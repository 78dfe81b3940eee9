import numpy as np

from mfrec_tpu.data.ratings import Ratings, Vocab
from mfrec_tpu.data.movielens import synthetic_ratings, ratings_from_arrays


def test_vocab_defaults_and_relabel():
    v = Vocab(3, 'item')
    assert v.labels == ['item0', 'item1', 'item2']
    assert v.index['item1'] == 1
    v.set_label(1, 'Terminator 2')
    assert v.index['Terminator 2'] == 1
    assert 'item1' not in v.index
    assert v.add('new') == 3


def test_ratings_set_get_dedup():
    r = Ratings(4, 5)
    r.set(1, 2, 3.0)
    r.set(1, 2, 4.0)          # last write wins (lil_matrix semantics)
    r.set(0, 1, 2.0)
    assert r.nnz == 2
    assert r.get(1, 2) == 4.0
    r.set(1, 2, 0.0)          # explicit zero deletes
    assert r.nnz == 1


def test_ratings_csr_csc_roundtrip():
    users, items, vals = synthetic_ratings(50, 30, 400, seed=0)
    r = ratings_from_arrays(users, items, vals, 50, 30)
    ptr, cols, v = r.csr()
    assert ptr[-1] == r.nnz
    dense = r.to_dense()
    for u in (0, 7, 23):
        seg = cols[ptr[u]:ptr[u + 1]]
        np.testing.assert_array_equal(np.sort(np.nonzero(dense[u])[0]),
                                      np.sort(seg))
    cptr, rows, cv = r.csc()
    assert cptr[-1] == r.nnz
    i = 5
    np.testing.assert_array_equal(np.sort(np.nonzero(dense[:, i])[0]),
                                  np.sort(rows[cptr[i]:cptr[i + 1]]))


def test_padded_rows_cover_all():
    users, items, vals = synthetic_ratings(50, 30, 500, seed=1)
    r = ratings_from_arrays(users, items, vals, 50, 30)
    buckets = r.padded_rows(axis='user')
    covered = np.concatenate([b[0] for b in buckets])
    active = np.nonzero(r.user_counts() > 0)[0]
    np.testing.assert_array_equal(np.sort(covered), active)
    total = sum(int(b[3].sum()) for b in buckets)
    assert total == r.nnz
    # padded entries echo the right neighbor ids
    rows, idx, v, mask = buckets[0]
    dense = r.to_dense()
    u0 = int(rows[0])
    nz = np.nonzero(dense[u0])[0]
    got = np.sort(idx[0][mask[0] > 0])
    np.testing.assert_array_equal(got, np.sort(nz))


def test_shuffled_deterministic():
    users, items, vals = synthetic_ratings(20, 20, 100, seed=2)
    r = ratings_from_arrays(users, items, vals, 20, 20)
    a = r.shuffled(seed=7)
    b = r.shuffled(seed=7)
    np.testing.assert_array_equal(a[0], b[0])
    c = r.shuffled(seed=8)
    assert not np.array_equal(a[0], c[0])
