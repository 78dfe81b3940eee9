'''Pallas fused top-n kernel vs. the XLA reference path (interpret mode on
CPU; compiled on TPU).'''
import numpy as np
import jax
import jax.numpy as jnp

from mfrec_tpu.ops.pallas_topk import (topn_scores_pallas,
                                       pad_items_for_pallas, NEG)


def _case(B=8, I=300, K=16, n=5, block=128, seed=0):
    rng = np.random.default_rng(seed)
    P = rng.normal(0, 0.5, (B, K)).astype(np.float32)
    Q = rng.normal(0, 0.5, (I, K)).astype(np.float32)
    bu = rng.normal(0, 0.2, B).astype(np.float32)
    bi = rng.normal(0, 0.2, I).astype(np.float32)
    mu = 3.5
    Qp, bip = pad_items_for_pallas(Q, bi, block)
    idx, scores = topn_scores_pallas(
        jnp.asarray(P), jnp.asarray(Qp), jnp.asarray(bu), jnp.asarray(bip),
        mu, n=n, block=block, interpret=True)
    full = mu + bu[:, None] + bi[None, :] + P @ Q.T
    return np.asarray(idx), np.asarray(scores), full


def test_pallas_topn_matches_bruteforce():
    idx, scores, full = _case()
    want_scores = -np.sort(-full, axis=1)[:, :5]
    np.testing.assert_allclose(scores, want_scores, atol=1e-4)
    for b in range(full.shape[0]):
        want_ids = set(np.argsort(-full[b])[:5].tolist())
        assert set(idx[b].tolist()) == want_ids


def test_pallas_topn_descending_and_padding_excluded():
    idx, scores, full = _case(I=200, block=128)   # 56 padded rows
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert idx.max() < 200                        # no padded ids leaked
    assert (scores > NEG / 2).all()


def test_recommend_batch_pallas_path(small_dataset):
    '''Model serving path via the Pallas kernel honors the model's
    predictor mode (GD default: dot + 1.0, gradient_descent.py:621-631)
    INCLUDING rated-item masking — ids AND scores match both a
    brute-force predictor and the XLA path.'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 5, 'max_epochs': 5,
                             'nbr_features': 8, 'learning_rate': 0.01})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    users = [0, 5, 11, 17]
    idx, scores = m.recommend_batch(users, 5, use_pallas=True)
    assert idx.shape == (4, 5)
    # brute-force check against GD's default dot+1 predictor w/ masking
    full = 1.0 + m.P[np.asarray(users)] @ m.Q.T
    for r, uu in enumerate(users):
        full[r, m.ratings.rated_mask_for_user(uu)] = -np.inf
    want = -np.sort(-full, axis=1)[:, :5]
    np.testing.assert_allclose(scores, want, atol=1e-3)
    for r, uu in enumerate(users):
        rated = set(np.nonzero(m.ratings.rated_mask_for_user(uu))[0])
        assert not (set(idx[r].tolist()) & rated)
    # and the XLA default path agrees (same mode resolution)
    idx_x, sc_x = m.recommend_batch(users, 5, use_pallas=False)
    np.testing.assert_array_equal(idx, np.asarray(idx_x))
    np.testing.assert_allclose(scores, np.asarray(sc_x), atol=1e-3)


def test_recommend_batch_pallas_logistic_mode(small_dataset):
    '''KMF's logistic predictor through the Pallas path: ids match the
    XLA path exactly (the sigmoid is applied as a monotone host
    post-map), scores come back through the link.'''
    from mfrec_tpu.models.kmf import KMFRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = KMFRecommender(U, I, {'nbr_epochs': 4, 'nbr_features': 6})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train()
    users = [1, 3, 7]
    idx_p, sc_p = m.recommend_batch(users, 5, use_pallas=True)
    idx_x, sc_x = m.recommend_batch(users, 5, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_x),
                               atol=1e-3)
    lo, hi = float(m.min_rating), float(m.max_rating)
    assert (sc_p >= lo - 1e-6).all() and (sc_p <= hi + 1e-6).all()


# ---------------------------------------------------- fast opt-ins (r4)

def test_f32_sort_key_monotone():
    '''The int32 key orders exactly like the floats (negatives, zeros,
    denormal-scale, NEG sentinel).'''
    from mfrec_tpu.ops.pallas_topk import _f32_sort_key, _key_to_f32
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.normal(0, 10, 500), rng.normal(0, 1e-3, 200),
        [0.0, -0.0, 1e38, -1e38, NEG, 2.5, -2.5]]).astype(np.float32)
    order_f = np.argsort(vals, kind='stable')
    keys = np.asarray(_f32_sort_key(jnp.asarray(vals)))
    sf = vals[order_f]
    sk = keys[order_f]
    # keys must STRICTLY ascend wherever the floats do (float ties --
    # only +/-0.0 here -- may order either way in key space)
    assert (np.diff(sk)[np.diff(sf) > 0] > 0).all()
    # roundtrip: key -> float is exact when low bits are intact
    back = np.asarray(_key_to_f32(jnp.asarray(keys)))
    np.testing.assert_array_equal(back[sf == sf], vals[sf == sf])


def test_packed_merge_matches_exact_ids():
    '''packed_merge=True returns the same item SETS as the exact path
    when scores are well separated; scores match within the 2^-11
    quantization.'''
    idx0, sc0, full = _case(B=6, I=500, K=16, n=7, block=128, seed=4)
    rng = np.random.default_rng(4)
    P = rng.normal(0, 0.5, (6, 16)).astype(np.float32)
    Q = rng.normal(0, 0.5, (500, 16)).astype(np.float32)
    bu = rng.normal(0, 0.2, 6).astype(np.float32)
    bi = rng.normal(0, 0.2, 500).astype(np.float32)
    Qp, bip = pad_items_for_pallas(Q, bi, 128)
    idx, scores = topn_scores_pallas(
        jnp.asarray(P), jnp.asarray(Qp), jnp.asarray(bu), jnp.asarray(bip),
        3.5, n=7, block=128, interpret=True, packed_merge=True)
    full = 3.5 + bu[:, None] + bi[None, :] + P @ Q.T
    for b in range(6):
        want = set(np.argsort(-full[b])[:7].tolist())
        assert set(np.asarray(idx)[b].tolist()) == want
    want_s = -np.sort(-full, axis=1)[:, :7]
    # quantized toward -inf by <= 2^-11 relative
    s = np.asarray(scores)
    assert (s <= want_s + 1e-6).all()
    np.testing.assert_allclose(s, want_s, rtol=2 ** -10, atol=1e-5)


def test_packed_merge_with_rated_mask_and_bf16():
    '''bf16 dot + packed merge together: rated items still excluded,
    top sets match a bf16 brute force.'''
    rng = np.random.default_rng(7)
    B, I, K, n, block = 5, 400, 32, 6, 128
    P = rng.normal(0, 0.5, (B, K)).astype(np.float32)
    Q = rng.normal(0, 0.5, (I, K)).astype(np.float32)
    bu = rng.normal(0, 0.2, B).astype(np.float32)
    bi = rng.normal(0, 0.2, I).astype(np.float32)
    rated = np.zeros((B, 10), np.int32)
    mask = np.zeros((B, 10), np.float32)
    for b in range(B):
        picks = rng.choice(I, 10, replace=False)
        rated[b] = picks
        mask[b] = 1.0
    Qp, bip = pad_items_for_pallas(Q, bi, block)
    idx, scores = topn_scores_pallas(
        jnp.asarray(P), jnp.asarray(Qp), jnp.asarray(bu), jnp.asarray(bip),
        3.5, n=n, block=block, interpret=True,
        rated_idx=jnp.asarray(rated), rated_mask=jnp.asarray(mask),
        score_dtype='bfloat16', packed_merge=True)
    fullb = 3.5 + bu[:, None] + bi[None, :] + (
        P.astype(jnp.bfloat16) @ Q.astype(jnp.bfloat16).T
    ).astype(np.float32)
    for b in range(B):
        fullb[b, rated[b]] = -np.inf
        want = set(np.argsort(-fullb[b])[:n].tolist())
        got = set(np.asarray(idx)[b].tolist())
        assert got == want, (b, got, want)
        assert not (got & set(rated[b].tolist()))


def test_packed_merge_block_too_wide_raises():
    import pytest
    rng = np.random.default_rng(0)
    P = rng.normal(0, 0.5, (2, 8)).astype(np.float32)
    Q = rng.normal(0, 0.5, (8192, 8)).astype(np.float32)
    z = np.zeros(2, np.float32)
    bi = np.zeros(8192, np.float32)
    with pytest.raises(ValueError):
        topn_scores_pallas(jnp.asarray(P), jnp.asarray(Q), jnp.asarray(z),
                           jnp.asarray(bi), 0.0, n=3, block=8192,
                           interpret=True, packed_merge=True)
