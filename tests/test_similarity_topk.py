'''Similarity engine and fused top-N retrieval vs. brute-force numpy.'''
import numpy as np
import jax.numpy as jnp
import pytest

from mfrec_tpu.ops import similarity as sim_ops
from mfrec_tpu.ops import topk as topk_ops
from mfrec_tpu.data.movielens import ratings_from_arrays, synthetic_ratings


@pytest.mark.parametrize('method', ['cosine', 'pearson', 'euclidean'])
def test_similarity_matches_pairwise_oracle(method):
    rng = np.random.default_rng(0)
    F = rng.normal(0, 1, (30, 6)).astype(np.float32)
    s = np.asarray(sim_ops.similarity_to_queries(
        jnp.asarray(F), jnp.asarray(F[4:5]), method=method))[0]
    for j in range(30):
        want = sim_ops.numpy_reference_similarity(F[j].astype(np.float64),
                                                  F[4].astype(np.float64),
                                                  method)
        assert abs(s[j] - want) < 1e-4, (j, s[j], want)


def test_similar_topk_order_and_exclusion():
    rng = np.random.default_rng(1)
    F = rng.normal(0, 1, (40, 5)).astype(np.float32)
    idx, sims = sim_ops.similar_topk(jnp.asarray(F), jnp.asarray([7]), 10,
                                     method='cosine')
    idx, sims = np.asarray(idx[0]), np.asarray(sims[0])
    assert 7 not in idx
    assert np.all(np.diff(sims) <= 1e-6)       # descending
    # brute force
    Fn = F / np.linalg.norm(F, axis=1, keepdims=True)
    full = Fn @ Fn[7]
    full[7] = -np.inf
    want = np.argsort(-full)[:10]
    np.testing.assert_array_equal(np.sort(idx), np.sort(want))


def test_all_pairs_topk_matches_per_query():
    rng = np.random.default_rng(2)
    F = rng.normal(0, 1, (50, 4)).astype(np.float32)
    idx_all, sims_all = sim_ops.all_pairs_topk(jnp.asarray(F), 5,
                                               method='cosine', block=16)
    idx_q, sims_q = sim_ops.similar_topk(jnp.asarray(F),
                                         jnp.arange(50), 5, method='cosine')
    np.testing.assert_allclose(np.asarray(sims_all), np.asarray(sims_q),
                               atol=1e-5)


def test_binary_cosine_matches_set_oracle():
    users, items, vals = synthetic_ratings(25, 15, 150, seed=3)
    r = ratings_from_arrays(users, items, vals, 25, 15)
    B = (r.to_dense() != 0)
    idx, sims = sim_ops.binary_cosine_topk(
        jnp.asarray(B, jnp.float32), jnp.asarray([2]), 10)
    sets = [set(np.nonzero(B[u])[0].tolist()) for u in range(25)]
    for pos, uid in enumerate(np.asarray(idx[0])):
        a, b = sets[2], sets[int(uid)]
        denom = np.sqrt(float(len(a) * len(b)))
        want = len(a & b) / denom if denom else 0.0
        assert abs(float(sims[0][pos]) - want) < 1e-5


def test_topn_scores_masks_rated_and_matches_bruteforce():
    users, items, vals = synthetic_ratings(30, 50, 300, seed=4)
    r = ratings_from_arrays(users, items, vals, 30, 50)
    rng = np.random.default_rng(5)
    P = rng.normal(0, 0.5, (30, 6)).astype(np.float32)
    Q = rng.normal(0, 0.5, (50, 6)).astype(np.float32)
    batch_users = [0, 3, 9]
    rated_idx, rated_mask = topk_ops.pad_rated_lists(r, batch_users)
    idx, scores = topk_ops.topn_scores(
        jnp.asarray(P[batch_users]), jnp.asarray(Q),
        jnp.zeros(3, jnp.float32), jnp.zeros(50, jnp.float32),
        jnp.float32(0.0), jnp.asarray(rated_idx), jnp.asarray(rated_mask),
        n=5, block=16, predictor='dot_plus_one')
    idx, scores = np.asarray(idx), np.asarray(scores)
    for b, u in enumerate(batch_users):
        full = P[u] @ Q.T + 1.0
        full[r.rated_mask_for_user(u)] = -np.inf
        want = np.argsort(-full)[:5]
        np.testing.assert_array_equal(np.sort(idx[b]), np.sort(want))
        assert not np.any(r.rated_mask_for_user(u)[idx[b]])


def test_topn_scores_bias_and_logistic_modes():
    rng = np.random.default_rng(6)
    P = rng.normal(0, 0.5, (2, 4)).astype(np.float32)
    Q = rng.normal(0, 0.5, (20, 4)).astype(np.float32)
    bu = rng.normal(0, 0.2, 2).astype(np.float32)
    bi = rng.normal(0, 0.2, 20).astype(np.float32)
    rated_idx = np.zeros((2, 1), np.int32)
    rated_mask = np.zeros((2, 1), np.float32)
    for mode in ('bias', 'logistic', 'dot'):
        idx, scores = topk_ops.topn_scores(
            jnp.asarray(P), jnp.asarray(Q), jnp.asarray(bu),
            jnp.asarray(bi), jnp.float32(3.5), jnp.asarray(rated_idx),
            jnp.asarray(rated_mask), n=3, block=8, predictor=mode)
        scores = np.asarray(scores)
        dots = P @ Q.T
        if mode == 'bias':
            full = 3.5 + bu[:, None] + bi[None, :] + dots
        elif mode == 'logistic':
            full = 1.0 + 1.0 / (1.0 + np.exp(-(dots + bu[:, None]
                                               + bi[None, :]))) * 4.0
        else:
            full = dots
        want = -np.sort(-full, axis=1)[:, :3]
        np.testing.assert_allclose(scores, want, atol=1e-5)
