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
    '''Model serving path via the Pallas kernel agrees with a brute-force
    bias predictor INCLUDING rated-item masking (in-kernel since r2).'''
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
    # brute-force check against the bias predictor with rated masking
    bu = m.users_bias; bi = m.items_bias
    full = (m.overall_bias + bu[np.asarray(users)][:, None]
            + bi[None, :] + m.P[np.asarray(users)] @ m.Q.T)
    for r, uu in enumerate(users):
        full[r, m.ratings.rated_mask_for_user(uu)] = -np.inf
    want = -np.sort(-full, axis=1)[:, :5]
    np.testing.assert_allclose(scores, want, atol=1e-3)
    for r, uu in enumerate(users):
        rated = set(np.nonzero(m.ratings.rated_mask_for_user(uu))[0])
        assert not (set(idx[r].tolist()) & rated)
