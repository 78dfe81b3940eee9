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
