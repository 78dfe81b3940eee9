'''Randomized truncated SVD vs. scipy dense/sparse SVD.'''
import numpy as np
import jax.numpy as jnp

from mfrec_tpu.ops import svd as svd_ops
from mfrec_tpu.data.movielens import ratings_from_arrays, synthetic_ratings


def test_randomized_svd_matches_scipy():
    users, items, vals = synthetic_ratings(80, 50, 1500, seed=7)
    r = ratings_from_arrays(users, items, vals, 80, 50)
    dense = r.to_dense().astype(np.float64)
    u, i, v = r.coo()
    k = 6
    U, s, Vt = svd_ops.randomized_svd(jnp.asarray(u), jnp.asarray(i),
                                      jnp.asarray(v), 80, 50, k,
                                      oversample=10, n_iter=8)
    U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
    s_true = np.linalg.svd(dense, compute_uv=False)[:k]
    np.testing.assert_allclose(s, s_true, rtol=5e-3)
    # reconstruction quality at rank k matches the optimal rank-k error
    approx = (U * s) @ Vt
    best = np.linalg.svd(dense, compute_uv=False)
    err = np.linalg.norm(dense - approx)
    opt = np.sqrt((best[k:] ** 2).sum())
    assert err < opt * 1.02


def test_coo_matmul_roundtrip():
    users, items, vals = synthetic_ratings(20, 15, 120, seed=8)
    r = ratings_from_arrays(users, items, vals, 20, 15)
    dense = r.to_dense()
    u, i, v = r.coo()
    X = np.random.default_rng(0).normal(0, 1, (15, 3)).astype(np.float32)
    got = np.asarray(svd_ops.coo_matmul(jnp.asarray(u), jnp.asarray(i),
                                        jnp.asarray(v), jnp.asarray(X), 20))
    np.testing.assert_allclose(got, dense @ X, atol=1e-4)
    Y = np.random.default_rng(1).normal(0, 1, (20, 3)).astype(np.float32)
    got = np.asarray(svd_ops.coo_rmatmul(jnp.asarray(u), jnp.asarray(i),
                                         jnp.asarray(v), jnp.asarray(Y), 15))
    np.testing.assert_allclose(got, dense.T @ Y, atol=1e-4)


def test_svd_model_predict(small_dataset):
    from mfrec_tpu.models.svd import SVDRecommender
    from mfrec_tpu.eval.metrics import test_predict_rating
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    model = SVDRecommender(U, I, {'nbr_features': 12})
    model.set_ratings(u, i, v)
    model.train()
    assert model.svd_s.shape[0] == 12
    rmse, _ = test_predict_rating(model, test, nbr_samples=200,
                                  predictor='predict', quiet=True)
    base_rmse = float(np.sqrt(((test[:, 2] - v.mean()) ** 2).mean()))
    assert np.isfinite(rmse)
    assert rmse < base_rmse * 1.5   # sanity: in the right range
