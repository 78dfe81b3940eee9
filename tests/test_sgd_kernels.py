'''Kernel-level parity: the serial JAX tier must match the numpy oracle of
the Cython loops (near bit-parity), and the fused tier must converge to
comparable RMSE (the documented parity definition for order-changing
parallel schedules — SURVEY.md §7).'''
import numpy as np
import jax.numpy as jnp
import pytest

from mfrec_tpu.ops import sgd_mf
from mfrec_tpu.ops.reference_numpy import funk_train_oracle


def _coo(tiny_dataset):
    (u, i, v), test = tiny_dataset
    return u, i, v.astype(np.float32)


@pytest.mark.parametrize('bias_mode', ['none', 'fixed', 'learned'])
def test_serial_matches_oracle(tiny_dataset, bias_mode):
    u, i, v = _coo(tiny_dataset)
    U = int(u.max()) + 1
    I = int(i.max()) + 1
    dim, f_init, lr, K = 3, 0.1, 0.01, 0.02
    min_epochs = max_epochs = 3

    # oracle (reference layout u=[dim, items], v=[dim, users])
    uo = np.full((dim, I), f_init)
    vo = np.full((dim, U), f_init)
    mu = float(v.mean())
    bi_o = np.random.default_rng(0).normal(0, 0.05, I)
    bu_o = np.random.default_rng(1).normal(0, 0.05, U)
    idx = np.stack([u, i], 1)
    funk_train_oracle(min_epochs, max_epochs, 0.0001, dim, f_init, lr, K,
                      uo, vo, idx, v.astype(np.float64), bias_mode=bias_mode,
                      overall_avg=mu, items_bias=bi_o.copy(),
                      users_bias=bu_o.copy(),
                      lr_users=0.005, lr_items=0.005,
                      # K2 != K3: user- and item-bias regularization must
                      # genuinely differ (the reference collapses both to
                      # K2 — latent defect, see reference_numpy.py)
                      K_bias_users=0.012, K_bias_items=0.004)

    # serial JAX tier, feature-by-feature (row-major layout)
    P = jnp.full((U, dim), f_init, jnp.float32)
    Q = jnp.full((I, dim), f_init, jnp.float32)
    bu = jnp.asarray(bu_o, jnp.float32)
    bi = jnp.asarray(bi_o, jnp.float32)
    cache = jnp.zeros((u.shape[0],), jnp.float32)
    uj = jnp.asarray(u, jnp.int32)
    ij = jnp.asarray(i, jnp.int32)
    rj = jnp.asarray(v, jnp.float32)
    for f in range(dim):
        pf, qf = P[:, f], Q[:, f]
        rmse = 2.0
        for epoch in range(max_epochs):
            rmse_last = rmse
            if epoch >= min_epochs and not rmse <= rmse_last - 0.0001:
                break
            pf, qf, bu, bi, rmse_dev = sgd_mf.serial_feature_epoch(
                pf, qf, cache, uj, ij, rj, f, dim, f_init, lr, K,
                jnp.float32(mu), bu, bi, 0.005, 0.005, 0.012, 0.004,
                bias_mode=bias_mode, P=P, Q=Q)
            rmse = float(rmse_dev)
        P = P.at[:, f].set(pf)
        Q = Q.at[:, f].set(qf)
        if bias_mode != 'learned':
            cache = sgd_mf.update_cache(pf, qf, cache, uj, ij,
                                        jnp.float32(mu), bu, bi,
                                        bias_mode=bias_mode)
    np.testing.assert_allclose(np.asarray(Q).T, uo, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(P).T, vo, atol=2e-3, rtol=1e-3)


def test_fused_epoch_reduces_rmse(small_dataset):
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    k = 8
    state = sgd_mf.init_state(U, I, k, feature_init=0.1)
    mu = float(v.mean())
    state = state._replace(mu=jnp.float32(mu))
    ub, ib, rb, mb = sgd_mf.batch_ratings(u, i, v, batch_size=512, seed=0)
    epoch = sgd_mf.make_fused_epoch(512, lr=0.02, K=0.02, bias_mode='fixed',
                                    donate=False)
    hist = []
    for _ in range(30):
        state, rmse = epoch(state, jnp.asarray(ub), jnp.asarray(ib),
                            jnp.asarray(rb), jnp.asarray(mb), None, None)
        hist.append(float(rmse))
    assert hist[-1] < hist[0] - 0.05
    assert hist[-1] < 0.85


def test_fused_learned_bias_converges(small_dataset):
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    state = sgd_mf.init_state(U, I, 8, feature_init=0.1)
    state = state._replace(mu=jnp.float32(v.mean()))
    ub, ib, rb, mb = sgd_mf.batch_ratings(u, i, v, batch_size=512, seed=0)
    epoch = sgd_mf.make_fused_epoch(512, lr=0.02, K=0.02, lr_bu=0.01,
                                    lr_bi=0.01, K_bu=0.01, K_bi=0.02,
                                    bias_mode='learned', donate=False)
    for _ in range(30):
        state, rmse = epoch(state, jnp.asarray(ub), jnp.asarray(ib),
                            jnp.asarray(rb), jnp.asarray(mb), None, None)
    assert float(rmse) < 0.9
    assert float(jnp.abs(state.bu).max()) > 0  # biases actually learned


def test_fused_implicit_converges(small_dataset):
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    state = sgd_mf.init_state(U, I, 8, feature_init=0.1)
    state = state._replace(mu=jnp.float32(v.mean()))
    ub, ib, rb, mb = sgd_mf.batch_ratings(u, i, v, batch_size=512, seed=0)
    # padded per-user lists
    from mfrec_tpu.data.movielens import ratings_from_arrays
    r = ratings_from_arrays(u, i, v, U, I)
    ptr, items, _ = r.csr()
    counts = np.diff(ptr)
    L = int(counts.max())
    fl = np.zeros((U, L), np.int32)
    fm = np.zeros((U, L), np.float32)
    for uu in range(U):
        n = counts[uu]
        fl[uu, :n] = items[ptr[uu]:ptr[uu + 1]]
        fm[uu, :n] = 1.0
    epoch = sgd_mf.make_fused_epoch(512, lr=0.02, K=0.02, bias_mode='fixed',
                                    implicit=True, donate=False)
    hist = []
    for _ in range(20):
        state, rmse = epoch(state, jnp.asarray(ub), jnp.asarray(ib),
                            jnp.asarray(rb), jnp.asarray(mb),
                            jnp.asarray(fl), jnp.asarray(fm))
        hist.append(float(rmse))
    assert hist[-1] < hist[0]
    assert float(jnp.abs(state.Y).max()) > 0


def test_alternating_epoch_converges(small_dataset):
    '''Scatter-free sorted-window tier: converges to rmse comparable to
    the fused tier.'''
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pl_ = sgd_mf.sorted_pass_layout(u, i, v, 512, axis='user')
    ql_ = sgd_mf.sorted_pass_layout(u, i, v, 512, axis='item')
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, 8, feature_init=0.1)
    Paug, Qaug = sgd_mf.augment_factors(st.P, st.Q, st.bu, st.bi)
    mu = jnp.float32(v.mean())
    # row-mean gradients: use a larger lr than per-sample SGD
    epoch = sgd_mf.make_alternating_epoch(W_user, W_item, lr=0.2, K=0.02,
                                          bias_mode='fixed', chunk=512,
                                          donate=False)
    hist = []
    for _ in range(30):
        Paug, Qaug, rmse = epoch(Paug, Qaug, mu, p_layout, q_layout)
        hist.append(float(rmse))
    assert hist[-1] < hist[0] - 0.05
    assert hist[-1] < 0.8
    P, Q, bu, bi = sgd_mf.split_factors(Paug, Qaug)
    assert np.isfinite(np.asarray(P)).all()
    # bias/const columns untouched in fixed mode
    np.testing.assert_array_equal(np.asarray(bu), 0.0)
    np.testing.assert_array_equal(np.asarray(Paug[:, -1]), 1.0)


def test_alternating_layout_covers_all(small_dataset):
    (u, i, v), _ = small_dataset
    ub, ib, rb, mb, kl, lo, W = sgd_mf.sorted_pass_layout(u, i, v, 512,
                                                          axis='user')
    assert int(mb.sum()) == u.shape[0]
    # window-local ids valid
    assert kl.max() < W
    # reconstruct the sorted stream
    sel = mb.ravel() > 0
    np.testing.assert_array_equal(np.sort(ub.ravel()[sel]), np.sort(u))


def test_gd_model_alternating_engine(small_dataset):
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 20, 'max_epochs': 20,
                             'nbr_features': 8, 'learning_rate': 0.2,
                             'regularization_model': 0.02,
                             'engine': 'alternating', 'batch_size': 1024})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    assert m.P.shape == (U, 8)
    hist = m.get_rmse_history()
    assert hist[-1] < hist[0]


def test_funk_fused_engine_trains(small_dataset):
    '''funk_fused: feature-by-feature schedule at mini-batch speed;
    trains to reasonable rmse and fills per-feature rmse history.'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 8, 'max_epochs': 8,
                             'nbr_features': 6, 'learning_rate': 0.02,
                             'regularization_model': 0.02,
                             'engine': 'funk_fused', 'batch_size': 1024})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    hist = m.get_rmse_history()
    assert len(hist) == 6 * 8                  # per-feature epochs recorded
    assert hist[-1] < hist[0]
    assert np.isfinite(m.predict_rating_with_bias(1, 1))


def test_funk_fused_matches_funk_serial_loosely(tiny_dataset):
    '''With one big batch, funk_fused differs from the serial sweep only
    in within-epoch update order; final factors should be close on easy
    data.'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = tiny_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    params = {'min_epochs': 4, 'max_epochs': 4, 'nbr_features': 3,
              'learning_rate': 0.01, 'regularization_model': 0.02}
    outs = {}
    for engine in ('funk', 'funk_fused'):
        p = dict(params, engine=engine, batch_size=4096)
        m = GDRecommender(U, I, p)
        m.seed(42)                 # same shuffle draw
        m.set_ratings(u, i, v)
        m.train()
        outs[engine] = m.rmse_history[-1]
    assert abs(outs['funk'] - outs['funk_fused']) < 0.1, outs


def test_engines_deterministic(small_dataset):
    '''Determinism (the single-chip analogue of SURVEY §5 race detection):
    same seed -> bit-identical factors for the fused and alternating
    engines.'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    for engine in ('fused', 'alternating'):
        outs = []
        for _ in range(2):
            m = GDRecommender(U, I, {'min_epochs': 5, 'max_epochs': 5,
                                     'nbr_features': 6,
                                     'learning_rate': 0.02,
                                     'engine': engine, 'batch_size': 1024})
            m.seed(123)
            m.set_ratings(u, i, v)
            m.train(handle_bias=True)
            outs.append(m.P.copy())
        np.testing.assert_array_equal(outs[0], outs[1])


def test_funk_fused_learned_bias(tiny_dataset):
    '''funk_fused learned-bias mode (off-feature dot cache) tracks the
    exact serial learned loop at final-RMSE tolerance, learns biases.'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = tiny_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    params = {'min_epochs': 4, 'max_epochs': 4, 'nbr_features': 3,
              'learning_rate': 0.01, 'regularization_model': 0.02,
              'learning_rate_users': 0.005, 'learning_rate_items': 0.005,
              'regularization_users_bias': 0.012,
              'regularization_items_bias': 0.004}
    outs = {}
    for engine in ('funk', 'funk_fused'):
        m = GDRecommender(U, I, dict(params, engine=engine,
                                     batch_size=4096))
        m.seed(42)
        m.set_ratings(u, i, v)
        m.feature_training_bias()
        outs[engine] = m
    d = abs(outs['funk'].rmse_history[-1]
            - outs['funk_fused'].rmse_history[-1])
    assert d < 0.05, (outs['funk'].rmse_history[-1],
                      outs['funk_fused'].rmse_history[-1])
    assert np.abs(outs['funk_fused'].users_bias).max() > 0


def test_alternating_implicit_converges(small_dataset):
    '''SVD++ at sorted-window speed: rmse falls, Y learns, and every
    engine routes through the exact windowed tier (the capped fused
    implicit path was removed — r2 verdict weak #3).'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 25, 'max_epochs': 25,
                             'nbr_features': 6, 'learning_rate': 0.2,
                             'regularization_model': 0.02,
                             'engine': 'alternating', 'batch_size': 1024,
                             'inner_steps': 4})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.feature_training_implicit()
    hist = m.get_rmse_history()
    assert hist[-1] < hist[0] - 0.03
    assert np.abs(m.Y).max() > 0                  # y factors learned
    assert np.isfinite(m.predict_rating_implicit(1, 1))
    # engine='fused' lands on the SAME exact tier (no capped path left)
    m2 = GDRecommender(U, I, {'min_epochs': 25, 'max_epochs': 25,
                              'nbr_features': 6, 'learning_rate': 0.2,
                              'regularization_model': 0.02,
                              'engine': 'fused', 'batch_size': 1024,
                              'inner_steps': 4})
    m2.seed(0)
    m2.set_ratings(u, i, v)
    m2.feature_training_implicit()
    np.testing.assert_allclose(m2.Y, m.Y, atol=1e-6)


def test_implicit_heavy_user_exact_feedback():
    '''r2 verdict weak #3 "done" criterion: a user with MORE than 128
    ratings (the old feedback_cap) must contribute their FULL rated set
    to the SVD++ feedback sum — verified against a direct numpy
    recomputation of the predictor from the trained factors.'''
    from mfrec_tpu.models.gd import GDRecommender
    rng = np.random.default_rng(0)
    U, I = 40, 200
    # user 0 rates 180 items (> the old 128 cap); others rate a few
    heavy_items = rng.choice(I, 180, replace=False)
    uu = [0] * 180
    ii = list(heavy_items)
    for usr in range(1, U):
        its = rng.choice(I, 6, replace=False)
        uu += [usr] * 6
        ii += list(its)
    vv = rng.integers(1, 6, len(uu)).astype(np.float32)
    u, i, v = (np.asarray(uu, np.int32), np.asarray(ii, np.int32), vv)
    m = GDRecommender(U, I, {'min_epochs': 5, 'max_epochs': 5,
                             'nbr_features': 4, 'learning_rate': 0.1,
                             'engine': 'alternating', 'batch_size': 512,
                             'inner_steps': 2})
    m.seed(1)
    m.set_ratings(u, i, v)
    m.feature_training_implicit()
    # predictor must use ALL 180 rated items of user 0
    seek, span = m.feedback_hash[0]
    assert span == 180
    items_id = m.feedback_rated[seek:seek + span, 1]
    p_u = m.P[0] + m.Y[items_id].sum(0) / np.sqrt(180)
    want = float(m.Q[3] @ p_u + m.overall_bias + m.items_bias[3]
                 + m.users_bias[0])
    got = m.predict_rating_implicit(3, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_alternating_lr_scale_matches_rebuild(tiny_dataset):
    '''The traced lr_scale arg must equal a rebuild at the scaled rates
    BIT-EXACTLY (all lrv columns scale: factors + learned biases) — the
    schedule/backoff path must not drift from the constant-rate path.'''
    u, i, v = _coo(tiny_dataset)
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pl_ = sgd_mf.sorted_pass_layout(u, i, v, 256, axis='user',
                                    max_window=16)
    ql_ = sgd_mf.sorted_pass_layout(u, i, v, 256, axis='item',
                                    max_window=16)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, 8, feature_init=0.1)
    Paug, Qaug = sgd_mf.augment_factors(st.P, st.Q, st.bu, st.bi)
    mu = jnp.float32(v.mean())
    kw = dict(bias_mode='learned', chunk=256, inner_steps=3,
              donate=False)
    ep_a = sgd_mf.make_alternating_epoch(W_user, W_item, lr=0.2, K=0.02,
                                         lr_bu=0.05, lr_bi=0.05, **kw)
    ep_b = sgd_mf.make_alternating_epoch(W_user, W_item, lr=0.1, K=0.02,
                                         lr_bu=0.025, lr_bi=0.025, **kw)
    P1, Q1, r1 = ep_a(Paug, Qaug, mu, p_layout, q_layout,
                      jnp.float32(0.5))
    P2, Q2, r2 = ep_b(Paug, Qaug, mu, p_layout, q_layout)
    np.testing.assert_array_equal(np.asarray(P1), np.asarray(P2))
    np.testing.assert_array_equal(np.asarray(Q1), np.asarray(Q2))
    assert float(r1) == float(r2)
    # scale=1.0 (traced) == no scale arg (default path)
    P3, Q3, _ = ep_a(Paug, Qaug, mu, p_layout, q_layout)
    P4, Q4, _ = ep_a(Paug, Qaug, mu, p_layout, q_layout,
                     jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(P3), np.asarray(P4))
    np.testing.assert_array_equal(np.asarray(Q3), np.asarray(Q4))


def test_alternating_implicit_lr_scale_matches_rebuild(tiny_dataset):
    '''SVD++ tier: the traced lr_scale arg must equal a rebuild at the
    scaled rates BIT-EXACTLY — the scale rides BOTH the P/Q half-passes
    (through the base epoch) and the Y window step (lr_y * s).'''
    u, i, v = _coo(tiny_dataset)
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pl_ = sgd_mf.sorted_pass_layout(u, i, v, 256, axis='user',
                                    max_window=16)
    ql_ = sgd_mf.sorted_pass_layout(u, i, v, 256, axis='item',
                                    max_window=16)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    k = 8
    st = sgd_mf.init_state(U + W_user, I + W_item, k, feature_init=0.1)
    Paug, Qaug = sgd_mf.augment_factors(st.P, st.Q, st.bu, st.bi)
    # nonzero Y so phase 1 (user aggregates of Y) is exercised
    Ypad = jnp.asarray(np.random.default_rng(7).normal(
        0, 0.05, (I + W_item, k)).astype(np.float32))
    counts = np.bincount(u, minlength=U).astype(np.float32)
    nrm = np.zeros(U + W_user, np.float32)
    nrm[:U] = np.where(counts > 0, 1.0 / np.sqrt(np.maximum(counts, 1.0)),
                       0.0)
    nrm_rows = jnp.asarray(nrm)
    mu = jnp.float32(v.mean())
    kw = dict(K=0.02, K_y=0.02, chunk=256, inner_steps=2, donate=False)
    ep_a = sgd_mf.make_alternating_implicit_epoch(W_user, W_item,
                                                  lr=0.2, lr_y=0.2, **kw)
    ep_b = sgd_mf.make_alternating_implicit_epoch(W_user, W_item,
                                                  lr=0.1, lr_y=0.1, **kw)
    P1, Q1, Y1, r1 = ep_a(Paug, Qaug, Ypad, mu, p_layout, q_layout,
                          nrm_rows, jnp.float32(0.5))
    P2, Q2, Y2, r2 = ep_b(Paug, Qaug, Ypad, mu, p_layout, q_layout,
                          nrm_rows)
    np.testing.assert_array_equal(np.asarray(P1), np.asarray(P2))
    np.testing.assert_array_equal(np.asarray(Q1), np.asarray(Q2))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y2))
    assert float(r1) == float(r2)
    # scale=1.0 (traced) == no scale arg (default path)
    P3, Q3, Y3, _ = ep_a(Paug, Qaug, Ypad, mu, p_layout, q_layout,
                         nrm_rows)
    P4, Q4, Y4, _ = ep_a(Paug, Qaug, Ypad, mu, p_layout, q_layout,
                         nrm_rows, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(P3), np.asarray(P4))
    np.testing.assert_array_equal(np.asarray(Y3), np.asarray(Y4))


def test_gd_implicit_lr_decay_and_plateau(small_dataset):
    '''Model-level SVD++ schedules: lr_decay trains (finite, converging,
    different trajectory from constant-rate), lr_plateau_decay keeps
    training through the stall, and both are REFUSED on the sharded
    implicit engine (not wired there — silent wrong rates otherwise).'''
    from mfrec_tpu.models.base import Error
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    base = {'nbr_features': 6, 'learning_rate': 0.2,
            'regularization_model': 0.02, 'engine': 'alternating',
            'batch_size': 1024, 'inner_steps': 4,
            'min_epochs': 8, 'max_epochs': 8}
    m0 = GDRecommender(U, I, base)
    m0.seed(0)
    m0.set_ratings(u, i, v)
    m0.feature_training_implicit()
    m1 = GDRecommender(U, I, dict(base, lr_decay=0.7))
    m1.seed(0)
    m1.set_ratings(u, i, v)
    m1.feature_training_implicit()
    h0, h1 = m0.get_rmse_history(), m1.get_rmse_history()
    assert np.isfinite(m1.P).all() and np.isfinite(m1.Y).all()
    assert h1[-1] < h1[0] - 0.02                  # still converges
    assert h1[0] == pytest.approx(h0[0])          # epoch 0: scale 0.7**0=1
    assert h1[-1] != pytest.approx(h0[-1])        # schedule changed later
    # plateau decay: keeps training past the plain stop point
    stall = dict(base, min_epochs=3, max_epochs=40, min_improvement=5e-3)
    m2 = GDRecommender(U, I, stall)
    m2.seed(0)
    m2.set_ratings(u, i, v)
    m2.feature_training_implicit()
    m3 = GDRecommender(U, I, dict(stall, lr_plateau_decay=0.5))
    m3.seed(0)
    m3.set_ratings(u, i, v)
    m3.feature_training_implicit()
    h2, h3 = m2.get_rmse_history(), m3.get_rmse_history()
    assert len(h3) > len(h2)
    assert h3[:len(h2)] == pytest.approx(h2)      # identical to the stall
    assert h3[-1] <= h2[-1] + 1e-9
    # refusal on the sharded implicit tier
    for kw in ({'lr_decay': 0.9}, {'lr_plateau_decay': 0.9}):
        bad = GDRecommender(U, I, dict(base, engine='alternating_sharded',
                                       **kw))
        bad.set_ratings(u, i, v)
        with pytest.raises(Error):
            bad.feature_training_implicit()


def test_gd_model_lr_decay_matches_stepwise(small_dataset):
    '''lr_decay=g on the alternating engine == training one epoch at a
    time with learning_rate lr*g**e (warm start) — exact on CPU (lr and
    g chosen exactly representable so baked and traced rates agree).'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    base = {'nbr_features': 8, 'regularization_model': 0.02,
            'engine': 'alternating', 'batch_size': 1024}
    m = GDRecommender(U, I, dict(base, min_epochs=3, max_epochs=3,
                                 learning_rate=0.25, lr_decay=0.5))
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)

    s = GDRecommender(U, I, dict(base, min_epochs=1, max_epochs=1,
                                 learning_rate=0.25))
    s.set_ratings(u, i, v)
    s.train(handle_bias=True)
    for e in (1, 2):
        s.set_parameters({'learning_rate': 0.25 * 0.5 ** e})
        s.feature_training(initialize_model=False, handle_bias=True)
    np.testing.assert_array_equal(m.P, s.P)
    np.testing.assert_array_equal(m.Q, s.Q)


def test_gd_model_lr_decay_validation(small_dataset):
    from mfrec_tpu.models.base import Error
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 1, 'max_epochs': 1,
                             'nbr_features': 4, 'engine': 'fused',
                             'lr_decay': 0.9, 'batch_size': 1024})
    m.set_ratings(u, i, v)
    with pytest.raises(Error):           # refused off the wired engine
        m.train()
    m2 = GDRecommender(U, I, {'min_epochs': 1, 'max_epochs': 1,
                              'nbr_features': 4, 'engine': 'alternating',
                              'lr_decay': 1.5, 'batch_size': 1024})
    m2.set_ratings(u, i, v)
    with pytest.raises(Error):           # out of (0, 1]
        m2.train()


def test_gd_model_lr_decay_with_resilience(small_dataset):
    '''Decay composes with the resilient driver (backoff scale x decay
    exponent both ride the traced lr_scale; no epoch rebuilds).'''
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = GDRecommender(U, I, {'min_epochs': 4, 'max_epochs': 4,
                             'nbr_features': 8, 'learning_rate': 0.2,
                             'regularization_model': 0.02,
                             'engine': 'alternating', 'batch_size': 1024,
                             'lr_decay': 0.8, 'resilience': 1})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    hist = m.get_rmse_history()
    assert len(hist) == 4 and hist[-1] < hist[0]
    assert np.isfinite(m.P).all()


def test_convergence_driver_plateau_decay():
    '''Driver-level: a stall decays lr_scale and continues; the floor
    restores the reference stop rule; plateau_decay=1.0 is bit-legacy.'''
    from mfrec_tpu.engine.trainer import ConvergenceDriver

    def make_fn(seq):
        it = iter(seq)

        def fn(state):
            return state + 1, next(it)
        return fn

    # improving, then stalled: legacy stops right after the first stall
    seq = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    d0 = ConvergenceDriver(1, 50, 1e-3)
    s0 = d0.run(make_fn(seq), 0)
    assert s0 == 3 and d0.lr_scale == 1.0          # 1.0, 0.9, 0.9(stall)
    # plateau decay keeps training through stalls, decaying each time,
    # until the scale floors — then stops
    d1 = ConvergenceDriver(1, 50, 1e-3, plateau_decay=0.5,
                           min_lr_scale=0.2)
    s1 = d1.run(make_fn(seq + [0.9] * 10), 0)
    # decays: 0.5, 0.25, 0.2(floored) -> one extra epoch each, then stop
    assert s1 > s0
    assert d1.lr_scale == 0.2
    # a post-decay improvement resumes the normal rule
    d2 = ConvergenceDriver(1, 50, 1e-3, plateau_decay=0.5)
    seq2 = [1.0, 0.9, 0.9, 0.5, 0.4, 0.4, 0.4]     # stall, decay, improve
    d2.run(make_fn(seq2 + [0.4] * 20), 0)
    assert min(d2.history) == 0.4


def test_gd_model_plateau_decay(small_dataset):
    '''Model-level: lr_plateau_decay engages at the stop point, trains
    further than the plain rule, and never hurts final train RMSE.'''
    from mfrec_tpu.models.base import Error
    from mfrec_tpu.models.gd import GDRecommender
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    base = {'nbr_features': 8, 'learning_rate': 0.2,
            'regularization_model': 0.02, 'engine': 'alternating',
            'batch_size': 1024, 'min_epochs': 5, 'max_epochs': 60,
            'min_improvement': 1e-3}
    m0 = GDRecommender(U, I, base)
    m0.set_ratings(u, i, v)
    m0.train(handle_bias=True)
    m1 = GDRecommender(U, I, dict(base, lr_plateau_decay=0.5))
    m1.set_ratings(u, i, v)
    m1.train(handle_bias=True)
    h0, h1 = m0.get_rmse_history(), m1.get_rmse_history()
    assert len(h1) > len(h0)             # kept training through the stall
    assert h1[:len(h0)] == pytest.approx(h0)   # identical until the stall
    assert h1[-1] <= h0[-1] + 1e-9
    # refusal contracts
    bad = GDRecommender(U, I, dict(base, lr_plateau_decay=0.5,
                                   engine='fused'))
    bad.set_ratings(u, i, v)
    with pytest.raises(Error):
        bad.train()
    bad2 = GDRecommender(U, I, dict(base, lr_plateau_decay=0.5,
                                    resilience=1))
    bad2.set_ratings(u, i, v)
    with pytest.raises(Error):
        bad2.train()
