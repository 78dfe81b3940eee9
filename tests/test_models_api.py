'''API-parity surface: parameter dicts, labels, biases, persistence,
fold-in, similarity methods — mirroring how the reference is driven
(example1b + the call stacks in SURVEY.md §3).'''
import io
import json

import numpy as np
import pytest

from mfrec_tpu.models.base import BaseRecommender, Error
from mfrec_tpu.models.gd import GDRecommender
from mfrec_tpu.models.wrmf import WRMFRecommender
from mfrec_tpu.models.popular import MostPopularRecommender
from mfrec_tpu.models.random_ import RandomRecommender
from mfrec_tpu.models.knn_users import KNNUsersRecommender


def _small_gd(small_dataset, **over):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    params = {'min_epochs': 10, 'max_epochs': 10, 'nbr_features': 6,
              'learning_rate': 0.02, 'regularization_model': 0.02,
              # pin the sweep count these tests were tuned under: the
              # shipped default climbed the TPU ladder to T=128, which
              # is 16x the CPU work and not what's under test here
              'inner_steps': 8}
    params.update(over)
    model = GDRecommender(U, I, params)
    model.seed(0)
    model.set_ratings(u, i, v)
    return model, test


def test_set_parameters_unknown_key_raises():
    with pytest.raises(Error):
        GDRecommender(4, 6, {'bogus_param': 1})


def test_parameters_map_to_reference_attributes():
    m = GDRecommender(4, 6, {'min_epochs': 5, 'regularization_model': 0.07,
                             'nbr_features': 12})
    assert m.min_epochs == 5
    assert m.K == 0.07
    assert m.dimensionality == 12


def test_default_labels_and_relabel():
    m = BaseRecommender(3, 2)
    assert m.users_label == ['user0', 'user1', 'user2']
    assert m.items_index['item1'] == 1
    m.set_item_label(1, 'Toy Story (1995)')
    assert m.items_index['Toy Story (1995)'] == 1
    with pytest.raises(KeyError):
        m.set_item_label(99, 'nope')


def test_ingest_paths_agree():
    m = BaseRecommender(3, 4)
    m.set_item_by_id(0, 1, 4.0)
    m.set_item_by_label('user1', 'item2', 3.0)
    m.set_item('user2', [{'label': 'item0', 'value': 5.0}])
    assert m.get_nbr_ratings() == 3
    assert m.ratings.get(1, 2) == 3.0
    m.set_item_raw(0, np.array([1.0, 0.0, 0.0, 2.0]))
    assert m.ratings.get(0, 3) == 2.0


def test_bias_computations(small_dataset):
    model, _ = _small_gd(small_dataset)
    model.compute_overall_avg()
    assert 1.0 < model.overall_bias < 5.0
    model.compute_items_bias_bk()
    model.compute_users_bias_bk()
    assert model.items_bias.shape[0] == model.nbr_items
    assert np.isfinite(model.items_bias).all()
    assert abs(model.users_bias.mean()) < 1.0
    model.compute_items_bias()
    model.compute_users_bias()
    assert np.isfinite(model.users_bias).all()
    model.compute_item_pseudo_avg()
    assert np.isfinite(model.items_avg).all()
    b2 = model.baseline_predictor2(0, 0)
    assert np.isfinite(b2)


def test_gd_end_to_end_beats_baseline(small_dataset):
    from mfrec_tpu.eval.metrics import test_predict_rating
    model, test = _small_gd(small_dataset, min_epochs=40, max_epochs=40)
    model.train(handle_bias=True)
    rmse, _ = test_predict_rating(model, test, nbr_samples=len(test),
                                  predictor='predict_rating_with_bias',
                                  quiet=True)
    base = float(np.sqrt(((test[:, 2] - test[:, 2].mean()) ** 2).mean()))
    assert rmse < base


def test_gd_warm_start_continues(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3,
                         learning_rate=0.005)
    model.train()
    P1 = model.P.copy()
    rmse_cold = model.rmse_history[-1]
    model.train(initialize_model=False)
    assert not np.allclose(model.P, P1)      # training continued
    assert model.rmse_history[-1] < rmse_cold   # and kept improving


def test_gd_rmse_history(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=5, max_epochs=5)
    model.train()
    hist = model.get_rmse_history()
    assert len(hist) == 5
    assert hist[-1] < hist[0]


def test_gd_add_user_fold_in(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    model.train(handle_bias=True)
    nbr_users_before = model.nbr_users
    rated_items = np.array([0, 1, 2, 3], np.int32)
    ratings = np.array([5.0, 4.0, 4.5, 3.0], np.float32)
    new_id = model.add_user('fresh-user', rated_items, ratings)
    assert new_id == nbr_users_before
    assert model.nbr_users == nbr_users_before + 1
    assert model.P.shape[0] == nbr_users_before + 1
    pred = model.predict_rating(0, new_id)
    assert np.isfinite(pred)


def test_gd_predictors(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    model.train(handle_bias=True)
    assert np.isfinite(model.predict_rating(1, 1))
    assert np.isfinite(model.predict_rating_with_bias(1, 1))
    assert model.predict(1, 1) == model.predict_rating(1, 1)
    lbl = model.predict_rating_by_label('user1', 'item1')
    assert lbl == model.predict_rating(1, 1)
    # unknown label falls back to the baseline predictor
    fallback = model.predict_rating_by_label('no-such', 'item1')
    assert np.isfinite(fallback)


def test_gd_implicit_training_and_predict(small_dataset):
    from mfrec_tpu.eval.metrics import test_predict_rating
    model, test = _small_gd(small_dataset, min_epochs=15, max_epochs=15)
    model.feature_training_implicit()
    assert model.Y is not None and np.abs(model.Y).max() > 0
    p = model.predict_rating_implicit(2, 2)
    assert np.isfinite(p)


def test_find_recommended_items_excludes_rated(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=5, max_epochs=5)
    model.train()
    uid = 5
    ids, scores = model.find_recommended_items(user_index=uid,
                                               nbr_recommendations=10,
                                               predictor='predict_rating')
    rated = model.ratings.rated_mask_for_user(uid)
    assert len(ids) == 10
    assert not any(rated[i] for i in ids)
    assert all(scores[j] >= scores[j + 1] for j in range(len(scores) - 1))
    labels, _ = model.find_recommended_items(user_index=uid,
                                             nbr_recommendations=3,
                                             output_label=True,
                                             predictor='predict_rating')
    assert all(isinstance(x, str) for x in labels)


def test_similarity_api_surface(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=5, max_epochs=5)
    model.train()
    sims = model.similar_items(3, 5, method='cosine')
    assert len(sims) == 5 and 3 not in sims
    ids, vals = model.similar_items(3, 5, similarities_output=True,
                                    method='pearson')
    assert len(ids) == len(vals) == 5
    lbls = model.similar_items_by_label('item3', 4)
    assert len(lbls) == 4 and all(isinstance(x, str) for x in lbls)
    users = model.similar_users(2, 5)       # GD default: binary cosine
    assert len(users) == 5 and 2 not in users
    full = model.similar_items_full(1, 3)
    assert len(full) == 3


def test_save_load_state_roundtrip(tmp_path, small_dataset):
    from mfrec_tpu.eval.metrics import test_predict_rating
    model, test = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    model.train(handle_bias=True)
    path = str(tmp_path / 'ckpt')
    model.save_state(path)

    m2 = GDRecommender(4, 6)
    m2.load_state(path)
    assert m2.nbr_users == model.nbr_users
    assert m2.ratings.nnz == model.ratings.nnz
    np.testing.assert_allclose(m2.P, model.P, atol=1e-6)
    np.testing.assert_allclose(m2.users_bias, model.users_bias, atol=1e-6)
    m2.compute_overall_avg()
    assert m2.predict_rating(1, 1) == model.predict_rating(1, 1)


def test_model_snapshot_roundtrip(tmp_path, small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    model.train()
    path = str(tmp_path / 'snap')
    model.save_model_snapshot(path)
    P_orig = model.P.copy()
    model.P[:] = 0
    model.load_model_snapshot(path)
    np.testing.assert_allclose(model.P, P_orig, atol=1e-6)


def test_export_import_jsonl(small_dataset):
    model, _ = _small_gd(small_dataset, min_epochs=2, max_epochs=2)
    model.train(handle_bias=True)
    buf = io.StringIO()
    model.export_items(buf)
    lines = buf.getvalue().strip().split('\n')
    assert len(lines) == model.nbr_items
    doc = json.loads(lines[0])
    assert doc['lbl'] == 'item0' and len(doc['w']) == model.dimensionality
    # round-trip into a fresh model
    m2, _ = _small_gd(small_dataset, min_epochs=2, max_epochs=2)
    m2.initialize_model()
    m2.initialize_bias()
    m2.import_items(json.loads(l) for l in lines)
    np.testing.assert_allclose(m2.Q, model.Q, atol=1e-6)


def test_popular_and_random_baselines(small_dataset):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pop = MostPopularRecommender(U, I)
    pop.set_ratings(u, i, v)
    pop.train()
    top = pop.most_popular_items(5)
    counts = pop.ratings.item_counts()
    assert counts[top[0]] == counts.max()
    recs, _ = pop.find_recommended_items(0, 10)
    rated = pop.ratings.rated_mask_for_user(0)
    assert not any(rated[i] for i in recs)

    rnd = RandomRecommender(U, I)
    rnd.seed(0)
    rnd.set_ratings(u, i, v)
    rnd.train()
    recs, _ = rnd.find_recommended_items(0, 10)
    assert len(recs) == 10
    assert not any(rated[i] for i in recs)


def test_knn_users_end_to_end(small_dataset):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = KNNUsersRecommender(U, I)
    m.set_ratings(u, i, v)
    m.train(k=10)
    assert m.users_similarities_sorted_id.shape[0] == U
    recs, _ = m.find_recommended_items(user_index=0, nbr_recommendations=5)
    assert len(recs) == 5
    sims = m.similar_users(0, 5)
    assert len(sims) == 5 and 0 not in sims


def test_knn_svd_end_to_end(small_dataset):
    from mfrec_tpu.models.knn_svd import KNNSVDRecommender
    from mfrec_tpu.eval.metrics import test_predict_rating
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = KNNSVDRecommender(U, I, {'nbr_features': 10, 'k': 40})
    m.set_ratings(u, i, v)
    m.train()
    assert m.warmedup
    rmse, _ = test_predict_rating(m, test, nbr_samples=100,
                                  predictor='predict', quiet=True)
    assert np.isfinite(rmse) and rmse < 2.0


def test_most_popular_via_base(small_dataset):
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = BaseRecommender(U, I)
    m.set_ratings(u, i, v)
    top = m.most_popular_items(3)
    assert len(top) == 3


def test_new_user_coordinates_projection(small_dataset):
    (u, i, v), _ = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = BaseRecommender(U, I)
    m.set_ratings(u, i, v)
    m.dimensionality = 8
    m._compute_svd()
    vec = np.zeros(I, np.float32)
    vec[:5] = 4.0
    coord = m.new_user_coordinates(vec)
    assert coord.shape == (8,)
    assert np.isfinite(coord).all()
    sims = m.similar_users_new(vec, 3)
    assert len(sims) == 3


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    from mfrec_tpu.engine.checkpoint import (save_state_orbax,
                                             load_state_orbax)
    tree = {'P': np.arange(12, dtype=np.float32).reshape(3, 4),
            'bu': np.ones(3, np.float32)}
    path = str(tmp_path / 'ockpt')
    save_state_orbax(path, tree)
    back = load_state_orbax(path, like=tree)
    np.testing.assert_allclose(back['P'], tree['P'])
    np.testing.assert_allclose(back['bu'], tree['bu'])


def test_fn_recommender_trains(small_dataset):
    '''FNRecommender: real factorized-neighborhood model (Koren KDD'08);
    deep coverage in tests/test_fn.py.'''
    from mfrec_tpu.models.fn import FNRecommender
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    m = FNRecommender(U, I, {'nbr_epochs': 10, 'nbr_features': 6,
                             'learning_rate': 0.02, 'batch_size': 1024})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train()
    p = m.predict(1, 1)
    assert np.isfinite(p)
    assert m.X.shape == (I, 6) and m.Y.shape == (I, 6)
    with pytest.raises(Error):
        FNRecommender(U, I, {'no_such_param': 1})


def test_gd_training_variants(small_dataset):
    '''Batch/online/prototype/folding training variants all run and leave
    usable factors.'''
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    params = {'min_epochs': 2, 'max_epochs': 2, 'nbr_features': 4,
              'learning_rate': 0.01, 'regularization_model': 0.02,
              'batch_size': 1024}
    m = GDRecommender(U, I, params)
    m.seed(0)
    m.set_ratings(u, i, v)

    probes = np.stack([u[:50].astype(float), i[:50].astype(float),
                       v[:50].astype(float)], 1)
    rmse_probe = m.feature_training_batch(batch_size=2000, probeset=probes)
    assert np.isfinite(rmse_probe).all()

    idx = np.stack([u[:300], i[:300]], 1).astype(np.int32)
    m.feature_training_online_prototype(idx, v[:300].astype(np.float32),
                                        initialize_model=True)
    assert np.isfinite(m.P).all()

    m.feature_training_folding()
    assert m.components_mean is not None

    hist = m.feature_training_dev()
    assert len(hist) > 0 and np.isfinite(hist).all()

    m.feature_training_prototype_p()
    assert np.isfinite(m.P).all()


def test_gd_folding_in_projection(small_dataset):
    m, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    m.train()
    vec = np.zeros(m.nbr_items, np.float32)
    vec[:5] = 4.0
    new_v = m.folding_in_new_user('x', vec)
    assert new_v.shape == (m.dimensionality,)
    vec_u = np.zeros(m.nbr_users, np.float32)
    vec_u[:5] = 4.0
    new_u = m.folding_in_new_item('y', vec_u)
    assert new_u.shape == (m.dimensionality,)


def test_gd_add_item_and_retrain_item(small_dataset):
    m, _ = _small_gd(small_dataset, min_epochs=2, max_epochs=2)
    m.train(handle_bias=True)
    before = m.nbr_items
    new_id = m.add_item('fresh-item', np.array([0, 1, 2], np.int32),
                        np.array([4.0, 3.0, 5.0], np.float32))
    assert new_id == before and m.Q.shape[0] == before + 1
    assert np.isfinite(m.predict_rating(new_id, 0))


def test_predict_rating_itembased(small_dataset):
    m, _ = _small_gd(small_dataset, min_epochs=3, max_epochs=3)
    m.train()
    m._compute_items_similarities(20)
    m.warmedup = True
    u, i, v = m.ratings.coo()
    # pick an unrated pair for a user with many ratings
    uid = int(np.bincount(u).argmax())
    rated = m.ratings.rated_mask_for_user(uid)
    target = int(np.nonzero(~rated)[0][0])
    try:
        r = m.predict_rating_itembased(uid, target, k=10, k_min=1)
        assert np.isfinite(r)
    except Error:
        pass    # acceptable: no rated neighbors among top similarities


def test_checkpoint_resume_equals_uninterrupted(tmp_path):
    '''The SURVEY §5 failure-recovery contract: train 3 epochs +
    save_state + load_state into a fresh process-equivalent model +
    train 3 more (warm start) must equal 6 uninterrupted epochs exactly
    (the alternating engine is deterministic given the data).'''
    from mfrec_tpu.data.movielens import synthetic_ratings
    users, items, vals = synthetic_ratings(60, 40, 900, rank=3, seed=13)
    params = {'nbr_features': 6, 'learning_rate': 0.1,
              'regularization_model': 0.02, 'engine': 'alternating',
              'batch_size': 256, 'min_improvement': -1.0}

    ref = GDRecommender(60, 40, dict(params, min_epochs=6, max_epochs=6))
    ref.set_ratings(users, items, vals)
    ref.train(handle_bias=True)

    m1 = GDRecommender(60, 40, dict(params, min_epochs=3, max_epochs=3))
    m1.set_ratings(users, items, vals)
    m1.train(handle_bias=True)
    path = str(tmp_path / 'mid')
    m1.save_state(path)

    m2 = GDRecommender(4, 6, dict(params, min_epochs=3, max_epochs=3))
    m2.load_state(path)
    m2.train(handle_bias=True, initialize_model=False)

    np.testing.assert_allclose(m2.P, ref.P, atol=1e-5)
    np.testing.assert_allclose(m2.Q, ref.Q, atol=1e-5)


def test_direct_attribute_learning_rate_honored():
    '''A learning_rate set by direct attribute assignment (not via
    set_parameters) must be honored by the alternating tiers' row-mean
    rate resolution, same as an explicitly passed parameter.'''
    from mfrec_tpu.models.gd import GDRecommender
    from mfrec_tpu.models.kmf import KMFRecommender

    m = GDRecommender(4, 4)
    m.learning_rate = 0.005
    assert m._alt_lrs()[0] == 0.005
    m2 = GDRecommender(4, 4)                 # untouched default -> tuned
    assert m2._alt_lrs()[0] == 0.15
    m3 = GDRecommender(4, 4, {'learning_rate': 0.02})
    lr, lr_bu, lr_bi = m3._alt_lrs()
    assert lr == 0.02 and lr_bu == 0.02 and lr_bi == 0.02
    m4 = GDRecommender(4, 4)
    m4.learning_rate_users = 0.003           # per-side direct set
    assert m4._alt_lrs()[1] == 0.003

    k = KMFRecommender(4, 4)
    k.learning_rate = 0.005
    assert k._alt_lr() == 0.005
    assert KMFRecommender(4, 4)._alt_lr() == 0.15


def test_knn_users_top_neighbor_not_dropped():
    '''The precomputed neighbor list NEG-masks self, so ALL k slots are
    real neighbors — regression for the reference-shaped [1:] slice that
    dropped the best neighbor (the reference slices because its own list
    carries self at position 0).'''
    m = KNNUsersRecommender(3, 8, {'k': 2})
    for it in (0, 1):
        m.set_item_by_id(0, it, 1.0)
    for it in (0, 1, 2):
        m.set_item_by_id(1, it, 1.0)
    for it in (5, 6, 7):
        m.set_item_by_id(2, it, 1.0)
    m.train()
    # user 0's best neighbor is user 1 (shares {0,1}); user 2 is the
    # second neighbor.  With the best neighbor dropped, the top-3
    # counts came only from user 2's items.
    out, _ = m.find_recommended_items(user_index=0, nbr_recommendations=3)
    assert [int(x) for x in out] == [0, 1, 2]
