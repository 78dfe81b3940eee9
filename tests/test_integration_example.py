'''End-to-end integration mirroring the reference driver
(example1b_movielens_100k_wrmf.py): ingest -> label -> train WRMF ->
precision/recall -> label-based similarity -> graph export -> store
round-trip.'''
import numpy as np

from mfrec_tpu.models.wrmf import WRMFRecommender
from mfrec_tpu.eval.metrics import precision_recall
from mfrec_tpu.graph.similarity_graph import (SimilarityGraph,
                                              ratings_bipartite_graph)


class _FakeCollection:
    def __init__(self):
        self.rows = []
        self.updates = []

    def insert(self, batch):
        self.rows.extend(batch)

    def update(self, where, change):
        self.updates.append((where, change))


class _FakeDB:
    def __init__(self):
        self.items = _FakeCollection()
        self.users = _FakeCollection()
        self.ratings = _FakeCollection()
        self.models = _FakeCollection()


def test_example1b_flow(tmp_path, small_dataset):
    (u, i, v), test = small_dataset
    nbr_user, nbr_feature = int(u.max()), int(i.max())

    parameters = {'nbr_epochs': 10,
                  'feature_init': 0.1,
                  'regularization_model': 0.015,
                  'nbr_features': 8,
                  'neighborhood': 1500}
    rec = WRMFRecommender(nbr_user + 1, nbr_feature + 1, parameters)
    rec.set_ratings(u, i, np.ones_like(v))          # implicit 1.0

    # labels like the u.item loop
    rec.set_item_label(50, 'Terminator 2: Judgment Day (1991)')
    rec.train(verbose=False)

    p, r, f1 = precision_recall(rec, test, nbr_recommendations=5)
    assert np.isfinite(p) and p >= 0.0

    sims = rec.similar_items_by_label('Terminator 2: Judgment Day (1991)',
                                      10, method='cosine')
    assert len(sims) == 10
    assert 'Terminator 2: Judgment Day (1991)' not in sims

    sg = SimilarityGraph(rec)
    sg.build_graph(min_score=0.9, max_related=10)
    out = str(tmp_path / 'g.graphml')
    sg.write_graph(out)
    import os
    assert os.path.getsize(out) > 0

    bg = ratings_bipartite_graph(rec)
    assert bg.number_of_edges() == rec.get_nbr_ratings()

    # store round-trip with a duck-typed db
    db = _FakeDB()
    rec.set_name('wrmf-test')
    rec.compute_overall_avg()
    rec.save_items_to_db(db)
    rec.save_users_to_db(db)
    rec.save_ratings_to_db(db)
    rec.update_model_in_db(db)
    assert len(db.items.rows) == rec.nbr_items
    assert len(db.ratings.rows) == rec.get_nbr_ratings()
    assert db.models.updates[0][1]['$set']['bias'] == rec.overall_bias

    # read back into a fresh model
    rec2 = WRMFRecommender(nbr_user + 1, nbr_feature + 1, parameters)
    rec2.initialize_model()
    rec2.set_items_from_db(iter(db.items.rows))
    np.testing.assert_allclose(rec2.Q[:rec.nbr_items],
                               rec.Q, atol=1e-6)
