'''Evaluation metrics, sweeps, fold-in test harness, graph export,
native helpers.'''
import os

import numpy as np
import pytest

from mfrec_tpu.eval import metrics as M
from mfrec_tpu.eval.metrics import (precision_recall, folding_in_test,
                                    shannon_entropy)

# module-level names starting with `test_` would be collected by pytest
eval_predict_rating = M.test_predict_rating
eval_predict_rating2 = M.test_predict_rating2
from mfrec_tpu.models.gd import GDRecommender
from mfrec_tpu.models.popular import MostPopularRecommender


def _trained(small_dataset, **over):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    params = {'min_epochs': 15, 'max_epochs': 15, 'nbr_features': 6,
              'learning_rate': 0.01, 'regularization_model': 0.02,
              # pin the pre-T=128 sweep count (metric behavior, not
              # training rate, is under test — 16x less CPU work)
              'inner_steps': 8}
    params.update(over)
    m = GDRecommender(U, I, params)
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train(handle_bias=True)
    return m, test


def test_rmse_matches_manual(small_dataset):
    m, test = _trained(small_dataset)
    rmse, errors = eval_predict_rating(m, test, nbr_samples=150,
                                       predictor='predict_rating_with_bias',
                                       quiet=True)
    manual = []
    for row in test[:150]:
        p = m.predict_rating_with_bias(int(row[1]), int(row[0]))
        manual.append(row[2] - p)
    want = float(np.sqrt((np.asarray(manual) ** 2).mean()))
    assert abs(rmse - want) < 1e-5


def test_rmse2_with_item_remap(small_dataset):
    m, test = _trained(small_dataset)
    item_map = {int(i): int(i) for i in np.unique(test[:, 1].astype(int))}
    rmse, _ = eval_predict_rating2(m, test, item_map, nbr_samples=100,
                                   predictor='predict_rating_with_bias')
    assert np.isfinite(rmse)


def test_precision_recall_popularity(small_dataset):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pop = MostPopularRecommender(U, I)
    pop.set_ratings(u, i, v)
    pop.train()
    p, r, f1 = precision_recall(pop, test, nbr_recommendations=10)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0
    assert p > 0.0   # popularity beats nothing-at-all on zipf data
    if p and r:
        assert abs(f1 - 2 * p * r / (p + r)) < 1e-9


def test_shannon_entropy_coverage(small_dataset):
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1
    pop = MostPopularRecommender(U, I)
    pop.set_ratings(u, i, v)
    pop.train()
    same = [pop.most_popular_items(5)] * 20
    low = shannon_entropy(pop, same)
    spread = [[(j * 5 + k) % I for k in range(5)] for j in range(20)]
    high = shannon_entropy(pop, spread)
    assert high > low


def test_folding_in_harness(small_dataset):
    (u, i, v), test = small_dataset
    train_rows = np.stack([u.astype(np.float64), i.astype(np.float64),
                           v.astype(np.float64)], 1)
    U, I = int(u.max()) + 1, int(i.max()) + 1

    def factory():
        m = GDRecommender(U, I, {'min_epochs': 5, 'max_epochs': 5,
                                 'nbr_features': 6, 'learning_rate': 0.01,
                                 'inner_steps': 8})
        m.seed(0)
        return m

    res = folding_in_test(factory, train_rows, test, ratio=0.1,
                          nbr_samples=300)
    assert set(res) == {'pruned_model_full_test', 'pruned_model_pruned_test',
                        'folded_model_full_test',
                        'folded_model_pruned_test'}
    assert all(np.isfinite(val) for val in res.values())


def test_sweep_parameter(small_dataset):
    from mfrec_tpu.eval.sweep import sweep_parameter
    (u, i, v), test = small_dataset
    U, I = int(u.max()) + 1, int(i.max()) + 1

    def factory(extra):
        params = {'min_epochs': 5, 'max_epochs': 5, 'nbr_features': 6,
                  'learning_rate': 0.01, 'inner_steps': 8}
        params.update(extra)
        m = GDRecommender(U, I, params)
        m.seed(0)
        m.set_ratings(u, i, v)
        return m

    vals, scores = sweep_parameter(factory, {}, test, 'nbr_features',
                                   [4, 8], nbr_samples=200)
    assert len(scores) == 2 and np.isfinite(scores).all()


def test_similarity_graph_export(tmp_path, small_dataset):
    from mfrec_tpu.graph.similarity_graph import SimilarityGraph
    m, _ = _trained(small_dataset, min_epochs=5, max_epochs=5)
    sg = SimilarityGraph(m)
    sg.build_graph(min_score=0.5, max_related=5)
    assert sg.similarity_graph.number_of_nodes() == m.nbr_items
    assert sg.similarity_graph.number_of_edges() > 0
    out = str(tmp_path / 'simgraph.graphml')
    sg.write_graph(out)
    assert os.path.getsize(out) > 0


def test_native_helpers(tmp_path):
    from mfrec_tpu import native
    if not native.available():
        pytest.skip('no compiler available')
    path = str(tmp_path / 'ratings.tsv')
    with open(path, 'w') as f:
        f.write('1\t5\t3.5\t884182806\n')
        f.write('2\t3\t4.0\t884182807\n')
        f.write('\n')
        f.write('7\t1\t1.5\t884182808\n')
    users, items, vals = native.parse_ratings(path)
    np.testing.assert_array_equal(users, [1, 2, 7])
    np.testing.assert_array_equal(items, [5, 3, 1])
    np.testing.assert_allclose(vals, [3.5, 4.0, 1.5])

    keys = np.array([2, 0, 1, 0, 2], np.int32)
    perm = native.counting_sort(keys, 3)
    np.testing.assert_array_equal(keys[perm], [0, 0, 1, 2, 2])
    # stability
    np.testing.assert_array_equal(perm, [1, 3, 2, 0, 4])
    ptr = native.csr_pointers(keys, 3)
    np.testing.assert_array_equal(ptr, [0, 2, 3, 5])


def test_load_ratings_file_native_vs_numpy(tmp_path):
    from mfrec_tpu.data.movielens import load_ratings_file
    path = str(tmp_path / 'u.data')
    rows = np.array([[1, 2, 3.0, 99], [4, 5, 1.5, 98], [2, 2, 5.0, 97]])
    np.savetxt(path, rows, fmt='%g', delimiter='\t')
    u1, i1, v1 = load_ratings_file(path, use_native=True)
    u2, i2, v2 = load_ratings_file(path, use_native=False)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2)


def test_vmapped_regularization_sweep(small_dataset):
    '''All regularization candidates trained in one vmapped program;
    extreme over-regularization must score worse than a sensible value.'''
    from mfrec_tpu.eval.sweep import optimize_regularization_vmapped
    (u, i, v), test = small_dataset
    regs, rmses = optimize_regularization_vmapped(
        u, i, v, test, regs=[0.02, 0.3, 1.0], rank=8, epochs=25, lr=0.02,
        batch_size=1024)
    assert rmses.shape == (3,)
    assert np.isfinite(rmses).all()
    assert rmses[2] > rmses[0]        # absurd reg kills accuracy


def test_native_parse_streaming_boundaries(tmp_path):
    '''The streaming parser (fixed 1 MiB read window) must parse files
    larger than its window with lines straddling window boundaries
    byte-identically to a whole-file numpy parse.'''
    from mfrec_tpu import native
    if not native.available():
        import pytest
        pytest.skip('no compiler')
    rng = np.random.default_rng(3)
    n = 150_000                      # ~2.6 MiB of text: >2 window refills
    users = rng.integers(0, 5000, n)
    items = rng.integers(0, 3000, n)
    vals = np.round(rng.uniform(1, 5, n), 3)
    path = tmp_path / 'big.tsv'
    with open(path, 'w') as f:
        for j in range(n):
            # vary separators and trailing fields like real ML dumps
            sep = '\t' if j % 3 else '::'
            extra = '\t%d' % (880000000 + j) if j % 2 else ''
            f.write('%d%s%d%s%.3f%s\n'
                    % (users[j], sep, items[j], sep, vals[j], extra))
    u, i, v = native.parse_ratings(str(path))
    assert u.shape[0] == n
    np.testing.assert_array_equal(u, users.astype(np.int32))
    np.testing.assert_array_equal(i, items.astype(np.int32))
    np.testing.assert_allclose(v, vals.astype(np.float32), rtol=1e-6)


def test_native_parse_skips_over_window_sized_line(tmp_path):
    '''A pathological line longer than the 1 MiB read window is
    malformed for this format: it must be SKIPPED whole, not parsed in
    pieces (a numeric token straddling the window boundary would
    otherwise split into two bogus ratings).'''
    from mfrec_tpu import native
    if not native.available():
        import pytest
        pytest.skip('no compiler')
    path = tmp_path / 'longline.tsv'
    with open(path, 'w') as f:
        f.write('1\t2\t3.0\n')
        # >2 windows of digits with no newline: would parse as many
        # bogus rows if the window contents were parsed piecewise
        f.write('9' * (3 * (1 << 20)))
        f.write('\n')
        f.write('4\t5\t2.0\n')
    u, i, v = native.parse_ratings(str(path))
    np.testing.assert_array_equal(u, [1, 4])
    np.testing.assert_array_equal(i, [2, 5])
    np.testing.assert_allclose(v, [3.0, 2.0])


def test_ranking_metrics_exact_values():
    '''NDCG/MAP/MRR on a hand-computed case.'''
    from mfrec_tpu.eval.metrics import ranking_metrics

    class Stub:
        nbr_users = 2
        nbr_items = 10

        def find_recommended_items(self, user_index, nbr_recommendations,
                                   output_label, predictor):
            # user 0: hits at ranks 1 and 3 of [0,1,2]; user 1: hit at 2
            recs = {0: [5, 6, 7], 1: [8, 3, 9]}[user_index]
            return recs[:nbr_recommendations], None

    u_test = np.array([[0, 5, 4.0], [0, 7, 5.0], [0, 4, 3.0],
                       [1, 3, 4.0]])
    out = ranking_metrics(Stub(), u_test, nbr_recommendations=3)
    # user 0: relevant {5, 7, 4}; hits ranks 1, 3
    d = 1.0 / np.log2([2.0, 3.0, 4.0])
    ndcg0 = (d[0] + d[2]) / (d[0] + d[1] + d[2])
    ap0 = (1.0 / 1 + 2.0 / 3) / 3
    # user 1: relevant {3}; hit rank 2
    ndcg1 = d[1] / d[0]
    ap1 = (1.0 / 2) / 1
    assert abs(out['ndcg'] - (ndcg0 + ndcg1) / 2) < 1e-9
    assert abs(out['map'] - (ap0 + ap1) / 2) < 1e-9
    assert abs(out['mrr'] - (1.0 + 0.5) / 2) < 1e-9
    assert out['users'] == 2
    assert abs(out['coverage'] - 6 / 10) < 1e-9


def test_ranking_metrics_on_trained_model():
    from mfrec_tpu.eval.metrics import ranking_metrics
    from mfrec_tpu.models.gd import GDRecommender
    from mfrec_tpu.data.movielens import synthetic_ratings, train_test_split
    users, items, vals = synthetic_ratings(120, 80, 4000, rank=4, seed=11)
    (tu, ti, tv), u_test = train_test_split(users, items, vals,
                                            test_fraction=0.25)
    m = GDRecommender(120, 80, {'nbr_features': 8, 'min_epochs': 20,
                                'max_epochs': 20, 'learning_rate': 0.01,
                                'engine': 'fused', 'batch_size': 1024})
    m.set_ratings(tu, ti, tv)
    m.train(handle_bias=True)
    out = ranking_metrics(m, u_test, nbr_recommendations=10,
                          relevance_threshold=3.5)
    for k in ('ndcg', 'map', 'mrr', 'coverage'):
        assert 0.0 <= out[k] <= 1.0
    assert out['users'] > 0
