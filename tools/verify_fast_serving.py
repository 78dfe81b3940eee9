'''End-to-end verify: train a GD model, serve it over HTTP with each
retrieval mode (xla/pallas/fast), and check the fast path agrees with the
exact path on real requests, including after a /rate write.'''
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np

from mfrec_tpu.models.gd import GDRecommender
from mfrec_tpu.serving.server import RecommenderServer


def get(port, path):
    with urllib.request.urlopen(
            'http://127.0.0.1:%d%s' % (port, path), timeout=60) as r:
        return json.loads(r.read())


def main():
    rng = np.random.default_rng(0)
    U, I, N = 60, 300, 2400
    u = rng.integers(0, U, N).astype(np.int64)
    i = rng.integers(0, I, N).astype(np.int64)
    v = rng.integers(1, 6, N).astype(np.float64)
    m = GDRecommender(U, I, {'min_epochs': 3, 'max_epochs': 3,
                             'nbr_features': 8})
    m.seed(0)
    m.set_ratings(u, i, v)
    m.train()

    results = {}
    for mode in ('xla', 'pallas', 'fast'):
        import copy
        srv = RecommenderServer(copy.deepcopy(m), batch_window_ms=1.0,
                                retrieval=mode)
        port = srv.start()
        try:
            rec = get(port, '/recommend?user=7&n=10')
            assert len(rec['items']) == 10, rec
            view0 = srv.view
            # write then read again (view rebuild w/ fresh device cache)
            req = urllib.request.Request(
                'http://127.0.0.1:%d/rate' % port,
                data=json.dumps(
                    {'user': 7, 'item': rec['items'][0],
                     'value': 5.0}).encode(),
                method='POST')
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read())['ok']
            import time
            deadline = time.monotonic() + 15
            while srv.view is view0 and time.monotonic() < deadline:
                time.sleep(0.05)
            assert srv.view is not view0, 'view never refreshed'
            rec2 = get(port, '/recommend?user=7&n=10')
            assert rec['items'][0] not in rec2['items'], (mode, rec, rec2)
            results[mode] = (rec['items'], rec2['items'])
        finally:
            srv.stop()
    assert results['xla'][0] == results['pallas'][0], results
    ov = len(set(results['xla'][0]) & set(results['fast'][0])) / 10.0
    assert ov >= 0.8, (ov, results)
    print('verify ok: pallas==xla ids, fast overlap %.2f, '
          'post-rate masking works on all 3 modes' % ov)


if __name__ == '__main__':
    main()
