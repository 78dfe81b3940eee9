'''
Lightweight model-serving front: a stdlib HTTP server over a trained
recommender.

The reference's serving story is exporting factors to MongoDB/neo4j for
an external app to read (``base.py:599-794``).  Here the trained model
serves directly — requests hit the batched device retrieval path
(``MFRecommender.recommend_batch``: blocked P@Q^T + fused top-k, Pallas
on TPU, mesh-sharded when >1 device), so one process covers the whole
retrieve-and-rank loop.  stdlib-only (ThreadingHTTPServer): no web
framework to pin, trivially replaceable by a real gateway in production.

Endpoints (all JSON):

  GET /health                          -> {"ok": true, users, items}
  GET /recommend?user=3&n=10           -> {"user": 3, "items": [...],
                                           "scores": [...]}
  GET /recommend?label=user3&n=10      -> same, label-addressed
  GET /similar_items?item=7&n=5        -> {"item": 7, "items": [...],
                                           "scores": [...]}
  GET /predict?user=3&item=7           -> {"user": 3, "item": 7,
                                           "score": ...}
  POST /rate  {"user": 3, "item": 7, "value": 4.5}
      -> ingest one rating (fold-in retraining stays an offline call:
         ``add_user``/``retrain_user``)

Micro-batching: concurrent /recommend requests are coalesced into one
``recommend_batch`` device call (up to ``batch_window_ms``), so serving
throughput rides the batched kernel rather than per-request dispatch —
the lever that measured 43k -> 61k users/s on v5e (see README serving
row).
'''
from __future__ import annotations

import json
import queue
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Batcher:
    '''Coalesce concurrent single-user retrieval requests into one
    batched device call.'''

    def __init__(self, model, nbr_recommendations, window_ms, max_batch,
                 lock=None):
        self.model = model
        self.lock = lock or threading.RLock()
        self.n = int(nbr_recommendations)
        self.window_s = window_ms / 1000.0
        self.max_batch = int(max_batch)
        self.q = queue.Queue()
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, user_index, n):
        ev = threading.Event()
        slot = {'user': int(user_index), 'n': int(n), 'ev': ev}
        self.q.put(slot)
        if not ev.wait(timeout=60.0):
            raise RuntimeError('batched retrieval timed out')
        if 'error' in slot:
            raise RuntimeError(slot['error'])
        return slot['items'], slot['scores']

    def _loop(self):
        while not self._stop:
            try:
                first = self.q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = threading.Event()
            deadline.wait(self.window_s)
            while len(batch) < self.max_batch:
                try:
                    batch.append(self.q.get_nowait())
                except queue.Empty:
                    break
            users = [s['user'] for s in batch]
            n = max(s['n'] for s in batch)
            # pad the user batch to a power of two so the device call is
            # jitted on a handful of stable shapes instead of one per
            # batch composition (remote compile costs minutes)
            B = 1 << (len(users) - 1).bit_length()
            padded = users + [users[0]] * (B - len(users))
            try:
                with self.lock:
                    ids, scores = self.model.recommend_batch(
                        np.asarray(padded, np.int64),
                        nbr_recommendations=n)
                ids, scores = np.asarray(ids), np.asarray(scores)
                for j, s in enumerate(batch):
                    s['items'] = ids[j][:s['n']].tolist()
                    s['scores'] = [float(x) for x in scores[j][:s['n']]]
            except Exception as e:          # surface to every waiter
                for s in batch:
                    s['error'] = repr(e)
            for s in batch:
                s['ev'].set()
        # drain: fail anything still queued so waiters return promptly
        # instead of sitting out the submit timeout
        while True:
            try:
                s = self.q.get_nowait()
            except queue.Empty:
                break
            s['error'] = 'server shutting down'
            s['ev'].set()

    def stop(self):
        self._stop = True


class RecommenderServer:
    '''HTTP serving wrapper around a trained recommender.'''

    def __init__(self, model, host='127.0.0.1', port=0,
                 nbr_recommendations=10, batch_window_ms=2.0,
                 max_batch=1024):
        self.model = model
        # one coarse lock serializes model access across handler threads
        # and the batcher (the Ratings store's lazy consolidation is not
        # thread-safe against concurrent /rate ingestion)
        self.lock = threading.RLock()
        self.batcher = _Batcher(model, nbr_recommendations,
                                batch_window_ms, max_batch, lock=self.lock)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):       # quiet; use logging if needed
                pass

            def _json(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    url = urllib.parse.urlparse(self.path)
                    q = dict(urllib.parse.parse_qsl(url.query))
                    if url.path == '/health':
                        return self._json(200, {
                            'ok': True,
                            'users': server.model.nbr_users,
                            'items': server.model.nbr_items})
                    if url.path == '/recommend':
                        if 'label' in q:
                            user = server.model.users.index[q['label']]
                        elif 'user' in q:
                            user = int(q['user'])
                        else:
                            return self._json(400, {
                                'error': "need 'user' or 'label'"})
                        if not 0 <= int(user) < server.model.nbr_users:
                            # reject here: an invalid id inside a
                            # coalesced batch would otherwise 500 every
                            # concurrent request in its window (and
                            # negative ids would silently alias another
                            # user through numpy indexing)
                            return self._json(404, {
                                'error': 'unknown user %s' % user})
                        n = int(q.get('n', server.batcher.n))
                        items, scores = server.batcher.submit(user, n)
                        return self._json(200, {'user': int(user),
                                                'items': items,
                                                'scores': scores})
                    if url.path == '/similar_items':
                        if 'item' not in q:
                            return self._json(400, {'error': "need 'item'"})
                        item = int(q['item'])
                        if not 0 <= item < server.model.nbr_items:
                            return self._json(404, {
                                'error': 'unknown item %d' % item})
                        n = int(q.get('n', 5))
                        with server.lock:
                            ids, sims = server.model.similar_items(
                                item, nbr_recommendations=n,
                                similarities_output=True)
                        return self._json(200, {
                            'item': item,
                            'items': [int(i) for i in ids],
                            'scores': [float(s) for s in sims]})
                    if url.path == '/predict':
                        if 'user' not in q or 'item' not in q:
                            return self._json(400, {
                                'error': "need 'user' and 'item'"})
                        user, item = int(q['user']), int(q['item'])
                        if not (0 <= user < server.model.nbr_users
                                and 0 <= item < server.model.nbr_items):
                            return self._json(404, {'error': 'unknown id'})
                        with server.lock:
                            score = float(server.model.predict(item, user))
                        return self._json(200, {'user': user, 'item': item,
                                                'score': score})
                    return self._json(404, {'error': 'unknown path'})
                except KeyError as e:
                    return self._json(404, {'error': 'unknown id %s' % e})
                except ValueError as e:
                    return self._json(400, {'error': 'bad parameter: %s' % e})
                except Exception as e:
                    return self._json(500, {'error': repr(e)})

            def do_POST(self):
                try:
                    url = urllib.parse.urlparse(self.path)
                    length = int(self.headers.get('Content-Length', 0))
                    payload = json.loads(self.rfile.read(length) or b'{}')
                    if url.path == '/rate':
                        with server.lock:
                            server.model.set_item_by_id(
                                int(payload['user']), int(payload['item']),
                                float(payload['value']))
                        return self._json(200, {'ok': True})
                    return self._json(404, {'error': 'unknown path'})
                except Exception as e:
                    return self._json(500, {'error': repr(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread = None

    def start(self):
        '''Serve in a background thread; returns the bound port.'''
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self.port

    def stop(self):
        self.batcher.stop()
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def serve(model, host='127.0.0.1', port=8080, **kw):
    '''Blocking convenience entry: serve `model` until interrupted.'''
    s = RecommenderServer(model, host=host, port=port, **kw)
    print('serving on %s:%d' % (host, s.port))
    try:
        s.httpd.serve_forever()
    except KeyboardInterrupt:
        s.stop()
