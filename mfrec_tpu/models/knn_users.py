'''
KNNUsersRecommender — binary-cosine user k-NN in raw rating space.

Re-design of reference ``mfrec/recommendation/knn_users.py:23-197``
(whose ``from mfrec.config import base`` import is broken — SURVEY.md
§2.6): rated-set similarity |A∩B|/sqrt(|A||B|) computed as one matmul over
the 0/1 indicator matrix, neighborhood item counts via bincount.
'''
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mfrec_tpu.models.base import BaseRecommender
from mfrec_tpu.ops import similarity as sim_ops


class KNNUsersRecommender(BaseRecommender):
    '''KNN Users Recommendation Engine.'''

    PARAMETERS_INDEX = {'k': 'k'}

    def __init__(self, nbr_users=4, nbr_items=6, parameters=None,
                 filename=False):
        BaseRecommender.__init__(self, nbr_users, nbr_items, None)
        self.k = 10
        self.users_sets_list = None
        if parameters:
            self.set_parameters(parameters)

    def initialize_users_sets(self):
        '''Per-user rated-item sets (reference knn_users.py:60-70).'''
        ptr, items, _ = self.ratings.csr()
        self.users_sets_list = [set(items[ptr[u]:ptr[u + 1]].tolist())
                                for u in range(self.nbr_users)]

    def _cosine_similarity_binary(self, A_set, B_set):
        count = len(A_set.intersection(B_set))
        denom = np.sqrt(float(len(A_set) * len(B_set)))
        return float(count) / denom if denom else 0.0

    def similar_users(self, user_index, nbr_recommendations=2,
                      similarity_threshold=False, similarities_output=False):
        '''Binary-cosine neighbors, one matmul (reference
        knn_users.py:104-136).'''
        B = jnp.asarray(self.ratings.to_dense() != 0, jnp.float32)
        n = B.shape[0]
        nbr = nbr_recommendations
        if nbr == 'All':
            nbr = n - 1
        idx, sims = sim_ops.binary_cosine_topk(
            B, jnp.asarray([int(user_index)]), min(int(nbr), n - 1))
        ids = np.asarray(idx[0])
        vals = np.asarray(sims[0], np.float64)
        ids, vals = self._apply_threshold(ids, vals, similarity_threshold)
        if not similarities_output:
            return [int(x) for x in ids]
        return [int(x) for x in ids], [float(v) for v in vals]

    def _compute_users_similarities(self, k):
        B = jnp.asarray(self.ratings.to_dense() != 0, jnp.float32)
        counts = B.sum(1)
        inter = B @ B.T
        denom = jnp.sqrt(jnp.maximum(counts[:, None] * counts[None, :],
                                     1e-12))
        s = inter / denom
        s = jnp.where(jnp.eye(B.shape[0], dtype=bool), -3.0e38, s)
        sims, idx = jax.lax.top_k(s, min(int(k), B.shape[0] - 1))
        self.users_similarities_sorted_id = np.asarray(idx)
        self.users_similarities_values = np.asarray(sims)

    def train(self, k=None):
        '''Precompute top-k neighbors (reference knn_users.py:158-160).'''
        if k is None:
            k = self.k
        self.k = k
        self._compute_users_similarities(k=k)

    def find_recommended_items(self, user_index=None, user_label=None,
                               nbr_recommendations=5, output_label=False,
                               predictor=None):
        '''Recommend the most frequent items in the user's neighborhood
        (reference knn_users.py:138-147).'''
        if user_index is None:
            user_index = self.users.index[user_label]
        # the whole precomputed list is usable: _compute_users_similarities
        # NEG-masks self out of the top-k, unlike the reference whose
        # sorted list carries self at position 0 (hence its [1:k] slice,
        # knn_users.py:140-141) — slicing here would drop the BEST
        # neighbor, not self
        neighbors = self.users_similarities_sorted_id[user_index]
        ptr, items, _ = self.ratings.csr()
        pieces = [items[ptr[u]:ptr[u + 1]] for u in neighbors]
        in_neighborhood = np.concatenate(pieces) if pieces else \
            np.zeros(0, np.int64)
        counts = np.bincount(in_neighborhood, minlength=self.nbr_items)
        order = np.argsort(-counts, kind='stable')[:nbr_recommendations]
        if output_label:
            return [self.items.labels[int(i)] for i in order], 0
        return order, 0
