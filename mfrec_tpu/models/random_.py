'''
RandomRecommender — random baseline ("for testing metrics only",
reference ``mfrec/recommendation/random_recommender.py:16-64``).
'''
from __future__ import annotations

import numpy as np

from mfrec_tpu.models.base import BaseRecommender


class RandomRecommender(BaseRecommender):
    '''Random Recommendation Engine.'''

    PARAMETERS_INDEX = {}

    def __init__(self, nbr_users=4, nbr_items=6, parameters=None,
                 filename=False):
        BaseRecommender.__init__(self, nbr_users, nbr_items, parameters)

    def train(self):
        pass

    def find_recommended_items(self, user_index, nbr_recommendations=10,
                               output_label=False, predictor=None):
        '''Uniformly random unrated items (reference
        random_recommender.py:50-62; deterministic under ``seed()``).'''
        rated = self.ratings.rated_mask_for_user(user_index)
        candidates = np.nonzero(~rated)[0]
        if candidates.shape[0] == 0:
            return [], 0
        picks = self.rng.choice(
            candidates, min(nbr_recommendations, candidates.shape[0]),
            replace=False)
        out = [int(i) for i in picks]
        if output_label:
            return [self.items.labels[i] for i in out], 0
        return out, 0
