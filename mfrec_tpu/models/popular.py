'''
MostPopularRecommender — popularity baseline ("for testing metrics only",
reference ``mfrec/recommendation/mostpopular.py:16-75``).
'''
from __future__ import annotations

import numpy as np

from mfrec_tpu.models.base import BaseRecommender


class MostPopularRecommender(BaseRecommender):
    '''Most Popular Recommendation Engine.'''

    PARAMETERS_INDEX = {}

    def __init__(self, nbr_users=4, nbr_items=6, parameters=None,
                 filename=False):
        BaseRecommender.__init__(self, nbr_users, nbr_items, parameters)

    def train(self):
        '''Sort items by rating count (reference mostpopular.py:51-56).'''
        counts = self.ratings.item_counts()
        self.sorted_items_by_count = np.argsort(-counts,
                                                kind='stable').tolist()

    def most_popular_items(self, n=10):
        if self.sorted_items_by_count is None:
            self.train()
        return self.sorted_items_by_count[0:n]

    def find_recommended_items(self, user_index, nbr_recommendations=10,
                               output_label=False, predictor=None):
        '''Most popular items the user has not rated yet
        (reference mostpopular.py:66-74).'''
        if self.sorted_items_by_count is None:
            self.train()
        rated = self.ratings.rated_mask_for_user(user_index)
        out = []
        for item in self.sorted_items_by_count:
            if not rated[item]:
                out.append(int(item))
                if len(out) >= nbr_recommendations:
                    break
        if output_label:
            return [self.items.labels[i] for i in out], 0
        return out, 0
