'''
FNRecommender — factorized neighborhood model.

The reference ``mfrec/recommendation/fn.py:19-96`` is a skeleton whose
``train`` dispatches (via ``eval``) to the never-imported KMF kernels and
whose ``predict`` is ``pass`` (SURVEY.md §2.6).  Here the same structural
intent is implemented *working*: training through the KMF link kernels plus
an item-neighborhood prediction term in the Koren KDD'08 spirit.

Yehuda Koren: Factorization Meets the Neighborhood, KDD 2008.
'''
from __future__ import annotations

import numpy as np

from mfrec_tpu.models.kmf import KMFRecommender


class FNRecommender(KMFRecommender):
    '''Factorized Neighborhood Recommendation Engine.'''

    PARAMETERS_INDEX = dict(KMFRecommender.PARAMETERS_INDEX)

    _default_predictor_mode = 'logistic'

    def __init__(self, nbr_users=4, nbr_items=6, parameters=None,
                 filename=False):
        KMFRecommender.__init__(self, nbr_users, nbr_items, parameters)

    def train(self, initialize_model=True, verbose=False,
              kernel='train_logistic_kernel'):
        '''Reference fn.py:81-96 intent: random init, zeroed biases, SGD via
        the selected link kernel over the dense rating triples.'''
        KMFRecommender.train(self, initialize_model=initialize_model,
                             verbose=verbose, kernel=kernel)
