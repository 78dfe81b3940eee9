'''
Hyperparameter sweeps.

Re-design of reference ``mfrec/recommendation/metaparameters.py`` (dev
sketches referencing undefined globals) as working utilities: each sweep
builds/evaluates models over a parameter grid and returns (values, scores).
'''
from __future__ import annotations

import numpy as np

from mfrec_tpu.eval.metrics import test_predict_rating, precision_recall


def sweep_parameter(factory, train_kwargs, u_test, name, values,
                    metric='rmse', predictor='predict_rating',
                    nbr_samples=5000, nbr_recommendations=5):
    '''Train a fresh model per value of parameter `name`; score on u_test.

    factory(params_dict) -> untrained model.  Returns (values, scores).
    '''
    scores = np.zeros(len(values))
    for j, val in enumerate(values):
        model = factory({name: val})
        model.train(**(train_kwargs or {}))
        if metric == 'rmse':
            scores[j] = test_predict_rating(model, u_test, nbr_samples,
                                            predictor=predictor,
                                            quiet=True)[0]
        else:
            scores[j] = precision_recall(model, u_test,
                                         nbr_recommendations)[0]
    return np.asarray(values), scores


def optimize_k(model, u_test, ks=range(5, 55, 5), nbr_samples=2000):
    '''Sweep the kNN neighborhood size (reference metaparameters.py:1-7).'''
    scores = []
    for k in ks:
        rmse = test_predict_rating(
            model, u_test, nbr_samples, predictor='predict', quiet=True)[0]
        scores.append(rmse)
    return np.asarray(list(ks)), np.asarray(scores)


def optimize_similarity_threshold(factory, train_kwargs, u_test,
                                  thresholds=None, nbr_samples=2000):
    '''reference metaparameters.py:9-17.'''
    if thresholds is None:
        thresholds = np.linspace(0.0, 0.99, 20)
    return sweep_parameter(factory, train_kwargs, u_test, 'sim_threshold',
                           list(thresholds), nbr_samples=nbr_samples,
                           predictor='predict')


def optimize_dim(factory, train_kwargs, u_test, dims=range(10, 50, 2),
                 nbr_samples=1000):
    '''reference metaparameters.py:19-29.'''
    return sweep_parameter(factory, train_kwargs, u_test, 'nbr_features',
                           list(dims), nbr_samples=nbr_samples,
                           predictor='predict')
