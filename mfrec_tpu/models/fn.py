'''
FNRecommender — the Koren KDD'08 factorized item-item neighborhood model,
implemented for real.

The reference ``mfrec/recommendation/fn.py:19-96`` declares this model
(docstring cites Koren, "Factorization Meets the Neighborhood") but never
delivers it: ``train`` eval-dispatches to never-imported KMF kernels and
``predict`` is ``pass`` (SURVEY.md §2.6).  Here the declared model is
built: learned item-item weights w_ij = q_i.x_j (explicit) and implicit
offsets c_ij = q_i.y_j over each user's rated set,

    r_hat(u,i) = mu + b_u + b_i
               + q_i . |R(u)|^-1/2 sum_{j in R(u)} [(r_uj - b_uj) x_j + y_j]

trained by mini-batch SGD on device (``ops.fn.make_fn_epoch``), with a
strictly-sequential numpy oracle (``ops.reference_numpy.fn_train_oracle``)
as the parity spec.

Parameter names follow the reference's FN PARAMETERS_INDEX (fn.py:28-37).
Note the reference maps ``regularization_users/items/bias`` onto attributes
``K/K2/K3`` while its __init__ sets ``K_users/K_items/K_bias`` — so
set_parameters there writes attributes train() never reads (latent defect).
Here the mapping is coherent: ``regularization_users`` -> K_users
(regularizes the implicit y factors — the user-profile side),
``regularization_items`` -> K_items (regularizes q and x), and
``regularization_bias`` -> K_bias (both learned biases).

After ``train()`` the per-user aggregate profiles a_u are materialized
into ``self.P``, so every MFRecommender serving kernel (fused top-N,
batched prediction, factor-space similarity) works on an FN model
unchanged: prediction is exactly mu + b_u + b_i + P[u].Q[i].
'''
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mfrec_tpu.models.mf import MFRecommender
from mfrec_tpu.ops import fn as fn_ops
from mfrec_tpu.ops import sgd_mf
from mfrec_tpu.engine.trainer import ConvergenceDriver


class FNRecommender(MFRecommender):
    '''Factorized Neighborhood Recommendation Engine (Koren KDD'08 §4).'''

    PARAMETERS_INDEX = {'nbr_epochs': 'nbr_epochs',
                        'min_improvement': 'min_improvement',
                        'feature_init': 'feature_init',
                        'learning_rate': 'learning_rate',
                        'learning_rate_users': 'learning_rate_users',
                        'learning_rate_items': 'learning_rate_items',
                        'regularization_users': 'K_users',
                        'regularization_items': 'K_items',
                        'regularization_bias': 'K_bias',
                        'nbr_features': 'dimensionality',
                        'batch_size': 'batch_size'}

    _default_predictor_mode = 'bias'

    def __init__(self, nbr_users=4, nbr_items=6, parameters=None,
                 filename=False):
        MFRecommender.__init__(self, nbr_users, nbr_items, None)

        # Reference FN defaults (fn.py:44-53)
        self.nbr_epochs = 200
        self.min_improvement = 0.0001
        self.feature_init = 0.1
        self.learning_rate = 0.01
        self.learning_rate_users = 0.01
        self.learning_rate_items = 0.01
        self.K_users = 0.1
        self.K_items = 0.1
        self.K_bias = 0.007
        self.dimensionality = 40
        self.batch_size = 8192

        if parameters:
            self.set_parameters(parameters)

        self.rmse_history = []
        self.X = None                 # explicit-weight item factors
        self.Y = None                 # implicit-offset item factors

    def __repr__(self):
        return ('Factorized Neighborhood Recommendation Engine\n'
                'Number of users: %d\nNumber of items: %d\n'
                % (self.nbr_users, self.nbr_items))

    # ------------------------------------------------------------- training
    def train(self, initialize_model=True, verbose=False):
        '''Mini-batch SGD on the factorized-neighborhood objective.

        K regularization note: q and x are regularized by K_items, y by
        K_users (see module docstring for the reference-defect mapping).
        '''
        uidx, iidx, vals = self.ratings.shuffled(
            int(self.rng.integers(2 ** 31)))
        self.compute_overall_avg()
        k = self.dimensionality
        if initialize_model or self.Q is None or self.X is None:
            state = fn_ops.init_fn_state(
                self.nbr_users, self.nbr_items, k,
                feature_init=self.feature_init,
                seed=int(self.rng.integers(2 ** 31)),
                mu=self.overall_bias or 0.0)
        else:
            state = fn_ops.FNState(
                Q=jnp.asarray(self.Q, jnp.float32),
                X=jnp.asarray(self.X, jnp.float32),
                Y=jnp.asarray(self.Y, jnp.float32),
                bu=jnp.asarray(self.users_bias, jnp.float32),
                bi=jnp.asarray(self.items_bias, jnp.float32),
                mu=jnp.float32(self.overall_bias or 0.0))
        fl, fv, fm = fn_ops.padded_user_lists(self.ratings)
        fl, fv, fm = jnp.asarray(fl), jnp.asarray(fv), jnp.asarray(fm)
        ub, ib, rb, mb = sgd_mf.batch_ratings(uidx, iidx, vals,
                                              self.batch_size)
        ub, ib = jnp.asarray(ub), jnp.asarray(ib)
        rb, mb = jnp.asarray(rb), jnp.asarray(mb)
        epoch = fn_ops.make_fn_epoch(
            self.learning_rate, self.learning_rate_users,
            self.learning_rate_items, self.K_items,
            self.K_bias, self.K_bias, K_y=self.K_users,
            lo=self.min_rating, hi=self.max_rating)
        driver = ConvergenceDriver(1, self.nbr_epochs, self.min_improvement)
        state = driver.run(
            lambda s: epoch(s, ub, ib, rb, mb, fl, fv, fm), state)
        self.rmse_history = driver.history
        if verbose:
            for e, r in enumerate(driver.history):
                self.logger.info('epoch %d rmse %.5f', e, r)
        # materialize user profiles so MF serving kernels work unchanged
        profiles = fn_ops.user_aggregates(state, fl, fv, fm)
        self.P = np.array(profiles)
        self.Q = np.array(state.Q)
        self.X = np.array(state.X)
        self.Y = np.array(state.Y)
        self.users_bias = np.array(state.bu)
        self.items_bias = np.array(state.bi)

    def get_rmse_history(self):
        return np.asarray(self.rmse_history)

    def _extra_state_arrays(self):
        '''Persist the explicit-weight factors X (P holds derived
        profiles and is checkpointed as svd_v; Y rides items_feedback) so
        fold-in keeps working after load.'''
        return {} if self.X is None else {'X': self.X}

    # ----------------------------------------------------------- prediction
    def predict_rating_with_bias(self, item_index, user_index):
        '''mu + b_u + b_i + q_i . a_u (profile a_u precomputed at train).'''
        return float(self.clamping(
            self.overall_bias + self.users_bias[user_index]
            + self.items_bias[item_index]
            + self.Q[item_index] @ self.P[user_index],
            self.min_rating, self.max_rating))

    predict = predict_rating_with_bias
    predict_rating = predict_rating_with_bias

    def refresh_user_profile(self, user_index):
        '''Recompute one user's aggregate a_u from the current ratings —
        the FN fold-in: new ratings change the profile with NO retraining
        (the neighborhood model's operational advantage, Koren §4).'''
        ptr, items, vals = self.ratings.csr()
        s, e = int(ptr[user_index]), int(ptr[user_index + 1])
        ids = items[s:e]
        if ids.size == 0:
            self.P[user_index] = 0.0
            return
        resid = vals[s:e] - (self.overall_bias
                             + self.users_bias[user_index]
                             + self.items_bias[ids])
        nrm = 1.0 / np.sqrt(ids.size)
        self.P[user_index] = nrm * (resid @ self.X[ids]
                                    + self.Y[ids].sum(0))

    def add_user(self, user_label, users_ratings_index, users_ratings):
        '''Fold in a new user: append, store ratings, rebuild the profile
        — no gradient steps needed.'''
        new_id = self.users.add(user_label)
        self.ratings.grow(nbr_users=new_id + 1)
        self.ratings.set_many(
            np.full(len(users_ratings), new_id, np.int32),
            np.asarray(users_ratings_index, np.int32),
            np.asarray(users_ratings, np.float32))
        self.P = np.resize(self.P, (new_id + 1, self.dimensionality))
        self.users_bias = np.resize(self.users_bias, new_id + 1)
        self.users_bias[new_id] = 0.0
        self.refresh_user_profile(new_id)
        return new_id
