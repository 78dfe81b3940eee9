'''
Convergence drivers.

The reference's epoch rule (``gd_estimator.pyx:360,455,545``):

    while (epoch < min_epochs) or (rmse <= rmse_last - min_improvement):

with rmse initialized to 2.0 — i.e. train at least ``min_epochs`` epochs and
keep going while the training RMSE still improves by ``min_improvement``.
Only ``estimator_loop`` (:264) also honors ``max_epochs``; here every driver
honors it as a safety cap (documented deviation — set it high to reproduce
uncapped reference behavior).

The device kernels are epoch-granular jitted functions; the improvement
test runs on host between epochs (one scalar device->host sync per epoch).
'''
from __future__ import annotations


class ConvergenceDriver:
    '''Stateful epoch loop with the reference's improvement rule and an
    rmse history (reference ``rmse_history``: ``gradient_descent.py:93,114``).'''

    def __init__(self, min_epochs, max_epochs, min_improvement,
                 nan_guard=True):
        self.min_epochs = int(min_epochs)
        self.max_epochs = int(max_epochs)
        self.min_improvement = float(min_improvement)
        self.nan_guard = nan_guard
        self.history = []

    def run(self, epoch_fn, state):
        '''epoch_fn(state) -> (state, rmse_scalar).  Returns final state.'''
        import math
        rmse = 2.0
        rmse_last = rmse      # min_epochs=0 means converge-only, not crash
        epoch = 0
        while (epoch < self.min_epochs
               or rmse <= rmse_last - self.min_improvement):
            if epoch >= self.max_epochs:
                break
            rmse_last = rmse
            state, rmse_dev = epoch_fn(state)
            rmse = float(rmse_dev)
            if self.nan_guard and not math.isfinite(rmse):
                raise FloatingPointError(
                    'training diverged: rmse=%r at epoch %d (reduce the '
                    'learning rate or batch size)' % (rmse, epoch))
            self.history.append(rmse)
            epoch += 1
        return state
