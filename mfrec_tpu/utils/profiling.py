'''
Training telemetry and profiling.

The reference has no tracing — only wall-clock anecdotes in docstrings
(SURVEY.md §5).  Here: a ``jax.profiler`` trace context and an
``EpochTimer`` that records per-epoch wall time and rating-update
throughput (the BASELINE.md metric).
'''
from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir='/tmp/mfrec_tpu_trace'):
    '''Capture a jax.profiler trace (view with tensorboard/xprof).'''
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class EpochTimer:
    '''Wall-time + throughput per epoch.  Use ``with timer.epoch():`` around
    each epoch (after forcing a device sync) and read ``summary()``.'''

    def __init__(self, nbr_ratings, rank):
        self.nbr_ratings = int(nbr_ratings)
        self.rank = int(rank)
        self.times = []

    @contextlib.contextmanager
    def epoch(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        if not self.times:
            return {}
        med = float(np.median(self.times))
        return {
            'epochs': len(self.times),
            'epoch_s_median': med,
            'epoch_s_min': float(np.min(self.times)),
            'rating_updates_per_s': self.nbr_ratings / med,
            'feature_rating_updates_per_s':
                self.nbr_ratings * self.rank / med,
        }
