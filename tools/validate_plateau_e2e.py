'''End-to-end on-chip validation of the SHIPPED stall-triggered
``lr_plateau_decay`` at the ML-10M headline shape.

The r4 TTQ probes validated plateau-onset decay with an *epoch-indexed*
schedule (``TTQ_G='0.9@70'``, bench_logs/r4/ttq_decay_*.log) driven at
the ops level.  This script drives the shipped mechanism instead — the
full model path: ``GDRecommender(... lr_plateau_decay=0.9).train(
handle_bias=True)`` with BellKor fixed biases, ConvergenceDriver decay
triggered by the measured improvement rule — and checks it reproduces
the probe's qualitative result end to end.

The check is INTERNALLY CONTROLLED and drift-immune: with
``plateau_decay=g``, every epoch before the first stall runs at
lr_scale=1.0, so the constant-rate run's trajectory is a bit-identical
PREFIX of this run's.  Replaying the recorded ``rmse_history`` through a
plain ConvergenceDriver therefore yields exactly where the constant run
would have stopped and at what RMSE — one chip run gives both arms.

Asserts:
  1. decay extended training past the constant stop point,
  2. final RMSE beats the constant run's stopping RMSE by > 1e-3
     (the probe margin at this shape is ~2e-3: full_train stops at
      ~0.290 while the decayed trajectory reaches the 0.2886 band).

Run from the repo root (TPU): ``timeout 1700 python
tools/validate_plateau_e2e.py``.
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench
from mfrec_tpu.models.gd import GDRecommender
from mfrec_tpu.engine.trainer import ConvergenceDriver

U, I, N = 69878, 10677, 10_000_000
MIN_EPOCHS, MAX_EPOCHS, MIN_IMPROVEMENT = 3, 200, 1e-4


def main():
    t0 = time.perf_counter()
    users, items, vals = bench.make_data(U, I, N, seed=0)
    t_data = time.perf_counter() - t0

    model = GDRecommender(U, I, {
        'nbr_features': 64,
        'feature_init': 0.05,
        'min_epochs': MIN_EPOCHS,
        'max_epochs': MAX_EPOCHS,
        'min_improvement': MIN_IMPROVEMENT,
        'regularization_model': 0.02,
        'regularization_users_bias': 0.02,
        'regularization_items_bias': 0.02,
        # the documented ML-10M deep-plateau recipe (README):
        # inner_steps=64 + plateau decay; learning_rate stays unset so
        # the row-mean 0.15 default (the benchmarked rate) applies
        'inner_steps': 64,
        'lr_plateau_decay': 0.9,
        'engine': 'alternating',
    })
    model.set_ratings(users.astype(np.int32), items.astype(np.int32),
                      vals.astype(np.float32))
    t1 = time.perf_counter()
    model.train(handle_bias=True)
    t_train = time.perf_counter() - t1

    history = [float(r) for r in model.rmse_history]
    final = history[-1]

    # Replay the history through a plain (plateau_decay=1.0) driver: the
    # decay run's pre-stall prefix is identical to the constant run, so
    # this recovers the constant run's stop epoch + stopping RMSE exactly.
    replay = iter(history)
    ref = ConvergenceDriver(MIN_EPOCHS, MAX_EPOCHS, MIN_IMPROVEMENT)
    try:
        ref.run(lambda s: (s, next(replay)), None)
        exhausted = False
    except StopIteration:
        exhausted = True
    constant_epochs = len(ref.history)
    constant_final = ref.history[-1] if ref.history else float('nan')

    ok_extended = (not exhausted) and len(history) > constant_epochs
    ok_quality = np.isfinite(final) and final < constant_final - 1e-3
    print(json.dumps({
        'metric': 'ml10m_rank64_plateau_decay_e2e',
        'epochs': len(history),
        'train_s': round(t_train, 1),
        'data_prep_s': round(t_data, 1),
        'constant_stop_epochs': constant_epochs,
        'constant_stop_rmse': round(constant_final, 4),
        'final_rmse': round(final, 4),
        'margin': round(constant_final - final, 4),
        'decay_extended_training': bool(ok_extended),
        'beats_constant_stop_by_1e3': bool(ok_quality),
        'ok': bool(ok_extended and ok_quality),
    }))
    if not (ok_extended and ok_quality):
        sys.exit(1)


if __name__ == '__main__':
    main()
