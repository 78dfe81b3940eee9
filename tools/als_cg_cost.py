'''Decompose the ALS-CG epoch cost: interleave one-jit epochs built at
cg_steps = 1 / 3 / 6 to get the marginal HBM/compute cost per CG step
(each step re-reads the materialized [R, k, k] normal matrices — the
candidate target for a VMEM-resident-M Pallas CG kernel).

Run from /root/repo on the TPU: `python tools/als_cg_cost.py`.
'''
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import bench
from mfrec_tpu.data.movielens import ratings_from_arrays
from mfrec_tpu.ops import als as als_ops

U, I, N, K = 69_878, 10_677, 10_000_000, 64
REG, C_POS, ALPHA = 0.015, 1.0, 0.0
STEP_COUNTS = (1, 3, 6)
EPOCHS_PER_BLOCK, REPS = 3, 4

if __name__ == '__main__':
    users, items, vals = bench.make_data(U, I, N)
    r = ratings_from_arrays(users, items,
                            np.ones(users.shape[0], np.float32), U, I)
    ub = als_ops.device_buckets(r.padded_rows(axis='user'))
    ib = als_ops.device_buckets(r.padded_rows(axis='item'))
    flat = [x for b in ub for x in b] + [x for b in ib for x in b]
    rng = np.random.default_rng(0)
    P0 = jnp.asarray(rng.normal(0, 0.1, (U, K)), jnp.float32)
    Q0 = jnp.asarray(rng.normal(0, 0.1, (I, K)), jnp.float32)
    u_alive = jnp.asarray(als_ops._alive_mask(
        [tuple(np.asarray(x) for x in b) for b in ub], U))
    i_alive = jnp.asarray(als_ops._alive_mask(
        [tuple(np.asarray(x) for x in b) for b in ib], I))

    eps, state = {}, {}
    for s in STEP_COUNTS:
        eps[s] = als_ops.make_cg_epoch(len(ub), len(ib), C_POS, ALPHA,
                                       REG, s)
        P, Q = P0, Q0
        for _ in range(3):
            P, Q = eps[s](P, Q, u_alive, i_alive, *flat)
        float(P[0, 0])
        state[s] = (P, Q)

    times = {s: [] for s in STEP_COUNTS}
    for rep in range(REPS):
        for s in STEP_COUNTS:
            P, Q = state[s]
            t0 = time.perf_counter()
            for _ in range(EPOCHS_PER_BLOCK):
                P, Q = eps[s](P, Q, u_alive, i_alive, *flat)
            float(P[0, 0])
            dt = (time.perf_counter() - t0) / EPOCHS_PER_BLOCK
            times[s].append(dt)
            state[s] = (P, Q)
            print('rep %d steps=%d %.4f s/epoch' % (rep, s, dt), flush=True)

    med = {s: statistics.median(times[s]) for s in STEP_COUNTS}
    for s in STEP_COUNTS:
        print('steps=%d median %.4f s/epoch' % (s, med[s]))
    print('marginal per CG step (6 vs 1): %.4f s' % ((med[6] - med[1]) / 5))
    print('assembly+solve floor (extrapolated to 0 steps): %.4f s'
          % (med[1] - (med[6] - med[1]) / 5))
