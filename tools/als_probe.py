'''ALS-CG epoch deletion probe (drift-immune, interleaved blocks).

The 0.085 s/epoch ALS-CG pipeline (ops/als.py) has one known open
lever: the [R, L, k] neighbor gather materializes in HBM before the
Gram einsum.  Before building a fused gather+Gram kernel (hard: Mosaic
has no dynamic row gather), measure what the gather actually costs.

Variants (timing-only surgery on the BUCKET DATA, so ops/als.py is
untouched — except `coarse`, which is numerics-identical and
adoptable):
  default — real nnz-bucket neighbor lists (random access)
  seq     — nbr_idx rewritten to sequential indices (locality-perfect
            access; numerics wrong, timing-only)
  cg1     — default buckets, cg_steps=1 (vs the steady 3): the
            per-CG-step cost by subtraction
  coarse  — a (32, 256, 2048)-rung bucket ladder instead of the
            default powers of two: ~3x fewer per-bucket op sequences
            and larger batched Gram/CG ops at more padded FLOPs
            (masked padding — numerically identical results)

Run from the repo root: python tools/als_probe.py
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench
from mfrec_tpu.data.movielens import ratings_from_arrays
from mfrec_tpu.ops import als as als_ops

U, I, N, K = 69878, 10677, 10_000_000, 64


def seq_buckets(bk, n_other):
    '''Same bucket shapes, sequential neighbor indices (timing-only).'''
    out = []
    for rows, nidx, nval, mask in bk:
        R, L = nidx.shape
        seq = ((np.arange(R, dtype=np.int64)[:, None] * L
                + np.arange(L, dtype=np.int64)[None, :]) % n_other)
        out.append((rows, seq.astype(nidx.dtype), nval, mask))
    return out


def build(ub, ib, steps):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(0, 0.1, (U, K)), jnp.float32)
    Q = jnp.asarray(rng.normal(0, 0.1, (I, K)), jnp.float32)
    kw = dict(gram_dtype=jnp.bfloat16, solver='cg', cg_steps=steps,
              cg_warm_steps=None, pcg_impl='auto')
    P, Q = als_ops.als_wrmf_train(P, Q, ub, ib, nbr_epochs=1, **kw)
    float(P[0, 0])                                            # compile
    return P, Q, kw


def timed(P, Q, ub, ib, kw, epochs=3):
    t0 = time.perf_counter()
    P, Q = als_ops.als_wrmf_train(P, Q, ub, ib, nbr_epochs=epochs, **kw)
    float(P[0, 0])
    return (time.perf_counter() - t0) / epochs, P, Q


if __name__ == '__main__':
    users, items, vals = bench.make_data(U, I, N)
    r = ratings_from_arrays(users, items,
                            np.ones(users.shape[0], np.float32), U, I)
    ub_h = r.padded_rows(axis='user')
    ib_h = r.padded_rows(axis='item')
    ub = als_ops.device_buckets(ub_h)
    ib = als_ops.device_buckets(ib_h)
    ub_s = als_ops.device_buckets(seq_buckets(ub_h, I))
    ib_s = als_ops.device_buckets(seq_buckets(ib_h, U))
    coarse = (32, 256, 2048)
    ub_c = als_ops.device_buckets(r.padded_rows(axis='user',
                                                buckets=coarse))
    ib_c = als_ops.device_buckets(r.padded_rows(axis='item',
                                                buckets=coarse))

    variants = {
        'default': (ub, ib, 3),
        'seq': (ub_s, ib_s, 3),
        'cg1': (ub, ib, 1),
        'coarse': (ub_c, ib_c, 3),
    }
    built = {nm: build(*cfg) for nm, cfg in variants.items()}
    times = {nm: [] for nm in variants}
    for _ in range(4):
        for nm, cfg in variants.items():
            P, Q, kw = built[nm]
            dt, P, Q = timed(P, Q, cfg[0], cfg[1], kw)
            built[nm] = (P, Q, kw)
            times[nm].append(dt)
    for nm in variants:
        print('%s: %s  median %.4f'
              % (nm, [round(x, 4) for x in times[nm]],
                 float(np.median(times[nm]))))
    med = {nm: float(np.median(times[nm])) for nm in variants}
    print('random-access gather premium: %.4f s/epoch'
          % (med['default'] - med['seq']))
    print('per-CG-step cost: %.4f s/epoch (x2 half-sweeps, steps 3->1)'
          % ((med['default'] - med['cg1']) / 2.0))
