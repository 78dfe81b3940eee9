'''Interleaved A/B for the ALS-CG epoch: f32 neighbor gather (round-2
shipped body) vs bf16 fixed-side gather (round-3 candidate — one cast per
half-sweep, the [R, L, k] gather moves half the HBM bytes).

Run from /root/repo on the TPU: `python tools/ab_als.py`.
Interleaves timed blocks of warm-schedule epochs in ONE process
(chip/relay drift is ~20% across hours; within-run spread ~0.3%).
'''
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mfrec_tpu.data.movielens import ratings_from_arrays
from mfrec_tpu.ops import als as als_ops
from mfrec_tpu.ops.als import pcg_solve

U, I, N, K = 69_878, 10_677, 10_000_000, 64
REG, C_POS, ALPHA, STEPS = 0.015, 1.0, 0.0, 3   # warm steady state
EPOCHS_PER_BLOCK, REPS = 3, 5


def _body_f32(F, out, HHreg, rows, nbr_idx, nbr_val, mask):
    '''Round-2 shipped body: f32 gather, mask applied to A, f32 rhs.'''
    A = F[nbr_idx] * mask[..., None]
    cm1 = jnp.where(ALPHA > 0, ALPHA * nbr_val, C_POS) * mask
    Ab = A.astype(jnp.bfloat16)
    Awb = (A * cm1[..., None]).astype(jnp.bfloat16)
    M = HHreg[None] + jnp.einsum('rlk,rlm->rkm', Awb, Ab,
                                 preferred_element_type=jnp.float32)
    b = ((1.0 + cm1)[..., None] * A).sum(1)
    x = pcg_solve(M, b, out[rows], STEPS)
    return out.at[rows].set(x.astype(out.dtype))


def make_epoch_f32(n_ub, n_ib):
    def epoch(P, Q, u_alive, i_alive, *flat):
        k = P.shape[1]
        eye = REG * jnp.eye(k, dtype=jnp.float32)
        ub = [tuple(flat[4 * j:4 * j + 4]) for j in range(n_ub)]
        off = 4 * n_ub
        ib = [tuple(flat[off + 4 * j:off + 4 * j + 4]) for j in range(n_ib)]
        HHreg = (Q.T @ Q + eye).astype(jnp.float32)
        for rows, nidx, nval, mask in ub:
            P = _body_f32(Q, P, HHreg, rows, nidx, nval, mask)
        P = P * u_alive
        HHreg = (P.T @ P + eye).astype(jnp.float32)
        for rows, nidx, nval, mask in ib:
            Q = _body_f32(P, Q, HHreg, rows, nidx, nval, mask)
        Q = Q * i_alive
        return P, Q
    return jax.jit(epoch)


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

    if os.environ.get('AB_ALS') == 'pcg':
        # XLA CG loop (re-reads [R, k, k] per step) vs the VMEM-resident
        # blocked Pallas CG (ops/pallas_cg.py) — both on the bf16 gather
        names = ('xla', 'pallas')
        ep_old = als_ops.make_cg_epoch(len(ub), len(ib), C_POS, ALPHA,
                                       REG, STEPS, 'xla')
        ep_new = als_ops.make_cg_epoch(len(ub), len(ib), C_POS, ALPHA,
                                       REG, STEPS, 'pallas')
    else:
        names = ('f32', 'bf16')
        ep_old = make_epoch_f32(len(ub), len(ib))
        ep_new = als_ops.make_cg_epoch(len(ub), len(ib), C_POS, ALPHA,
                                       REG, STEPS)

    # settle both to warm steady state + compile
    state = {}
    legs = tuple(zip(names, (ep_old, ep_new)))
    for name, ep in legs:
        P, Q = P0, Q0
        for _ in range(4):
            P, Q = ep(P, Q, u_alive, i_alive, *flat)
        float(P[0, 0])
        state[name] = (P, Q)

    times = {n: [] for n in names}
    for rep in range(REPS):
        for name, ep in legs:
            P, Q = state[name]
            t0 = time.perf_counter()
            for _ in range(EPOCHS_PER_BLOCK):
                P, Q = ep(P, Q, u_alive, i_alive, *flat)
            float(P[0, 0])
            dt = (time.perf_counter() - t0) / EPOCHS_PER_BLOCK
            times[name].append(dt)
            state[name] = (P, Q)
            print('rep %d %-5s %.4f s/epoch' % (rep, name, dt), flush=True)

    for name in names:
        print('%-6s median %.4f s/epoch (spread %.4f..%.4f)' % (
            name, statistics.median(times[name]),
            min(times[name]), max(times[name])))
    m_old = statistics.median(times[names[0]])
    m_new = statistics.median(times[names[1]])
    print('%s-vs-%s speedup: %.1f%%'
          % (names[1], names[0], 100 * (m_old - m_new) / m_old))
