'''Blocked warm-started Jacobi-PCG with VMEM-resident normal matrices.

The XLA path (``ops.als.pcg_solve``) runs the CG iteration as a Python
loop of batched [k,k]@[k,1] mat-vecs: every iteration re-reads the
materialized ``M`` ([R, k, k], f32 — ~1.1 GB for the ML-10M user side)
from HBM.  This kernel tiles the rows into blocks, DMAs each block's
systems into VMEM ONCE, and runs ALL ``steps`` iterations against the
resident tile — the iteration's mat-vec becomes a VPU
multiply-and-lane-reduce with zero marginal HBM traffic.

Numerics match ``pcg_solve`` (same Jacobi preconditioner, same guarded
step sizes, f32 throughout); order of the lane reduction differs, so
agreement is float-tolerance, not bitwise.  Reference seed: the per-row
normal-equation solves of ``als_implicit.pyx:257-302``.
'''
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(steps, k, m_ref, b_ref, x0_ref, out_ref):
    Mt = m_ref[:]                                   # [rb, k, k] resident
    b = b_ref[:]                                    # [rb, k]
    x = x0_ref[:]
    eye = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    D = jnp.sum(jnp.where(eye[None], Mt, 0.0), axis=-1)   # [rb, k] diag
    D = jnp.maximum(D, 1e-12)
    eps = 1e-20

    def Mv(v):
        return jnp.sum(Mt * v[:, None, :], axis=-1)       # [rb, k]

    r = b - Mv(x)
    z = r / D
    p = z
    rz = (r * z).sum(-1, keepdims=True)                   # [rb, 1]
    for _ in range(steps):
        Mp = Mv(p)
        denom = (p * Mp).sum(-1, keepdims=True)
        a = jnp.where(denom > eps, rz / jnp.maximum(denom, eps), 0.0)
        x = x + a * p
        r = r - a * Mp
        z = r / D
        rz_new = (r * z).sum(-1, keepdims=True)
        beta = jnp.where(rz > eps, rz_new / jnp.maximum(rz, eps), 0.0)
        p = z + beta * p
        rz = rz_new
    out_ref[:] = x


@functools.partial(jax.jit,
                   static_argnames=('steps', 'rb', 'interpret'))
def pcg_solve_resident(M, b, x0, steps, rb=256, interpret=False):
    '''Drop-in for ``ops.als.pcg_solve``: M [R, k, k] f32, b/x0 [R, k]
    -> x [R, k].  Rows are processed in blocks of ``rb``; R is padded to
    a block multiple with identity systems (solution 0, sliced off).'''
    R, k = b.shape
    rb = min(rb, max(R, 8))
    pad = -R % rb
    if pad:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=M.dtype), (pad, k, k))
        M = jnp.concatenate([M, eye], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, k), b.dtype)], 0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, k), x0.dtype)], 0)
    Rp = R + pad
    out = pl.pallas_call(
        functools.partial(_kernel, int(steps), int(k)),
        grid=(Rp // rb,),
        in_specs=[
            pl.BlockSpec((rb, k, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, k), lambda i: (i, 0)),
            pl.BlockSpec((rb, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rb, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(M.astype(jnp.float32), b.astype(jnp.float32), x0.astype(jnp.float32))
    return out[:R]
