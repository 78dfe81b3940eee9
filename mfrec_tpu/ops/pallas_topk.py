'''
Pallas TPU kernel: fused blocked P@Q^T scoring with running top-n.

The serving hot path (``ops.topk.topn_scores``) computes scores block-by-
block and merges top-k; this Pallas version keeps the [B, block] score
tile and the running top-n entirely in VMEM, so only the final [B, n]
result ever reaches HBM: Q streams through VMEM once (HBM-bandwidth
bound), the matmul rides the MXU, and the top-n merge is a short
extract-max loop on the VPU.

Replaces the reference's per-candidate python scoring loop
(``mf.py:144-193``) at serving scale.  Numerics validated against the XLA
path in tests (CPU interpret mode).
'''
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _merge_topn(best_s, best_i, s, ids, n):
    '''Merge running top-n with a fresh score tile via n extract-max
    passes — select + reduce only (neither top_k nor gather lowers
    inside Mosaic kernels).'''
    cat_s = jnp.concatenate([best_s, s], axis=1)
    cat_i = jnp.concatenate([best_i, ids], axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, cat_s.shape, 1)
    out_s = []
    out_i = []
    for _ in range(n):
        m = cat_s.max(axis=1, keepdims=True)                 # [B, 1]
        col = jnp.argmax(cat_s, axis=1)[:, None]             # [B, 1]
        hit = iota == col
        idx = jnp.where(hit, cat_i, 0).sum(axis=1, keepdims=True)
        out_s.append(m)
        out_i.append(idx)
        cat_s = jnp.where(hit, NEG, cat_s)
    return jnp.concatenate(out_s, axis=1), jnp.concatenate(out_i, axis=1)


def _topn_kernel(n, L, mu_ref, prows_ref, bu_ref, ridx_ref, rmask_ref,
                 q_ref, bi_ref, out_s_ref, out_i_ref):
    j = pl.program_id(0)
    block = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    scores = jnp.dot(prows_ref[:], q_ref[:].T,
                     preferred_element_type=jnp.float32)
    scores = scores + mu_ref[0, 0] + bu_ref[:][:, None] + bi_ref[:][None, :]
    ids = j * block + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1)
    if L:
        # mask this user's already-rated items falling in the block: a
        # static loop of [B, block] compares (VPU) — no 3D tile in VMEM.
        # (fori_loop needs dynamic_slice, unimplemented in Mosaic; the
        # caller caps `block` when L > 0 so the unrolled loop's scoped
        # stack stays under the 16 MB vmem limit.)
        ridx = ridx_ref[:]
        rmask = rmask_ref[:]
        for l in range(L):
            hit = (ids == ridx[:, l:l + 1]) & (rmask[:, l:l + 1] > 0)
            scores = jnp.where(hit, NEG, scores)
    best_s, best_i = _merge_topn(out_s_ref[:], out_i_ref[:], scores, ids, n)
    out_s_ref[:] = best_s
    out_i_ref[:] = best_i


@functools.partial(jax.jit,
                   static_argnames=('n', 'block', 'interpret'))
def topn_scores_pallas(P_rows, Q, bu_rows, bi, mu, n=10, block=1024,
                       interpret=False, rated_idx=None, rated_mask=None):
    '''Fused top-n retrieval: returns (idx [B, n], scores [B, n]) for the
    bias predictor mu + bu + bi + P.Q^T.  Q/bi must have row count
    divisible by `block` (pad with NEG-bias rows).

    rated_idx/rated_mask [B, L] (optional): per-user already-rated item
    ids to exclude.  Each list entry costs one [B, block] compare per
    block — cap L at serving time for very heavy users.'''
    B, K = P_rows.shape
    I = Q.shape[0]
    assert I % block == 0, 'pad Q to a block multiple'
    if rated_idx is None:
        rated_idx = jnp.zeros((B, 0), jnp.int32)
        rated_mask = jnp.zeros((B, 0), jnp.float32)
    L = int(rated_idx.shape[1])
    if L and block > 1024 and I % 1024 == 0:
        block = 1024       # keep the unrolled mask loop under scoped vmem
    grid = (I // block,)
    mu_arr = jnp.full((1, 1), mu, jnp.float32)
    kernel = functools.partial(_topn_kernel, int(n), L)
    Lp = max(L, 1)        # zero-width VMEM blocks don't lower; pad to 1
    if L == 0:
        rated_idx = jnp.zeros((B, 1), jnp.int32)
        rated_mask = jnp.zeros((B, 1), jnp.float32)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),       # mu
            pl.BlockSpec((B, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # P_rows
            pl.BlockSpec((B,), lambda j: (0,),
                         memory_space=pltpu.VMEM),       # bu_rows
            pl.BlockSpec((B, Lp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # rated ids
            pl.BlockSpec((B, Lp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # rated mask
            pl.BlockSpec((block, K), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),       # Q block
            pl.BlockSpec((block,), lambda j: (j,),
                         memory_space=pltpu.VMEM),       # bi block
        ],
        out_specs=(
            pl.BlockSpec((B, n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
        ),
        interpret=interpret,
    )(mu_arr, P_rows, bu_rows, rated_idx, rated_mask, Q, bi)
    return out_i, out_s


def pad_items_for_pallas(Q, bi, block):
    '''Pad Q rows to a block multiple; padded rows get bi = NEG so they
    never reach the top-n.'''
    import numpy as np
    I = Q.shape[0]
    Ipad = -(-I // block) * block
    Qp = np.zeros((Ipad, Q.shape[1]), np.float32)
    Qp[:I] = Q
    bip = np.full((Ipad,), NEG, np.float32)
    bip[:I] = bi
    return Qp, bip
