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


# packed-merge constants: block-local item ids ride the low PACK_BITS of
# the monotone-int32 score key, so every extract-max pass is a plain int
# max + equality clear (no argmax reduction, no one-hot index gather)
PACK_BITS = 12
PACK_MASK = (1 << PACK_BITS) - 1
PACK_CLEAR = -2 ** 31          # python int: jnp constants built at module
                               # scope would be captured by pallas kernels


def _f32_sort_key(s):
    '''IEEE-754 f32 -> int32 whose SIGNED ordering matches float
    ordering: non-negatives keep their bits (sign 0, payload ascends);
    negatives flip the non-sign bits (payload order reverses, sign bit
    keeps them below every non-negative).'''
    i = jax.lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))


def _key_to_f32(key):
    return jax.lax.bitcast_convert_type(
        jnp.where(key >= 0, key, key ^ jnp.int32(0x7FFFFFFF)), jnp.float32)


def _block_topn_packed(scores, n):
    '''Top-n of one [B, block] f32 tile via id-in-mantissa packing:
    quantize the score key's low PACK_BITS to zero, OR in the lane id,
    then run n passes of (int max, unpack, equality clear).  Ids are
    unique per row, so packed values are unique and the equality clear
    removes exactly the extracted element.  Scores come back quantized
    toward -inf by <= 2^-11 relative — ranking among quasi-ties may
    differ from the exact path (accepted: opt-in fast mode).'''
    B, block = scores.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
    packed = (_f32_sort_key(scores) & jnp.int32(~PACK_MASK)) | iota
    out_s, out_i = [], []
    for _ in range(n):
        m = packed.max(axis=1, keepdims=True)               # [B, 1] int32
        out_i.append(m & jnp.int32(PACK_MASK))
        out_s.append(_key_to_f32(m & jnp.int32(~PACK_MASK)))
        packed = jnp.where(packed == m, jnp.int32(PACK_CLEAR), packed)
    return jnp.concatenate(out_s, axis=1), jnp.concatenate(out_i, axis=1)


def _topn_kernel(n, L, bf16_dot, packed, mu_ref, prows_ref, bu_ref,
                 ridx_ref, rmask_ref, q_ref, bi_ref, out_s_ref, out_i_ref):
    j = pl.program_id(0)
    block = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    if bf16_dot:
        # MXU at bf16 rate (~4x f32), f32 accumulation.  Q may already
        # arrive bf16 (serving keeps a bf16 device copy: half the HBM
        # streaming, which bounds this kernel) — the casts no-op then.
        scores = jnp.dot(prows_ref[:].astype(jnp.bfloat16),
                         q_ref[:].astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32)
    else:
        scores = jnp.dot(prows_ref[:], q_ref[:].T,
                         preferred_element_type=jnp.float32)
    scores = scores + mu_ref[0, 0] + bu_ref[:][:, None] + bi_ref[:][None, :]
    if L:
        # mask this user's already-rated items in THIS block: the host
        # pre-bucketed rated ids per (block, user) as block-LOCAL ids
        # (block_rated_layout), so the compare loop runs over the
        # per-block max count Lb (typically ~L*block/I + slack, i.e. a
        # handful) instead of the full per-user list length.
        ridx = ridx_ref[0]                                # [B, Lb] local
        rmask = rmask_ref[0]
        local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        for l in range(L):
            hit = (local == ridx[:, l:l + 1]) & (rmask[:, l:l + 1] > 0)
            scores = jnp.where(hit, NEG, scores)
    if packed:
        # id-in-mantissa block top-n (3 cheap int passes per extracted
        # element vs ~8 for max+argmax+onehot-gather), then an exact
        # merge over the tiny [B, 2n] concat with the running best
        fs, fi = _block_topn_packed(scores, n)
        best_s, best_i = _merge_topn(out_s_ref[:], out_i_ref[:],
                                     fs, j * block + fi, n)
    else:
        ids = j * block + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        best_s, best_i = _merge_topn(out_s_ref[:], out_i_ref[:],
                                     scores, ids, n)
    out_s_ref[:] = best_s
    out_i_ref[:] = best_i


def block_rated_layout(rated_idx, rated_mask, block, nblocks):
    '''Host-side: bucket each user's global rated ids [B, L] by item
    block -> ([nblocks, B, Lb] block-local ids, [nblocks, B, Lb] mask),
    where Lb = max rated count of any (user, block) pair.  The kernel
    then compares only the ids that can fall in its block.'''
    import numpy as np
    rated_idx = np.asarray(rated_idx)
    rated_mask = np.asarray(rated_mask)
    B, L = rated_idx.shape
    if L == 0 or not (rated_mask > 0).any():
        z = np.zeros((nblocks, B, 1), np.float32)
        return np.zeros((nblocks, B, 1), np.int32), z
    # sort each row by id with invalid entries pushed last (the group-
    # rank logic below needs per-row sortedness)
    sort_key = np.where(rated_mask > 0, rated_idx, np.iinfo(np.int32).max)
    order = np.argsort(sort_key, axis=1, kind='stable')
    rated_idx = np.take_along_axis(rated_idx, order, axis=1)
    rated_mask = np.take_along_axis(rated_mask, order, axis=1)
    b_of = rated_idx // block                           # [B, L] sorted/row
    valid = rated_mask > 0
    # rank within each (user, block) group: rows are sorted by id, hence
    # by block; group starts are where b_of changes
    change = np.diff(b_of, axis=1, prepend=-1) != 0
    firsts = np.maximum.accumulate(
        np.where(change, np.arange(L)[None, :], 0), axis=1)
    rank = np.arange(L)[None, :] - firsts
    Lb = int(rank[valid].max()) + 1
    out_idx = np.zeros((nblocks, B, Lb), np.int32)
    out_msk = np.zeros((nblocks, B, Lb), np.float32)
    rows = np.broadcast_to(np.arange(B)[:, None], (B, L))
    out_idx[b_of[valid], rows[valid], rank[valid]] = \
        (rated_idx % block)[valid]
    out_msk[b_of[valid], rows[valid], rank[valid]] = 1.0
    return out_idx, out_msk


def topn_scores_pallas(P_rows, Q, bu_rows, bi, mu, n=10, block=1024,
                       interpret=False, rated_idx=None, rated_mask=None,
                       rated_blocks=None, score_dtype=None,
                       packed_merge=False):
    '''Fused top-n retrieval: returns (idx [B, n], scores [B, n]) for the
    bias predictor mu + bu + bi + P.Q^T.  Q/bi must have row count
    divisible by `block` (pad with NEG-bias rows).

    Rated-item exclusion: pass either ``rated_blocks`` — the
    device-resident ([nblocks, B, Lb] local ids, mask) pair from
    ``block_rated_layout(..., block, I // block)``, the steady-state
    serving form — or raw ``rated_idx/rated_mask`` [B, L] global ids,
    bucketed (and uploaded) here per call.  Bucketing means the
    in-kernel compare loop runs over the per-block max count Lb
    (~L*block/I + slack), not L.

    Fast opt-ins (exact path is the default):
    ``score_dtype='bfloat16'`` runs the score matmul at bf16 MXU rate
    with f32 accumulation (Q may be passed pre-cast to bf16 to also
    halve the HBM streaming that bounds this kernel).
    ``packed_merge=True`` extracts each block's top-n from an
    id-in-mantissa int32 packing (plain max + equality clear per
    element instead of argmax + one-hot gather); scores quantize toward
    -inf by <= 2^-11 relative, so quasi-ties may reorder.'''
    B, K = P_rows.shape
    I = Q.shape[0]
    if I % block != 0:
        # API-input validation must survive python -O (a stripped
        # assert would silently truncate the grid and never score the
        # last partial item block)
        raise ValueError('pad Q to a block multiple (%d rows, block %d) '
                         '— see pad_items_for_pallas' % (I, block))
    if packed_merge and block > (1 << PACK_BITS):
        raise ValueError('packed_merge needs block <= %d' % (1 << PACK_BITS))
    if packed_merge and n > block:
        # n extraction passes past the block width would unpack the
        # PACK_CLEAR sentinel (NaN payload) into the running merge
        raise ValueError('packed_merge needs n <= block')
    if rated_blocks is not None:
        bidx, bmask = rated_blocks
        if bidx.shape[0] != I // block:
            raise ValueError('rated_blocks built for a different block '
                             'size (%d blocks vs %d)'
                             % (bidx.shape[0], I // block))
        L = int(bidx.shape[2])
    elif rated_idx is None or rated_idx.shape[1] == 0:
        L = 0
        bidx = jnp.zeros((I // block, B, 1), jnp.int32)
        bmask = jnp.zeros((I // block, B, 1), jnp.float32)
    else:
        bidx_np, bmask_np = block_rated_layout(rated_idx, rated_mask,
                                               block, I // block)
        L = int(bidx_np.shape[2])
        # the unrolled compare loop allocates ~L live [B, block] tiles on
        # the Mosaic scoped-vmem stack; shrink the block if dense
        while L * block > 16384 and block > 512 and I % (block // 2) == 0:
            block //= 2
            bidx_np, bmask_np = block_rated_layout(rated_idx, rated_mask,
                                                   block, I // block)
            L = int(bidx_np.shape[2])
        bidx, bmask = jnp.asarray(bidx_np), jnp.asarray(bmask_np)
    if score_dtype == 'bfloat16':
        Q = Q.astype(jnp.bfloat16)        # no-op if pre-cast by the caller
    return _topn_pallas(P_rows, Q, bu_rows, bi,
                        jnp.full((1, 1), mu, jnp.float32), bidx, bmask,
                        n=int(n), block=int(block), L=L,
                        bf16_dot=(score_dtype == 'bfloat16'),
                        packed=bool(packed_merge),
                        interpret=bool(interpret))


@functools.partial(jax.jit,
                   static_argnames=('n', 'block', 'L', 'bf16_dot',
                                    'packed', 'interpret'))
def _topn_pallas(P_rows, Q, bu_rows, bi, mu_arr, bidx, bmask, n, block, L,
                 bf16_dot, packed, interpret):
    B, K = P_rows.shape
    I = Q.shape[0]
    grid = (I // block,)
    kernel = functools.partial(_topn_kernel, n, L, bf16_dot, packed)
    Lb = bidx.shape[2]
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
            pl.BlockSpec((1, B, Lb), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),       # rated local ids
            pl.BlockSpec((1, B, Lb), lambda j: (j, 0, 0),
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
        # the n extract-max passes keep ~n live [B, block] tiles on the
        # scoped-vmem stack; n=20 at block 4096 already exceeds the 16 MB
        # default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mu_arr, P_rows, bu_rows, bidx, bmask, Q, bi)
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
