'''
Pallas TPU kernel: sorted-window gradient aggregation.

The inner op of the alternating SGD tier: given per-sample gradients
g [B, k] and window-local row ids kl [B] (values in [0, W)), produce
gsum [W, k] (sum of rows per id) and cnt [W] (rows per id).  The XLA
implementation materializes a [B, W] bf16 one-hot tile in HBM and reads
it twice (gradient einsum + count einsum); here the one-hot lives only in
VMEM per chunk and both outputs accumulate in one pass:

    for each chunk c:  onehot = (kl_c[:, None] == iota_W)      (VPU)
                       acc   += onehot^T @ [g_c | 1]           (MXU)
'''
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _agg_kernel(W, g_ref, kl_ref, out_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = g_ref[:]                                   # [ch, k]
    kl = kl_ref[:]                                 # [ch]
    ch = g.shape[0]
    onehot = (kl[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (ch, W), 1)).astype(jnp.bfloat16)
    gx = jnp.concatenate(
        [g, jnp.ones((ch, 1), g.dtype)], axis=1).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        onehot, gx, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=('W', 'chunk', 'interpret'))
def window_aggregate(g, kl, mask, W, chunk=4096, interpret=False):
    '''Returns (gsum [W, k], cnt [W]).  g must be pre-masked (rows with
    mask 0 must already be zero); mask rides along as the count column.'''
    B, k = g.shape
    ch = min(chunk, B)
    if B % ch != 0:
        # must survive python -O: a stripped assert would let the grid
        # truncate and silently drop the tail rows from the aggregation
        raise ValueError('batch %d not a multiple of chunk %d' % (B, ch))
    # fold the mask into the count column by scaling a ones column: done
    # inside the kernel via g's own rows — zero rows still count, so mask
    # must zero kl-counts too: replace kl of masked rows by W (one-hot
    # misses every column).
    kl = jnp.where(mask > 0, kl, W)
    out = pl.pallas_call(
        functools.partial(_agg_kernel, int(W)),
        grid=(B // ch,),
        in_specs=[
            pl.BlockSpec((ch, k), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch,), lambda j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, k + 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, k + 1), jnp.float32),
        interpret=interpret,
    )(g, kl)
    return out[:, :k], out[:, k]
