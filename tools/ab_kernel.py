'''Interleaved A/B: the round-3 fused half-pass kernel (diagonal-
regularization identity — error-term-only aggregation matmul, t==0-only
count matvec, no per-step [ch, k+1] concat) vs the round-2 kernel
(concat count column into every aggregation matmul, per-rating reg term).

The old kernel is vendored below verbatim (git 2407088^) so both
variants run INTERLEAVED in one process (chip/relay drift ~20%/hours).
Run from /root/repo: `python tools/ab_kernel.py`.
'''
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from mfrec_tpu.ops import sgd_mf

U, I, N, K = 69878, 10677, 10_000_000, 64
BATCH = 1 << 14
INNER = 8
CHUNK = 8192


# ---------------------------------------------------------------- OLD kernel
def _kernel_old(W, lo_r, hi_r, clamp_pred, row_mean, bias_none, cache_onehot,
                mu_ref, win_ref, ff_ref, r_ref, m_ref, kl_ref, lrv_ref,
                regv_ref, out_ref, sse_ref, acc_ref, win_scr, oh_scr):
    t = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when((t == 0) & (j == 0))
    def _():
        win_scr[:] = win_ref[:]
        sse_ref[0, 0] = 0.0

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ff = ff_ref[:].astype(jnp.float32)
    kl = kl_ref[:]
    m = m_ref[:]
    ch = ff.shape[0]
    if cache_onehot:
        @pl.when(t == 0)
        def _():
            oh_scr[pl.ds(j * ch, ch), :] = (
                kl[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (ch, W), 1)).astype(jnp.bfloat16)
        onehot = oh_scr[pl.ds(j * ch, ch), :]
    else:
        onehot = (kl[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (ch, W), 1)).astype(jnp.bfloat16)
    fu = jax.lax.dot_general(
        onehot, win_scr[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dot = (fu * ff).sum(-1)
    pred = (1.0 + dot) if bias_none else (mu_ref[0, 0] + dot)
    if clamp_pred:
        pred = jnp.clip(pred, lo_r, hi_r)
    err = (r_ref[:] - pred) * m

    @pl.when(t == 0)
    def _():
        sse_ref[0, 0] += (err * err).sum()

    g = err[:, None] * ff - regv_ref[:][None, :] * fu * m[:, None]
    gx = jnp.concatenate([g, m[:, None]], axis=1).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        onehot, gx, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        gsum = acc_ref[:, :-1]
        if row_mean:
            gsum = gsum / jnp.maximum(acc_ref[:, -1:], 1.0)
        win_scr[:] = win_scr[:] + lrv_ref[:][None, :] * gsum

    @pl.when((t == nt - 1) & (j == nj - 1))
    def _():
        out_ref[:] = win_scr[:]


@functools.partial(jax.jit, static_argnames=('W', 'chunk', 'inner_steps'))
def half_pass_batch_old(window, ff, r, m, kl, lrv, regv, mu, W, chunk,
                        inner_steps):
    B, k = ff.shape
    ch = min(chunk, B)
    mu_arr = jnp.full((1, 1), mu, jnp.float32)
    kernel = functools.partial(_kernel_old, int(W), 1.0, 5.0, True, True,
                               False, True)
    out, sse = pl.pallas_call(
        kernel,
        grid=(int(inner_steps), B // ch),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((W, k), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, k), lambda t, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch,), lambda t, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch,), lambda t, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch,), lambda t, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda t, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda t, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, k), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((W, k + 1), jnp.float32),
                        pltpu.VMEM((W, k), jnp.float32),
                        pltpu.VMEM((B, W), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mu_arr, window, ff, r, m, kl, lrv, regv)
    return out, sse[0, 0]


def build(variant):
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, BATCH, axis='user',
                                    max_window=128)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, BATCH, axis='item',
                                    max_window=128)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, K, feature_init=0.05,
                           mode='normal')
    Paug, Qaug = sgd_mf.augment_factors(
        st.P, st.Q, jnp.asarray(np.pad(bu_fit, (0, W_user))),
        jnp.asarray(np.pad(bi_fit, (0, W_item))))
    if variant == 'new':
        ep = sgd_mf.make_alternating_epoch(
            W_user, W_item, lr=0.15, K=0.02, bias_mode='fixed',
            inner_steps=INNER, chunk=CHUNK, use_pallas_full=True,
            donate=False, ff_dtype='bfloat16')
        return ep, (Paug, Qaug), p_layout, q_layout

    # old variant: same epoch structure, scan driven here with the
    # vendored kernel (mirrors make_alternating_epoch's half passes)
    def half_pass(F_upd, F_fix, mu, batches, W, upd_is_user):
        F_fix = F_fix.astype(jnp.bfloat16)

        def step(carry, batch):
            F_upd, sse = carry
            u, i, r, m, kl, lo = batch
            upd_rows = u if upd_is_user else i
            fix_rows = i if upd_is_user else u
            ff = F_fix[fix_rows]
            kdim = F_upd.shape[1] - 2
            lrv = np.full(kdim + 2, 0.15, np.float32)
            regv = np.full(kdim + 2, 0.02, np.float32)
            own_bias_col = kdim if upd_is_user else kdim + 1
            const_col = kdim + 1 if upd_is_user else kdim
            lrv[own_bias_col] = 0.0
            lrv[const_col] = 0.0
            regv[const_col] = 0.0
            win = jax.lax.dynamic_slice_in_dim(F_upd, lo, W, 0)
            win_out, sse_b = half_pass_batch_old(
                win, ff, r, m, kl, jnp.asarray(lrv), jnp.asarray(regv),
                mu, W, CHUNK, INNER)
            F_upd = jax.lax.dynamic_update_slice_in_dim(
                F_upd, win_out, lo, 0)
            return (F_upd, sse + sse_b), None

        (F_upd, sse), _ = jax.lax.scan(step, (F_upd, jnp.float32(0.0)),
                                       batches)
        return F_upd, sse

    @jax.jit
    def epoch(Paug, Qaug, mu, p_layout, q_layout):
        Paug, sse_p = half_pass(Paug, Qaug, mu, p_layout, W_user, True)
        Qaug, sse_q = half_pass(Qaug, Paug, mu, q_layout, W_item, False)
        n = jnp.maximum(p_layout[3].sum() + q_layout[3].sum(), 1.0)
        return Paug, Qaug, jnp.sqrt((sse_p + sse_q) / n)

    return epoch, (Paug, Qaug), p_layout, q_layout


def run_block(ep, state, pl_, ql_, epochs=3):
    Pa, Qa = state
    t0 = time.perf_counter()
    for _ in range(epochs):
        Pa, Qa, rmse = ep(Pa, Qa, mu, pl_, ql_)
    float(rmse)
    return (time.perf_counter() - t0) / epochs, (Pa, Qa), float(rmse)


if __name__ == '__main__':
    users, items, vals = bench.make_data(U, I, N)
    floor, bu_fit, bi_fit = bench.bias_floor_rmse(users, items, vals, U, I)
    mu = jnp.float32(vals.mean())
    ep_n, st_n, pn, qn = build('new')
    ep_o, st_o, po, qo = build('old')
    _, st_n, _ = run_block(ep_n, st_n, pn, qn, epochs=1)
    _, st_o, _ = run_block(ep_o, st_o, po, qo, epochs=1)
    tn, to = [], []
    for rep in range(4):
        dt, st_o, r_o = run_block(ep_o, st_o, po, qo)
        to.append(dt)
        dt, st_n, r_n = run_block(ep_n, st_n, pn, qn)
        tn.append(dt)
        print('rep %d old %.4f (rmse %.4f) | new %.4f (rmse %.4f)'
              % (rep, to[-1], r_o, tn[-1], r_n), flush=True)
    print('old: %s median %.4f' % ([round(x, 4) for x in to],
                                   float(np.median(to))))
    print('new: %s median %.4f' % ([round(x, 4) for x in tn],
                                   float(np.median(tn))))
    mo, mn = float(np.median(to)), float(np.median(tn))
    print('new kernel speedup: %.1f%%' % (100 * (mo - mn) / mo))
