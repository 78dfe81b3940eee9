'''Deletion profiling of the fused half-pass kernel's marginal sweep.

The marginal in-VMEM sweep (~50 us/batch at W=128/B=16k/k=66) sits well
above the MXU+VPU floor (~5 us by FLOP count).  This probe times kernel
VARIANTS that each delete one cost component, at inner_steps T=2 vs
T=10, so

    marginal_sweep = (t(T=10) - t(T=2)) / (8 * N_BATCH)

isolates the per-sweep cost of each deleted part (compile-time constants
and DMA setup cancel).  Each timed call chains N_BATCH kernel calls in
one lax.scan (the window carried batch-to-batch, so calls serialize on
device) — per-dispatch relay jitter here is ms-scale and a single-call
T-difference (~0.4 ms) is unmeasurable through it.  Variants (math
intentionally wrong where parts are deleted — timing only):

  full      — the shipped kernel body
  no_fu     — skip the onehot@win gather matmul (fu := ff)
  no_acc    — skip the onehot^T@(eff*ff) aggregation matmul
  no_elem   — skip the prediction/error chain (eff := r)
  k64 / k128— lane-alignment probe: full body at k=64 / 128 vs the 66
              the augmented layout uses

Fix variants (probe round 2 — the no_elem delta showed the VPU chain,
dominated by the lane-dim reduction (fu*ff).sum(-1), costs ~26 of the
39 us/sweep):

  dot_mxu     — dot via f32 ones-matmul (fu*ff)@ones_k on the MXU
                (numerics-identical accumulation order aside)
                [MEASURED rep0: 43 us — f32 MXU matmul loses, drop]
  dot_mxu_b16 — same but the product is cast bf16 before the matmul
                [MEASURED rep0: 34.5 vs 38.6 — only ~4 us of the 26]
  bf16_chain  — no [ch,k] f32 intermediates at all: fu cast bf16 off the
                matmul, product/acc-operand bf16, dot via bf16 ones-matmul

Round 3 (the 1D-layout hypothesis): [ch] 1D vectors (r, m, err, the
squeezed dot) are lane-major while [ch,k] arrays are sublane-major on
dim 0 — every 1D<->2D broadcast/squeeze is a vreg relayout.  The all2d
variants pass r/m/kl as [ch,1] COLUMNS and keep every intermediate 2D
(lane-broadcasts are native; nothing squeezes):

  all2d       — 2D chain, f32 products, dot via bf16 ones-matmul
  all2d_bf16  — 2D chain, bf16 products everywhere (halves vreg traffic)

MEASURED (5 interleaved reps, medians, us/batch marginal sweep):
  full 39.0 | dot_mxu_b16 39.3 | bf16_chain 27.6 | all2d 19.6 |
  all2d_bf16 20.5 | no_elem 13.6
The 1D-layout hypothesis CONFIRMED: the all-2D chain halves the sweep
(19.4 us of the 25.4 us no_elem delta recovered); the MXU dot alone
(dot_mxu_b16, still 1D operands) is neutral — it was never the
arithmetic, it was the [ch] 1D <-> [ch,k] relayouts.  f32 products
(all2d) edge out full-bf16 (all2d_bf16): adopt all2d.

Mode ``all2d`` (probe round 4) decomposes the adopted all-2D chain
(MEASURED medians, us/batch marginal sweep, ch=8192 unless noted):
  all2d 20.2 | no_dot 14.2 (-6.1) | no_prod 17.0 | no_fu 17.3 (-2.9) |
  no_acc 11.2 (-9.1) | no_elem 20.0 (-0.2) | ch=16384 18.1 | ch=4096 21.1
The aggregation matmul (onehot^T @ eff*ff, ch-dim contraction) is now
the largest sweep component (9.1 us, ~6x its MXU FLOP floor), then the
k-dim ones-matvec dot (6.1 us — N=1 pads to a full lane tile), then the
fu gather matmul (2.9).  The elementwise chain is ~free after all2d.
t2_abs includes the per-run relay round-trip (~250 us/batch at
N_BATCH=200), so "fixed" here is an upper bound — epoch-level timing
puts the true per-batch fixed cost at ~140 us (dispatch + XLA gather +
slice/update + t=0 kernel work); the batch-group kernel
(pallas_half_pass.half_pass_group) attacks that term.

Interleaved reps in one process.  Run from /root/repo on the TPU.
'''
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, W, CH = 1 << 14, 66, 128, 8192
REPS = 5
N_BATCH = 200


def make_kernel(variant):
    def kernel(mu_ref, win_ref, ff_ref, r_ref, m_ref, kl_ref, lrv_ref,
               regv_ref, out_ref, sse_ref, acc_ref, win_scr, oh_scr,
               cnt_scr):
        t = pl.program_id(0)
        j = pl.program_id(1)
        nt = pl.num_programs(0)
        nj = pl.num_programs(1)

        @pl.when((t == 0) & (j == 0))
        def _():
            win_scr[:] = win_ref[:]
            sse_ref[0, 0] = 0.0
            cnt_scr[:] = jnp.zeros_like(cnt_scr)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ff = ff_ref[:].astype(jnp.float32)
        kl = kl_ref[:]
        m = m_ref[:]
        ch = ff.shape[0]

        @pl.when(t == 0)
        def _():
            oh_scr[pl.ds(j * ch, ch), :] = (
                kl[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (ch, W), 1)).astype(jnp.bfloat16)
            cnt_scr[:] += jax.lax.dot_general(
                oh_scr[pl.ds(j * ch, ch), :],
                m[:, None].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        onehot = oh_scr[pl.ds(j * ch, ch), :]
        k = win_scr.shape[1]
        if variant == 'bf16_chain':
            ffb = ff_ref[:].astype(jnp.bfloat16)
            fu = jax.lax.dot_general(
                onehot, win_scr[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            prod = fu * ffb
            dot = jax.lax.dot_general(
                prod, jnp.ones((k, 1), jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]
            pred = jnp.clip(mu_ref[0, 0] + dot, 1.0, 5.0)
            err = (r_ref[:] - pred) * m
            acc_ref[:] += jax.lax.dot_general(
                onehot, err[:, None].astype(jnp.bfloat16) * ffb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            @pl.when(t == 0)
            def _():
                sse_ref[0, 0] += (err * err).sum()
        else:
            if variant == 'no_fu':
                fu = ff
            else:
                fu = jax.lax.dot_general(
                    onehot, win_scr[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if variant == 'no_elem':
                err = r_ref[:]
                eff = err
            elif variant == 'dot_mxu':
                dot = jax.lax.dot_general(
                    fu * ff, jnp.ones((k, 1), jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, 0]
                pred = jnp.clip(mu_ref[0, 0] + dot, 1.0, 5.0)
                err = (r_ref[:] - pred) * m
                eff = err
            elif variant == 'dot_mxu_b16':
                dot = jax.lax.dot_general(
                    (fu * ff).astype(jnp.bfloat16),
                    jnp.ones((k, 1), jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, 0]
                pred = jnp.clip(mu_ref[0, 0] + dot, 1.0, 5.0)
                err = (r_ref[:] - pred) * m
                eff = err
            else:
                dot = (fu * ff).sum(-1)
                pred = jnp.clip(mu_ref[0, 0] + dot, 1.0, 5.0)
                err = (r_ref[:] - pred) * m
                eff = err

            @pl.when(t == 0)
            def _():
                sse_ref[0, 0] += (err * err).sum()

            if variant == 'no_acc':
                acc_ref[:] += eff[0] * ff[:W, :] * 1e-6   # keep deps alive
            else:
                acc_ref[:] += jax.lax.dot_general(
                    onehot, (eff[:, None] * ff).astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(j == nj - 1)
        def _():
            cnt = cnt_scr[:]
            alive = (cnt > 0.0).astype(jnp.float32)
            reg = regv_ref[:][None, :] * win_scr[:]
            gsum = acc_ref[:] / jnp.maximum(cnt, 1.0) - reg * alive
            win_scr[:] = win_scr[:] + lrv_ref[:][None, :] * gsum

        @pl.when((t == nt - 1) & (j == nj - 1))
        def _():
            out_ref[:] = win_scr[:]
    return kernel


def make_kernel_2d(variant):
    '''All-2D variant: r/m/kl arrive as [ch, 1] columns; no [ch] 1D
    intermediate exists anywhere in the kernel.

    ohT variants (probe round 5 — the agg matmul is the largest sweep
    component at 9.1 us, ~6x its MXU FLOP floor; hypothesis: its
    ((0,),(0,)) ch-dim contraction costs a per-sweep operand relayout):
    build a SECOND, transposed one-hot scratch [W, ch] once per batch
    (t == 0, from klr [1, ch] row input — t-invariant, amortized over
    the T sweeps) so the aggregation runs as a natural-orientation
    ohT [W, ch] @ gops [ch, k] matmul with NO per-sweep transpose.'''
    ohT = 'ohT' in variant
    def kernel(mu_ref, win_ref, ff_ref, r_ref, m_ref, kl_ref, klr_ref,
               lrv_ref, regv_ref, out_ref, sse_ref, acc_ref, win_scr,
               oh_scr, ohT_scr, cnt_scr):
        t = pl.program_id(0)
        j = pl.program_id(1)
        nt = pl.num_programs(0)
        nj = pl.num_programs(1)

        @pl.when((t == 0) & (j == 0))
        def _():
            win_scr[:] = win_ref[:]
            sse_ref[0, 0] = 0.0
            cnt_scr[:] = jnp.zeros_like(cnt_scr)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        kl = kl_ref[:]                                  # [ch, 1]
        m = m_ref[:]                                    # [ch, 1]
        ch = kl.shape[0]
        k = win_scr.shape[1]

        @pl.when(t == 0)
        def _():
            oh_scr[pl.ds(j * ch, ch), :] = (
                kl == jax.lax.broadcasted_iota(
                    jnp.int32, (ch, W), 1)).astype(jnp.bfloat16)
            if ohT:
                ohT_scr[:, pl.ds(j * ch, ch)] = (
                    klr_ref[:] == jax.lax.broadcasted_iota(
                        jnp.int32, (W, ch), 0)).astype(jnp.bfloat16)
            cnt_scr[:] += jax.lax.dot_general(
                oh_scr[pl.ds(j * ch, ch), :], m.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        onehot = oh_scr[pl.ds(j * ch, ch), :]
        onehotT = ohT_scr[:, pl.ds(j * ch, ch)] if ohT else None
        if variant == 'all2d_bf16':
            ffb = ff_ref[:].astype(jnp.bfloat16)
            fu = jax.lax.dot_general(
                onehot, win_scr[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            prod = fu * ffb
        else:
            ffb = ff_ref[:].astype(jnp.float32)
            if variant == 'all2d_no_fu':
                fu = ffb
            else:
                fu = jax.lax.dot_general(
                    onehot, win_scr[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            prod = (fu * ffb).astype(jnp.bfloat16)
        if variant.startswith('all2d_sumk'):
            # keepdims lane-reduction instead of the ones-matvec: stays
            # 2D ([ch,k] -> [ch,1]), no MXU N=1 tile padding
            dot = (fu * ffb).sum(axis=1, keepdims=True)
        elif variant == 'all2d_no_dot':
            # delete just the k-dim ones-matvec; keep prod alive via a
            # single-lane read (timing only — math wrong by design)
            dot = prod[:, :1].astype(jnp.float32)
        elif variant == 'all2d_no_prod':
            # delete the [ch,k] elementwise product AND the matvec
            # (prod is unused -> DCE'd): dot from a single fu lane
            dot = fu[:, :1].astype(jnp.float32)
        else:
            dot = jax.lax.dot_general(
                prod, jnp.ones((k, 1), jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [ch, 1]
        if variant == 'all2d_no_elem':
            err = r_ref[:] + dot * 1e-6
        else:
            pred = jnp.clip(mu_ref[0, 0] + dot, 1.0, 5.0)
            err = (r_ref[:] - pred) * m                  # [ch, 1]

        @pl.when(t == 0)
        def _():
            sse_ref[0, 0] += (err * err).sum()

        if variant == 'all2d_bf16':
            gops = err.astype(jnp.bfloat16) * ffb
        else:
            gops = (err * ffb).astype(jnp.bfloat16)
        if variant == 'all2d_no_acc':
            acc_ref[:] += gops[:W, :].astype(jnp.float32) * 1e-6
        elif ohT:
            # natural orientation: contracting dim is minor on the lhs
            acc_ref[:] += jax.lax.dot_general(
                onehotT, gops,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[:] += jax.lax.dot_general(
                onehot, gops,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(j == nj - 1)
        def _():
            cnt = cnt_scr[:]
            alive = (cnt > 0.0).astype(jnp.float32)
            reg = regv_ref[:][None, :] * win_scr[:]
            gsum = acc_ref[:] / jnp.maximum(cnt, 1.0) - reg * alive
            win_scr[:] = win_scr[:] + lrv_ref[:][None, :] * gsum

        @pl.when((t == nt - 1) & (j == nj - 1))
        def _():
            out_ref[:] = win_scr[:]
    return kernel


def run_one(window, ff, r, m, kl, lrv, regv, variant, T, k, ch=CH):
    mu_arr = jnp.full((1, 1), 3.5, jnp.float32)
    if variant.startswith('all2d'):
        out, sse = pl.pallas_call(
            make_kernel_2d(variant),
            grid=(T, B // ch),
            in_specs=[
                pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((W, k), lambda t, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, k), lambda t, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, 1), lambda t, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, 1), lambda t, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, 1), lambda t, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ch), lambda t, j: (0, j),
                             memory_space=pltpu.VMEM),   # kl as a row
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
            scratch_shapes=[pltpu.VMEM((W, k), jnp.float32),
                            pltpu.VMEM((W, k), jnp.float32),
                            pltpu.VMEM((B, W), jnp.bfloat16),
                            pltpu.VMEM((W, B) if 'ohT' in variant
                                       else (8, 128), jnp.bfloat16),
                            pltpu.VMEM((W, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(mu_arr, window, ff, r[:, None], m[:, None], kl[:, None],
          kl[None, :], lrv, regv)
        return out, sse[0, 0]
    out, sse = pl.pallas_call(
        make_kernel(variant),
        grid=(T, B // CH),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((W, k), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, k), lambda t, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda t, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda t, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH,), lambda t, j: (j,),
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
        scratch_shapes=[pltpu.VMEM((W, k), jnp.float32),
                        pltpu.VMEM((W, k), jnp.float32),
                        pltpu.VMEM((B, W), jnp.bfloat16),
                        pltpu.VMEM((W, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mu_arr, window, ff, r, m, kl, lrv, regv)
    return out, sse[0, 0]


@functools.partial(jax.jit, static_argnames=('variant', 'T', 'k', 'ch'))
def run_chain(window, ff, r, m, kl, lrv, regv, variant, T, k, ch):
    '''N_BATCH serialized kernel calls: the window output feeds the next
    call, so the device cannot overlap or elide them; one dispatch.'''
    def step(win, _):
        out, sse = run_one(win, ff, r, m, kl, lrv, regv, variant, T, k,
                           ch)
        return out, sse
    win, sses = jax.lax.scan(step, window, None, length=N_BATCH)
    return win, sses.sum()


def time_case(data, variant, T, k, iters=5, ch=CH):
    window, ff, r, m, kl, lrv, regv = data[k]
    out, sse = run_chain(window, ff, r, m, kl, lrv, regv, variant, T, k,
                         ch)
    float(sse)
    best = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out, sse = run_chain(window, ff, r, m, kl, lrv, regv, variant,
                             T, k, ch)
        float(sse)
        float(out[0, 0])
        best.append(time.perf_counter() - t0)
    return min(best) / N_BATCH


def time_group(F, data66, T, G, lo_mod, iters=5, nsteps=None):
    '''Chain the PRODUCTION half_pass_group over nsteps groups (window
    carried through F, so calls serialize); per-BATCH time.'''
    from mfrec_tpu.ops.pallas_half_pass import half_pass_group
    window, ff, r, m, kl, lrv, regv = data66
    k = ff.shape[1]
    nsteps = nsteps or max(1, N_BATCH // G)
    rng = np.random.default_rng(1)
    lo = jnp.asarray(rng.integers(0, lo_mod, G).astype(np.int32))
    ffg = jnp.broadcast_to(ff, (G, B, k))
    rg = jnp.broadcast_to(r, (G, B))
    mg = jnp.broadcast_to(m, (G, B))
    klg = jnp.broadcast_to(kl, (G, B))

    @functools.partial(jax.jit, static_argnames=('T', 'G', 'nsteps'))
    def chain(F, T, G, nsteps):
        def step(Fc, _):
            Fc, sse = half_pass_group(Fc, ffg, rg, mg, klg, lo, lrv,
                                      regv, 3.5, W, chunk=CH,
                                      inner_steps=T)
            return Fc, sse
        F, sses = jax.lax.scan(step, F, None, length=nsteps)
        return F, sses.sum()

    out, sse = chain(F, T, G, nsteps)
    float(sse)
    best = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out, sse = chain(F, T, G, nsteps)
        float(sse)
        float(out[0, 0])
        best.append(time.perf_counter() - t0)
    return min(best) / (nsteps * G)


def grp_mode():
    '''Decompose the group kernel's marginal-sweep regression with the
    production kernel: vary G and the HBM factor-array size.'''
    rng = np.random.default_rng(0)
    data66 = tuple(jnp.asarray(x) for x in (
        rng.normal(0, 0.3, (W, 66)).astype(np.float32),
        rng.normal(0, 0.3, (B, 66)).astype(np.float32),
        rng.uniform(1, 5, B).astype(np.float32),
        np.ones(B, np.float32),
        np.sort(rng.integers(0, W, B)).astype(np.int32),
        np.full(66, 1e-4, np.float32),
        np.full(66, 0.02, np.float32)))
    Fbig = jnp.asarray(rng.normal(0, 0.3, (70136, 128)).astype(np.float32))
    Fsmall = jnp.asarray(rng.normal(0, 0.3, (512, 128)).astype(np.float32))
    cases = [('G8_bigF', Fbig, 8, 70000), ('G32_bigF', Fbig, 32, 70000),
             ('G8_smallF', Fsmall, 8, 384), ('G32_smallF', Fsmall, 32, 384)]
    res = {c[0]: [] for c in cases}
    for rep in range(REPS):
        for name, F, G, lo_mod in cases:
            t2 = time_group(F, data66, 2, G, lo_mod)
            t10 = time_group(F, data66, 10, G, lo_mod)
            marg = (t10 - t2) / 8
            res[name].append(marg)
            print('rep %d %-10s marginal %6.1f us/batch  t2_abs %6.1f'
                  % (rep, name, marg * 1e6, t2 * 1e6), flush=True)
    print()
    for name, _, _, _ in cases:
        print('%-10s median marginal %6.1f us/batch'
              % (name, statistics.median(res[name]) * 1e6))


if __name__ == '__main__':
    rng = np.random.default_rng(0)
    data = {}
    for k in (64, 66, 128):
        data[k] = tuple(jnp.asarray(x) for x in (
            rng.normal(0, 0.3, (W, k)).astype(np.float32),
            rng.normal(0, 0.3, (B, k)).astype(np.float32),
            rng.uniform(1, 5, B).astype(np.float32),
            np.ones(B, np.float32),
            np.sort(rng.integers(0, W, B)).astype(np.int32),
            np.full(k, 0.1, np.float32),
            np.full(k, 0.02, np.float32)))
    mode = sys.argv[1] if len(sys.argv) > 1 else ''
    if mode == 'grp':
        grp_mode()
        sys.exit(0)
    if mode == 'hiT':
        # The T-ladder epochs measure a marginal sweep of ~24 us/batch
        # (t32->t64 differencing) while the T=2->10 probe says ~15 —
        # either the in-kernel marginal grows with T (VMEM/pipelining
        # effect) or the low-T differencing hides overhead under DMA
        # overlap.  Chain the PRODUCTION kernel (shipped options) at
        # T=8/32/64 x ch=8k/16k and difference adjacent rungs.
        from mfrec_tpu.ops.pallas_half_pass import half_pass_batch
        window, ff, r, m, kl, lrv, regv = data[66]
        ffb = ff.astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=('T', 'ch'))
        def chain_prod(win, T, ch):
            def step(w, _):
                out, sse = half_pass_batch(
                    w, ffb, r, m, kl, lrv, regv, 3.5, W, chunk=ch,
                    inner_steps=T, cache_onehot=True, all2d=True,
                    dot_sum=True)
                return out, sse
            w, sses = jax.lax.scan(step, win, None, length=N_BATCH)
            return w, sses.sum()

        def time_prod(T, ch, iters=5):
            out, sse = chain_prod(window, T, ch)
            float(sse)
            best = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out, sse = chain_prod(window, T, ch)
                float(sse)
                float(out[0, 0])
                best.append(time.perf_counter() - t0)
            return min(best) / N_BATCH

        res = {}
        for rep in range(3):
            for ch in (8192, 16384):
                ts = {T: time_prod(T, ch) for T in (8, 32, 64)}
                m8_32 = (ts[32] - ts[8]) / 24
                m32_64 = (ts[64] - ts[32]) / 32
                res.setdefault(ch, []).append((m8_32, m32_64))
                print('rep %d ch=%-5d t8 %7.1f t32 %7.1f t64 %7.1f us '
                      ' marg(8-32) %5.1f  marg(32-64) %5.1f us/batch'
                      % (rep, ch, ts[8] * 1e6, ts[32] * 1e6,
                         ts[64] * 1e6, m8_32 * 1e6, m32_64 * 1e6),
                      flush=True)
        for ch, v in res.items():
            print('ch=%-5d median marg(8-32) %5.1f  marg(32-64) %5.1f'
                  % (ch, statistics.median(x[0] for x in v) * 1e6,
                     statistics.median(x[1] for x in v) * 1e6))
        sys.exit(0)
    if mode == 'fix':
        cases = [('full', 66, CH), ('dot_mxu_b16', 66, CH),
                 ('bf16_chain', 66, CH), ('all2d', 66, CH),
                 ('all2d_bf16', 66, CH), ('no_elem', 66, CH)]
    elif mode == 'dot':
        cases = [('all2d', 66, CH), ('all2d_sumk', 66, CH)]
    elif mode == 'ohT':
        # probe round 5: transposed-onehot aggregation (built once per
        # batch at t==0) vs the shipped ((0,),(0,)) contraction
        cases = [('all2d_sumk', 66, CH), ('all2d_sumk_ohT', 66, CH),
                 ('all2d_ohT', 66, CH), ('all2d_sumk', 64, CH),
                 ('all2d_sumk_ohT', 64, CH)]
    elif mode == 'all2d':
        # decompose the remaining all2d sweep + chunk-size axis (per-
        # grid-step overhead shows up as a win at ch=16384 / loss at 4096)
        cases = [('all2d', 66, CH), ('all2d_no_dot', 66, CH),
                 ('all2d_no_prod', 66, CH), ('all2d_no_fu', 66, CH),
                 ('all2d_no_acc', 66, CH), ('all2d_no_elem', 66, CH),
                 ('all2d', 66, B), ('all2d', 66, 4096)]
    else:
        cases = [('full', 66, CH), ('no_fu', 66, CH), ('no_acc', 66, CH),
                 ('no_elem', 66, CH), ('full', 64, CH), ('full', 128, CH)]
    res = {c: [] for c in cases}
    abs2 = {c: [] for c in cases}
    for rep in range(REPS):
        for c in cases:
            v, k, ch = c
            t2 = time_case(data, v, 2, k, ch=ch)
            t10 = time_case(data, v, 10, k, ch=ch)
            marg = (t10 - t2) / 8
            res[c].append(marg)
            abs2[c].append(t2)
            print('rep %d %-14s k=%-3d ch=%-5d marginal %6.1f us/batch'
                  '  t2_abs %6.1f us' % (rep, v, k, ch, marg * 1e6,
                                         t2 * 1e6), flush=True)
    print()
    base = statistics.median(res[cases[0]])
    for c in cases:
        med = statistics.median(res[c])
        t2m = statistics.median(abs2[c])
        print('%-14s k=%-3d ch=%-5d median %6.1f us/batch (delta vs %s'
              ' %.1f us)  t2_abs %6.1f (fixed ~%.1f)'
              % (c[0], c[1], c[2], med * 1e6, cases[0][0],
                 (base - med) * 1e6, t2m * 1e6, (t2m - 2 * med) * 1e6))
