'''Interleaved A/B bench for the alternating tier.

The relay/chip drifts ~20% across hours (CLAUDE.md), so one-shot config
comparisons are meaningless; this alternates timed blocks of two configs
in one process (within-run spread measured +-0.3%).  Edit the ab() calls
at the bottom for the configs under test; run from the repo root:

    python tools/ab_bench.py
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import bench
from mfrec_tpu.ops import sgd_mf

U, I, N, K = 69878, 10677, 10_000_000, 64
BATCH = 1 << 15
INNER = 4


def build(window, batch, locality_sort, inner=INNER, chunk=4096,
          resident=False, ff_dtype=None, cache_onehot=False, all2d=False,
          group=0, dot_sum=False, group_resident=False, probe_ff=None,
          gather_group=0, tloop=False):
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='user',
                                    max_window=window,
                                    locality_sort=locality_sort)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='item',
                                    max_window=window,
                                    locality_sort=locality_sort)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, K, feature_init=0.05,
                           mode='normal')
    Paug, Qaug = sgd_mf.augment_factors(
        st.P, st.Q, jnp.asarray(np.pad(bu_fit, (0, W_user))),
        jnp.asarray(np.pad(bi_fit, (0, W_item))))
    ep = sgd_mf.make_alternating_epoch(
        W_user, W_item, lr=0.15, K=0.02, bias_mode='fixed',
        inner_steps=inner, chunk=chunk, use_pallas_full=True, donate=False,
        pallas_resident=resident, ff_dtype=ff_dtype,
        pallas_cache_onehot=cache_onehot, pallas_all2d=all2d,
        pallas_group=group, pallas_dot_sum=dot_sum,
        pallas_group_resident=group_resident, probe_ff=probe_ff,
        pallas_gather_group=gather_group, pallas_tloop=tloop)
    return ep, (Paug, Qaug), p_layout, q_layout


def build_implicit(use_pallas, window=256, batch=1 << 15, inner=4,
                   chunk=None, lr=0.15):
    '''SVD++ alternating-implicit epoch at the bench operating point
    (W=256/B=32k — the plain tier's W=128 diverges here).  chunk
    defaults to the builder's 4096 (AB_CHUNK overrides: chunk=B rides
    the one-grid-step-per-sweep win on the Pallas base; tloop stays
    auto-gated OFF at this shape — [B,1] columns OOM VMEM at B=32k).'''
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='user',
                                    max_window=window)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='item',
                                    max_window=window)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, K, feature_init=0.05,
                           mode='normal')
    Paug, Qaug = sgd_mf.augment_factors(
        st.P, st.Q, jnp.asarray(np.pad(bu_fit, (0, W_user))),
        jnp.asarray(np.pad(bi_fit, (0, W_item))))
    Ypad = jnp.zeros((I + W_item, K), jnp.float32)
    counts = np.bincount(users, minlength=U).astype(np.float32)
    nrm = np.zeros(U + W_user, np.float32)
    nrm[:U] = np.where(counts > 0,
                       1.0 / np.sqrt(np.maximum(counts, 1.0)), 0.0)
    nrm_rows = jnp.asarray(nrm)
    kw = {}
    if chunk is not None:
        kw['chunk'] = chunk
    ep = sgd_mf.make_alternating_implicit_epoch(
        W_user, W_item, lr=lr, lr_y=0.05, K=0.02, K_y=0.02,
        inner_steps=inner, use_pallas_full=use_pallas, ff_dtype=None,
        donate=False, **kw)
    return ep, (Paug, Qaug, Ypad), p_layout, q_layout, nrm_rows


def ab_implicit(blocks=4):
    inner = int(os.environ.get('AB_T', 4))
    chunk = os.environ.get('AB_CHUNK')
    chunk = int(chunk) if chunk else None
    print('(inner_steps=%d both sides, pallas chunk=%s)' % (inner, chunk))
    ep_a, st_a, pa, qa, nrm = build_implicit(False, inner=inner)
    ep_b, st_b, pb, qb, _ = build_implicit(True, inner=inner, chunk=chunk)

    def blk(ep, st, pl, ql, epochs=3):
        Pa, Qa, Yp = st
        t0 = time.perf_counter()
        for _ in range(epochs):
            Pa, Qa, Yp, rmse = ep(Pa, Qa, Yp, mu, pl, ql, nrm)
        r = float(rmse)
        return (time.perf_counter() - t0) / epochs, (Pa, Qa, Yp), r
    _, st_a, _ = blk(ep_a, st_a, pa, qa, epochs=1)
    _, st_b, _ = blk(ep_b, st_b, pb, qb, epochs=1)
    ta, tb = [], []
    ra = rb = None
    for _ in range(blocks):
        dt, st_a, ra = blk(ep_a, st_a, pa, qa)
        ta.append(dt)
        dt, st_b, rb = blk(ep_b, st_b, pb, qb)
        tb.append(dt)
    print('xla:    %s  median %.4f  rmse %.4f'
          % ([round(x, 4) for x in ta], float(np.median(ta)), ra))
    print('pallas: %s  median %.4f  rmse %.4f'
          % ([round(x, 4) for x in tb], float(np.median(tb)), rb))


def build_kmf(inner, chunk=8192, window=128, batch=1 << 14):
    '''KMF logistic-link epoch exactly as bench.py BENCH_MODE=kmf builds
    it (learned aug-column biases, clamp off, sigmoid chain in-kernel).'''
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='user',
                                    max_window=window)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, batch, axis='item',
                                    max_window=window)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, K, feature_init=0.05,
                           mode='normal')
    Paug, Qaug = sgd_mf.augment_factors(
        st.P, st.Q, jnp.zeros(U + W_user, jnp.float32),
        jnp.zeros(I + W_item, jnp.float32))
    ep = sgd_mf.make_alternating_epoch(
        W_user, W_item, lr=0.15, K=0.02, lr_bu=0.05, lr_bi=0.05,
        bias_mode='learned', clamp_pred=False, link='logistic',
        inner_steps=inner, chunk=chunk, use_pallas_full=True,
        donate=False, ff_dtype='bfloat16')
    return ep, (Paug, Qaug), p_layout, q_layout


def ab_kmf(name_a, inner_a, name_b, inner_b, blocks=3):
    '''Interleaved KMF-epoch A/B (mu=0 — the logistic link carries the
    level through the learned aug biases).'''
    ep_a, st_a, pa, qa = build_kmf(inner_a)
    ep_b, st_b, pb, qb = build_kmf(inner_b)
    mu0 = jnp.float32(0.0)

    def blk(ep, st, pl, ql, epochs=3):
        Pa, Qa = st
        t0 = time.perf_counter()
        for _ in range(epochs):
            Pa, Qa, rmse = ep(Pa, Qa, mu0, pl, ql)
        r = float(rmse)
        return (time.perf_counter() - t0) / epochs, (Pa, Qa), r
    _, st_a, _ = blk(ep_a, st_a, pa, qa, epochs=1)
    _, st_b, _ = blk(ep_b, st_b, pb, qb, epochs=1)
    ta, tb = [], []
    ra = rb = None
    for _ in range(blocks):
        dt, st_a, ra = blk(ep_a, st_a, pa, qa)
        ta.append(dt)
        dt, st_b, rb = blk(ep_b, st_b, pb, qb)
        tb.append(dt)
    print('%s: %s  median %.4f  rmse %.4f'
          % (name_a, [round(x, 4) for x in ta], float(np.median(ta)), ra))
    print('%s: %s  median %.4f  rmse %.4f'
          % (name_b, [round(x, 4) for x in tb], float(np.median(tb)), rb))


def run_block(ep, state, pl, ql, epochs=3):
    Pa, Qa = state
    t0 = time.perf_counter()
    for _ in range(epochs):
        Pa, Qa, rmse = ep(Pa, Qa, mu, pl, ql)
    float(rmse)
    return (time.perf_counter() - t0) / epochs, (Pa, Qa)


def ab(name_a, cfg_a, name_b, cfg_b, blocks=4):
    ep_a, st_a, pa, qa = build(*cfg_a)
    ep_b, st_b, pb, qb = build(*cfg_b)
    # compile both
    _, st_a = run_block(ep_a, st_a, pa, qa, epochs=1)
    _, st_b = run_block(ep_b, st_b, pb, qb, epochs=1)
    ta, tb = [], []
    for _ in range(blocks):
        dt, st_a = run_block(ep_a, st_a, pa, qa)
        ta.append(dt)
        dt, st_b = run_block(ep_b, st_b, pb, qb)
        tb.append(dt)
    print('%s: %s  median %.4f' % (name_a, [round(x, 4) for x in ta],
                                   float(np.median(ta))))
    print('%s: %s  median %.4f' % (name_b, [round(x, 4) for x in tb],
                                   float(np.median(tb))))


if __name__ == '__main__':
    # data build is deliberately inside the guard: importing this module
    # must not trigger a 10M-rating generation + TPU runs
    mode = os.environ.get('AB', 'default')
    if mode.startswith('netflix'):
        # Netflix-prize shape (bench.py config 5): the rank-128 one-hot
        # matmuls are the suspected bottleneck there (ROADMAP r2), so
        # the window/chunk optimum may sit elsewhere than rank 64's
        U, I, N, K = 480_189, 17_770, 100_000_000, 128
    users, items, vals = bench.make_data(U, I, N)
    floor, bu_fit, bi_fit = bench.bias_floor_rmse(users, items, vals, U, I)
    mu = jnp.float32(vals.mean())
    if mode == 'netflix_window':
        # Netflix rank 128: wider window halves the number of one-hot
        # aggregation matmuls per batch at 2x their [ch, W] width
        print('--- Netflix r128 A/B: W=128/B=16k vs W=256/B=32k '
              '(T=8, chunk=8k, bf16 ff)')
        ab('w128', (128, 1 << 14, False, 8, 8192, False, 'bfloat16'),
           'w256', (256, 1 << 15, False, 8, 8192, False, 'bfloat16'),
           blocks=3)
    elif mode == 'netflix_chunk':
        print('--- Netflix r128 A/B: chunk 8192 vs 4096 (W=128/B=16k, T=8)')
        ab('c8192', (128, 1 << 14, False, 8, 8192, False, 'bfloat16'),
           'c4096', (128, 1 << 14, False, 8, 4096, False, 'bfloat16'),
           blocks=3)
    elif mode == 'resident_cached':
        # headline config (W=128/B=16k/chunk=8k/T=8/bf16 ff): the chunked
        # grid vs the resident variant with the t-invariant onehot cached
        # in VMEM scratch (r3: attacks the marginal-sweep onehot build)
        print('--- A/B: full-grid vs resident+onehot-cache (T=8, bf16 ff)')
        ab('full', (128, BATCH // 2, False, 8, 8192, False, 'bfloat16'),
           'res_cache', (128, BATCH // 2, False, 8, 8192, True, 'bfloat16'))
    elif mode == 'all2d':
        # headline config: the 1D-chain kernel vs the all-2D chain
        # ([B,1] columns, MXU ones-matvec dot — kernel_probe r3 measured
        # the marginal sweep 39 -> 20 us/batch; this is the epoch-level
        # adoption A/B)
        print('--- A/B: 1D chain vs all2d (T=8, chunk=8k, bf16 ff, '
              'onehot cache)')
        ab('chain1d',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True),
           'all2d',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True))
    elif mode == 'netflix_all2d':
        print('--- Netflix r128 A/B: 1D chain vs all2d (T=8, chunk=8k, '
              'bf16 ff, onehot cache)')
        ab('chain1d',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True),
           'all2d',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True),
           blocks=3)
    elif mode == 'implicit':
        # SVD++ tier: XLA half-pass base vs the fused Pallas kernel —
        # re-decided after all2d+dot_sum (r2 negative: 0.652 vs 0.463
        # pre-all2d; the kernel is now ~1.8x faster per sweep).  RMSE
        # printed: bf16/bf16-rounding sensitivity of the Y-coupled
        # trajectory decides too, not just rate.
        print('--- A/B: implicit XLA base vs fused Pallas (T=4, W=256, '
              'B=32k)')
        ab_implicit()
    elif mode == 'netflix_dotsum':
        # rank 128: the k-dim lane-reduction is 2x wider — re-decide
        # dot_sum at Netflix shape (one-shot benches drift-ambiguous)
        print('--- Netflix r128 A/B: matvec dot vs keepdims-sum dot '
              '(T=8, chunk=8k, bf16 ff)')
        ab('matvec',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True),
           'sumk',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True),
           blocks=3)
    elif mode == 'ggroup':
        # grouped ff gather: ONE gather op per G batches feeding G
        # per-batch fused kernel calls — attacks the ~15 us/batch
        # gather-op dispatch + scan-step overhead (AB=fixed_decomp)
        # without the batch-group KERNEL's slow grid (definitive
        # negative, ROADMAP r4)
        print('--- A/B: per-batch gather vs gather-group G=8 '
              '(T=8, chunk=8k, bf16 ff, dot_sum)')
        ab('per-batch',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True),
           'ggroup8',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True, False, None, 8))
    elif mode == 'ggroup_g':
        print('--- A/B: gather-group G=4 vs G=16 (T=8, chunk=8k, '
              'bf16 ff, dot_sum)')
        ab('ggroup4',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True, False, None, 4),
           'ggroup16',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True, False, None, 16))
    elif mode == 't32':
        # T=16 adopted (+19%); sweeps past 8 cost ~24 us/batch — check
        # whether 32 keeps amortizing (quality via BENCH_INNER=32)
        print('--- A/B: T=16 vs T=32 (all2d+dot_sum, chunk=8k, bf16 ff)')
        ab('t16',
           (128, BATCH // 2, False, 16, 8192, False, 'bfloat16', True, True,
            0, True),
           't32',
           (128, BATCH // 2, False, 32, 8192, False, 'bfloat16', True, True,
            0, True),
           blocks=3)
    elif mode == 't64':
        # definitive stop-evidence for the T ladder (measured: still
        # +5.5% — the marginal sweep is constant ~24 us/batch)
        print('--- A/B: T=32 vs T=64 (all2d+dot_sum, chunk=8k, bf16 ff)')
        ab('t32',
           (128, BATCH // 2, False, 32, 8192, False, 'bfloat16', True, True,
            0, True),
           't64',
           (128, BATCH // 2, False, 64, 8192, False, 'bfloat16', True, True,
            0, True),
           blocks=3)
    elif mode == 'netflix_t64':
        # close the ladder at Netflix shape too (ML-10M T=64 is +5.5%
        # and the marginal sweep is constant ~24 us/batch there;
        # quality via BENCH_MODE=netflix BENCH_INNER=64)
        print('--- Netflix r128 A/B: T=32 vs T=64 (all2d+matvec dot, '
              'chunk=8k, bf16 ff)')
        ab('t32',
           (128, BATCH // 2, False, 32, 8192, False, 'bfloat16', True, True),
           't64',
           (128, BATCH // 2, False, 64, 8192, False, 'bfloat16', True, True),
           blocks=3)
    elif mode == 'netflix_t32':
        # T=32 wins at ML-10M (+10.6%, RMSE 0.311): re-decide at
        # Netflix rank 128 (quality via BENCH_MODE=netflix BENCH_INNER=32)
        print('--- Netflix r128 A/B: T=16 vs T=32 (all2d+matvec dot, '
              'chunk=8k, bf16 ff)')
        ab('t16',
           (128, BATCH // 2, False, 16, 8192, False, 'bfloat16', True, True),
           't32',
           (128, BATCH // 2, False, 32, 8192, False, 'bfloat16', True, True),
           blocks=3)
    elif mode == 'netflix_t16':
        # T=16 wins +19% updates/s at ML-10M rank 64 (AB=t16 + the
        # BENCH_INNER=16 bench: 0.572 s/epoch, RMSE 0.339) — re-decide
        # at Netflix rank 128 where the marginal sweep is ~2x wider
        print('--- Netflix r128 A/B: T=8 vs T=16 (all2d+matvec dot, '
              'chunk=8k, bf16 ff)')
        ab('t8',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True),
           't16',
           (128, BATCH // 2, False, 16, 8192, False, 'bfloat16', True, True),
           blocks=3)
    elif mode == 'netflix_dotsplit':
        # rank 128 + 2 aug cols = 130 lanes: the naive keepdims-sum
        # loses to the matvec (-6.4%, netflix_dotsum), but a per-vreg
        # split reduction (128-lane group + 2-lane tail) avoids the
        # masked cross-vreg tree — re-decide the dot at Netflix shape
        print('--- Netflix r128 A/B: matvec dot vs SPLIT keepdims-sum '
              '(T=8, chunk=8k, bf16 ff)')
        ab('matvec',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True),
           'split',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, 'split'),
           blocks=3)
    elif mode == 'netflix_dotsplit_tloop':
        # the r4 self-review found the original AB=netflix_dotsplit
        # measured NOTHING (bool(dot_sum) coerced 'split' to the plain
        # keepdims-sum on the grid path) — re-decide split vs matvec at
        # k=130 on the SHIPPED tloop kernel, where the string always
        # reached the dot
        print('--- Netflix r128 A/B: matvec dot vs SPLIT keepdims-sum '
              '(tloop, T=64, bf16 ff)')
        ab('matvec',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           'split',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, 'split', False, None, 0, True),
           blocks=3)
    elif mode == 't16':
        # marginal sweep is now ~15 us (all2d+dot_sum): re-check whether
        # more in-VMEM sweeps amortize further (rate only; quality at
        # higher T validated separately via BENCH_INNER)
        print('--- A/B: T=8 vs T=16 (all2d+dot_sum, chunk=8k, bf16 ff)')
        ab('t8',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True),
           't16',
           (128, BATCH // 2, False, 16, 8192, False, 'bfloat16', True, True,
            0, True))
    elif mode == 'dotsum':
        # all2d dot via bf16 ones-matvec vs f32 keepdims lane-reduction
        # (probe: 19.3 vs 15.0 us/sweep; sum is also numerically better)
        print('--- A/B: all2d matvec dot vs keepdims-sum dot (T=8, '
              'chunk=8k, bf16 ff)')
        ab('matvec',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True),
           'sumk',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True))
    elif mode == 'group':
        # scanned per-batch pallas_calls vs the batch-group kernel
        # (G batches / call, HBM factors + in-kernel window DMA at
        # scalar-prefetched offsets): amortizes per-batch dispatch,
        # scan-step overhead and the dynamic slice/update pair
        print('--- A/B: all2d scanned vs group G=64 (T=8, chunk=8k, '
              'bf16 ff, dot_sum both sides)')
        ab('scanned',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True),
           'group64',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            64, True))
    elif mode == 'group_res':
        # r4: scanned per-batch kernel vs the RESIDENT-style group
        # kernel (grid (g,t), whole-batch VMEM blocks per g, pipelined
        # ff prefetch, unrolled chunk loop) — targets the two suspected
        # causes of the r3 chunked-group regression
        print('--- A/B: all2d scanned vs group-RESIDENT G=64 (T=8, '
              'chunk=8k, bf16 ff, dot_sum both sides)')
        ab('scanned',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            0, True),
           'group64_res',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            64, True, True))
    elif mode == 'group_res_vs_chunked':
        print('--- A/B: chunked group G=64 vs RESIDENT group G=64')
        ab('group64',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            64, True),
           'group64_res',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            64, True, True))
    elif mode == 'fixed_decomp':
        # decompose the ~155 us/batch per-epoch FIXED cost (epoch(T) is
        # fixed + T*sweep; run at T=2 so fixed dominates).  The group
        # kernels removed dispatch + slice/update and the fixed cost did
        # NOT move (group_res A/B) — suspect the random ff row gather.
        # TIMING-ONLY variants: seq = sequential-index gather (locality),
        # bcast = no gather at all (one-row broadcast).
        print('--- fixed-cost decomp at T=2: default vs seq-gather vs '
              'no-gather (W=128, B=16k, chunk=8k, bf16 ff, dot_sum)')
        base = (128, BATCH // 2, False, 2, 8192, False, 'bfloat16', True,
                True, 0, True, False)
        cfgs = [('default', base + (None,)),
                ('seq_gather', base + ('seq',)),
                ('no_gather', base + ('bcast',))]
        built = [(nm, *build(*cfg)) for nm, cfg in cfgs]
        built = [(nm, ep, run_block(ep, st, pl_, ql_, epochs=1)[1], pl_,
                  ql_) for nm, ep, st, pl_, ql_ in built]
        times = {nm: [] for nm, *_ in built}
        for _ in range(4):
            for i, (nm, ep, st, pl_, ql_) in enumerate(built):
                dt, st = run_block(ep, st, pl_, ql_)
                built[i] = (nm, ep, st, pl_, ql_)
                times[nm].append(dt)
        for nm, *_ in built:
            print('%s: %s  median %.4f'
                  % (nm, [round(x, 4) for x in times[nm]],
                     float(np.median(times[nm]))))
    elif mode == 'gather_pad':
        # fixed_decomp found the random ff gather = ~49 us/batch (~18% of
        # the T=8 epoch).  Hypothesis: unaligned 132 B bf16 rows waste
        # HBM transactions; gathering from a 128-lane-padded fixed side
        # (256 B aligned rows) should cut it even with the slice-back copy.
        print('--- A/B: default vs pad128-gather (T=2 and T=8, W=128, '
              'B=16k, chunk=8k, bf16 ff, dot_sum)')
        base2 = (128, BATCH // 2, False, 2, 8192, False, 'bfloat16', True,
                 True, 0, True, False)
        ab('default_t2', base2 + (None,), 'pad128_t2', base2 + ('pad128',))
        base8 = (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True,
                 True, 0, True, False)
        ab('default_t8', base8 + (None,), 'pad128_t8', base8 + ('pad128',))
    elif mode == 'group_res_t':
        # marginal-sweep extraction for the resident group kernel
        print('--- A/B: group64_res T=2 vs T=10 (chunk=8k, bf16 ff)')
        ab('g64res_t2',
           (128, BATCH // 2, False, 2, 8192, False, 'bfloat16', True, True,
            64, True, True),
           'g64res_t10',
           (128, BATCH // 2, False, 10, 8192, False, 'bfloat16', True, True,
            64, True, True))
    elif mode == 'netflix_group_res':
        # Netflix rank 128 (k=130 with bias cols): matvec dot both sides
        # (keepdims-sum loses when rows span 2 vregs — r3 A/B), scanned
        # per-batch kernel vs the resident group kernel
        print('--- Netflix r128 A/B: all2d scanned vs group-RESIDENT '
              'G=64 (T=8, chunk=8k, bf16 ff, matvec dot)')
        ab('scanned',
           (128, 1 << 14, False, 8, 8192, False, 'bfloat16', True, True),
           'group64_res',
           (128, 1 << 14, False, 8, 8192, False, 'bfloat16', True, True,
            64, False, True),
           blocks=3)
    elif mode == 'group_g':
        print('--- A/B: group G=16 vs G=64 (T=8, chunk=8k, bf16 ff)')
        ab('g16',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            16),
           'g64',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True, True,
            64))
    elif mode == 'group_t':
        # marginal-sweep extraction for the group kernel: epoch(T=10) -
        # epoch(T=2) over 8 sweeps x n_batches gives its per-sweep cost;
        # the T=2 intercept bounds its per-batch fixed cost
        print('--- A/B: group64 T=2 vs T=10 (chunk=8k, bf16 ff)')
        ab('g64_t2',
           (128, BATCH // 2, False, 2, 8192, False, 'bfloat16', True, True,
            64),
           'g64_t10',
           (128, BATCH // 2, False, 10, 8192, False, 'bfloat16', True, True,
            64))
    elif mode == 't64chunk':
        # At T=64 the per-sweep grid overhead is ~60% of the marginal
        # cost (in-kernel probe 15 us vs in-epoch 24 us/batch).
        # chunk=B collapses the grid to (T, 1): one grid step per sweep
        # and the ff block index map becomes constant, so ff is fetched
        # once per batch instead of re-streamed per sweep (probe:
        # ch=16384 18.1 vs ch=8192 20.2 us/sweep at T=2/10).
        print('--- A/B: T=64 chunk=8k vs chunk=16k (=B, all2d+dot_sum, '
              'bf16 ff)')
        ab('c8k',
           (128, BATCH // 2, False, 64, 8192, False, 'bfloat16', True, True,
            0, True),
           'c16k',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', True, True,
            0, True),
           blocks=3)
    elif mode == 'netflix_t64chunk':
        # same chunk=B question at the Netflix rank-128 shape (matvec
        # dot — the k<=128 dot_sum gate keeps sumk off there)
        print('--- Netflix r128 A/B: T=64 chunk=8k vs chunk=16k (=B, '
              'all2d, bf16 ff)')
        ab('c8k',
           (128, BATCH // 2, False, 64, 8192, False, 'bfloat16', True, True),
           'c16k',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', True,
            True),
           blocks=3)
    elif mode == 'kmf_ladder':
        # KMF logistic T ladder (quality at T=16 already probed good:
        # BENCH_MODE=kmf BENCH_INNER=16 → RMSE 0.358 < floor); this is
        # the interleaved RATE check gating a higher KMF default
        print('--- KMF logistic A/B: T=8 vs T=16 (chunk=8k, bf16 ff)')
        ab_kmf('t8', 8, 't16', 16)
        print('--- KMF logistic A/B: T=16 vs T=32 (chunk=8k, bf16 ff)')
        ab_kmf('t16', 16, 't32', 32)
    elif mode == 'kmf_t64':
        print('--- KMF logistic A/B: T=32 vs T=64 (tloop, bf16 ff)')
        ab_kmf('t32', 32, 't64', 64)
    elif mode == 'kmf_t128':
        # the t64 rung measured +8.4% and projected T=128 at +4.5%;
        # the explicit tiers adopted their 128 rungs at +5.9/+6.7%, so
        # measure rather than trust the projection (adopt at >=5% with
        # a monotone quality gate, same standard as every other rung)
        print('--- KMF logistic A/B: T=64 vs T=128 (tloop, bf16 ff)')
        ab_kmf('t64', 64, 't128', 128)
    elif mode == 'implicit_ladder':
        # SVD++ tier: does the XLA alternating-implicit epoch amortize
        # more inner sweeps the way the Pallas tier does?  (default T=4)
        t_a = int(os.environ.get('AB_TA', 4))
        t_b = int(os.environ.get('AB_TB', 8))
        print('--- SVD++ A/B: T=%d vs T=%d (XLA base, W=256/B=32k)'
              % (t_a, t_b))
        ep_a, st_a, pa, qa, nrm = build_implicit(False, inner=t_a)
        ep_b, st_b, pb, qb, _ = build_implicit(False, inner=t_b)

        def blk(ep, st, pl, ql, epochs=3):
            Pa, Qa, Yp = st
            t0 = time.perf_counter()
            for _ in range(epochs):
                Pa, Qa, Yp, rmse = ep(Pa, Qa, Yp, mu, pl, ql, nrm)
            r = float(rmse)
            return (time.perf_counter() - t0) / epochs, (Pa, Qa, Yp), r
        _, st_a, _ = blk(ep_a, st_a, pa, qa, epochs=1)
        _, st_b, _ = blk(ep_b, st_b, pb, qb, epochs=1)
        ta, tb = [], []
        ra = rb = None
        for _ in range(3):
            dt, st_a, ra = blk(ep_a, st_a, pa, qa)
            ta.append(dt)
            dt, st_b, rb = blk(ep_b, st_b, pb, qb)
            tb.append(dt)
        print('t%d: %s  median %.4f  rmse %.4f'
              % (t_a, [round(x, 4) for x in ta], float(np.median(ta)), ra))
        print('t%d: %s  median %.4f  rmse %.4f'
              % (t_b, [round(x, 4) for x in tb], float(np.median(tb)), rb))
    elif mode == 'implicit_chunk':
        # now that the implicit tier rides the Pallas base (AB=implicit
        # AB_T=32 +36.8%), does its grid want bigger chunks?  (chunk=B
        # won +26.2% on the explicit tier; tloop is auto-gated OFF at
        # W=256/B=32k, so the (T, B/ch) grid is what's tuned here)
        inner = int(os.environ.get('AB_T', 32))
        c_a = int(os.environ.get('AB_CA', 4096))
        c_b = int(os.environ.get('AB_CB', 8192))
        print('--- SVD++ Pallas-base A/B: chunk=%d vs %d (T=%d, W=256, '
              'B=32k)' % (c_a, c_b, inner))
        ep_a, st_a, pa, qa, nrm = build_implicit(True, inner=inner,
                                                 chunk=c_a)
        ep_b, st_b, pb, qb, _ = build_implicit(True, inner=inner,
                                               chunk=c_b)

        def blk(ep, st, pl, ql, epochs=3):
            Pa, Qa, Yp = st
            t0 = time.perf_counter()
            for _ in range(epochs):
                Pa, Qa, Yp, rmse = ep(Pa, Qa, Yp, mu, pl, ql, nrm)
            r = float(rmse)
            return (time.perf_counter() - t0) / epochs, (Pa, Qa, Yp), r
        _, st_a, _ = blk(ep_a, st_a, pa, qa, epochs=1)
        _, st_b, _ = blk(ep_b, st_b, pb, qb, epochs=1)
        ta, tb = [], []
        ra = rb = None
        for _ in range(4):
            dt, st_a, ra = blk(ep_a, st_a, pa, qa)
            ta.append(dt)
            dt, st_b, rb = blk(ep_b, st_b, pb, qb)
            tb.append(dt)
        print('c%d: %s  median %.4f  rmse %.4f'
              % (c_a, [round(x, 4) for x in ta], float(np.median(ta)), ra))
        print('c%d: %s  median %.4f  rmse %.4f'
              % (c_b, [round(x, 4) for x in tb], float(np.median(tb)), rb))
    elif mode == 't64tloop':
        # in-kernel fori over T (no pallas grid) vs the (T, 1) grid at
        # chunk=B: isolates the per-sweep Mosaic grid-step transition
        print('--- A/B: T=64 chunk=16k grid vs tloop (all2d+dot_sum, '
              'bf16 ff)')
        ab('grid',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', True, True,
            0, True),
           'tloop',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, True, False, None, 0, True),
           blocks=3)
    elif mode == 'netflix_t64tloop':
        # tloop vs the shipped r4 grid config at the Netflix rank-128
        # shape (k=130 -> matvec dot; VMEM estimate 34 MB, gate passes)
        print('--- Netflix r128 A/B: T=64 grid(c8k) vs tloop (all2d, '
              'bf16 ff)')
        ab('grid_c8k',
           (128, BATCH // 2, False, 64, 8192, False, 'bfloat16', True,
            True),
           'tloop',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           blocks=3)
    elif mode == 'netflix_t128tloop':
        # does the T ladder reopen past 64 at the Netflix rank-128
        # shape on the tloop kernel?  (rate standard: adopt if the
        # interleaved gain matches the T=64 rung's +8.5%-class margin
        # and the quality gate holds)
        print('--- Netflix r128 A/B: T=64 vs T=128 (tloop, bf16 ff)')
        ab('t64',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           't128',
           (128, BATCH // 2, False, 128, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           blocks=3)
    elif mode == 'netflix_t256':
        # ladder-end stop-evidence at the Netflix shape (t64/t128 data
        # projects ~+3.4%: fixed ~2.2 s + 0.2372 s/sweep-epoch)
        print('--- Netflix r128 A/B: T=128 vs T=256 (tloop, bf16 ff)')
        ab('t128',
           (128, BATCH // 2, False, 128, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           't256',
           (128, BATCH // 2, False, 256, 16384, False, 'bfloat16', False,
            True, 0, False, False, None, 0, True),
           blocks=2)
    elif mode == 't256':
        # stop-evidence for the T ladder past the adopted 128 (the
        # constant ~12.9 us/batch marginal projects ~+3%; measure
        # rather than trust the projection — same lesson as kmf_t128)
        print('--- A/B: T=128 vs T=256 (tloop, bf16 ff)')
        ab('t128',
           (128, BATCH // 2, False, 128, 16384, False, 'bfloat16', False,
            True, 0, True, False, None, 0, True),
           't256',
           (128, BATCH // 2, False, 256, 16384, False, 'bfloat16', False,
            True, 0, True, False, None, 0, True),
           blocks=3)
    elif mode == 't128':
        # does the ladder reopen past 64 on the tloop kernel?
        # (marginal ~13 us/batch projects T=128 at only +4-5% rate)
        print('--- A/B: T=64 vs T=128 (tloop, bf16 ff)')
        ab('t64',
           (128, BATCH // 2, False, 64, 16384, False, 'bfloat16', False,
            True, 0, True, False, None, 0, True),
           't128',
           (128, BATCH // 2, False, 128, 16384, False, 'bfloat16', False,
            True, 0, True, False, None, 0, True),
           blocks=3)
    elif mode == 'grid_cached':
        print('--- A/B: full-grid vs full-grid+onehot-cache (T=8, bf16 ff)')
        ab('full', (128, BATCH // 2, False, 8, 8192, False, 'bfloat16'),
           'full_cache',
           (128, BATCH // 2, False, 8, 8192, False, 'bfloat16', True))
    else:
        print('--- A/B at W=128/B=16k: T=4 vs T=8')
        ab('t4', (128, BATCH // 2, False, 4),
           't8', (128, BATCH // 2, False, 8))
        print('--- A/B at W=128/B=16k: chunk 4096 vs 8192')
        ab('c4096', (128, BATCH // 2, False, 4, 4096),
           'c8192', (128, BATCH // 2, False, 4, 8192))
