'''Fused Pallas half-pass batch step vs. a numpy reference (interpret).'''
import numpy as np
import jax
import jax.numpy as jnp

from mfrec_tpu.ops import sgd_mf
from mfrec_tpu.ops.pallas_half_pass import half_pass_batch


def test_half_pass_batch_matches_numpy():
    rng = np.random.default_rng(0)
    B, k, W = 256, 10, 32
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    mu = 3.4

    out, sse = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True)
    out, sse = np.asarray(out), float(sse)

    # numpy reference
    fu = window[kl]
    pred = np.clip(mu + (fu * ff).sum(-1), 1.0, 5.0)
    err = (r - pred) * m
    g = err[:, None] * ff - regv[None, :] * fu * m[:, None]
    gsum = np.zeros((W, k)); cnt = np.zeros(W)
    for b in range(B):
        gsum[kl[b]] += g[b] * m[b]
        cnt[kl[b]] += m[b]
    want = window + lrv[None, :] * gsum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(out, want, atol=5e-3, rtol=5e-2)   # bf16
    assert abs(sse - (err ** 2).sum()) / (err ** 2).sum() < 1e-3
    # frozen column untouched
    np.testing.assert_allclose(out[:, -1], window[:, -1], atol=1e-6)


def test_half_pass_all2d_matches_numpy():
    '''all2d=True (r/m/kl as [B,1] columns, MXU ones-matvec dot): same
    math as the 1D kernel up to bf16 rounding of the dot products.'''
    rng = np.random.default_rng(7)
    B, k, W, T = 256, 10, 32, 3
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    mu = 3.4

    out, sse = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True,
        inner_steps=T, cache_onehot=True, all2d=True)
    out, sse = np.asarray(out), float(sse)

    win = window.copy()
    sse_first = None
    for t in range(T):
        fu = win[kl]
        pred = np.clip(mu + (fu * ff).sum(-1), 1.0, 5.0)
        err = (r - pred) * m
        if t == 0:
            sse_first = (err ** 2).sum()
        g = err[:, None] * ff - regv[None, :] * fu * m[:, None]
        gsum = np.zeros((W, k)); cnt = np.zeros(W)
        for b in range(B):
            gsum[kl[b]] += g[b] * m[b]
            cnt[kl[b]] += m[b]
        win = win + lrv[None, :] * gsum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(out, win, atol=2e-2, rtol=5e-2)  # bf16 x3
    assert abs(sse - sse_first) / sse_first < 5e-3   # bf16-rounded dot
    # frozen column untouched
    np.testing.assert_allclose(out[:, -1], window[:, -1], atol=1e-6)
    # resident + all2d: same chunk order and rounding points -> bitwise
    out_r, sse_r = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True,
        inner_steps=T, resident=True, all2d=True)
    np.testing.assert_allclose(np.asarray(out_r), out, atol=1e-6)
    assert abs(float(sse_r) - sse) < 1e-4 * max(sse, 1.0)
    # logistic link through the 2D chain
    out_l, sse_l = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), 0.0, W, chunk=64, interpret=True,
        clamp_pred=False, link='logistic', all2d=True)
    out_l1, sse_l1 = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), 0.0, W, chunk=64, interpret=True,
        clamp_pred=False, link='logistic', all2d=False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_l1),
                               atol=5e-3, rtol=5e-2)
    assert abs(float(sse_l) - float(sse_l1)) < 5e-3 * max(float(sse_l1), 1)


def test_half_pass_inner_steps_matches_numpy():
    '''inner_steps=3: the kernel's persistent-window grid iteration must
    equal three sequential numpy half-steps (sse = first iteration's).'''
    rng = np.random.default_rng(1)
    B, k, W, T = 128, 8, 16, 3
    window0 = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    mu = 3.4

    out, sse = half_pass_batch(
        jnp.asarray(window0), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True, inner_steps=T)
    out, sse = np.asarray(out), float(sse)
    # the VMEM-resident variant must be numerically identical to the
    # chunked grid (same chunk order, same bf16 rounding points)
    out_res, sse_res = half_pass_batch(
        jnp.asarray(window0), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True, inner_steps=T,
        resident=True)
    np.testing.assert_allclose(np.asarray(out_res), out, atol=1e-6)
    assert abs(float(sse_res) - sse) < 1e-4 * max(sse, 1.0)
    # the onehot-cache variant (tile built once at t==0 into VMEM scratch,
    # re-read by later sweeps) must be bitwise: identical onehot values
    out_c, sse_c = half_pass_batch(
        jnp.asarray(window0), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True, inner_steps=T,
        cache_onehot=True)
    np.testing.assert_allclose(np.asarray(out_c), out, atol=1e-6)
    assert abs(float(sse_c) - sse) < 1e-4 * max(sse, 1.0)

    window = window0.copy()
    sse_first = None
    for t in range(T):
        fu = window[kl]
        pred = np.clip(mu + (fu * ff).sum(-1), 1.0, 5.0)
        err = (r - pred) * m
        if t == 0:
            sse_first = (err ** 2).sum()
        g = err[:, None] * ff - regv[None, :] * fu * m[:, None]
        gsum = np.zeros((W, k)); cnt = np.zeros(W)
        for b in range(B):
            gsum[kl[b]] += g[b] * m[b]
            cnt[kl[b]] += m[b]
        window = window + lrv[None, :] * gsum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(out, window, atol=2e-2, rtol=5e-2)  # bf16 x3
    assert abs(sse - sse_first) / sse_first < 1e-3


def test_half_pass_bf16_fixed_side():
    '''ff in bfloat16 (the ff_dtype='bfloat16' fast path): same result
    as f32 ff within bf16 rounding of the fixed side.'''
    rng = np.random.default_rng(2)
    B, k, W = 256, 10, 32
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)   # masked rows too
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32)
    regv = np.full(k, 0.02, np.float32)
    out32, sse32 = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), 3.4, W, chunk=64, interpret=True)
    out16, sse16 = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff).astype(jnp.bfloat16),
        jnp.asarray(r), jnp.asarray(m), jnp.asarray(kl),
        jnp.asarray(lrv), jnp.asarray(regv), 3.4, W, chunk=64,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=2e-2, rtol=5e-2)
    assert abs(float(sse16) - float(sse32)) / float(sse32) < 0.05
    # the resident kernel's bf16 slicing/upcast path must agree with the
    # chunked grid bitwise (same chunk order, same rounding points)
    out16r, sse16r = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff).astype(jnp.bfloat16),
        jnp.asarray(r), jnp.asarray(m), jnp.asarray(kl),
        jnp.asarray(lrv), jnp.asarray(regv), 3.4, W, chunk=64,
        interpret=True, resident=True)
    np.testing.assert_allclose(np.asarray(out16r), np.asarray(out16),
                               atol=1e-6)
    assert abs(float(sse16r) - float(sse16)) < 1e-4 * max(float(sse16), 1)


def test_half_pass_logistic_link_matches_numpy():
    '''link='logistic' (kernel MF, kmf_train.pyx:158-165 semantics): the
    in-kernel sigmoid prediction/gradient must match the numpy math the
    XLA tier implements; sse reports the raw (pre-link-derivative)
    residual.'''
    rng = np.random.default_rng(4)
    B, k, W = 256, 10, 32
    lo, hi = 1.0, 5.0
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(lo, hi, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0

    out, sse = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), 0.0, W, chunk=64, interpret=True,
        clamp_pred=False, lo_r=lo, hi_r=hi, link='logistic')
    out, sse = np.asarray(out), float(sse)

    fu = window[kl]
    s = (fu * ff).sum(-1)
    sig = 1.0 / (1.0 + np.exp(-s))
    pred = lo + sig * (hi - lo)
    err = (r - pred) * m
    eff = err * sig * (1.0 - sig) * (hi - lo)
    g = eff[:, None] * ff - regv[None, :] * fu * m[:, None]
    gsum = np.zeros((W, k)); cnt = np.zeros(W)
    for b in range(B):
        gsum[kl[b]] += g[b] * m[b]
        cnt[kl[b]] += m[b]
    want = window + lrv[None, :] * gsum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(out, want, atol=5e-3, rtol=5e-2)   # bf16
    assert abs(sse - (err ** 2).sum()) / max((err ** 2).sum(), 1e-9) < 1e-3


def test_half_pass_group_matches_scanned():
    '''half_pass_group (G batches per call, HBM-resident factors,
    in-kernel window DMA at scalar-prefetched offsets) must equal the
    per-batch all2d kernel applied sequentially with dynamic
    slice/update — including OVERLAPPING windows between consecutive
    batches and masked filler rows.'''
    from mfrec_tpu.ops.pallas_half_pass import half_pass_group

    rng = np.random.default_rng(3)
    G, B, k, W, T = 4, 128, 10, 32, 3
    n_rows = 80
    F = rng.normal(0, 0.3, (n_rows + W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (G, B, k)).astype(np.float32)
    r = rng.uniform(1, 5, (G, B)).astype(np.float32)
    m = (rng.random((G, B)) > 0.1).astype(np.float32)
    m[-1, B // 2:] = 0.0                      # short (filler-ish) batch
    kl = np.sort(rng.integers(0, W, (G, B)), axis=1).astype(np.int32)
    lo = np.array([0, 20, 45, 46], np.int32)  # 0/20, 45/46 overlap
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    mu = 3.4

    Fref = jnp.asarray(F)
    sse_ref = 0.0
    for g in range(G):
        win = jax.lax.dynamic_slice_in_dim(Fref, int(lo[g]), W, 0)
        win_out, sse_b = half_pass_batch(
            win, jnp.asarray(ff[g]), jnp.asarray(r[g]), jnp.asarray(m[g]),
            jnp.asarray(kl[g]), jnp.asarray(lrv), jnp.asarray(regv), mu,
            W, chunk=64, interpret=True, inner_steps=T, cache_onehot=True,
            all2d=True)
        Fref = jax.lax.dynamic_update_slice_in_dim(
            Fref, win_out, int(lo[g]), 0)
        sse_ref += float(sse_b)

    Fg, sse_g = half_pass_group(
        jnp.asarray(F), jnp.asarray(ff), jnp.asarray(r), jnp.asarray(m),
        jnp.asarray(kl), jnp.asarray(lo), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True, inner_steps=T)
    np.testing.assert_allclose(np.asarray(Fg), np.asarray(Fref),
                               atol=1e-5, rtol=1e-5)
    assert abs(float(sse_g) - sse_ref) < 1e-3 * max(sse_ref, 1.0)
    # rows outside every window carried through untouched
    np.testing.assert_allclose(np.asarray(Fg)[n_rows:], F[n_rows:],
                               atol=0.0)
    # logistic link through the group kernel
    Fl, _ = half_pass_group(
        jnp.asarray(F), jnp.asarray(ff), jnp.asarray(r), jnp.asarray(m),
        jnp.asarray(kl), jnp.asarray(lo), jnp.asarray(lrv),
        jnp.asarray(regv), 0.0, W, chunk=64, interpret=True,
        clamp_pred=False, link='logistic')
    Fl_ref = jnp.asarray(F)
    for g in range(G):
        win = jax.lax.dynamic_slice_in_dim(Fl_ref, int(lo[g]), W, 0)
        win_out, _ = half_pass_batch(
            win, jnp.asarray(ff[g]), jnp.asarray(r[g]), jnp.asarray(m[g]),
            jnp.asarray(kl[g]), jnp.asarray(lrv), jnp.asarray(regv), 0.0,
            W, chunk=64, interpret=True, clamp_pred=False,
            link='logistic', all2d=True)
        Fl_ref = jax.lax.dynamic_update_slice_in_dim(
            Fl_ref, win_out, int(lo[g]), 0)
    np.testing.assert_allclose(np.asarray(Fl), np.asarray(Fl_ref),
                               atol=1e-5, rtol=1e-5)


def test_half_pass_all2d_dot_sum_matches_numpy():
    '''dot_sum=True: f32 keepdims lane-reduction for the prediction dot —
    tighter numerics than the bf16 ones-matvec (only the window/ff bf16
    rounding remains).'''
    rng = np.random.default_rng(11)
    B, k, W, T = 256, 10, 32, 2
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    mu = 3.4

    out, sse = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True,
        inner_steps=T, cache_onehot=True, all2d=True, dot_sum=True)
    out, sse = np.asarray(out), float(sse)

    win = window.copy()
    sse_first = None
    for t in range(T):
        fu = win[kl]
        pred = np.clip(mu + (fu * ff).sum(-1), 1.0, 5.0)
        err = (r - pred) * m
        if t == 0:
            sse_first = (err ** 2).sum()
        g = err[:, None] * ff - regv[None, :] * fu * m[:, None]
        gsum = np.zeros((W, k)); cnt = np.zeros(W)
        for b in range(B):
            gsum[kl[b]] += g[b] * m[b]
            cnt[kl[b]] += m[b]
        win = win + lrv[None, :] * gsum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(out, win, atol=2e-2, rtol=5e-2)
    assert abs(sse - sse_first) / sse_first < 2e-3
    # resident twin at the same rounding points
    out_r, sse_r = half_pass_batch(
        jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
        jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
        jnp.asarray(regv), mu, W, chunk=64, interpret=True,
        inner_steps=T, resident=True, all2d=True, dot_sum=True)
    np.testing.assert_allclose(np.asarray(out_r), out, atol=1e-6)


def test_half_pass_group_resident_matches_chunked():
    """The r4 resident-style group kernel (grid (g, t), whole-batch VMEM
    blocks, unrolled chunk loop) must be numerically identical to the
    chunked group kernel — same windows, overlaps, masks, links."""
    from mfrec_tpu.ops.pallas_half_pass import half_pass_group

    rng = np.random.default_rng(9)
    G, B, k, W, T = 4, 128, 10, 32, 3
    n_rows = 80
    F = rng.normal(0, 0.3, (n_rows + W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (G, B, k)).astype(np.float32)
    r = rng.uniform(1, 5, (G, B)).astype(np.float32)
    m = (rng.random((G, B)) > 0.1).astype(np.float32)
    m[-1, B // 2:] = 0.0
    kl = np.sort(rng.integers(0, W, (G, B)), axis=1).astype(np.int32)
    lo = np.array([0, 20, 45, 46], np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    args = (jnp.asarray(F), jnp.asarray(ff), jnp.asarray(r),
            jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lo),
            jnp.asarray(lrv), jnp.asarray(regv))
    Fc, sse_c = half_pass_group(*args, 3.4, W, chunk=64, interpret=True,
                                inner_steps=T)
    Fr, sse_r = half_pass_group(*args, 3.4, W, chunk=64, interpret=True,
                                inner_steps=T, resident=True)
    np.testing.assert_allclose(np.asarray(Fr), np.asarray(Fc),
                               atol=1e-6, rtol=1e-6)
    assert abs(float(sse_r) - float(sse_c)) < 1e-3
    # logistic link + dot_sum through the resident variant
    for ds in (False, True):
        Flc, _ = half_pass_group(*args, 0.0, W, chunk=64, interpret=True,
                                 clamp_pred=False, link='logistic',
                                 dot_sum=ds)
        Flr, _ = half_pass_group(*args, 0.0, W, chunk=64, interpret=True,
                                 clamp_pred=False, link='logistic',
                                 dot_sum=ds, resident=True)
        np.testing.assert_allclose(np.asarray(Flr), np.asarray(Flc),
                                   atol=1e-6, rtol=1e-6)


def test_alternating_epoch_grouped_matches_scanned():
    '''The grouped EPOCH path (nb padded to a G multiple with mask-0
    filler batches, [nb,B] -> [nb/G,G,B] regroup, lane pre-pad of the
    factor carry) must match the scanned fused epoch on the same
    layouts.  Exercises make_alternating_epoch(pallas_group=...) end to
    end in interpret mode.'''
    from mfrec_tpu.ops import sgd_mf

    rng = np.random.default_rng(5)
    U, I, N, k = 60, 40, 2000, 6
    users = rng.integers(0, U, N).astype(np.int32)
    items = rng.integers(0, I, N).astype(np.int32)
    vals = rng.uniform(1, 5, N).astype(np.float32)
    batch = 256
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, batch,
                                    axis='user', max_window=32)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, batch,
                                    axis='item', max_window=32)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, k, feature_init=0.05,
                           mode='normal')
    bu = np.zeros(U + W_user, np.float32)
    bi = np.zeros(I + W_item, np.float32)
    Paug, Qaug = sgd_mf.augment_factors(st.P, st.Q, jnp.asarray(bu),
                                        jnp.asarray(bi))
    mu = jnp.float32(vals.mean())
    kw = dict(lr=0.1, K=0.02, bias_mode='fixed', chunk=128, donate=False,
              inner_steps=2, use_pallas_full=True, pallas_interpret=True)
    ep_scan = sgd_mf.make_alternating_epoch(W_user, W_item, **kw)
    # G=3 does NOT divide the batch count -> exercises filler batches
    ep_grp = sgd_mf.make_alternating_epoch(W_user, W_item,
                                           pallas_group=3, **kw)
    Ps, Qs, rs = ep_scan(Paug, Qaug, mu, p_layout, q_layout)
    Pg, Qg, rg = ep_grp(Paug, Qaug, mu, p_layout, q_layout)
    np.testing.assert_allclose(np.asarray(Pg), np.asarray(Ps),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Qg), np.asarray(Qs),
                               atol=2e-5, rtol=2e-5)
    assert abs(float(rg) - float(rs)) < 1e-4
    # forced dot_sum on both sides (the auto gate also picks it at this
    # k, but force it so the assertion is explicit)
    ep_scan_s = sgd_mf.make_alternating_epoch(W_user, W_item,
                                              pallas_dot_sum=True, **kw)
    ep_grp_s = sgd_mf.make_alternating_epoch(W_user, W_item,
                                             pallas_group=3,
                                             pallas_dot_sum=True, **kw)
    Pss, Qss, rss = ep_scan_s(Paug, Qaug, mu, p_layout, q_layout)
    Pgs, Qgs, rgs = ep_grp_s(Paug, Qaug, mu, p_layout, q_layout)
    np.testing.assert_allclose(np.asarray(Pgs), np.asarray(Pss),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Qgs), np.asarray(Qss),
                               atol=2e-5, rtol=2e-5)
    assert abs(float(rgs) - float(rss)) < 1e-4
    # resident group variant through the SAME epoch path (filler
    # batches, regroup, lane pre-pad) — identical to the chunked group
    ep_grp_r = sgd_mf.make_alternating_epoch(W_user, W_item,
                                             pallas_group=3,
                                             pallas_group_resident=True,
                                             **kw)
    Pgr, Qgr, rgr = ep_grp_r(Paug, Qaug, mu, p_layout, q_layout)
    np.testing.assert_allclose(np.asarray(Pgr), np.asarray(Pg),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Qgr), np.asarray(Qg),
                               atol=1e-6, rtol=1e-6)
    assert abs(float(rgr) - float(rg)) < 1e-4


def test_half_pass_dot_split_matches_sum():
    '''dot_sum='split' (per-128-lane-group keepdims reductions) must be
    numerically identical to the plain f32 keepdims-sum at a width that
    spans two vregs (k=130 = Netflix rank 128 + 2 aug bias columns).'''
    rng = np.random.default_rng(13)
    B, k, W, T = 256, 130, 16, 2
    window = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    outs = {}
    # split reduces each 128-lane group separately and adds the partial
    # sums, so every path (grid/tloop/resident) differs from the single
    # keepdims-sum only by fp summation order — assert within reorder
    # tolerance on all three
    for ds in (True, 'split'):
        o, s = half_pass_batch(
            jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
            jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
            jnp.asarray(regv), 3.4, W, chunk=128, interpret=True,
            inner_steps=T, cache_onehot=True, all2d=True, dot_sum=ds,
            tloop=False)
        outs[ds] = (np.asarray(o), float(s))
    np.testing.assert_allclose(outs['split'][0], outs[True][0],
                               atol=5e-6)
    assert abs(outs['split'][1] - outs[True][1]) < 1e-4
    # tloop twin: same split-vs-sum equivalence within fp reordering
    touts = {}
    for ds in (True, 'split'):
        o, s = half_pass_batch(
            jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
            jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
            jnp.asarray(regv), 3.4, W, chunk=128, interpret=True,
            inner_steps=T, all2d=True, dot_sum=ds, tloop=True)
        touts[ds] = (np.asarray(o), float(s))
    np.testing.assert_allclose(touts['split'][0], touts[True][0],
                               atol=5e-6)
    # resident twin
    for ds in (True, 'split'):
        o, s = half_pass_batch(
            jnp.asarray(window), jnp.asarray(ff), jnp.asarray(r),
            jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
            jnp.asarray(regv), 3.4, W, chunk=128, interpret=True,
            inner_steps=T, resident=True, all2d=True, dot_sum=ds)
        outs[ds] = (np.asarray(o), float(s))
    np.testing.assert_allclose(outs['split'][0], outs[True][0],
                               atol=5e-6)


def test_dot_sum_split_reaches_pred_dot_on_all_paths(monkeypatch):
    '''Plumbing regression for the r4 bool-coercion bug: half_pass_batch
    passed dot_sum through bool() on the grid/resident kernels, so
    dot_sum='split' silently ran the plain keepdims-sum and the split
    parity assertions above passed VACUOUSLY.  Pin the knob's plumbing
    directly: record what _pred_dot2d actually receives on every kernel
    path (the kernels resolve the module global at trace time, so a spy
    sees the bound value).'''
    from mfrec_tpu.ops import pallas_half_pass as php
    rng = np.random.default_rng(7)
    # deliberately unique shapes: half_pass_batch is jitted, and a
    # static-signature collision with another test would cache-hit and
    # skip the retrace the spy needs to observe
    B, k, W, T = 192, 130, 24, 3
    window = jnp.asarray(rng.normal(0, 0.3, (W, k)).astype(np.float32))
    ff = jnp.asarray(rng.normal(0, 0.3, (B, k)).astype(np.float32))
    r = jnp.asarray(rng.uniform(1, 5, B).astype(np.float32))
    m = jnp.asarray((rng.random(B) > 0.1).astype(np.float32))
    kl = jnp.asarray(np.sort(rng.integers(0, W, B)).astype(np.int32))
    lrv = jnp.asarray(np.full(k, 0.1, np.float32))
    regv = jnp.asarray(np.full(k, 0.02, np.float32))
    seen = []
    orig = php._pred_dot2d
    monkeypatch.setattr(php, '_pred_dot2d',
                        lambda fu, ff_, k_, ds: (seen.append(ds),
                                                 orig(fu, ff_, k_, ds))[1])
    for kw in ({'tloop': False}, {'tloop': True}, {'resident': True}):
        seen.clear()
        half_pass_batch(window, ff, r, m, kl, lrv, regv, 3.4, W,
                        chunk=96, interpret=True, inner_steps=T,
                        all2d=True, dot_sum='split', **kw)
        assert seen and all(ds == 'split' for ds in seen), \
            'dot_sum string did not reach _pred_dot2d on %r' % (kw,)


def test_alternating_epoch_gather_grouped_matches_per_batch():
    '''pallas_gather_group=G (one fixed-side gather per G batches around
    per-batch kernel calls) must be BIT-identical to the per-batch scan:
    same kernels, same order — only the gather/scan grouping changes.
    G=3 does not divide the batch count -> exercises filler batches.'''
    rng = np.random.default_rng(17)
    U, I, N = 150, 90, 4000
    users = rng.integers(0, U, N).astype(np.int32)
    items = rng.integers(0, I, N).astype(np.int32)
    vals = rng.uniform(1, 5, N).astype(np.float32)
    pl_ = sgd_mf.sorted_pass_layout(users, items, vals, 256, axis='user',
                                    max_window=32)
    ql_ = sgd_mf.sorted_pass_layout(users, items, vals, 256, axis='item',
                                    max_window=32)
    W_user, W_item = pl_[-1], ql_[-1]
    p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
    q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
    st = sgd_mf.init_state(U + W_user, I + W_item, 6, feature_init=0.05,
                           mode='normal')
    Paug, Qaug = sgd_mf.augment_factors(
        st.P, st.Q, jnp.zeros(U + W_user), jnp.zeros(I + W_item))
    mu = jnp.float32(vals.mean())
    kw = dict(lr=0.1, K=0.02, bias_mode='fixed', chunk=128, donate=False,
              inner_steps=2, use_pallas_full=True, pallas_interpret=True)
    ep_pb = sgd_mf.make_alternating_epoch(W_user, W_item, **kw)
    ep_gg = sgd_mf.make_alternating_epoch(W_user, W_item,
                                          pallas_gather_group=3, **kw)
    Pp, Qp, rp = ep_pb(Paug, Qaug, mu, p_layout, q_layout)
    Pg, Qg, rg = ep_gg(Paug, Qaug, mu, p_layout, q_layout)
    np.testing.assert_array_equal(np.asarray(Pg), np.asarray(Pp))
    np.testing.assert_array_equal(np.asarray(Qg), np.asarray(Qp))
    assert float(rg) == float(rp)


def test_half_pass_tloop_matches_grid():
    '''tloop (in-kernel fori over T, no pallas grid) must be numerically
    identical to the (T, 1)-grid path at chunk=B — same math, same bf16
    rounding points, the grid machinery is the only thing removed.'''
    rng = np.random.default_rng(7)
    B, k, W, T = 128, 8, 16, 4
    window0 = rng.normal(0, 0.3, (W, k)).astype(np.float32)
    ff = rng.normal(0, 0.3, (B, k)).astype(np.float32)
    r = rng.uniform(1, 5, B).astype(np.float32)
    m = (rng.random(B) > 0.1).astype(np.float32)
    kl = np.sort(rng.integers(0, W, B)).astype(np.int32)
    lrv = np.full(k, 0.1, np.float32); lrv[-1] = 0.0
    regv = np.full(k, 0.02, np.float32); regv[-1] = 0.0
    args = (jnp.asarray(window0), jnp.asarray(ff), jnp.asarray(r),
            jnp.asarray(m), jnp.asarray(kl), jnp.asarray(lrv),
            jnp.asarray(regv))
    for dot_sum in (True, False):
        out_g, sse_g = half_pass_batch(
            *args, 3.4, W, chunk=B, interpret=True, inner_steps=T,
            cache_onehot=True, all2d=True, dot_sum=dot_sum)
        out_t, sse_t = half_pass_batch(
            *args, 3.4, W, chunk=B, interpret=True, inner_steps=T,
            all2d=True, dot_sum=dot_sum, tloop=True)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                                   atol=1e-6)
        assert abs(float(sse_t) - float(sse_g)) \
            < 1e-5 * max(float(sse_g), 1.0)
    # logistic link rides the same body
    out_g, sse_g = half_pass_batch(
        *args, 0.0, W, chunk=B, interpret=True, inner_steps=T,
        cache_onehot=True, all2d=True, dot_sum=True, link='logistic',
        clamp_pred=False)
    out_t, sse_t = half_pass_batch(
        *args, 0.0, W, chunk=B, interpret=True, inner_steps=T,
        all2d=True, dot_sum=True, link='logistic', clamp_pred=False,
        tloop=True)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                               atol=1e-6)
    assert abs(float(sse_t) - float(sse_g)) < 1e-5 * max(float(sse_g), 1.0)


def test_tloop_auto_gate_shapes():
    '''Pin the tloop auto-gate at the shipped operating points: the
    headline and Netflix shapes ride tloop; the implicit W=256/B=32k
    shape falls back to the chunked grid (its three [B, 1] columns cost
    16 MB each at physical (8, 128) tiling and OOM VMEM under tloop —
    measured, commit 108b7a3).'''
    from mfrec_tpu.ops.pallas_half_pass import tloop_auto
    # ML-10M headline: B=16k, k=64+bias, W=128 (est ~44 MB)
    assert tloop_auto(1 << 14, 65, 128)
    # Netflix rank 128: k=128+2 bias cols (est ~59 MB)
    assert tloop_auto(1 << 14, 130, 128)
    # SVD++ tier shape: B=32k, W=256 -> est ~97 MB, grid fallback
    assert not tloop_auto(1 << 15, 65, 256)
    # tloop requires the all-2D chain; the resident variant keeps its grid
    assert not tloop_auto(1 << 14, 65, 128, all2d=False)
    assert not tloop_auto(1 << 14, 65, 128, resident=True)
