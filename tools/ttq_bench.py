'''Time-to-target-RMSE bench — the quality-led ladder (ROADMAP r5).

The rate A/Bs rejected ML-10M T=256 (+3.0%) and KMF T=128 (+4.4%)
under the >=5% rate-adoption standard, but per-epoch RMSE still
improved at those rungs.  Rate-at-fixed-epoch is the wrong metric for
a quality-hungry user; the decision-grade question is: at a fixed
TARGET train RMSE, which inner_steps reaches it in the least
wall-clock?  This tool answers it directly.

Method (same protocol as bench.py BENCH_MODE=full_train): for each
config, one fresh-factors trajectory — compile warmed on a throwaway
epoch, state reset from host, then epochs with a per-epoch
device->host RMSE sync — recording (cumulative seconds, RMSE) per
epoch until the improvement drops below TTQ_STOP_IMP or TTQ_MAX_EP.
The report prints each trajectory and the FIRST-CROSSING time for a
ladder of targets.  Trajectories are sequential (a trajectory is
stateful, so the interleaved-block A/B discipline cannot apply);
the ~20%/hours relay drift (CLAUDE.md) is BRACKETED instead: the
first config re-runs at the end (A, B, ..., A2) and the report
prints the A2/A per-epoch-time ratio — conclusions are only
decision-grade when that bracket is tight (within a few %).

    TTQ=ml10m   python tools/ttq_bench.py   # T=64/128/256, rank 64
    TTQ=kmf     python tools/ttq_bench.py   # T=32/64/128, logistic
    TTQ=netflix python tools/ttq_bench.py   # T=64/128, rank 128, 100M
    TTQ=implicit python tools/ttq_bench.py  # SVD++ T=8/16/32, W=256

Reference anchor: full training is the reference's only published
wall-clock claim (gradient_descent.py:41-45, "49 minutes" ML-10M).
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

import bench
import ab_bench as abm


def trajectory(build_fn, label, max_ep, stop_imp):
    '''build_fn() -> (step, state0) with step(state) -> (state, rmse);
    state0 is a tuple of device arrays (host-copied for the reset).'''
    step, st = build_fn()
    st_host = tuple(np.array(x) for x in st)
    # warm the compile on a throwaway step, then restart from fresh
    # factors so epoch 1's time is a training epoch, not a compile
    _st, r = step(st)
    float(r)
    del _st
    st = tuple(jnp.asarray(x) for x in st_host)
    rows = []
    t0 = time.perf_counter()
    # patience: SVD++'s Y-coupled objective has DETERMINISTIC transient
    # RMSE bumps mid-trajectory (e.g. epoch 4 at T=8) that recover, so
    # stop only after `patience` consecutive epochs without improving
    # the best-so-far by stop_imp
    patience = int(os.environ.get('TTQ_PATIENCE', 3))
    best, stall = float('inf'), 0
    for _ in range(max_ep):
        st, r = step(st)
        rv = float(r)                      # per-epoch sync (real training
        rows.append((time.perf_counter() - t0, rv))  # does the same)
        if rv < best - stop_imp:
            best, stall = rv, 0
        else:
            stall += 1
            if len(rows) >= 3 and stall >= patience:
                break
    ep_s = rows[-1][0] / len(rows)
    print('%s: %d epochs, %.2f s total (%.4f s/epoch), final rmse %.4f'
          % (label, len(rows), rows[-1][0], ep_s, rows[-1][1]))
    print('   traj: ' + ' '.join('%.1fs@%.4f' % rc for rc in rows))
    return rows


def first_crossing(rows, target):
    for t, r in rows:
        if r <= target:
            return t
    return None


def report(trajs, targets, bracket):
    '''trajs: list of (label, rows); bracket: (label, ratio).'''
    print('\ntime-to-target (s; - = never reached):')
    hdr = 'target  ' + ''.join('%12s' % lb for lb, _ in trajs)
    print(hdr)
    table = {}
    for tgt in targets:
        cells = []
        for lb, rows in trajs:
            c = first_crossing(rows, tgt)
            table.setdefault(lb, {})[tgt] = c
            cells.append('%12s' % ('-' if c is None else '%.2f' % c))
        print('%.4f  %s' % (tgt, ''.join(cells)))
    print('\ndrift bracket: %s re-run epoch-time ratio %.3f '
          '(tight <1.05 = decision-grade)' % bracket)
    print(json.dumps({'ttq': {lb: {('%.4f' % t): (None if c is None
                                                  else round(c, 2))
                                   for t, c in d.items()}
                              for lb, d in table.items()},
                      'drift_ratio': round(bracket[1], 4)}))


def main():
    mode = os.environ.get('TTQ', 'ml10m')
    max_ep = int(os.environ.get('TTQ_MAX_EP', 48))
    stop_imp = float(os.environ.get('TTQ_STOP_IMP', 5e-5))

    def explicit(T, *, netflix=False, gamma=None, gamma_start=0):
        # AB=t256 / netflix_t128tloop configs: tloop, chunk=B, bf16 ff,
        # all2d; dot is keepdims-sum at k=64, matvec at k=130.
        # ``gamma``: per-epoch multiplicative lr decay via the traced
        # lr_scale arg (ops.sgd_mf lr_scale; model param lr_decay) — the
        # epoch counter rides the device state tuple so the trajectory
        # warm/reset protocol resets it with the factors.
        # ``gamma_start``: constant rate until that epoch, then decay
        # (scale = g^max(e - start, 0)) — the plateau-decay probe.
        def bf():
            ep, st, pl, ql = abm.build(
                128, 1 << 14, False, T, 1 << 14, False, 'bfloat16',
                False, True, 0, not netflix, False, None, 0, True)
            mu = jnp.float32(abm.vals.mean())
            if gamma is None:
                def step(s):
                    Pa, Qa, r = ep(s[0], s[1], mu, pl, ql)
                    return (Pa, Qa), r
                return step, st
            g = jnp.float32(gamma)
            e0 = jnp.float32(gamma_start)

            def step(s):
                Pa, Qa, e = s
                Pa, Qa, r = ep(Pa, Qa, mu, pl, ql,
                               g ** jnp.maximum(e - e0, 0.0))
                return (Pa, Qa, e + 1.0), r
            return step, st + (jnp.zeros((), jnp.float32),)
        return bf

    def kmf(T):
        def bf():
            ep, st, pl, ql = abm.build_kmf(T)
            mu = jnp.float32(0.0)
            def step(s):
                Pa, Qa, r = ep(s[0], s[1], mu, pl, ql)
                return (Pa, Qa), r
            return step, st
        return bf

    def implicit(T, lr=0.15, gamma=None, gamma_start=0):
        # shipped SVD++ config: fused Pallas base, chunk 8192, ff f32.
        # ``gamma``/``gamma_start``: plateau-decay probe like explicit's
        # — constant rate to epoch gamma_start, then scale by gamma each
        # epoch (rides the implicit epoch's traced lr_scale)
        def bf():
            ep, st, pl, ql, nrm = abm.build_implicit(True, inner=T,
                                                     chunk=8192, lr=lr)
            mu = jnp.float32(abm.vals.mean())
            if gamma is None:
                def step(s):
                    Pa, Qa, Yp, r = ep(s[0], s[1], s[2], mu, pl, ql, nrm)
                    return (Pa, Qa, Yp), r
                return step, st
            g = jnp.float32(gamma)
            e0 = jnp.float32(gamma_start)

            def step(s):
                Pa, Qa, Yp, e = s
                Pa, Qa, Yp, r = ep(Pa, Qa, Yp, mu, pl, ql, nrm,
                                   g ** jnp.maximum(e - e0, 0.0))
                return (Pa, Qa, Yp, e + 1.0), r
            return step, st + (jnp.zeros((), jnp.float32),)
        return bf

    _fn_cache = {}

    def fn_tier(T):
        '''FN alternating tier at the bench operating point
        (W=512/B=16k, the FNRecommender defaults) — VERDICT r4 #2's
        "add a TTQ run".'''
        def bf():
            from mfrec_tpu.ops import fn as fn_ops
            from mfrec_tpu.ops import sgd_mf
            import jax
            if 'layout' not in _fn_cache:
                W, batch = 512, 1 << 14
                pl_ = sgd_mf.sorted_pass_layout(
                    abm.users, abm.items, abm.vals, batch, axis='user',
                    max_window=W)
                ql_ = sgd_mf.sorted_pass_layout(
                    abm.users, abm.items, abm.vals, batch, axis='item',
                    max_window=W)
                W_user, W_item = pl_[-1], ql_[-1]
                pl = tuple(jnp.asarray(x) for x in pl_[:-1])
                ql = tuple(jnp.asarray(x) for x in ql_[:-1])
                counts = np.bincount(abm.users,
                                     minlength=abm.U).astype(np.float32)
                nrm = np.zeros(abm.U + W_user, np.float32)
                nrm[:abm.U] = np.where(
                    counts > 0, 1.0 / np.sqrt(np.maximum(counts, 1.0)),
                    0.0)
                _fn_cache['layout'] = (pl, ql, W_user, W_item,
                                       jnp.asarray(nrm))
            pl, ql, W_user, W_item, nrm_rows = _fn_cache['layout']
            ep = fn_ops.make_fn_alternating_epoch(
                W_user, W_item, lr=0.15, lr_bu=0.05, lr_bi=0.05,
                lr_xy=0.15, K=0.02, K_bu=0.02, K_bi=0.02, K_x=0.02,
                K_y=0.02, inner_steps=T, chunk=8192, donate=False,
                use_pallas_full=jax.default_backend() != 'cpu')
            rng = np.random.default_rng(7)
            f = 0.05
            Paug, Qaug = sgd_mf.augment_factors(
                jnp.zeros((abm.U + W_user, abm.K), jnp.float32),
                jnp.asarray(rng.normal(0, f, (abm.I + W_item, abm.K)),
                            jnp.float32),
                jnp.asarray(np.pad(abm.bu_fit, (0, W_user))),
                jnp.asarray(np.pad(abm.bi_fit, (0, W_item))))
            Xpad = jnp.asarray(rng.normal(0, f, (abm.I + W_item, abm.K)),
                               jnp.float32)
            Ypad = jnp.asarray(rng.normal(0, f, (abm.I + W_item, abm.K)),
                               jnp.float32)
            mu = jnp.float32(abm.vals.mean())

            def step(s):
                Pa, Qa, Xp, Yp = s
                Pa, Qa, Xp, Yp, r = ep(Pa, Qa, Xp, Yp, mu, pl, ql,
                                       nrm_rows)
                return (Pa, Qa, Xp, Yp), r
            return step, (Paug, Qaug, Xpad, Ypad)
        return bf

    if mode == 'fn':
        ts = [int(x) for x in os.environ.get('TTQ_T', '32,64,128')
              .split(',')]
        mk = fn_tier
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.55,0.50,0.46,0.44,0.43,0.42,0.41,0.405,0.40,0.395'
        ).split(',')]
    elif mode == 'ml10m':
        ts = [int(x) for x in
              os.environ.get('TTQ_T', '64,128,256').split(',')]
        mk = explicit
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.34,0.32,0.31,0.30,0.295,0.293,0.291,0.290,0.289,0.288'
        ).split(',')]
    elif mode == 'decay':
        # lr-decay ladder at the shipped ML-10M config (T from TTQ_T,
        # default 128): constant-rate SGD plateaus at its step-noise
        # floor (~0.2888 on this data) — the question is whether a
        # geometric schedule reaches the shared targets sooner AND how
        # far below the constant floor it lands.  g=1 is the control +
        # drift bracket.  TTQ_SHAPE=netflix re-runs the ladder at the
        # Netflix headline shape (rank 128, 100M ratings; the __main__
        # data build honors TTQ_SHAPE too).
        T = int(os.environ.get('TTQ_T', '128'))
        nfx = os.environ.get('TTQ_SHAPE', 'ml10m') == 'netflix'
        cfgs = []
        # entries: '0.97' (decay from epoch 0), '0.95@45' (constant to
        # epoch 45 then decay), '1.0' (constant control)
        for spec in os.environ.get('TTQ_G', '1.0,0.97,0.93,0.88').split(','):
            if '@' in spec:
                gtxt, stxt = spec.split('@')
                g, s0 = float(gtxt), int(stxt)
            else:
                g, s0 = float(spec), 0
            lb = 'g=%g' % g if s0 == 0 else 'g=%g@%d' % (g, s0)
            cfgs.append((lb, explicit(T, netflix=nfx,
                                      gamma=(None if g == 1.0 else g),
                                      gamma_start=s0)))
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.30,0.295,0.291,0.289,0.288,0.287,0.286,0.285,0.284,0.282'
        ).split(',')]
        trajs = [(lb, trajectory(bf, lb, max_ep, stop_imp))
                 for lb, bf in cfgs]
        rows2 = trajectory(cfgs[0][1], cfgs[0][0] + ' (re-run)',
                           max_ep, stop_imp)
        e1 = trajs[0][1][-1][0] / len(trajs[0][1])
        e2 = rows2[-1][0] / len(rows2)
        report(trajs, targets, (cfgs[0][0], e2 / e1))
        return
    elif mode == 'netflix':
        # T=256 is NOT in the default list: AB=netflix_t256 crashed the
        # TPU worker and the rung is projection-rejected; the decision
        # pair is 64 vs the shipped 128.  Epochs are ~17/33 s, so the
        # cap defaults lower.
        ts = [int(x) for x in
              os.environ.get('TTQ_T', '64,128').split(',')]
        mk = lambda T: explicit(T, netflix=True)
        max_ep = int(os.environ.get('TTQ_MAX_EP', 20))
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.40,0.36,0.34,0.33,0.325,0.321,0.318,0.315,0.3125,0.310'
        ).split(',')]
    elif mode == 'kmf':
        ts = [int(x) for x in
              os.environ.get('TTQ_T', '32,64,128').split(',')]
        mk = kmf
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.40,0.36,0.34,0.33,0.325,0.320,0.317,0.315,0.313,0.311'
        ).split(',')]
    elif mode == 'implicit':
        # SVD++ tier: the rate ladder closed at T=32 BY THE QUALITY
        # GATE (T=64 regresses RMSE through the Y coupling); TTQ asks
        # whether the cheaper T=16 reaches shared targets sooner.
        # 'T:lr' entries re-open a rung at a reduced rate (the T=64
        # overshoot is an lr x sweep-count product question); a third
        # ':g@s' part adds plateau decay (constant to epoch s, then
        # scale by g each epoch), e.g. '32:0.15:0.85@14'
        cfgs = []
        for spec in os.environ.get('TTQ_T', '8,16,32').split(','):
            parts = spec.split(':')
            T = int(parts[0])
            lr = float(parts[1]) if len(parts) > 1 else 0.15
            g, s0 = None, 0
            if len(parts) > 2:
                gtxt, stxt = parts[2].split('@')
                g, s0 = float(gtxt), int(stxt)
            lb = 'T=%d' % T if lr == 0.15 else 'T=%d@lr%g' % (T, lr)
            if g is not None:
                lb += ' g=%g@%d' % (g, s0)
            cfgs.append((lb, implicit(T, lr=lr, gamma=g, gamma_start=s0)))
        targets = [float(x) for x in os.environ.get(
            'TTQ_TARGETS',
            '0.45,0.40,0.36,0.34,0.33,0.322,0.318,0.314,0.311,0.309'
        ).split(',')]
        # T=64@lr0.1's deterministic transient (epochs 5-8: .4173 .4912
        # .4205 .4582 before the plunge to .3194) outlasts patience=3 —
        # the default stop rule killed it at epoch 8 in
        # bench_logs/r4/ttq_implicit_decay.log.  SVD++ probes default
        # deeper patience; explicit TTQ_PATIENCE still overrides.
        os.environ.setdefault('TTQ_PATIENCE', '6')
        trajs = [(lb, trajectory(bf, lb, max_ep, stop_imp))
                 for lb, bf in cfgs]
        rows2 = trajectory(cfgs[0][1], cfgs[0][0] + ' (re-run)',
                           max_ep, stop_imp)
        e1 = trajs[0][1][-1][0] / len(trajs[0][1])
        e2 = rows2[-1][0] / len(rows2)
        report(trajs, targets, (cfgs[0][0], e2 / e1))
        return
    else:
        raise SystemExit('unknown TTQ mode %r' % mode)

    trajs = []
    for T in ts:
        trajs.append(('T=%d' % T,
                      trajectory(mk(T), 'T=%d' % T, max_ep, stop_imp)))
    # drift bracket: re-run the first config
    lb0 = 'T=%d' % ts[0]
    rows2 = trajectory(mk(ts[0]), lb0 + ' (re-run)', max_ep, stop_imp)
    e1 = trajs[0][1][-1][0] / len(trajs[0][1])
    e2 = rows2[-1][0] / len(rows2)
    report(trajs, targets, (lb0, e2 / e1))


if __name__ == '__main__':
    # data build inside the guard (imports must not trigger generation)
    U, I, N, K = 69878, 10677, 10_000_000, 64
    if (os.environ.get('TTQ', 'ml10m') == 'netflix'
            or os.environ.get('TTQ_SHAPE', 'ml10m') == 'netflix'):
        U, I, N, K = 480_189, 17_770, 100_000_000, 128
    # smoke-scale overrides (CPU sanity runs), same names as bench.py
    U = int(os.environ.get('BENCH_U', U))
    I = int(os.environ.get('BENCH_I', I))
    N = int(os.environ.get('BENCH_N', N))
    K = int(os.environ.get('BENCH_K', K))
    abm.U, abm.I, abm.N, abm.K = U, I, N, K
    abm.users, abm.items, abm.vals = bench.make_data(U, I, N)
    _floor, abm.bu_fit, abm.bi_fit = bench.bias_floor_rmse(
        abm.users, abm.items, abm.vals, U, I)
    print('bias-floor rmse %.4f' % _floor)
    main()
