#!/usr/bin/env python
'''
Benchmark: MovieLens-10M-shaped rank-64 biased SGD MF training epoch on one
TPU chip (BASELINE.md headline config: 69,878 users x 10,677 items, 10M
ratings, k=64).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value = single-feature rating updates/s/chip (one full rank-64 rating
update counts as 64 single-feature updates — the unit of the reference's
derived throughput).  vs_baseline = value / 3.7e7, the reference's Cython
single-thread throughput derived from `gradient_descent.py:41-45`
(MovieLens-10M, 40 features, 275 epochs/feature, 49 min on 2011 CPU).
'''
import json
import os
import sys
import time

import numpy as np


def make_data(U, I, N, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, U, N).astype(np.int32)
    ranks = np.arange(1, I + 1, dtype=np.float64)
    pop = 1.0 / ranks ** 1.1
    pop /= pop.sum()
    items = rng.choice(I, N, p=pop).astype(np.int32)
    vals = (rng.integers(2, 11, N) / 2.0).astype(np.float32)
    return users, items, vals


def bench_als(U, I, users, items, K=64, epochs=3):
    '''Secondary metric: implicit WRMF ALS epoch (user+item half-sweeps,
    batched normal equations + Cholesky) at ML-10M shape, rank 64.'''
    import jax.numpy as jnp
    from mfrec_tpu.data.movielens import ratings_from_arrays
    from mfrec_tpu.ops import als as als_ops
    r = ratings_from_arrays(users, items, np.ones(users.shape[0],
                                                  np.float32), U, I)
    ub = r.padded_rows(axis='user')
    ib = r.padded_rows(axis='item')
    P = jnp.full((U, K), 0.1, jnp.float32)
    Q = jnp.full((I, K), 0.1, jnp.float32)
    P, Q = als_ops.als_wrmf_train(P, Q, ub, ib, nbr_epochs=1)   # compile
    float(P[0, 0])
    t0 = time.perf_counter()
    P, Q = als_ops.als_wrmf_train(P, Q, ub, ib, nbr_epochs=epochs)
    float(P[0, 0])
    epoch_s = (time.perf_counter() - t0) / epochs
    print(json.dumps({
        'metric': 'ml10m_rank64_wrmf_als_epoch_s',
        'value': round(epoch_s, 3),
        'unit': 's/epoch/chip',
        'vs_baseline': None,
        'nnz': int(r.nnz),
    }))


def bench_serving(I=360_000, K=64, B=256, n=10, iters=20, rated_L=0):
    '''Secondary metric: top-N retrieval throughput (Last.fm-scale item
    catalog, BASELINE config 4) via the fused Pallas kernel.  Set
    BENCH_RATED_L to also mask that many rated items per user in-kernel.'''
    import jax.numpy as jnp
    from mfrec_tpu.ops.pallas_topk import (topn_scores_pallas,
                                           pad_items_for_pallas)
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(0, 0.3, (B, K)), jnp.float32)
    Q = rng.normal(0, 0.3, (I, K)).astype(np.float32)
    bu = jnp.asarray(rng.normal(0, 0.1, B), jnp.float32)
    bi = rng.normal(0, 0.1, I).astype(np.float32)
    Qp, bip = pad_items_for_pallas(Q, bi, 4096)
    Qp, bip = jnp.asarray(Qp), jnp.asarray(bip)
    kw = {}
    if rated_L:
        kw['rated_idx'] = jnp.asarray(
            rng.integers(0, I, (B, rated_L)).astype(np.int32))
        kw['rated_mask'] = jnp.ones((B, rated_L), jnp.float32)
    idx, sc = topn_scores_pallas(P, Qp, bu, bip, 0.0, n=n, block=4096, **kw)
    float(sc[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        idx, sc = topn_scores_pallas(P, Qp, bu, bip, 0.0, n=n, block=4096,
                                     **kw)
    float(sc[0, 0])
    per_call = (time.perf_counter() - t0) / iters
    print(json.dumps({
        'metric': 'topn_retrieval_users_per_s',
        'value': round(B / per_call, 1),
        'unit': 'users/s/chip (360k items, rank 64, top-10%s)' % (
            ', %d rated masked' % rated_L if rated_L else ''),
        'vs_baseline': None,
        'batch_s': round(per_call, 4),
    }))


def main():
    import jax
    import jax.numpy as jnp
    from mfrec_tpu.ops import sgd_mf

    U, I, N, K = 69878, 10677, 10_000_000, 64
    batch = int(os.environ.get('BENCH_BATCH', 1 << 15))
    epochs_per_block = int(os.environ.get('BENCH_EPOCHS', 5))
    blocks = int(os.environ.get('BENCH_BLOCKS', 3))

    mode = os.environ.get('BENCH_MODE', 'alternating')
    if mode == 'serving':
        return bench_serving(
            rated_L=int(os.environ.get('BENCH_RATED_L', 0)))
    config = 'ml10m'
    if mode == 'netflix':
        # Netflix-prize scale (BASELINE config 5) on one chip:
        # 480k users x 17.8k items, 100M ratings, rank 128
        U, I, N, K = 480_189, 17_770, 100_000_000, 128
        config = 'netflix100m_rank128'
        mode = 'alternating'
    users, items, vals = make_data(U, I, N)

    if mode == 'als':
        return bench_als(U, I, users, items)

    if mode == 'alternating':
        # scatter-free sorted-window epochs (fastest single-chip path)
        W = int(os.environ.get('BENCH_WINDOW', 256))
        pl_ = sgd_mf.sorted_pass_layout(users, items, vals, batch,
                                        axis='user', max_window=W)
        ql_ = sgd_mf.sorted_pass_layout(users, items, vals, batch,
                                        axis='item', max_window=W)
        W_user, W_item = pl_[-1], ql_[-1]
        p_layout = tuple(jnp.asarray(x) for x in pl_[:-1])
        q_layout = tuple(jnp.asarray(x) for x in ql_[:-1])
        st = sgd_mf.init_state(U + W_user, I + W_item, K)
        Paug, Qaug = sgd_mf.augment_factors(st.P, st.Q, st.bu, st.bi)
        mu = jnp.float32(vals.mean())
        pallas_mode = os.environ.get('BENCH_PALLAS', 'full')
        ep = sgd_mf.make_alternating_epoch(
            W_user, W_item, lr=0.05, K=0.02, bias_mode='fixed',
            use_pallas_agg=pallas_mode == 'agg',
            use_pallas_full=pallas_mode == 'full')
        state = (Paug, Qaug)

        def epoch(s):
            Pa, Qa = s
            Pa, Qa, rmse = ep(Pa, Qa, mu, p_layout, q_layout)
            return (Pa, Qa), rmse
    else:
        ub, ib, rb, mb = sgd_mf.batch_ratings(users, items, vals, batch,
                                              seed=0)
        ub, ib = jnp.asarray(ub), jnp.asarray(ib)
        rb, mb = jnp.asarray(rb), jnp.asarray(mb)
        state = sgd_mf.init_state(U, I, K)
        state = state._replace(mu=jnp.float32(vals.mean()))
        ep = sgd_mf.make_fused_epoch(batch, lr=0.002, K=0.02,
                                     bias_mode='fixed')
        epoch = lambda s: ep(s, ub, ib, rb, mb, None, None)

    # compile + warmup (value fetch: on relayed platforms
    # block_until_ready does not reliably block)
    state, rmse = epoch(state)
    float(rmse)

    times = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(epochs_per_block):
            state, rmse = epoch(state)
        float(rmse)           # one device->host sync per block
        times.append((time.perf_counter() - t0) / epochs_per_block)

    epoch_s = float(np.median(times))
    updates_per_s = N * K / epoch_s
    baseline = 3.7e7          # reference single-feature updates/s (BASELINE.md)
    print(json.dumps({
        'metric': ('ml10m_rank64_sgd_feature_rating_updates_per_s'
                   if config == 'ml10m'
                   else config + '_sgd_feature_rating_updates_per_s'),
        'value': round(updates_per_s, 1),
        'unit': 'updates/s/chip',
        'vs_baseline': round(updates_per_s / baseline, 2),
        'epoch_s': round(epoch_s, 4),
        'final_train_rmse': round(float(rmse), 4),
        'device': str(jax.devices()[0]),
        'batch': batch,
        'mode': mode,
    }))


def _main_with_retry():
    try:
        return main()
    except Exception as e:                      # transient relay errors
        print('bench attempt failed (%s); retrying once' % type(e).__name__,
              file=sys.stderr)
        return main()


if __name__ == '__main__':
    sys.exit(_main_with_retry())
