'''
SGD matrix-factorization kernels.

Two tiers, replacing the nine serial Cython loops of the reference
(``mfrec/lib/gd_estimator.pyx:210-996``):

* **serial tier** (`serial_feature_epoch`, `update_cache`) — bit-faithful
  re-expression of the reference's Funk-style feature-by-feature sweep
  (cached partial dot product, trailing-value term, [min,max] clamping,
  pre-update gradient reads).  Order-dependent and sequential by
  construction; used as the exactness oracle and for small fold-in
  retrains.  Reference: ``gd_estimator.pyx:38-73`` (estimator),
  ``:489-582`` (fixed-bias loop), ``:691-779`` (no-bias loop),
  ``:401-483`` (learned-bias loop).

* **fused tier** (`make_fused_epoch`) — the TPU performance path: all
  features trained simultaneously with mini-batch SGD; each batch does two
  row gathers, an MXU-friendly batched dot, and duplicate-accumulating
  scatter-adds.  Update order differs from the serial reference, so parity
  is defined as final-RMSE tolerance (documented deviation; see
  SURVEY.md §7 "hard parts").

All functions are pure: they take and return factor pytrees.
'''
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MFState(NamedTuple):
    '''Factor/bias pytree.  P: [U, k] user factors; Q: [I, k] item factors;
    bu/bi: learned or precomputed biases; mu: overall average; Y: [I, k]
    implicit-feedback item factors (SVD++ ``y``), may be zeros.'''
    P: jax.Array
    Q: jax.Array
    bu: jax.Array
    bi: jax.Array
    mu: jax.Array
    Y: jax.Array


def init_state(nbr_users, nbr_items, k, feature_init=0.1, mode='constant',
               seed=0, dtype=jnp.float32):
    '''`constant` = reference SGD init (``gradient_descent.py:523-525``);
    `normal` = reference KMF init (``mf.py:124-133``).'''
    if mode == 'constant':
        P = jnp.full((nbr_users, k), feature_init, dtype)
        Q = jnp.full((nbr_items, k), feature_init, dtype)
    else:
        ku, ki = jax.random.split(jax.random.PRNGKey(seed))
        P = (jax.random.normal(ku, (nbr_users, k)) * feature_init).astype(dtype)
        Q = (jax.random.normal(ki, (nbr_items, k)) * feature_init).astype(dtype)
    z = lambda n: jnp.zeros((n,), dtype)
    return MFState(P=P, Q=Q, bu=z(nbr_users), bi=z(nbr_items),
                   mu=jnp.zeros((), dtype), Y=jnp.zeros((nbr_items, k), dtype))


def clamp(x, lo=1.0, hi=5.0):
    '''Rating clamp.  The reference's ``clamping`` ignores its min/max
    arguments and hardcodes [1, 5] (``gd_estimator.pyx:26-35``, a latent
    defect); here the bounds are honored, with the same defaults.'''
    return jnp.clip(x, lo, hi)


# --------------------------------------------------------------------------
# Serial tier — exact reference semantics (oracle / small retrains)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('bias_mode', 'update_users',
                                             'update_items'))
def serial_feature_epoch(pf, qf, cache, uidx, iidx, r, f, dim, f_init, lr, K,
                         mu, bu, bi, lr_bu, lr_bi, K_bias,
                         bias_mode='none', lo=1.0, hi=5.0,
                         update_users=True, update_items=True,
                         P=None, Q=None):
    '''One strictly-sequential epoch of single-feature Funk SGD.

    pf: [U] user feature-f column, qf: [I] item feature-f column.
    cache: [N] per-rating frozen prediction from features < f
    (``gd_estimator.pyx:535-538``).  Returns (pf, qf, bu, bi, rmse).

    bias_mode:
      'none'    -> baseline 1.0 (``estimator_loop_without_bias`` :691)
      'fixed'   -> baseline mu+bi+bu, cached (``estimator_loop_with_bias`` :489)
      'learned' -> full dot product each step + SGD on biases
                   (``estimator_loop_with_learned_bias`` :401); needs P, Q.
    update_users/update_items replicate the fold-in masks of
    ``estimator_loop_with_bias_dev`` (:664-667).
    '''
    n = uidx.shape[0]
    trailing = (dim - f - 1) * f_init * f_init

    def body(s, carry):
        pf, qf, bu, bi, sse = carry
        u = uidx[s]
        i = iidx[s]
        if bias_mode == 'learned':
            # full_estimator (gd_estimator.pyx:118-148): full dot, no cache
            full = mu + bi[i] + bu[u] + P[u] @ Q[i] - P[u, f] * Q[i, f] \
                + pf[u] * qf[i]
            p = clamp(full, lo, hi)
        else:
            base = jnp.where(cache[s] > 0, cache[s],
                             1.0 if bias_mode == 'none'
                             else mu + bi[i] + bu[u])
            p = clamp(base + pf[u] * qf[i], lo, hi)
        p = clamp(p + trailing, lo, hi)
        err = r[s] - p
        sse = sse + err * err
        cf = pf[u]
        mf = qf[i]
        if bias_mode == 'learned':
            bu = bu.at[u].add(lr_bu * (err - K_bias * bu[u]))
            bi = bi.at[i].add(lr_bi * (err - K_bias * bi[i]))
        if update_items:
            qf = qf.at[i].add(lr * (err * cf - K * mf))
        if update_users:
            pf = pf.at[u].add(lr * (err * mf - K * cf))
        return pf, qf, bu, bi, sse

    pf, qf, bu, bi, sse = jax.lax.fori_loop(
        0, n, body, (pf, qf, bu, bi, jnp.zeros((), pf.dtype)))
    rmse = jnp.sqrt(sse / n)
    return pf, qf, bu, bi, rmse


@functools.partial(jax.jit, static_argnames=('bias_mode',))
def update_cache(pf, qf, cache, uidx, iidx, mu, bu, bi, bias_mode='none',
                 lo=1.0, hi=5.0):
    '''Freeze feature f into the per-rating cache after it converges
    (``gd_estimator.pyx:573-580``).  Order-independent, so vectorized.'''
    base = jnp.where(cache > 0, cache,
                     1.0 if bias_mode == 'none' else mu + bi[iidx] + bu[uidx])
    return clamp(base + pf[uidx] * qf[iidx], lo, hi)


# --------------------------------------------------------------------------
# Fused tier — mini-batch all-features epoch (the TPU performance path)
# --------------------------------------------------------------------------

def make_fused_epoch(batch_size, lr, K, lr_bu=0.0, lr_bi=0.0, K_bias=0.0,
                     bias_mode='fixed', clamp_pred=True, lo=1.0, hi=5.0,
                     implicit=False, donate=True):
    '''Build a jitted epoch function.

    The returned ``epoch_fn(state, ub, ib, rb, mb) -> (state, rmse)`` takes
    ratings pre-reshaped to [nb, B] (+ a validity mask for padding) and scans
    mini-batches: gather P/Q rows, predict, scatter-add the regularized
    gradient step.  Duplicate indices within a batch accumulate — i.e.
    synchronous mini-batch SGD, the conflict-free replacement for the
    reference's serial sweep (``gd_estimator.pyx:363-378``).

    With ``implicit=True`` the state's Y factors are used SVD++-style:
    prediction uses (p_u + |N(u)|^-1/2 * sum_{j in N(u)} y_j) . q_i, and the
    per-batch y updates are scattered over the users' padded rating lists
    (reference intent of ``estimator_loop_with_implicit_feedback``
    :785-898 — whose inner-loop index clobbering we deliberately do not
    replicate, see SURVEY.md §2.6).  Requires extra args (flists [U, L],
    fmask [U, L]): each user's padded rated-item list, gathered per batch
    on device.
    '''

    def make_batch_step(flists, fmask):
        def batch_step(state, batch):
            u, i, r, m = batch
            P, Q, bu, bi, mu, Y = state
            pu = P[u]
            qi = Q[i]
            if implicit:
                fl = flists[u]                     # [B, L]
                fm = fmask[u]
                ysum = (Y[fl] * fm[..., None]).sum(1)
                fnorm = jax.lax.rsqrt(jnp.maximum(fm.sum(1), 1.0))[:, None]
                pu_eff = pu + fnorm * ysum
            else:
                pu_eff = pu
            dot = (pu_eff * qi).sum(-1)
            if bias_mode == 'none':
                pred = 1.0 + dot
            else:
                pred = mu + bu[u] + bi[i] + dot
            if clamp_pred:
                pred = clamp(pred, lo, hi)
            err = (r - pred) * m
            sse = (err * err).sum()

            gP = err[:, None] * qi - K * pu * m[:, None]
            gQ = err[:, None] * pu_eff - K * qi * m[:, None]
            P = P.at[u].add(lr * gP)
            Q = Q.at[i].add(lr * gQ)
            if bias_mode == 'learned':
                bu = bu.at[u].add(lr_bu * (err - K_bias * bu[u] * m))
                bi = bi.at[i].add(lr_bi * (err - K_bias * bi[i] * m))
            if implicit:
                gy = (err[:, None] * fnorm * qi)[:, None, :] * fm[..., None] \
                    - K * Y[fl] * fm[..., None]
                Y = Y.at[fl].add(lr * gy)
            return MFState(P, Q, bu, bi, mu, Y), sse
        return batch_step

    def epoch_fn(state, ub, ib, rb, mb, flists=None, fmask=None):
        state, sses = jax.lax.scan(make_batch_step(flists, fmask), state,
                                   (ub, ib, rb, mb))
        n = jnp.maximum(mb.sum(), 1.0)
        return state, jnp.sqrt(sses.sum() / n)

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def batch_ratings(uidx, iidx, r, batch_size, seed=None):
    '''Host-side: pad and reshape COO ratings to [nb, B] scan layout.
    Returns (ub, ib, rb, mask).'''
    n = uidx.shape[0]
    if seed is not None:
        perm = np.random.default_rng(seed).permutation(n)
        uidx, iidx, r = uidx[perm], iidx[perm], r[perm]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    mask = np.ones(n, np.float32)
    uidx = np.pad(uidx, (0, pad)).reshape(nb, batch_size)
    iidx = np.pad(iidx, (0, pad)).reshape(nb, batch_size)
    r = np.pad(r, (0, pad)).reshape(nb, batch_size).astype(np.float32)
    mask = np.pad(mask, (0, pad)).reshape(nb, batch_size)
    return uidx, iidx, r, mask
