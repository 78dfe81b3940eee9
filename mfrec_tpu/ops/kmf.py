'''
Kernel matrix-factorization SGD (Rendle & Schmidt-Thieme, RecSys'08).

Replaces ``mfrec/lib/kmf_train.pyx:103-278``.  Unlike the Funk loops, the
reference KMF already trains *all* features per rating, so the fused
mini-batch formulation is near-isomorphic: prediction is a full dot product
through a link function (logistic or identity), biases are learned jointly.

* serial tier: exact order-faithful sweep (oracle / fold-in retrains).
* fused tier: mini-batch scan — gathers, batched dot, link, scatter-adds.
'''
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _link(dot, kernel, lo, hi):
    rng = hi - lo
    if kernel == 'logistic':
        sig = jax.nn.sigmoid(dot)
        pred = lo + sig * rng
        dgrad = sig * (1.0 - sig) * rng      # dpred/ddot (kmf_train.pyx:165)
    else:                                    # 'linear' (kmf_train.pyx:250-256)
        pred = dot
        dgrad = jnp.ones_like(dot)
    return pred, dgrad


@functools.partial(jax.jit, static_argnames=('kernel', 'update_users',
                                             'update_items'))
def kmf_serial_epoch(P, Q, bu, bi, uidx, iidx, r, lr, K_users, K_items,
                     K_bias, kernel='logistic', lo=1.0, hi=5.0,
                     update_users=True, update_items=True):
    '''One strictly-sequential epoch (reference ``train_logistic_kernel``
    ``kmf_train.pyx:149-184`` / ``train_linear_kernel`` ``:241-273``).
    Biases use ``lr`` (not the per-side rates) exactly as the reference does
    at ``kmf_train.pyx:169-171``.  Returns (P, Q, bu, bi, rmse).'''
    n = uidx.shape[0]

    def body(s, carry):
        P, Q, bu, bi, sse = carry
        u, i = uidx[s], iidx[s]
        dot = P[u] @ Q[i] + bu[u] + bi[i]
        pred, dgrad = _link(dot, kernel, lo, hi)
        err = r[s] - pred
        sse = sse + err * err
        grad = err * dgrad
        cf = P[u]
        mf = Q[i]
        if update_users:
            bu = bu.at[u].add(lr * (grad - K_bias * bu[u]))
        if update_items:
            bi = bi.at[i].add(lr * (grad - K_bias * bi[i]))
        if update_items:
            Q = Q.at[i].add(lr * (grad * cf - K_items * mf))
        if update_users:
            P = P.at[u].add(lr * (grad * mf - K_users * cf))
        return P, Q, bu, bi, sse

    P, Q, bu, bi, sse = jax.lax.fori_loop(
        0, n, body, (P, Q, bu, bi, jnp.zeros((), P.dtype)))
    return P, Q, bu, bi, jnp.sqrt(sse / n)


def make_kmf_fused_epoch(kernel='logistic', lr=0.01, K_users=0.1,
                         K_items=0.1, K_bias=0.007, lo=1.0, hi=5.0,
                         update_users=True, update_items=True):
    '''Mini-batch epoch builder; same data layout as
    ``sgd_mf.make_fused_epoch`` ([nb, B] + mask).'''

    def batch_step(carry, batch):
        P, Q, bu, bi = carry
        u, i, r, m = batch
        pu, qi = P[u], Q[i]
        dot = (pu * qi).sum(-1) + bu[u] + bi[i]
        pred, dgrad = _link(dot, kernel, lo, hi)
        err = (r - pred) * m
        sse = (err * err).sum()
        grad = err * dgrad
        if update_users:
            bu = bu.at[u].add(lr * (grad - K_bias * bu[u] * m))
            P = P.at[u].add(lr * (grad[:, None] * qi - K_users * pu * m[:, None]))
        if update_items:
            bi = bi.at[i].add(lr * (grad - K_bias * bi[i] * m))
            Q = Q.at[i].add(lr * (grad[:, None] * pu - K_items * qi * m[:, None]))
        return (P, Q, bu, bi), sse

    @jax.jit
    def epoch_fn(P, Q, bu, bi, ub, ib, rb, mb):
        (P, Q, bu, bi), sses = jax.lax.scan(
            batch_step, (P, Q, bu, bi), (ub, ib, rb, mb))
        n = jnp.maximum(mb.sum(), 1.0)
        return P, Q, bu, bi, jnp.sqrt(sses.sum() / n)

    return epoch_fn
