import time
import numpy as np
import jax.numpy as jnp
from mfrec_tpu.ops.pallas_topk import topn_scores_pallas, pad_items_for_pallas

I, K, B = 360_000, 64, 256
rng = np.random.default_rng(0)
P = jnp.asarray(rng.normal(0, 0.3, (B, K)), jnp.float32)
Q = rng.normal(0, 0.3, (I, K)).astype(np.float32)
bu = jnp.asarray(rng.normal(0, 0.1, B), jnp.float32)
bi = rng.normal(0, 0.1, I).astype(np.float32)
Qp, bip = pad_items_for_pallas(Q, bi, 4096)
Qp, bip = jnp.asarray(Qp), jnp.asarray(bip)

for n in (1, 2, 5, 10, 20):
    idx, sc = topn_scores_pallas(P, Qp, bu, bip, 0.0, n=n, block=4096)
    float(sc[0, 0])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        idx, sc = topn_scores_pallas(P, Qp, bu, bip, 0.0, n=n, block=4096)
    float(sc[0, 0])
    per = (time.perf_counter() - t0) / iters
    print('n=%2d  %.4f s/call  %.0f users/s' % (n, per, B / per))
