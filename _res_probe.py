import numpy as np
import jax.numpy as jnp
from mfrec_tpu.ops.pallas_half_pass import half_pass_batch

B, k, W, T = 32768, 66, 256, 4
rng = np.random.default_rng(0)
window = jnp.asarray(rng.normal(0, 0.1, (W, k)), jnp.float32)
ff = jnp.asarray(rng.normal(0, 0.1, (B, k)), jnp.float32)
r = jnp.asarray(rng.uniform(1, 5, B), jnp.float32)
m = jnp.ones(B, jnp.float32)
kl = jnp.asarray(np.sort(rng.integers(0, W, B)).astype(np.int32))
lrv = jnp.full(k, 0.1, jnp.float32)
regv = jnp.full(k, 0.02, jnp.float32)
out, sse = half_pass_batch(window, ff, r, m, kl, lrv, regv, 3.5, W,
                           chunk=4096, inner_steps=T, resident=True)
print('resident ok', float(sse))
