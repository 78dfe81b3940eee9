'''Pallas window aggregation vs. numpy segment sums (interpret mode).'''
import numpy as np
import jax.numpy as jnp

from mfrec_tpu.ops.pallas_window_agg import window_aggregate


def test_window_aggregate_matches_numpy():
    rng = np.random.default_rng(0)
    B, k, W = 512, 16, 64
    g = rng.normal(0, 1, (B, k)).astype(np.float32)
    kl = rng.integers(0, W, B).astype(np.int32)
    mask = (rng.random(B) > 0.1).astype(np.float32)
    g = g * mask[:, None]
    gsum, cnt = window_aggregate(jnp.asarray(g), jnp.asarray(kl),
                                 jnp.asarray(mask), W, chunk=128,
                                 interpret=True)
    gsum, cnt = np.asarray(gsum), np.asarray(cnt)
    want = np.zeros((W, k), np.float64)
    wcnt = np.zeros(W)
    for b in range(B):
        if mask[b] > 0:
            want[kl[b]] += g[b]
            wcnt[kl[b]] += 1
    np.testing.assert_allclose(gsum, want, atol=5e-2, rtol=1e-2)  # bf16
    np.testing.assert_array_equal(cnt, wcnt)
