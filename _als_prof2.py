import time
import numpy as np
import jax
import jax.numpy as jnp
from mfrec_tpu.data.movielens import ratings_from_arrays
from mfrec_tpu.ops import als as als_ops
import bench as B

U, I, N, K = 69878, 10677, 10_000_000, 64
users, items, vals = B.make_data(U, I, N)
r = ratings_from_arrays(users, items, np.ones(N, np.float32), U, I)
rng = np.random.default_rng(0)
P = jnp.asarray(rng.normal(0, .1, (U, K)), jnp.float32)
Q = jnp.asarray(rng.normal(0, .1, (I, K)), jnp.float32)

for axis, F_fixed, n_upd in (('user', Q, U), ('item', P, I)):
    buckets = r.padded_rows(axis=axis)
    out = jnp.zeros((n_upd, K), jnp.float32)
    HH = F_fixed.T @ F_fixed
    HHreg = HH + 0.015 * jnp.eye(K)
    for rows, nbr_idx, nbr_val, mask in buckets:
        args = (jnp.asarray(rows), jnp.asarray(nbr_idx),
                jnp.asarray(nbr_val), jnp.asarray(mask),
                jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.015))
        o1 = als_ops._bucket_solve(F_fixed, out, HH, *args,
                                   gram_dtype=jnp.bfloat16)
        float(o1[0, 0])
        o2 = als_ops._bucket_cg(F_fixed, out, HHreg, *args, steps=6)
        float(o2[0, 0])
        t0 = time.perf_counter()
        o1 = als_ops._bucket_solve(F_fixed, out, HH, *args,
                                   gram_dtype=jnp.bfloat16)
        float(o1[0, 0]); t1 = time.perf_counter()
        o2 = als_ops._bucket_cg(F_fixed, out, HHreg, *args, steps=6)
        float(o2[0, 0]); t2 = time.perf_counter()
        print(f'{axis} R={rows.shape[0]:6d} L={nbr_idx.shape[1]:7d} '
              f'solve {t1-t0:.4f}s cg {t2-t1:.4f}s', flush=True)
