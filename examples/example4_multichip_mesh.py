'''
Multi-chip training + serving on a device mesh.

Runs the two mesh engines through the public model API — the all_gather
sharded alternating engine and the ring-rotation engine (ppermute shard
rotation, no factor replica) — then mesh-sharded top-N serving, on an
8-device mesh.  On a machine without 8 real devices it re-execs itself
onto a virtual 8-device CPU mesh (the tests/conftest.py recipe), so the
script runs anywhere; on a real v5e-8 the same code rides ICI.

Usage:  python examples/example4_multichip_mesh.py
'''
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8


def _reexec_virtual_mesh():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    flags = ' '.join(f for f in env.get('XLA_FLAGS', '').split()
                     if not f.startswith('--xla_force_host_platform_'
                                         'device_count'))
    env['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=%d'
                        % N_DEV).strip()
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    env['MFREC_EXAMPLE4_CHILD'] = '1'
    rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                        env=env).returncode
    sys.exit(rc)


def main():
    import jax
    if 'MFREC_EXAMPLE4_CHILD' in os.environ:
        # env vars alone don't override a platform preset applied at
        # interpreter start (sitecustomize) — force via config
        jax.config.update('jax_platforms', 'cpu')
    if len(jax.devices()) < N_DEV and 'MFREC_EXAMPLE4_CHILD' not in os.environ:
        print('< %d devices: re-running on a virtual CPU mesh' % N_DEV)
        _reexec_virtual_mesh()

    import numpy as np
    from mfrec_tpu.data.movielens import synthetic_ratings, train_test_split
    from mfrec_tpu.eval.metrics import test_predict_rating
    from mfrec_tpu.models.gd import GDRecommender

    U, I = 2000, 1200
    users, items, vals = synthetic_ratings(U, I, 60_000, rank=6, seed=3)
    (tu, ti, tv), u_test = train_test_split(users, items, vals,
                                            test_fraction=0.2)

    for engine in ('alternating_sharded', 'alternating_ring'):
        model = GDRecommender(U, I, {
            'engine': engine, 'nbr_features': 16,
            'learning_rate': 0.15, 'regularization_model': 0.02,
            'min_epochs': 30, 'max_epochs': 30, 'batch_size': 4096,
            'inner_steps': 2})
        model.set_ratings(tu, ti, tv)
        model.train(handle_bias=True)
        hist = model.get_rmse_history()
        rmse = test_predict_rating(model, u_test, 5000,
                                   predictor='predict_rating_with_bias',
                                   quiet=True)[0]
        print('%-22s train rmse %.4f -> %.4f | test rmse %.4f'
              % (engine, hist[0], hist[-1], rmse))

        # mesh-sharded top-N serving (items axis sharded + re-rank):
        # recommend_batch auto-selects the sharded path when >1 device
        ids, scores = model.recommend_batch(
            np.arange(8), nbr_recommendations=5)
        print('  top-5 for user 0:', ids[0].tolist())


if __name__ == '__main__':
    main()
