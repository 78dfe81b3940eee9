'''Failure detection / recovery (engine.trainer.ResilientDriver).

The reference library has no failure handling at all (SURVEY §5 —
bare try/except swallowing, base.py:249-255); this subsystem detects a
diverged epoch (non-finite or blown-up RMSE), rolls back to the last
good snapshot, rebuilds the epoch at a backed-off learning rate and
resumes — and optionally persists snapshots for crash resume.
'''
import numpy as np
import pytest

from mfrec_tpu.engine.trainer import ResilientDriver
from mfrec_tpu.models.gd import GDRecommender


def _counting_factory(fail_at, log):
    '''epoch_factory whose scale-1.0 epochs blow up at epoch ``fail_at``
    and whose backed-off epochs converge; state counts good epochs.'''

    def factory(scale):
        log.append(scale)

        def epoch(state):
            n = int(state)
            if scale == 1.0:
                rmse = np.inf if n >= fail_at else 1.0 - 0.1 * n
            else:
                rmse = 0.5 - 0.01 * n
            return np.asarray(n + 1), rmse
        return epoch
    return factory


def test_rollback_restores_state_and_history():
    log = []
    drv = ResilientDriver(min_epochs=0, max_epochs=6, min_improvement=0.0,
                          snapshot_every=1, max_retries=1)
    out = drv.run(_counting_factory(fail_at=2, log=log), np.asarray(0))
    # epochs 0,1 succeed at scale 1.0 (rmse 1.0, 0.9); epoch 2 fails ->
    # rollback to the epoch-2 snapshot, backoff to 0.5, resume there
    assert log == [1.0, 0.5]
    assert drv.recoveries == 1
    assert drv.lr_scale == 0.5
    # failed epoch's rmse never entered the history; pre-failure entries
    # survived the rollback
    assert drv.history[:2] == [1.0, 0.9]
    assert all(np.isfinite(drv.history))
    # state replays from the snapshot (2 good + 4 recovered epochs), not
    # from zero and not counting the failed epoch
    assert int(out) == 6


def test_retry_budget_exhausted_raises():
    def factory(scale):
        def epoch(state):
            return state, np.nan
        return epoch
    drv = ResilientDriver(0, 10, 0.0, max_retries=2)
    with pytest.raises(FloatingPointError):
        drv.run(factory, np.asarray(0))
    assert drv.recoveries == 2


def test_blowup_detection_without_nan():
    '''A 5x RMSE jump counts as failure even while finite.'''
    calls = []

    def factory(scale):
        calls.append(scale)

        def epoch(state):
            n = int(state)
            if scale == 1.0:
                rmse = [1.0, 0.9, 5.5][min(n, 2)]
            else:
                rmse = 0.8 - 0.01 * n
            return np.asarray(n + 1), rmse
        return epoch
    drv = ResilientDriver(0, 5, 0.0, snapshot_every=1, blowup_factor=4.0,
                          max_retries=1)
    drv.run(factory, np.asarray(0))
    assert drv.recoveries == 1
    assert 5.5 not in drv.history


def test_disk_snapshot_resume(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    log = []
    path = str(tmp_path / 'resil_ck')
    drv = ResilientDriver(min_epochs=0, max_epochs=4, min_improvement=0.0,
                          snapshot_every=2, checkpoint_dir=path)
    drv.run(_counting_factory(fail_at=99, log=log), np.asarray(0))
    snap = drv.load_snapshot()
    assert snap is not None
    assert int(snap['epoch']) == 4
    assert int(snap['state']) == 4
    assert len(list(snap['history'])) == 4


def test_gd_alternating_recovers_from_divergent_lr(tiny_dataset):
    '''Model-level: an absurd learning rate NaNs the alternating tier;
    with resilience on, training rolls back, backs the rate off, and
    finishes finite.'''
    (users, items, vals), _ = tiny_dataset
    U, I = int(users.max()) + 1, int(items.max()) + 1
    m = GDRecommender(U, I, {
        'nbr_features': 8, 'min_epochs': 4, 'max_epochs': 8,
        'min_improvement': 0.0, 'engine': 'alternating',
        'batch_size': 1024, 'inner_steps': 2,
        'resilience': 25, 'resilience_snapshot_every': 1,
    })
    m.learning_rate = 1e4          # honored (DefaultRate sentinel)
    m.set_ratings(users, items, vals)
    m.train()
    assert np.isfinite(m.P).all() and np.isfinite(m.Q).all()
    assert all(np.isfinite(r) for r in m.rmse_history)
    assert np.isfinite(m.predict(0, 0))


def test_gd_resilience_off_still_raises(tiny_dataset):
    (users, items, vals), _ = tiny_dataset
    U, I = int(users.max()) + 1, int(items.max()) + 1
    m = GDRecommender(U, I, {
        'nbr_features': 8, 'min_epochs': 4, 'max_epochs': 8,
        'engine': 'alternating', 'batch_size': 1024, 'inner_steps': 2,
    })
    m.learning_rate = 1e4
    m.set_ratings(users, items, vals)
    with pytest.raises(FloatingPointError):
        m.train()
