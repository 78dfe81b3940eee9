'''utils: scaled sigmoid (reference math_.py) and training telemetry.'''
import time

import numpy as np

from mfrec_tpu.utils.math_ import sigmoid
from mfrec_tpu.utils.profiling import EpochTimer


def test_sigmoid_reference_semantics():
    # maps R onto (y0, y0 + scale_range) = the [1, 5] rating scale
    assert abs(sigmoid(0.0) - 3.0) < 1e-12          # midpoint
    # saturates to the scale bounds (to f64 rounding at |x|=50)
    assert abs(sigmoid(-50.0) - 1.0) < 1e-9
    assert abs(sigmoid(50.0) - 5.0) < 1e-9
    # vectorized + monotone
    xs = np.linspace(-5, 5, 11)
    ys = sigmoid(xs)
    assert ys.shape == xs.shape and (np.diff(ys) > 0).all()
    # parameter semantics: x0 shifts the midpoint, p1 sharpens
    assert abs(sigmoid(2.0, x0=2.0) - 3.0) < 1e-12
    assert sigmoid(1.0, p1=4.0) > sigmoid(1.0, p1=1.0)


def test_epoch_timer_summary():
    t = EpochTimer(nbr_ratings=1000, rank=8)
    assert t.summary() == {}
    for _ in range(3):
        with t.epoch():
            time.sleep(0.01)
    s = t.summary()
    assert s['epochs'] == 3
    assert s['epoch_s_median'] >= 0.01
    assert abs(s['feature_rating_updates_per_s']
               - 1000 * 8 / s['epoch_s_median']) < 1e-6
