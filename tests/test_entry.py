'''The driver entry points must compile and run (single chip + 8-dev mesh).'''
import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    idx, scores = jax.jit(fn)(*args)
    idx, scores = np.asarray(idx), np.asarray(scores)
    assert idx.shape == scores.shape == (64, 10)
    assert np.isfinite(scores).all()
    # scores strictly descending per row
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
