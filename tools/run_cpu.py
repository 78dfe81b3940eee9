'''Run a repo script with JAX forced onto the CPU backend.

In this environment JAX_PLATFORMS=axon is preset and sitecustomize
imports jax at interpreter start, so a plain ``python examples/...``
grabs the (single) TPU chip and contends with any benchmark running
through the relay.  Env tweaks cannot undo that — the knob that works
is ``jax.config.update('jax_platforms', 'cpu')`` before the first
backend use (CLAUDE.md "Environment gotchas").

    python tools/run_cpu.py examples/example2_movielens_100k_sgd.py [args]
'''
import os
import runpy
import sys

import jax

jax.config.update('jax_platforms', 'cpu')

if len(sys.argv) < 2:
    sys.exit(__doc__)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name='__main__')
