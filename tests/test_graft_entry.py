"""The driver entry points (__graft_entry__) must stay green: the driver
compile-checks entry() single-chip and runs dryrun_multichip on a virtual
device mesh after every round."""

import sys

import jax
import numpy as np


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_entry_forward_jits():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].y.shape[0],)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    g = _load()
    g.dryrun_multichip(8)  # asserts sharded == single-device internally


def test_dryrun_multichip_odd():
    # odd device count exercises the model_axis=1 (pure data-parallel) branch
    g = _load()
    g.dryrun_multichip(3)
