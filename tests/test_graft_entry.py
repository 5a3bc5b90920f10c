"""The driver's entry points must stay importable and compilable: entry()
jits on whatever backend is active (CPU here), and dryrun_multichip runs
the full 8-device parallel suite (it forces the virtual CPU mesh itself;
the conftest has already initialized an 8-device CPU backend, which is the
post-init path of _force_virtual_cpu_mesh)."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any failure
