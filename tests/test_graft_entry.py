"""The driver hooks (__graft_entry__) are the round-end contract — keep them
under test so refactors can't silently break entry() or dryrun_multichip()."""
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow  # the driver compile-checks entry() every round
def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow  # the driver runs dryrun_multichip(N) every round
def test_dryrun_multichip():
    graft.dryrun_multichip(8)
