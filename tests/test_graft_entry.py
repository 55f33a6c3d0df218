"""Driver entry points must stay healthy: entry() compiles and runs;
dryrun_multichip shards a full train step over the 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.slow  # the driver re-runs dryrun_multichip(8) every round
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


@pytest.mark.slow
def test_dryrun_multichip_odd_world():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
