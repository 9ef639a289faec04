"""Driver-artifact integration tests: entry() compiles and runs; the
multi-chip dry run executes a full sharded train step on the test mesh."""

import numpy as np

import jax
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8,)
    assert set(np.asarray(out)).issubset({0, 1, 2})


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally
