"""Guard the driver entry points (__graft_entry__.py) against regressions:
the driver compile-checks entry() single-chip and runs dryrun_multichip on
virtual CPU devices."""
import importlib.util
import os

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..",
                              "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(graft, n):
    graft.dryrun_multichip(n)
