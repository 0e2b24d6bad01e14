import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; the driver runs entry()/dryrun_multichip itself

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    assert out[0].shape == args[1].shape


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
