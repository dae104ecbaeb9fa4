"""Driver entry-point contract: entry() compiles single-chip and
dryrun_multichip() jits the full sharded step over an 8-device mesh."""
import sys

import jax
import pytest


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip_eight_devices():
    import __graft_entry__ as g
    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)
