"""The driver contract: entry() compiles, dryrun_multichip(8) runs a full
sharded train step on the CPU mesh (kept in-suite so it can't rot)."""
import sys

import jax
import pytest


def test_dryrun_multichip_8(capsys):
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
    out = capsys.readouterr().out
    assert 'loss=' in out and 'ikr=' in out


def test_entry_shapes():
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import entry
    fn, (params, ids) = entry()
    assert ids.shape == (2, 1024)
    # trace-only check (full base compile on CPU is slow); eval_shape
    # validates the program builds without running it
    out = jax.eval_shape(fn, params, ids)
    assert out.shape == (2, 1024, 1190)
