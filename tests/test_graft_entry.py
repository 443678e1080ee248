"""Driver contract: __graft_entry__.dryrun_multichip must pass on a virtual
mesh (the bench rig has ONE real TPU, so the driver relies on the
self-provisioning path; this test runs the same body in-process on the
suite's 8 virtual CPU devices)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_dryrun_body_8_devices():
    from __graft_entry__ import _dryrun_body
    _dryrun_body(8)


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry
    fn, args = entry()
    out = np.asarray(jax.block_until_ready(jax.jit(fn)(*args)))
    assert out.dtype == np.uint8 and out.ndim == 3


def test_dryrun_subprocess_reexec(monkeypatch):
    """The self-provisioning branch: ask for more devices than visible so
    dryrun_multichip must re-exec in a subprocess with a forced CPU mesh."""
    from __graft_entry__ import dryrun_multichip
    n = len(jax.devices()) * 2  # force the subprocess path
    dryrun_multichip(n)
