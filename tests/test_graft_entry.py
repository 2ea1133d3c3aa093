"""Driver entry points survive a dead TPU tunnel (VERDICT r4 item 1a).

Round 4's MULTICHIP capture was killed by a `jax.devices()` probe in the
parent of a CPU-only gate while the axon tunnel was down. These tests pin
the fix: with the axon env var present, `dryrun_multichip` must re-exec
onto the virtual CPU mesh WITHOUT initializing any backend in the parent,
finish against a poisoned (unroutable) tunnel address, and respect its
wall-clock budget with a diagnosable error.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra, timeout=240):
    env = dict(os.environ)
    env.pop("NAVDV_MULTICHIP_REEXEC", None)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    code = ("import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO)
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_survives_dead_tunnel():
    # 192.0.2.0/24 is TEST-NET-1: guaranteed unroutable, so any backend
    # initialization in the parent would hang far past the child budget
    proc = _run({"PALLAS_AXON_POOL_IPS": "192.0.2.55"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip ok" in proc.stdout
    assert "re-exec onto a virtual 8-device CPU mesh" in proc.stdout
    # per-mesh progress lines make a future timeout tail diagnosable
    assert "mesh (data=8, lib=1)" in proc.stdout


def test_dryrun_budget_produces_diagnosable_error():
    proc = _run({"PALLAS_AXON_POOL_IPS": "192.0.2.55",
                 "NAVDV_MULTICHIP_BUDGET_S": "2"})
    assert proc.returncode != 0
    err = proc.stdout + proc.stderr
    assert "budget" in err
