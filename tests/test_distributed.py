"""Multi-host entry test (VERDICT r4 item 4; SURVEY.md §4.5/§5.8).

``parallel/distributed.py`` was the one untested module: a thin wrapper over
``jax.distributed.initialize`` + a global mesh. This test runs a REAL
2-process CPU coordinator on localhost (JAX's Gloo CPU collectives), each
process with 2 virtual CPU devices, and asserts ``init_distributed`` +
``global_mesh`` + cross-process ``lax.pmin`` all work — see
``_distributed_child.py`` for the child program.
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_distributed_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # the axon sitecustomize registers the TPU plugin at interpreter startup
    # (before any child code runs); the coordinator test is CPU-only
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the child appends its own --xla_force_host_platform_device_count=2
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    return env


@pytest.mark.slow
def test_two_process_coordinator_pmin():
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"coordinator test timed out; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} rc={p.returncode}:\n{out}"
        assert f"DIST_OK {i}" in out, f"process {i} output:\n{out}"
