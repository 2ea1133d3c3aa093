"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4.5) so
multi-device sharding tests run without a TPU pod.

The environment presets JAX_PLATFORMS=axon and a sitecustomize that registers
the TPU plugin at interpreter startup — which also breaks
--xla_force_host_platform_device_count. So when the axon env is detected, we
re-exec pytest once with a cleaned environment (after stopping pytest's fd
capture so the child's output reaches the caller).
"""

import os
import sys

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "NAVDV_TEST_REEXEC"
)


def pytest_configure(config):
    if _NEEDS_REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["NAVDV_TEST_REEXEC"] = "1"
        os.execvpe(
            sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
        )


if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # replace (not keep) any inherited device-count flag: a stale value != 8
    # would break every multi-device test
    _flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    _flags.append("--xla_force_host_platform_device_count=8")
    os.environ["XLA_FLAGS"] = " ".join(_flags)

    import numpy as np
    import pytest

    from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
    from navdv_tpu.landscape import make_landscape
    from navdv_tpu.routes import make_route

    @pytest.fixture(scope="session")
    def small_cfg() -> SimConfig:
        """Tiny config for fast oracle<->JAX parity runs."""
        return SimConfig(
            sensor=SensorConfig(
                n_radial=4, n_azimuth=24, az_upsample=3, r_min=2.0, r_max=8.0
            ),
            scan=ScanConfig(n_headings=12, scan_step_bins=2),
            agent=AgentConfig(
                step_size=1.0, goal_radius=2.0, corridor=15.0, max_steps=48
            ),
            capture_spacing=1.5,
        )

    @pytest.fixture(scope="session")
    def small_world():
        """(landscape, route) pair small enough for the NumPy oracle."""
        landscape = make_landscape("blobs", size=(128, 128), seed=3, n_features=60)
        route = make_route("line", size=(128, 128), margin=32.0, length=40.0)
        return landscape, route

    @pytest.fixture(scope="session")
    def rng():
        return np.random.default_rng(0)
