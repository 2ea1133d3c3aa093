"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4.5) so
multi-device sharding tests run without a TPU pod. Must run before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig  # noqa: E402
from navdv_tpu.landscape import make_landscape  # noqa: E402
from navdv_tpu.routes import make_route  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> SimConfig:
    """Tiny config for fast oracle<->JAX parity runs."""
    return SimConfig(
        sensor=SensorConfig(n_radial=4, n_azimuth=24, az_upsample=3, r_min=2.0, r_max=8.0),
        scan=ScanConfig(n_headings=12, scan_step_bins=2),
        agent=AgentConfig(step_size=1.0, goal_radius=2.0, corridor=15.0, max_steps=48),
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
