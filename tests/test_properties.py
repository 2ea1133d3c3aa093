"""Property-based tests (SURVEY.md §4.2) with hypothesis."""

import numpy as np
from hypothesis import given, settings, strategies as st

from navdv_tpu import oracle
from navdv_tpu.config import ScanConfig, SensorConfig, SimConfig


SMALL = SimConfig(
    sensor=SensorConfig(n_radial=3, n_azimuth=12, az_upsample=2, r_min=1.5, r_max=5.0),
    scan=ScanConfig(n_headings=8, scan_step_bins=3),
)


def _rand_img(seed, shape=(3, 12)):
    return np.random.default_rng(seed).uniform(size=shape)


@given(seed=st.integers(0, 10**6))
@settings(max_examples=20, deadline=None)
def test_ssd_nonneg_and_zero_iff_equal(seed):
    a, b = _rand_img(seed), _rand_img(seed + 1)
    assert oracle.ssd(a, a) == 0.0
    assert oracle.ssd(a, b) >= 0.0


@given(seed=st.integers(0, 10**6), scale=st.floats(0.1, 10.0), off=st.floats(-5, 5))
@settings(max_examples=20, deadline=None)
def test_ncc_affine_invariant(seed, scale, off):
    a = _rand_img(seed)
    # eps in the z-score variance gives O(eps/var) bias, so not exactly 0
    assert abs(oracle.ncc_distance(a, scale * a + off)) < 1e-4


@given(seed=st.integers(0, 10**6))
@settings(max_examples=10, deadline=None)
def test_familiarity_of_exact_library_view_is_zero(seed):
    """The distance of a view to a library containing it is the min (= 0)."""
    rng = np.random.default_rng(seed)
    lib = rng.uniform(size=(6, 3, 12))
    i = int(rng.integers(0, 6))
    dists = [oracle.ssd(lib[i], v) for v in lib]
    assert min(dists) == 0.0 and np.argmin(dists) == i


@given(seed=st.integers(0, 10**6))
@settings(max_examples=10, deadline=None)
def test_argmin_invariant_to_library_permutation(seed):
    rng = np.random.default_rng(seed)
    lib = rng.uniform(size=(7, 3, 12))
    cand = rng.uniform(size=(5, 3, 12))
    fam1 = [min(oracle.ssd(c, v) for v in lib) for c in cand]
    perm = rng.permutation(7)
    fam2 = [min(oracle.ssd(c, v) for v in lib[perm]) for c in cand]
    np.testing.assert_allclose(fam1, fam2)


@given(
    x=st.floats(20, 100),
    y=st.floats(20, 100),
    theta=st.floats(-10, 10),
    k=st.integers(0, 7),
)
@settings(max_examples=15, deadline=None)
def test_step_kinematics_preserve_step_size(x, y, theta, k):
    """|delta pose| == step_size regardless of chosen heading."""
    cfg = SMALL
    shifts = cfg.scan.shifts()
    theta2 = theta + shifts[k] * cfg.sensor.bin_width
    dx = cfg.agent.step_size * np.cos(theta2)
    dy = cfg.agent.step_size * np.sin(theta2)
    assert abs(np.hypot(dx, dy) - cfg.agent.step_size) < 1e-9


@given(seed=st.integers(0, 10**6), shift=st.integers(-24, 24))
@settings(max_examples=10, deadline=None)
def test_rotation_shift_consistency(seed, shift):
    """Oracle invariant: pool(roll(pano, s)) == view at theta + s*binw."""
    rng = np.random.default_rng(seed)
    landscape = rng.uniform(size=(64, 64))
    cfg = SMALL
    x, y, th = 32.0, 32.0, float(rng.uniform(0, 6.28))
    pano = oracle.render_panorama(landscape, x, y, th, cfg)
    rolled = oracle.pool_view(pano, shift, cfg)
    direct = oracle.render_view(
        landscape, x, y, th + shift * cfg.sensor.bin_width, cfg
    )
    np.testing.assert_allclose(rolled, direct, atol=1e-9)
