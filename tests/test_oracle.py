"""Oracle self-consistency: the frozen semantics must satisfy the SEMANTICS.md
invariants and reproduce the literature behavior (SURVEY.md §4.1–4.3)."""

import numpy as np
import pytest

from navdv_tpu import oracle
from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
from navdv_tpu.landscape import make_landscape
from navdv_tpu.routes import make_route


def test_ssd_identity_and_symmetry(rng):
    a = rng.uniform(size=(4, 24))
    b = rng.uniform(size=(4, 24))
    assert oracle.ssd(a, a) == 0.0
    assert oracle.ssd(a, b) == pytest.approx(oracle.ssd(b, a))
    assert oracle.ssd(a, b) > 0


def test_ncc_properties(rng):
    a = rng.uniform(size=(4, 24))
    # perfectly correlated with itself
    assert oracle.ncc_distance(a, a) == pytest.approx(0.0, abs=1e-6)
    # invariant to affine intensity change (SURVEY.md §4.1)
    assert oracle.ncc_distance(a, 3.0 * a + 0.7) == pytest.approx(0.0, abs=1e-5)
    # anti-correlated -> distance 2
    assert oracle.ncc_distance(a, -a) == pytest.approx(2.0, abs=1e-5)


def test_rotation_is_cyclic_shift(small_cfg, small_world):
    """SEMANTICS.md §3: view at theta + s*binw == rolled+pooled panorama."""
    landscape, _ = small_world
    s = small_cfg.sensor
    x, y, theta = 60.0, 64.0, 0.7
    pano = oracle.render_panorama(landscape, x, y, theta, small_cfg)
    for shift in [0, 1, 5, -4, s.n_fine // 2]:
        direct = oracle.render_view(
            landscape, x, y, theta + shift * s.bin_width, small_cfg
        )
        rolled = oracle.pool_view(pano, shift, small_cfg)
        np.testing.assert_allclose(rolled, direct, atol=1e-9)


def test_resample_route_spacing():
    route = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 5.0]])
    pts, headings = oracle.resample_route(route, 1.0)
    dists = np.hypot(*np.diff(pts, axis=0).T)
    np.testing.assert_allclose(dists, 1.0, atol=1e-9)
    assert headings[0] == pytest.approx(0.0)
    assert headings[-1] == pytest.approx(np.pi / 2)
    assert len(pts) == 16  # arc length 15 -> 16 points


def test_exact_library_view_is_min(small_cfg, small_world):
    """Property (SURVEY.md §4.2): standing at a training pose, the zero-shift
    candidate's distance to the library is ~0 and the argmin heading is the
    straight-ahead candidate."""
    landscape, route = small_world
    lib = oracle.train_library(landscape, route, small_cfg)
    pts, headings = oracle.resample_route(route, small_cfg.capture_spacing)
    i = len(pts) // 2
    pano = oracle.render_panorama(landscape, pts[i][0], pts[i][1], headings[i], small_cfg)
    fam = oracle.scan_familiarity(pano, lib, small_cfg)
    shifts = small_cfg.scan.shifts()
    k0 = shifts.index(0)
    assert fam[k0] == pytest.approx(0.0, abs=1e-9)
    assert int(np.argmin(fam)) == k0


def test_point_to_polyline():
    route = np.array([[0.0, 0.0], [10.0, 0.0]])
    assert oracle.point_to_polyline_dist(np.array([5.0, 3.0]), route) == pytest.approx(3.0)
    assert oracle.point_to_polyline_dist(np.array([-4.0, 3.0]), route) == pytest.approx(5.0)
    assert oracle.point_to_polyline_dist(np.array([12.0, 0.0]), route) == pytest.approx(2.0)


def test_point_to_polyline_dists_batch():
    """Vectorized form matches the scalar form point-for-point on a
    multi-segment route (shared by analysis.catchment's route_dist grid)."""
    rng = np.random.default_rng(0)
    route = rng.uniform(0.0, 100.0, (7, 2))
    pts = rng.uniform(-10.0, 110.0, (40, 2))
    d = oracle.point_to_polyline_dists(pts, route)
    assert d.shape == (40,)
    for p, di in zip(pts, d):
        assert di == pytest.approx(oracle.point_to_polyline_dist(p, route))


def test_resample_route_degenerate_short_route():
    """A route shorter than one capture spacing yields one capture with a
    matching heading (the route's own tangent), not mismatched lengths."""
    route = np.array([[10.0, 10.0], [10.4, 10.3]])  # arc 0.5 < spacing 1.0
    pts, headings = oracle.resample_route(route, spacing=1.0)
    assert pts.shape == (1, 2) and headings.shape == (1,)
    np.testing.assert_allclose(headings[0], np.arctan2(0.3, 0.4), rtol=1e-6)


def test_point_to_polyline_dists_chunked(monkeypatch):
    """The memory-bounding chunk loop splits without changing values."""
    rng = np.random.default_rng(1)
    route = rng.uniform(0.0, 100.0, (9, 2))
    pts = rng.uniform(-10.0, 110.0, (25, 2))
    whole = oracle.point_to_polyline_dists(pts, route)
    monkeypatch.setattr(oracle, "_POLYLINE_CHUNK_ELEMS", 8 * 7)  # chunk=7
    np.testing.assert_array_equal(
        oracle.point_to_polyline_dists(pts, route), whole
    )


def test_route_recall_on_featureful_landscape(small_cfg, small_world):
    """Golden behavior (SURVEY.md §4.3): trained agent recalls the route."""
    landscape, route = small_world
    lib = oracle.train_library(landscape, route, small_cfg)
    pts, headings = oracle.resample_route(route, small_cfg.capture_spacing)
    out = oracle.navigate(landscape, lib, route, pts[0], headings[0], small_cfg)
    assert out["success"], f"status={out['status']}"
    # stays in a tight corridor around the route
    errs = [oracle.point_to_polyline_dist(p, route) for p in out["xy"]]
    assert max(errs) < 3.0


def test_route_recall_fails_on_flat_landscape(small_cfg):
    """Negative control (SURVEY.md §4.3): featureless landscape -> no recall
    signal; the agent cannot reliably reach the goal."""
    flat = make_landscape("flat", size=(128, 128))
    route = make_route("line", size=(128, 128), margin=32.0, length=40.0)
    lib = oracle.train_library(flat, route, small_cfg)
    pts, headings = oracle.resample_route(route, small_cfg.capture_spacing)
    # start mid-route pointing sideways: with zero visual signal every
    # candidate ties, argmin picks candidate 0 (max left turn) forever.
    out = oracle.navigate(flat, lib, route, pts[len(pts) // 2], headings[0] + 1.0, small_cfg)
    assert not out["success"]


def test_route_recall_on_fractal_landscape(small_cfg):
    """1/f natural-statistics landscape supports route recall like blobs."""
    import jax.numpy as jnp

    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.routes import make_route
    from navdv_tpu.training import train_library

    landscape = make_landscape("fractal", size=(128, 128), seed=1)
    assert landscape.shape == (128, 128)
    assert 0.0 <= landscape.min() and landscape.max() <= 1.0
    route = make_route("line", size=(128, 128), margin=32.0, length=40.0)
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, small_cfg.capture_spacing)
    states0 = init_state(pts[0][None, :], np.asarray([headings[0]]))
    final, _ = make_navigate_batch(small_cfg)(states0, st)
    assert float(success_rate(final)) == 1.0
