"""L5 analysis tools: RIDF curves + familiarity maps (analysis.py).

Parity anchor: the probe must reproduce the f64 NumPy oracle's
scan_familiarity through the production pipeline (same tolerances as the
open-loop step parity test, SURVEY.md §4.4); the RIDF and catchment-map
properties are the literature's (Zeil 2003) qualitative signatures on a
world where recall is known to work.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from navdv_tpu import oracle
from navdv_tpu.agent import make_statics
from navdv_tpu.analysis import (
    full_circle_scan,
    familiarity_map,
    make_familiarity_probe,
    ridf,
)
from navdv_tpu.training import train_library


@pytest.fixture(scope="module")
def world(request):
    cfg = request.getfixturevalue("small_cfg")
    landscape, route = request.getfixturevalue("small_world")
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    return cfg, landscape, route, lib, st


def test_full_circle_scan_covers_the_circle(world):
    cfg, *_ = world
    fc = full_circle_scan(cfg)
    assert fc.scan.n_headings == cfg.sensor.n_fine
    assert fc.scan.scan_step_bins == 1 and fc.scan.tol_bins == 0
    probe_angles = make_familiarity_probe(fc, "jnp").angles
    assert probe_angles.shape == (cfg.sensor.n_fine,)
    assert np.all(np.diff(probe_angles) > 0)
    assert np.isclose(probe_angles[1] - probe_angles[0], cfg.sensor.bin_width)
    # spans one full turn (half-open): max - min == 2*pi - bin_width
    assert np.isclose(
        probe_angles[-1] - probe_angles[0],
        2 * np.pi - cfg.sensor.bin_width,
        atol=1e-6,
    )


def test_probe_matches_oracle_scan(world):
    """probe == oracle.scan_familiarity at the agent's own scan config."""
    cfg, landscape, route, lib, st = world
    olib = oracle.train_library(landscape, route, cfg)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    probe = make_familiarity_probe(cfg, "jnp")
    idx = [0, len(pts) // 2, len(pts) - 1]
    xy = np.asarray(pts)[idx] + np.array([0.7, -0.4])  # off-capture poses
    th = np.asarray(headings)[idx] + 0.1
    fam = np.asarray(probe(jnp.asarray(xy, jnp.float32),
                           jnp.asarray(th, jnp.float32), st))
    for i, (p, t) in enumerate(zip(xy, th)):
        pano = oracle.render_panorama(landscape, p[0], p[1], t, cfg)
        want = oracle.scan_familiarity(pano, olib, cfg)
        np.testing.assert_allclose(fam[i], want, atol=5e-2, rtol=1e-3)


def test_probe_impl_consistency(world):
    """Production impls agree through the probe: roll is matmul-identical to
    jnp; fft matches within its documented numerical band."""
    cfg, landscape, route, lib, st = world
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    xy = jnp.asarray(np.asarray(pts)[[1, 3]], jnp.float32)
    th = jnp.asarray(np.asarray(headings)[[1, 3]] + 0.05, jnp.float32)

    def run(impl):
        probe = make_familiarity_probe(cfg, impl)
        aux = probe.prepare(st) if probe.prepare is not None else None
        return np.asarray(probe(xy, th, st, aux))

    base = run("jnp")
    np.testing.assert_allclose(run("roll"), base, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(run("fft"), base, atol=5e-2, rtol=1e-3)


def test_ridf_minimum_at_capture_pose(world):
    """At an exact capture pose the RIDF valley bottoms at rotation 0 with
    ~zero distance (the stored view is the rendered view)."""
    cfg, landscape, route, lib, st = world
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    i = len(pts) // 2
    angles, fam = ridf(landscape, lib, pts[i], headings[i], cfg, fam_impl="jnp")
    assert fam.shape == angles.shape
    k = int(np.argmin(fam))
    assert abs(angles[k]) < 1e-6, f"valley at {angles[k]:.3f} rad, not 0"
    assert fam[k] < 1e-3 * float(np.max(fam))
    # batched form agrees with the single-pose form
    angles_b, fam_b = ridf(
        landscape, lib, np.stack([pts[i], pts[i]]),
        np.array([headings[i], headings[i]]), cfg, fam_impl="jnp",
    )
    np.testing.assert_allclose(fam_b[0], fam, rtol=1e-6)
    np.testing.assert_allclose(angles_b, angles)


def test_familiarity_map_catchment(world):
    """The map's familiar region hugs the route: on-route grid cells score
    lower (more familiar) than far-away cells, and the padding path (last
    batch < batch size) returns the same values as one unpadded pass."""
    cfg, landscape, route, lib, st = world
    fmap = familiarity_map(landscape, lib, cfg, stride=12.0, batch=32)
    ny, nx = len(fmap["y"]), len(fmap["x"])
    assert fmap["fam"].shape == (ny, nx)
    assert fmap["best_heading"].shape == (ny, nx)
    assert np.all(np.isfinite(fmap["fam"]))

    gx, gy = np.meshgrid(fmap["x"], fmap["y"])
    d = np.array([
        oracle.point_to_polyline_dist(np.array([x, y]), route)
        for x, y in zip(gx.ravel(), gy.ravel())
    ]).reshape(ny, nx)
    near, far = fmap["fam"][d < 8.0], fmap["fam"][d > 40.0]
    assert near.size > 0 and far.size > 0
    assert float(near.mean()) < float(far.mean()), (
        f"near-route fam {near.mean():.4g} !< far {far.mean():.4g}"
    )

    # batch-size independence (padding correctness)
    n = ny * nx
    fmap2 = familiarity_map(landscape, lib, cfg, stride=12.0, batch=n)
    np.testing.assert_allclose(fmap2["fam"], fmap["fam"], rtol=1e-6)


def test_plots_smoke(world, tmp_path):
    from navdv_tpu import viz

    cfg, landscape, route, lib, st = world
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    angles, fam = ridf(landscape, lib, pts[0], headings[0], cfg, fam_impl="jnp")
    p1 = viz.plot_ridf(angles, fam, str(tmp_path / "ridf.png"))
    fmap = familiarity_map(landscape, lib, cfg, stride=16.0, batch=64)
    p2 = viz.plot_familiarity_map(landscape, route, fmap,
                                  str(tmp_path / "fmap.png"))
    import os

    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_probe_sector_branches(request):
    """The step.fam exposure covers the sector renderer branches too: the
    unfused sector path and the fused per-sector-DFT path (u=1) agree with
    the full-window fft probe at the same poses."""
    import dataclasses

    from navdv_tpu.config import ScanConfig, SensorConfig, SimConfig

    landscape, route = request.getfixturevalue("small_world")
    sensor = SensorConfig(
        n_radial=4, n_azimuth=24, az_upsample=1, r_min=2.0, r_max=8.0
    )
    cfg = SimConfig(
        sensor=sensor,
        scan=ScanConfig(n_headings=12, scan_step_bins=2, tol_bins=2),
        capture_spacing=2.0,
    )
    cfg_sector = dataclasses.replace(
        cfg, sensor=dataclasses.replace(sensor, render_mode="sector")
    )
    cfg_fused = dataclasses.replace(
        cfg_sector,
        scan=dataclasses.replace(cfg.scan, fused_dft_precision="inherit"),
    )
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    xy = jnp.asarray(np.asarray(pts)[[2, 5]], jnp.float32)
    th = jnp.asarray(np.asarray(headings)[[2, 5]] + 0.3, jnp.float32)

    def run(c):
        probe = make_familiarity_probe(c, "fft")
        aux = probe.prepare(st) if probe.prepare is not None else None
        return np.asarray(probe(xy, th, st, aux))

    base = run(cfg)
    np.testing.assert_allclose(run(cfg_sector), base, atol=5e-3)
    np.testing.assert_allclose(run(cfg_fused), base, atol=5e-3)


def test_catchment_synthetic():
    """Descent on a synthetic bowl: a bowl centered on the route captures
    every cell; moving the bowl far away captures (near) none."""
    from navdv_tpu.analysis import catchment

    x = np.arange(0.0, 100.0, 4.0, dtype=np.float32)
    y = np.arange(0.0, 100.0, 4.0, dtype=np.float32)
    gx, gy = np.meshgrid(x, y)

    def bowl(cx, cy):
        return {"x": x, "y": y,
                "fam": ((gx - cx) ** 2 + (gy - cy) ** 2).astype(np.float32)}

    route = np.array([[46.0, 46.0], [50.0, 50.0]])
    full = catchment(bowl(48.0, 48.0), route, corridor=6.0)
    assert full["fraction"] == 1.0
    assert full["captured"].all()

    away = catchment(bowl(90.0, 10.0), route, corridor=6.0)
    assert away["fraction"] == 0.0

    # route_dist is the exact point-to-polyline distance on the grid
    i, j = 3, 7
    from navdv_tpu import oracle
    want = oracle.point_to_polyline_dist(np.array([x[j], y[i]]), route)
    np.testing.assert_allclose(full["route_dist"][i, j], want, rtol=1e-5)


def test_catchment_on_world(world):
    """On the test world the captured region is route-proximal: captured
    cells sit closer to the route on average than uncaptured ones."""
    from navdv_tpu.analysis import catchment

    cfg, landscape, route, lib, st = world
    fmap = familiarity_map(landscape, lib, cfg, stride=8.0, batch=64)
    c = catchment(fmap, route, corridor=10.0)
    assert 0.0 < c["fraction"] <= 1.0
    cap, uncap = c["route_dist"][c["captured"]], c["route_dist"][~c["captured"]]
    assert cap.size > 0
    if uncap.size:  # tiny worlds can be fully captured
        assert float(cap.mean()) < float(uncap.mean())


def test_probe_cache_and_best(world):
    """Probes are cached on (cfg, impl, lib_axis) — repeated analysis calls
    reuse one jitted pipeline — and probe.best is exactly the argmin
    reduction of the probe's familiarity output."""
    cfg, landscape, route, lib, st = world
    p1 = make_familiarity_probe(cfg, "jnp")
    assert p1 is make_familiarity_probe(cfg, "jnp")
    # keyword/positional call styles share one cache key
    assert p1 is make_familiarity_probe(cfg, fam_impl="jnp", lib_axis=None)
    assert p1 is not make_familiarity_probe(cfg, "roll")

    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    xy = jnp.asarray(np.asarray(pts)[[0, 3]], jnp.float32)
    th = jnp.asarray(np.asarray(headings)[[0, 3]] + 0.2, jnp.float32)
    fam = np.asarray(p1(xy, th, st))
    best, k = p1.best(xy, th, st)
    np.testing.assert_array_equal(np.asarray(k), fam.argmin(axis=1))
    np.testing.assert_allclose(np.asarray(best), fam.min(axis=1), rtol=1e-6)


def test_probe_lib_axis_pmin(world):
    """A lib_axis probe under shard_map (per-shard minima + lax.pmin, the
    production sharded-fam stage) matches the unsharded probe."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from navdv_tpu.parallel.mesh import (
        LIB_AXIS,
        _statics_specs,
        make_mesh,
        shard_statics,
    )

    cfg, landscape, route, lib, st = world
    mesh = make_mesh(4, 2)
    st_sh = shard_statics(st, mesh, shard_lib=True)
    probe = make_familiarity_probe(cfg, "jnp", lib_axis=LIB_AXIS)
    ref = make_familiarity_probe(cfg, "jnp")

    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    xy = jnp.asarray(np.asarray(pts)[[1, 2]], jnp.float32)
    th = jnp.asarray(np.asarray(headings)[[1, 2]] + 0.05, jnp.float32)

    sharded = shard_map(
        lambda x, t, s: probe(x, t, s),
        mesh=mesh,
        in_specs=(P(), P(), _statics_specs(True)),
        out_specs=P(),
    )
    np.testing.assert_allclose(
        np.asarray(sharded(xy, th, st_sh)),
        np.asarray(ref(xy, th, st)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_probe_best_production_tie_break(request):
    """On a flat world at an exact capture pose every rotation ties; the
    production tie-break (smallest |shift| first, SEMANTICS.md §5) must pick
    rotation 0 — a bare argmin would pick the most negative rotation."""
    from navdv_tpu.landscape import make_landscape
    from navdv_tpu.routes import make_route

    cfg = request.getfixturevalue("small_cfg")
    landscape = make_landscape("flat", size=(128, 128), seed=0)
    route = make_route("line", size=(128, 128), margin=32.0, length=40.0)
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)

    probe = make_familiarity_probe(full_circle_scan(cfg), "jnp")
    xy = jnp.asarray(np.asarray(pts)[[2]], jnp.float32)
    th = jnp.asarray(np.asarray(headings)[[2]], jnp.float32)
    fam = np.asarray(probe(xy, th, st))
    assert float(fam.max() - fam.min()) == 0.0, "flat world must tie"
    _, k = probe.best(xy, th, st)
    assert float(probe.angles[int(k[0])]) == pytest.approx(0.0, abs=1e-7)


def test_aux_cache_reuses_prepare(world, monkeypatch):
    """Repeated ridf calls against one library run probe.prepare once (for
    infomax, prepare TRAINS the network — re-preparing per call was the
    review finding this pins)."""
    from navdv_tpu import analysis

    cfg, landscape, route, lib, st = world
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    probe = make_familiarity_probe(full_circle_scan(cfg), "fft")
    calls = []
    orig = probe.prepare
    assert orig is not None
    monkeypatch.setattr(
        probe, "prepare", lambda s: (calls.append(1), orig(s))[1]
    )
    analysis._AUX_CACHE.clear()
    analysis._STATICS_CACHE.clear()
    _, f1 = ridf(landscape, lib, pts[1], headings[1], cfg, fam_impl="fft")
    _, f2 = ridf(landscape, lib, pts[2], headings[2], cfg, fam_impl="fft")
    assert len(calls) == 1
    assert np.isfinite(f1).all() and np.isfinite(f2).all()
    # the statics device upload is shared across the two calls too
    assert len(analysis._STATICS_CACHE) == 1


def test_batch_mismatch_raises(world):
    """ridf/heading_error reject silently-broadcasting heading batches."""
    from navdv_tpu.analysis import heading_error

    cfg, landscape, route, lib, st = world
    with pytest.raises(ValueError, match="theta batch"):
        ridf(landscape, lib, np.zeros((3, 2)), np.zeros(2), cfg)
    with pytest.raises(ValueError, match="heading batches"):
        heading_error(landscape, lib, cfg, np.zeros((3, 2)), np.zeros(2))


def test_heading_error(world):
    """Open-loop heading recovery: at capture poses the scan's chosen
    heading matches the capture heading within one fine bin — including
    when the agent faces 90 deg away and must recover via the full circle."""
    from navdv_tpu.analysis import heading_error

    cfg, landscape, route, lib, st = world
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    xy = np.asarray(pts)[[0, 4, 8]]
    th = np.asarray(headings)[[0, 4, 8]]
    binw = cfg.sensor.bin_width

    err = heading_error(landscape, lib, cfg, xy, th, fam_impl="jnp")
    assert err.shape == (3,)
    assert np.all(np.abs(err) <= binw + 1e-6), err

    # probe-heading invariance through the full circle
    err_rot = heading_error(landscape, lib, cfg, xy, th,
                            theta_probe=th + np.pi / 2, fam_impl="jnp")
    assert np.all(np.abs(err_rot) <= binw + 1e-6), err_rot
