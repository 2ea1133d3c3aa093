"""Sector renderer (heading = k*binw + phi decomposition) parity.

The sector renderer must reproduce the full-window renderer exactly (up to
fp rounding of the rotation) via the roll identity
``pano_theta[a] == pano_phi[(a + k) % A]``, and the downstream k absorption
(spectral phase rotation + residue-shifted lag stats) must reproduce the
non-rolled familiarity numbers.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
from navdv_tpu.config import ScanConfig, SensorConfig, SimConfig
from navdv_tpu.familiarity import pack_library
from navdv_tpu.familiarity_fft import make_lib_min_fft
from navdv_tpu.sensor import (
    make_lag_stats,
    make_render_batch,
    make_render_batch_rolled,
    scan_lag_sets,
    sector_bounds,
)


from navdv_tpu.sensor import unroll_panorama as _roll_back


def test_sector_bounds_cover_window(small_cfg):
    s = small_cfg.sensor
    bounds = sector_bounds(s, 8)
    assert [b[0] for b in bounds] == [0] * 8  # single ring block
    for _, n_rings, row_lo, n_rows, col_lo, n_cols in bounds:
        assert n_rings == s.n_radial
        assert 0 <= row_lo and 0 < n_rows and row_lo + n_rows <= 20
        assert 0 <= col_lo and 0 < n_cols and col_lo + n_cols <= 20
        # the whole point: support strictly smaller than the 20x20 window
        assert n_rows < 20 and n_cols < 20


@pytest.mark.parametrize("hat_dtype,atol", [("float32", 2e-4), ("bfloat16", 2e-2)])
def test_rolled_render_matches_full(small_cfg, small_world, rng, hat_dtype, atol):
    landscape, _ = small_world
    s = dataclasses.replace(small_cfg.sensor, hat_dtype=hat_dtype)
    # poses inside the live-agent envelope (>= r_max - 2 from every edge):
    # the sector renderer's replicate-pad guarantees exactness there
    poses = rng.uniform(12, 116, size=(16, 2)).astype(np.float32)
    thetas = jnp.asarray(rng.uniform(-7, 7, size=(16,)).astype(np.float32))
    pano_phi, k = make_render_batch_rolled(s)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    want = make_render_batch(s)(jnp.asarray(landscape), jnp.asarray(poses), thetas)
    got = _roll_back(np.asarray(pano_phi), np.asarray(k))
    assert np.all(np.asarray(k) >= 0) and np.all(np.asarray(k) < s.n_fine)
    np.testing.assert_allclose(got, np.asarray(want), atol=atol)


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
@pytest.mark.parametrize("u", [1, 3])
def test_phase_rotation_matches_rolled_panorama(metric, u):
    """lib_min_fft(s_phi, roll_k=k) == lib_min_fft(roll(s_phi, k)) exactly."""
    sensor = SensorConfig(n_radial=4, n_azimuth=24, az_upsample=u, r_min=2.0, r_max=8.0)
    scan = ScanConfig(n_headings=12, scan_step_bins=2, metric=metric, tol_bins=1)
    lags, _ = scan_lag_sets(scan)
    rng = np.random.default_rng(2)
    b, nl = 6, 5
    a = sensor.n_fine
    s_phi = jnp.asarray(rng.random((b, sensor.n_radial, a)), jnp.float32)
    k = jnp.asarray(rng.integers(0, a, size=(b,)), jnp.int32)
    views = jnp.asarray(rng.random((nl, sensor.n_radial, sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)

    s_theta = jnp.asarray(_roll_back(np.asarray(s_phi), np.asarray(k)))
    fft = make_lib_min_fft(sensor, scan, lags)
    stats = make_lag_stats(sensor, lags)
    stats_rolled = make_lag_stats(sensor, lags, dynamic_roll=True)

    sum_t, sq_t = stats(s_theta)
    sum_r, sq_r = stats_rolled(s_phi, k)
    np.testing.assert_allclose(np.asarray(sum_r), np.asarray(sum_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sq_r), np.asarray(sq_t), rtol=1e-5)

    m_direct = fft(s_theta, lib, sum_t, sq_t)
    m_rot = fft(s_phi, lib, sum_r, sq_r, roll_k=k)
    scale = float(jnp.max(jnp.abs(m_direct))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(m_rot), np.asarray(m_direct), atol=3e-4 * scale, rtol=3e-4
    )


@pytest.mark.parametrize("metric,tol_bins", [("ssd", 0), ("ncc", 2)])
def test_sector_closed_loop_recall(small_world, metric, tol_bins, request):
    """Episodes through the sector+fft step recall like the jnp full step."""
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    cfg = request.getfixturevalue("small_cfg")
    cfg = dataclasses.replace(
        cfg,
        scan=dataclasses.replace(cfg.scan, metric=metric, tol_bins=tol_bins),
    )
    cfg_sector = dataclasses.replace(
        cfg, sensor=dataclasses.replace(cfg.sensor, render_mode="sector")
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    b = 8
    starts = pts[0][None, :] + rng.normal(0, 1.0, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.1, size=(b,))
    states0 = init_state(starts, thetas)

    f_jnp, _ = make_navigate_batch(cfg, fam_impl="jnp")(states0, st)
    f_sec, _ = make_navigate_batch(cfg_sector, fam_impl="fft")(states0, st)
    r_jnp, r_sec = float(success_rate(f_jnp)), float(success_rate(f_sec))
    assert r_sec >= 0.75, (r_sec, r_jnp)
    assert abs(r_sec - r_jnp) <= 0.25, (r_sec, r_jnp)


def test_sector_falls_back_for_non_fft(small_cfg, small_world):
    """Non-fft impls ignore the sector hint: identical results to full mode."""
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    cfg_sector = dataclasses.replace(
        small_cfg, sensor=dataclasses.replace(small_cfg.sensor, render_mode="sector")
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, small_cfg.capture_spacing)
    states0 = init_state(pts[0][None, :], np.asarray([headings[0]]))
    f_full, rec_full = make_navigate_batch(small_cfg, fam_impl="jnp")(states0, st)
    f_sec, rec_sec = make_navigate_batch(cfg_sector, fam_impl="jnp")(states0, st)
    np.testing.assert_array_equal(np.asarray(rec_full.xy), np.asarray(rec_sec.xy))


def test_unknown_render_mode_raises(small_cfg):
    from navdv_tpu.agent import make_step_batched

    cfg = dataclasses.replace(
        small_cfg, sensor=dataclasses.replace(small_cfg.sensor, render_mode="secotr")
    )
    with pytest.raises(ValueError, match="render_mode"):
        make_step_batched(cfg, fam_impl="jnp")


@pytest.mark.parametrize("ring_blocks", [2, 3])
def test_rolled_render_ring_blocks(small_cfg, small_world, rng, ring_blocks):
    """Ring-blocked sector bounds reproduce the unblocked sector renderer."""
    landscape, _ = small_world
    s = dataclasses.replace(small_cfg.sensor, ring_blocks=ring_blocks)
    poses = rng.uniform(12, 116, size=(8, 2)).astype(np.float32)
    thetas = jnp.asarray(rng.uniform(-7, 7, size=(8,)).astype(np.float32))
    pano_rb, k_rb = make_render_batch_rolled(s)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    pano_1, k_1 = make_render_batch_rolled(small_cfg.sensor)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    np.testing.assert_array_equal(np.asarray(k_rb), np.asarray(k_1))
    np.testing.assert_allclose(
        np.asarray(pano_rb), np.asarray(pano_1), atol=2e-6
    )


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
def test_fused_spectral_front_end_parity(small_world, metric):
    """At az_upsample == 1 the sector+fft step takes the FUSED front-end (the
    forward DFT contracted per sector inside the renderer; no [B, R, A]
    panorama). One batched step must agree with the full-window renderer +
    unfused fft path: same selected candidate, fp-tight familiarity."""
    from navdv_tpu.agent import make_step_batched
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    sensor = SensorConfig(
        n_radial=4, n_azimuth=24, az_upsample=1, r_min=2.0, r_max=8.0
    )
    cfg = SimConfig(
        sensor=sensor,
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric=metric,
                        tol_bins=2),
        capture_spacing=2.0,
    )
    cfg_sector = dataclasses.replace(
        cfg,
        sensor=dataclasses.replace(sensor, render_mode="sector"),
        scan=dataclasses.replace(cfg.scan, fused_dft_precision="inherit"),
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(5)
    b = 8
    starts = pts[0][None, :] + rng.normal(0, 1.0, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.5, size=(b,))
    states0 = init_state(starts, thetas)

    step_full = make_step_batched(cfg, fam_impl="fft")
    step_fused = make_step_batched(cfg_sector, fam_impl="fft")
    assert hasattr(step_fused, "lib_prepare")
    _, rec_full = step_full(states0, st, step_full.lib_prepare(st))
    _, rec_fused = step_fused(states0, st, step_fused.lib_prepare(st))
    np.testing.assert_array_equal(np.asarray(rec_fused.k), np.asarray(rec_full.k))
    np.testing.assert_allclose(
        np.asarray(rec_fused.fam), np.asarray(rec_full.fam), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rec_fused.xy), np.asarray(rec_full.xy), atol=1e-5
    )


def test_fused_spectral_closed_loop(small_world):
    """Full episodes through the fused front-end recall like the unfused
    full-window fft path on the same (coarse, u=1) workload."""
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    sensor = SensorConfig(
        n_radial=4, n_azimuth=24, az_upsample=1, r_min=2.0, r_max=8.0
    )
    cfg = SimConfig(
        sensor=sensor,
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric="ncc",
                        tol_bins=2),
        capture_spacing=2.0,
    )
    cfg_sector = dataclasses.replace(
        cfg,
        sensor=dataclasses.replace(sensor, render_mode="sector"),
        # the config-3 production choice: one bf16 pass per sector contraction
        scan=dataclasses.replace(cfg.scan, fused_dft_precision="default"),
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    b = 8
    starts = pts[0][None, :] + rng.normal(0, 1.0, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.1, size=(b,))
    states0 = init_state(starts, thetas)
    f_full, _ = make_navigate_batch(cfg, fam_impl="fft")(states0, st)
    f_fused, _ = make_navigate_batch(cfg_sector, fam_impl="fft")(states0, st)
    r_full, r_fused = float(success_rate(f_full)), float(success_rate(f_fused))
    assert r_fused >= r_full - 0.13, (r_fused, r_full)
    assert r_fused > 0.0


@pytest.mark.parametrize("hat_dtype", ["float32", "bfloat16"])
def test_phi_bins_render_close_to_exact(small_cfg, small_world, rng, hat_dtype):
    """SensorConfig.phi_bins: the phi-quantized static-hat renderer (one-hot
    MXU weight selection + fractional window pre-shift) tracks the exact
    sector renderer within its documented approximation envelope — the
    (fx, fy) pre-shift blur dominates (~6e-3 max pixel error); the roll k is
    identical (phi quantization never crosses a bin boundary)."""
    landscape, _ = small_world
    s = dataclasses.replace(small_cfg.sensor, hat_dtype=hat_dtype)
    poses = rng.uniform(12, 116, size=(16, 2)).astype(np.float32)
    thetas = jnp.asarray(rng.uniform(-7, 7, size=(16,)).astype(np.float32))
    p0, k0 = make_render_batch_rolled(s)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    sq = dataclasses.replace(s, phi_bins=8)
    p1, k1 = make_render_batch_rolled(sq)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    err = np.abs(np.asarray(p1) - np.asarray(p0))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 2e-3, err.mean()


def test_phi_bins_warns_outside_sector_fft(small_cfg, small_world):
    """The phi_bins knob is sector+fft only; other routings warn (the
    knob-applicability pattern, ADVICE rounds 2-4)."""
    import warnings

    from navdv_tpu.agent import make_step_batched

    cfg = dataclasses.replace(
        small_cfg, sensor=dataclasses.replace(small_cfg.sensor, phi_bins=8)
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_step_batched(cfg, fam_impl="jnp")
    assert any("phi_bins" in str(x.message) for x in w)
