"""Spectral (DFT-matmul) familiarity path == extract-then-matmul reference.

The fft path computes the identical per-lag library minimum M[B, L] without
ever materializing candidates; these tests pin exact-math parity (fp32
tolerance) for both metrics and both sensor regimes (u > 1 zero-upsampled
library, u == 1 full-width rolls), plus closed-loop recall equivalence.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from navdv_tpu.agent import _make_lib_min, init_state, make_navigate_batch, make_statics
from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
from navdv_tpu.familiarity import pack_library
from navdv_tpu.familiarity_fft import make_lib_min_fft
from navdv_tpu.sensor import make_lag_stats, make_views_from_pooled, scan_lag_sets


def _cfg(metric: str, u: int, tol_bins: int = 0) -> SimConfig:
    return SimConfig(
        sensor=SensorConfig(n_radial=4, n_azimuth=24, az_upsample=u, r_min=2.0, r_max=8.0),
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric=metric, tol_bins=tol_bins),
    )


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
@pytest.mark.parametrize("u", [1, 3])
@pytest.mark.parametrize("tol_bins", [0, 2])
def test_fft_matches_matmul_lib_min(metric, u, tol_bins):
    cfg = _cfg(metric, u, tol_bins)
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(0)
    b, nl = 5, 7
    r, a = cfg.sensor.n_radial, cfg.sensor.n_fine
    s = jnp.asarray(rng.random((b, r, a)), jnp.float32)  # pooled panorama
    views = jnp.asarray(rng.random((nl, r, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)

    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    cand = make_views_from_pooled(cfg.sensor, lags)(s)  # [B, L, P]

    m_ref = _make_lib_min(cfg, "jnp")(cand, lib, lag_sum, lag_sq)
    m_fft = make_lib_min_fft(cfg.sensor, cfg.scan, lags)(s, lib, lag_sum, lag_sq)
    assert m_fft.shape == m_ref.shape
    scale = float(jnp.max(jnp.abs(m_ref))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(m_fft), np.asarray(m_ref), atol=2e-4 * scale, rtol=2e-4
    )


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
def test_fft_respects_library_padding(metric):
    """Padded (invalid) views must never win the min in the fft path."""
    cfg = _cfg(metric, 3)
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(1)
    r = cfg.sensor.n_radial
    s = jnp.asarray(rng.random((3, r, cfg.sensor.n_fine)), jnp.float32)
    views = jnp.asarray(rng.random((4, r, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)
    # mark the last two views invalid with all-zero pixels (as pad_library does)
    lib = lib._replace(
        valid=jnp.asarray([1.0, 1.0, 0.0, 0.0]),
        flat=lib.flat.at[2:].set(0.0),
        z=lib.z.at[2:].set(0.0),
        sq=lib.sq.at[2:].set(0.0),
    )
    lib_valid = pack_library(views[:2])

    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    fft = make_lib_min_fft(cfg.sensor, cfg.scan, lags)
    m_pad = fft(s, lib, lag_sum, lag_sq)
    m_valid = fft(s, lib_valid, lag_sum, lag_sq)
    np.testing.assert_allclose(np.asarray(m_pad), np.asarray(m_valid), rtol=1e-5)


@pytest.mark.parametrize("metric,tol_bins", [("ssd", 0), ("ncc", 2)])
def test_fft_closed_loop_recall(small_world, metric, tol_bins, request):
    """Full episodes through the fft step recall the route like the jnp step."""
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    cfg = request.getfixturevalue("small_cfg")
    cfg = dataclasses.replace(
        cfg, scan=dataclasses.replace(cfg.scan, metric=metric, tol_bins=tol_bins)
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
    f_fft, _ = make_navigate_batch(cfg, fam_impl="fft")(states0, st)
    r_jnp, r_fft = float(success_rate(f_jnp)), float(success_rate(f_fft))
    assert r_fft >= 0.75, (r_fft, r_jnp)
    assert abs(r_fft - r_jnp) <= 0.25, (r_fft, r_jnp)


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
def test_fft_matches_matmul_tall_sensor(metric):
    """R=64 exercises the unstacked re/im product path (stack_reim=False)."""
    cfg = SimConfig(
        sensor=SensorConfig(n_radial=64, n_azimuth=24, az_upsample=1,
                            r_min=2.0, r_max=8.0),
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric=metric, tol_bins=1),
    )
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(5)
    b, nl = 4, 6
    s = jnp.asarray(rng.random((b, 64, cfg.sensor.n_fine)), jnp.float32)
    views = jnp.asarray(rng.random((nl, 64, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)
    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    cand = make_views_from_pooled(cfg.sensor, lags)(s)
    m_ref = _make_lib_min(cfg, "jnp")(cand, lib, lag_sum, lag_sq)
    m_fft = make_lib_min_fft(cfg.sensor, cfg.scan, lags)(s, lib, lag_sum, lag_sq)
    scale = float(jnp.max(jnp.abs(m_ref))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(m_fft), np.asarray(m_ref), atol=2e-4 * scale, rtol=2e-4
    )


def test_spectral_cutoff_validates_and_navigates(small_cfg, small_world):
    """spectral_cutoff: invalid values raise; a half-spectrum cutoff still
    recalls comparably to the exact path (approximate, recall-gated knob)."""
    import dataclasses

    import pytest

    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.familiarity_fft import make_lib_min_fft
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.sensor import scan_lag_sets
    from navdv_tpu.training import train_library

    bad = dataclasses.replace(small_cfg.scan, spectral_cutoff=10_000)
    lags, _ = scan_lag_sets(bad)
    with pytest.raises(ValueError, match="spectral_cutoff"):
        make_lib_min_fft(small_cfg.sensor, bad, lags)

    landscape, route = small_world
    f_full = small_cfg.sensor.n_fine // 2 + 1
    cfg_cut = dataclasses.replace(
        small_cfg,
        scan=dataclasses.replace(small_cfg.scan, spectral_cutoff=f_full // 2),
    )
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, small_cfg.capture_spacing)
    rng = np.random.default_rng(0)
    b = 8
    starts = pts[0][None] + rng.normal(0, 0.5, (b, 2))
    thetas = hd[0] + rng.normal(0, 0.05, (b,))
    states0 = init_state(starts, thetas)
    f_exact, _ = make_navigate_batch(small_cfg, fam_impl="fft")(states0, st)
    f_cut, _ = make_navigate_batch(cfg_cut, fam_impl="fft")(states0, st)
    r_exact = float(success_rate(f_exact))
    r_cut = float(success_rate(f_cut))
    assert r_cut >= r_exact - 0.25, (r_cut, r_exact)
    assert r_cut > 0.0
