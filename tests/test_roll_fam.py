"""Rolled-library familiarity path == extract-then-matmul reference."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from navdv_tpu.agent import _make_lib_min, init_state, make_navigate_batch, make_statics
from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
from navdv_tpu.familiarity import pack_library
from navdv_tpu.familiarity_roll import make_lib_min_roll
from navdv_tpu.sensor import make_lag_stats, make_views_from_pooled, scan_lag_sets


def _cfg(metric: str, u: int, tol_bins: int = 0) -> SimConfig:
    return SimConfig(
        sensor=SensorConfig(n_radial=4, n_azimuth=24, az_upsample=u, r_min=2.0, r_max=8.0),
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric=metric, tol_bins=tol_bins),
    )


@pytest.mark.parametrize("metric", ["ssd", "ncc"])
@pytest.mark.parametrize("u", [1, 3])
@pytest.mark.parametrize("tol_bins", [0, 2])
def test_roll_matches_matmul_lib_min(metric, u, tol_bins):
    cfg = _cfg(metric, u, tol_bins)
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(0)
    b, nl = 5, 7
    r, a = cfg.sensor.n_radial, cfg.sensor.n_fine
    s = jnp.asarray(rng.random((b, r, a)), jnp.float32)
    views = jnp.asarray(rng.random((nl, r, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)

    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    cand = make_views_from_pooled(cfg.sensor, lags)(s)

    m_ref = _make_lib_min(cfg, "jnp")(cand, lib, lag_sum, lag_sq)
    m_roll = make_lib_min_roll(cfg.sensor, cfg.scan, lags)(s, lib, lag_sum, lag_sq)
    assert m_roll.shape == m_ref.shape
    scale = float(jnp.max(jnp.abs(m_ref))) + 1e-6
    # identical math up to summation order -> tight fp32 tolerance
    np.testing.assert_allclose(
        np.asarray(m_roll), np.asarray(m_ref), atol=2e-5 * scale, rtol=2e-5
    )


@pytest.mark.parametrize("metric,tol_bins", [("ssd", 0), ("ncc", 2)])
def test_roll_closed_loop_recall(small_world, metric, tol_bins, request):
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
    f_roll, _ = make_navigate_batch(cfg, fam_impl="roll")(states0, st)
    from navdv_tpu.metrics import success_rate as sr

    r_jnp, r_roll = float(sr(f_jnp)), float(sr(f_roll))
    assert r_roll >= 0.75, (r_roll, r_jnp)
    assert abs(r_roll - r_jnp) <= 0.25, (r_roll, r_jnp)


@pytest.mark.parametrize("u", [1, 3])
@pytest.mark.parametrize("rank", [2, 4, 16])
def test_roll_lowrank_matches_dense(u, rank):
    """roll_rank low-rank split == dense roll path (ssd), any rank.

    The identity c.l = c.m + (c.U)y + c.r is exact for any basis, so even
    rank 2 (huge residual) must agree to the bf16-residual error bound."""
    cfg = _cfg("ssd", u)
    cfg = dataclasses.replace(
        cfg, scan=dataclasses.replace(cfg.scan, roll_rank=rank)
    )
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(3)
    b, nl = 5, 9
    r = cfg.sensor.n_radial
    s = jnp.asarray(rng.random((b, r, cfg.sensor.n_fine)), jnp.float32)
    views = jnp.asarray(rng.random((nl, r, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)

    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)

    dense = make_lib_min_roll(cfg.sensor, dataclasses.replace(cfg.scan, roll_rank=0), lags)
    lowrank = make_lib_min_roll(cfg.sensor, cfg.scan, lags)
    m_dense = dense(s, lib, lag_sum, lag_sq)
    m_lr = lowrank(s, lib, lag_sum, lag_sq)
    # residual cross term runs at one bf16 pass: error ~ |c| |r_v| 2^-9
    scale = float(jnp.max(lib.sq)) + 1e-6
    np.testing.assert_allclose(
        np.asarray(m_lr), np.asarray(m_dense), atol=4e-3 * scale, rtol=4e-3
    )


def test_roll_lowrank_respects_padding():
    cfg = _cfg("ssd", 3)
    cfg = dataclasses.replace(cfg, scan=dataclasses.replace(cfg.scan, roll_rank=4))
    lags, _ = scan_lag_sets(cfg.scan)
    rng = np.random.default_rng(4)
    r = cfg.sensor.n_radial
    s = jnp.asarray(rng.random((3, r, cfg.sensor.n_fine)), jnp.float32)
    views = jnp.asarray(rng.random((4, r, cfg.sensor.n_azimuth)), jnp.float32)
    lib = pack_library(views)
    lib_pad = lib._replace(
        valid=jnp.asarray([1.0, 1.0, 0.0, 0.0]),
        flat=lib.flat.at[2:].set(0.0),
        z=lib.z.at[2:].set(0.0),
        sq=lib.sq.at[2:].set(0.0),
    )
    lib_valid = pack_library(views[:2])
    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    f = make_lib_min_roll(cfg.sensor, cfg.scan, lags)
    m_pad = f(s, lib_pad, lag_sum, lag_sq)
    m_valid = f(s, lib_valid, lag_sum, lag_sq)
    np.testing.assert_allclose(
        np.asarray(m_pad), np.asarray(m_valid), rtol=4e-3, atol=4e-3
    )


def test_roll_rank_rejects_ncc(small_cfg):
    """roll_rank is an SSD cross-term identity; enabling it on NCC raises
    instead of silently doing nothing (ADVICE round 2)."""
    import dataclasses

    import pytest

    from navdv_tpu.familiarity_roll import make_lib_min_roll
    from navdv_tpu.sensor import scan_lag_sets

    scan = dataclasses.replace(small_cfg.scan, metric="ncc", roll_rank=8)
    lags, _ = scan_lag_sets(scan)
    with pytest.raises(ValueError, match="roll_rank"):
        make_lib_min_roll(small_cfg.sensor, scan, lags)


def test_roll_rank_other_impl_warns(small_cfg):
    import dataclasses

    import pytest

    from navdv_tpu.agent import make_step_batched

    cfg = dataclasses.replace(
        small_cfg, scan=dataclasses.replace(small_cfg.scan, roll_rank=8)
    )
    with pytest.warns(UserWarning, match="roll_rank"):
        make_step_batched(cfg, fam_impl="jnp")


def test_fixed_point_exact_quantized_ssd():
    """fixed_point_bits=8 returns EXACTLY the f64 SSD of the 1/255-quantized
    candidate/library images — an exact metric, not an approximation."""
    cfg = _cfg("ssd", 3)
    scan = dataclasses.replace(cfg.scan, fixed_point_bits=8)
    lags, _ = scan_lag_sets(scan)
    rng = np.random.default_rng(1)
    b, nl = 4, 6
    r, a = cfg.sensor.n_radial, cfg.sensor.n_fine
    w, u = cfg.sensor.n_azimuth, cfg.sensor.az_upsample
    s = jnp.asarray(rng.random((b, r, a)), jnp.float32)
    views = jnp.asarray(rng.random((nl, r, w)), jnp.float32)
    lib = pack_library(views)

    lag_stats = make_lag_stats(cfg.sensor, lags)
    lag_sum, lag_sq = lag_stats(s)
    m = np.asarray(make_lib_min_roll(cfg.sensor, scan, lags)(s, lib, lag_sum, lag_sq))

    # f64 oracle: quantize, then plain SSD over the extracted candidates
    cand = np.asarray(make_views_from_pooled(cfg.sensor, lags)(s)).astype(np.float64)
    qc = np.round(cand * 255.0).clip(0, 255)
    ql = np.round(np.asarray(lib.flat).astype(np.float64) * 255.0).clip(0, 255)
    d64 = ((qc[:, :, None, :] - ql[None, None, :, :]) ** 2).sum(-1).min(-1) / 255.0**2
    # the int32 distance is exact; only the final f32 * (1/255^2) scaling
    # rounds (one ulp), so parity is one-f32-rounding tight, not f64-tight
    np.testing.assert_allclose(m, d64, rtol=2e-7, atol=0)


def test_fixed_point_closed_loop(small_cfg, small_world):
    """8-bit-quantized familiarity still recalls the small parity route."""
    import jax

    from navdv_tpu.metrics import success_rate
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    landscape, route = small_world
    cfg = dataclasses.replace(
        small_cfg, scan=dataclasses.replace(small_cfg.scan, fixed_point_bits=8)
    )
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    starts = pts[0][None] + rng.normal(0, 0.5, (8, 2))
    thetas = hd[0] + rng.normal(0, 0.05, (8,))
    final, _ = jax.block_until_ready(
        make_navigate_batch(cfg, fam_impl="roll")(init_state(starts, thetas), st)
    )
    assert float(success_rate(final)) >= 0.75


def test_fixed_point_rejects_bad_bits():
    cfg = _cfg("ssd", 3)
    scan = dataclasses.replace(cfg.scan, fixed_point_bits=16)
    lags, _ = scan_lag_sets(scan)
    with pytest.raises(ValueError, match="fixed_point_bits"):
        make_lib_min_roll(cfg.sensor, scan, lags)
