"""Pallas familiarity kernel == jnp reference (SURVEY.md §4.4: kernel
bit-compared against the jnp path; runs in interpreter mode on the CPU test
mesh, compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.config import ScanConfig, SensorConfig
from navdv_tpu.familiarity import make_familiarity_jnp, pack_library
from navdv_tpu.ops.familiarity_pallas import (
    make_familiarity_batched_pallas,
    min_distance_rows,
)


@pytest.mark.parametrize(
    "rows,nl,p,with_rowsq",
    [(64, 27, 96, True), (512, 128, 1152, True), (130, 200, 300, False)],
)
def test_min_distance_rows_matches_naive(rng, rows, nl, p, with_rowsq):
    a = jnp.asarray(rng.uniform(size=(rows, p)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(nl, p)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(size=(nl,)).astype(np.float32))
    alpha = -2.0
    got = np.asarray(min_distance_rows(a, b, gamma, alpha, with_rowsq, interpret=True))
    a64 = np.asarray(a, np.float64)
    beta = (a64 * a64).sum(axis=1) if with_rowsq else np.ones(rows)
    d = alpha * a64 @ np.asarray(b, np.float64).T
    d = d + beta[:, None] + np.asarray(gamma)[None, :]
    want = d.min(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("metric,tol_bins", [("ssd", 0), ("ncc", 0), ("ssd", 2), ("ncc", 1)])
def test_pallas_matches_jnp_reference(rng, metric, tol_bins):
    sensor = SensorConfig(n_radial=4, n_azimuth=24, az_upsample=3)
    scan = ScanConfig(n_headings=10, scan_step_bins=2, metric=metric, tol_bins=tol_bins)
    b, p = 6, sensor.n_pixels
    ne = scan.n_headings * (2 * tol_bins + 1)
    cand = jnp.asarray(rng.uniform(size=(b, ne, p)).astype(np.float32))
    lib = pack_library(
        jnp.asarray(rng.uniform(size=(17, sensor.n_radial, sensor.n_azimuth)).astype(np.float32))
    )

    ref1 = make_familiarity_jnp(sensor, scan)
    want = np.asarray(jax.vmap(ref1, in_axes=(0, None))(cand, lib))
    got = np.asarray(make_familiarity_batched_pallas(sensor, scan, interpret=True)(cand, lib))
    assert got.shape == (b, scan.n_headings)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_respects_padding_validity(rng):
    """Padded (invalid) library entries must never win the min."""
    from navdv_tpu.parallel.mesh import pad_library

    sensor = SensorConfig(n_radial=4, n_azimuth=24, az_upsample=3)
    scan = ScanConfig(n_headings=10, scan_step_bins=2)
    cand = jnp.asarray(rng.uniform(size=(2, 10, sensor.n_pixels)).astype(np.float32))
    lib = pack_library(
        jnp.asarray(rng.uniform(size=(5, 4, 24)).astype(np.float32))
    )
    lib_padded = pad_library(lib, 8)
    fam = make_familiarity_batched_pallas(sensor, scan, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fam(cand, lib_padded)), np.asarray(fam(cand, lib)), rtol=1e-5
    )


def test_batched_step_pallas_matches_jnp(small_cfg, small_world):
    """Whole production step with fam_impl='pallas' == 'jnp' (same states)."""
    from navdv_tpu import oracle
    from navdv_tpu.agent import init_state, make_statics, make_step_batched
    from navdv_tpu.training import train_library

    landscape, route = small_world
    cfg = small_cfg
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    states = init_state(
        jnp.asarray(np.stack([pts[0], pts[3], pts[5]]), jnp.float32),
        jnp.asarray([headings[0], headings[3], headings[5]], jnp.float32),
    )
    out_j, rec_j = make_step_batched(cfg, "jnp")(states, st)
    out_p, rec_p = make_step_batched(cfg, "pallas")(states, st)
    np.testing.assert_allclose(
        np.asarray(rec_p.fam), np.asarray(rec_j.fam), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(rec_p.k), np.asarray(rec_j.k))
    np.testing.assert_allclose(
        np.asarray(out_p.xy), np.asarray(out_j.xy), atol=1e-5
    )
