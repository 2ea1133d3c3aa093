"""Convolutional familiarity path == the extract-then-matmul reference path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.agent import init_state, make_statics, make_step_batched
from navdv_tpu.config import ScanConfig
from navdv_tpu.oracle import resample_route
from navdv_tpu.training import train_library


@pytest.mark.parametrize(
    "metric,tol_bins,step_bins",
    [("ssd", 0, 2), ("ncc", 0, 2), ("ssd", 2, 2), ("ncc", 1, 1), ("ssd", 0, 3)],
)
def test_conv_step_matches_jnp_step(small_cfg, small_world, metric, tol_bins, step_bins):
    cfg = dataclasses.replace(
        small_cfg,
        scan=ScanConfig(
            n_headings=12, scan_step_bins=step_bins, metric=metric, tol_bins=tol_bins
        ),
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, cfg.capture_spacing)
    states = init_state(
        jnp.asarray(np.stack([pts[0], pts[3], pts[6], pts[9]]), jnp.float32),
        jnp.asarray([hd[0], hd[3] + 0.3, hd[6] - 0.2, hd[9]], jnp.float32),
    )
    o1, r1 = make_step_batched(cfg, "jnp")(states, st)
    o2, r2 = make_step_batched(cfg, "conv")(states, st)
    np.testing.assert_allclose(
        np.asarray(r2.fam), np.asarray(r1.fam), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(r2.k), np.asarray(r1.k))
    np.testing.assert_allclose(np.asarray(o2.xy), np.asarray(o1.xy), atol=1e-5)


def test_conv_step_with_padded_library(small_cfg, small_world):
    """Pad-penalty columns must not win through the conv path either."""
    from navdv_tpu.parallel.mesh import pad_library

    landscape, route = small_world
    cfg = small_cfg
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    st_pad = st._replace(lib=pad_library(lib, 8))
    pts, hd = resample_route(route, cfg.capture_spacing)
    states = init_state(
        jnp.asarray(pts[:4], jnp.float32), jnp.asarray(hd[:4], jnp.float32)
    )
    step = make_step_batched(cfg, "conv")
    _, r1 = step(states, st)
    _, r2 = step(states, st_pad)
    np.testing.assert_allclose(np.asarray(r2.fam), np.asarray(r1.fam), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(r2.k), np.asarray(r1.k))
