"""Fused lag-familiarity kernel == jnp reference step (SSD)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.config import ScanConfig
from navdv_tpu.oracle import resample_route
from navdv_tpu.training import train_library


@pytest.mark.parametrize("tol_bins,step_bins", [(0, 2), (2, 2), (0, 3), (1, 1)])
def test_lag_kernel_matches_jnp(small_cfg, small_world, tol_bins, step_bins):
    from navdv_tpu.agent import init_state, make_statics, make_step_batched
    from navdv_tpu.ops.lag_pallas import make_lag_fam_pallas
    from navdv_tpu.sensor import make_render_batch

    cfg = dataclasses.replace(
        small_cfg,
        scan=ScanConfig(n_headings=12, scan_step_bins=step_bins, tol_bins=tol_bins),
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, cfg.capture_spacing)
    xy = jnp.asarray(np.stack([pts[0], pts[3], pts[6], pts[9]] * 2), jnp.float32)
    th = jnp.asarray([hd[0], hd[3] + 0.4, hd[6], hd[9] - 0.3] * 2, jnp.float32)

    # reference fam via the production jnp step machinery
    states = init_state(xy, th)
    _, r_ref = make_step_batched(cfg, "jnp")(states, st)

    pano = make_render_batch(cfg.sensor, window_impl="xla")(st.landscape, xy, th)
    fam_kernel = make_lag_fam_pallas(cfg.sensor, cfg.scan, interpret=True)
    fam = fam_kernel(pano, lib)
    k = jnp.asarray(np.asarray(cfg.scan.tie_order()))[
        jnp.argmin(fam[:, jnp.asarray(cfg.scan.tie_order())], axis=1)
    ]
    np.testing.assert_allclose(
        np.asarray(jnp.min(fam, axis=1)),
        np.asarray(r_ref.fam),
        rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_array_equal(np.asarray(k), np.asarray(r_ref.k))


def test_lag_kernel_rejects_ncc(small_cfg):
    from navdv_tpu.ops.lag_pallas import make_lag_fam_pallas

    with pytest.raises(ValueError):
        make_lag_fam_pallas(
            small_cfg.sensor, ScanConfig(n_headings=12, metric="ncc")
        )
