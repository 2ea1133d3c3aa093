"""Early-exit (while_loop) episodes == fixed-length (scan) episodes."""

import jax.numpy as jnp
import numpy as np

from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
from navdv_tpu.oracle import resample_route
from navdv_tpu.training import train_library


def test_early_exit_matches_scan(small_cfg, small_world):
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, small_cfg.capture_spacing)
    states0 = init_state(
        jnp.asarray(pts[:4], jnp.float32), jnp.asarray(hd[:4], jnp.float32)
    )
    f1, r1 = make_navigate_batch(small_cfg)(states0, st)
    f2, r2 = make_navigate_batch(small_cfg, early_exit=True)(states0, st)

    np.testing.assert_array_equal(np.asarray(f1.status), np.asarray(f2.status))
    np.testing.assert_allclose(np.asarray(f1.xy), np.asarray(f2.xy), atol=1e-6)
    act1, act2 = ~np.asarray(r1.done), ~np.asarray(r2.done)
    np.testing.assert_array_equal(act1, act2)
    np.testing.assert_allclose(
        np.asarray(r1.xy)[act1], np.asarray(r2.xy)[act2], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(r1.k)[act1], np.asarray(r2.k)[act2])

    from navdv_tpu.metrics import episode_metrics

    m1 = episode_metrics(f1, r1)
    m2 = episode_metrics(f2, r2)
    np.testing.assert_allclose(
        np.asarray(m1["final_fam"]), np.asarray(m2["final_fam"]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(m1["n_steps"]), np.asarray(m2["n_steps"]))
