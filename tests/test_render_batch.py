"""Batched renderer (pluggable window extraction) == per-agent renderer,
including at landscape edges where the aligned window is clipped."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.sensor import make_render_batch, make_render_panorama


@pytest.mark.parametrize("window_impl", ["xla", "pallas"])
def test_render_batch_matches_per_agent(small_cfg, small_world, rng, window_impl):
    landscape, _ = small_world
    s = small_cfg.sensor
    poses = np.concatenate(
        [
            rng.uniform(20, 100, size=(12, 2)),
            # edge cases: windows clip against every border
            np.array([[1.0, 1.0], [126.5, 126.5], [0.2, 64.0], [64.0, 126.9]]),
        ]
    ).astype(np.float32)
    thetas = jnp.asarray(rng.uniform(-4, 4, size=(16,)).astype(np.float32))
    got = make_render_batch(s, window_impl=window_impl)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    want = jax.vmap(make_render_panorama(s), in_axes=(None, 0, 0))(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
