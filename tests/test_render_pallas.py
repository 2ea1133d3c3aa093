"""Pallas batched renderer == jnp window renderer (exact bilinear)."""

import jax.numpy as jnp
import numpy as np

from navdv_tpu.ops.render_pallas import make_render_batch_pallas
from navdv_tpu.sensor import make_render_panorama


def test_render_pallas_matches_jnp(small_cfg, small_world, rng):
    landscape, _ = small_world
    s = small_cfg.sensor
    b = 16
    xy = jnp.asarray(rng.uniform(20, 100, size=(b, 2)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-4, 4, size=(b,)).astype(np.float32))
    got = make_render_batch_pallas(s, interpret=True)(jnp.asarray(landscape), xy, theta)
    ref = make_render_panorama(s)
    import jax

    want = jax.vmap(ref, in_axes=(None, 0, 0))(jnp.asarray(landscape), xy, theta)
    assert got.shape == (b, s.n_radial, s.n_fine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_render_pallas_edge_clamp(small_cfg, small_world):
    """Agents at the landscape edge: window clipping must reproduce the
    edge-clamp semantics."""
    landscape, _ = small_world
    s = small_cfg.sensor
    poses = np.array(
        [[1.0, 1.0], [126.5, 126.5], [0.2, 64.0], [64.0, 127.0],
         [5.0, 5.0], [122.0, 6.0], [6.0, 122.0], [64.0, 64.0]],
        dtype=np.float32,
    )
    thetas = jnp.asarray(np.linspace(-3, 3, 8), jnp.float32)
    got = make_render_batch_pallas(s, interpret=True)(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    import jax

    want = jax.vmap(make_render_panorama(s), in_axes=(None, 0, 0))(
        jnp.asarray(landscape), jnp.asarray(poses), thetas
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
