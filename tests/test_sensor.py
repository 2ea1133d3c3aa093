"""L1 parity: JAX renderer == NumPy oracle (SURVEY.md §4.4 cross-impl oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu import oracle
from navdv_tpu.sensor import (
    bilinear_sample,
    make_candidate_views,
    make_render_panorama,
    make_render_view,
    scan_shift_sets,
)


def test_bilinear_matches_oracle(small_world, rng):
    landscape, _ = small_world
    xs = rng.uniform(-2, 130, size=(50,))  # includes out-of-bounds clamping
    ys = rng.uniform(-2, 130, size=(50,))
    got = bilinear_sample(jnp.asarray(landscape), jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))
    want = oracle.bilinear(landscape.astype(np.float64), xs, ys)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_panorama_matches_oracle(small_cfg, small_world):
    landscape, _ = small_world
    render = make_render_panorama(small_cfg.sensor)
    for (x, y, th) in [(60.0, 64.0, 0.0), (40.0, 50.0, 2.1), (80.0, 70.0, -1.3)]:
        got = render(jnp.asarray(landscape), jnp.asarray([x, y], jnp.float32), jnp.float32(th))
        want = oracle.render_panorama(landscape, x, y, th, small_cfg)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_candidate_views_match_per_heading_render(small_cfg, small_world):
    """The roll+pool candidate stack equals re-rendering at each heading
    (SEMANTICS.md §3 rotation=shift, on the JAX path)."""
    landscape, _ = small_world
    s = small_cfg.sensor
    shifts, extended = scan_shift_sets(small_cfg.scan)
    render = make_render_panorama(s)
    views = make_candidate_views(s, extended)
    render_view = make_render_view(s)
    xy = jnp.asarray([60.0, 64.0], jnp.float32)
    th = 0.9
    cand = views(render(jnp.asarray(landscape), xy, jnp.float32(th)))
    for row, shift in enumerate(extended):
        direct = render_view(
            jnp.asarray(landscape), xy, jnp.float32(th + shift * s.bin_width)
        )
        np.testing.assert_allclose(
            np.asarray(cand[row]).reshape(s.n_radial, s.n_azimuth),
            np.asarray(direct),
            atol=2e-4,
        )


def test_render_view_matches_oracle(small_cfg, small_world):
    landscape, _ = small_world
    render_view = make_render_view(small_cfg.sensor)
    got = render_view(
        jnp.asarray(landscape), jnp.asarray([55.0, 60.0], jnp.float32), jnp.float32(1.234)
    )
    want = oracle.render_view(landscape, 55.0, 60.0, 1.234, small_cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_window_renderer_matches_gather_renderer(small_cfg, small_world, rng):
    """Production window+matmul renderer == gather reference renderer,
    including near landscape edges (clamp semantics)."""
    from navdv_tpu.sensor import make_render_panorama_gather

    landscape, _ = small_world
    fast = make_render_panorama(small_cfg.sensor)
    slow = make_render_panorama_gather(small_cfg.sensor)
    poses = [(60.0, 64.0, 0.7), (3.0, 64.0, 2.0), (126.0, 126.0, -0.4), (0.5, 0.5, 1.0)]
    for x, y, th in poses:
        a = fast(jnp.asarray(landscape), jnp.asarray([x, y], jnp.float32), jnp.float32(th))
        b = slow(jnp.asarray(landscape), jnp.asarray([x, y], jnp.float32), jnp.float32(th))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_render_is_jittable(small_cfg, small_world):
    landscape, _ = small_world
    render = jax.jit(make_render_panorama(small_cfg.sensor))
    out = render(jnp.asarray(landscape), jnp.asarray([60.0, 64.0], jnp.float32), jnp.float32(0.5))
    assert out.shape == (small_cfg.sensor.n_radial, small_cfg.sensor.n_fine)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_hat_render_close_to_f32(small_cfg, small_world, rng):
    """hat_dtype='bfloat16' batched renderer stays within bf16 weight noise of
    the exact f32 path (pixel atol ~1e-2; accumulation is f32)."""
    import dataclasses

    from navdv_tpu.sensor import make_render_batch

    landscape, _ = small_world
    sensor_bf = dataclasses.replace(small_cfg.sensor, hat_dtype="bfloat16")
    xy = jnp.asarray(rng.uniform(40, 90, (6, 2)), jnp.float32)
    th = jnp.asarray(rng.uniform(0, 6.28, (6,)), jnp.float32)
    land = jnp.asarray(landscape)
    a = make_render_batch(small_cfg.sensor)(land, xy, th)
    b = make_render_batch(sensor_bf)(land, xy, th)
    assert b.shape == a.shape
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1.5e-2)
    assert float(jnp.mean(jnp.abs(b - a))) < 3e-3


def test_bf16_matmul_pooling_close_to_exact(small_cfg, rng):
    """The fast-numerics banded-circulant matmul pooling stays within bf16
    input-rounding noise of the exact rolled-add pooling."""
    import dataclasses

    from navdv_tpu.sensor import make_pooled_panorama

    sensor_bf = dataclasses.replace(small_cfg.sensor, hat_dtype="bfloat16")
    pano = jnp.asarray(rng.random((5, small_cfg.sensor.n_radial,
                                   small_cfg.sensor.n_fine)), jnp.float32)
    exact = make_pooled_panorama(small_cfg.sensor)(pano)
    fast = make_pooled_panorama(sensor_bf)(pano)
    scale = float(jnp.max(jnp.abs(exact)))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=8e-3 * scale)
