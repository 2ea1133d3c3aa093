"""L5 visualization: plots and animations render to files without error."""

import numpy as np
import jax.numpy as jnp
import pytest

from navdv_tpu import viz
from navdv_tpu.agent import init_state, make_navigate, make_navigate_batch, make_statics
from navdv_tpu.oracle import resample_route
from navdv_tpu.training import train_library


@pytest.fixture(scope="module")
def episode(request):
    cfg = request.getfixturevalue("small_cfg")
    landscape, route = request.getfixturevalue("small_world")
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = resample_route(route, cfg.capture_spacing)
    final, rec = make_navigate(cfg)(init_state(pts[0], headings[0]), st)
    states0 = init_state(
        jnp.asarray(np.tile(pts[0], (4, 1)), jnp.float32),
        jnp.full((4,), headings[0], jnp.float32),
    )
    bfinal, brec = make_navigate_batch(cfg)(states0, st)
    return landscape, route, rec, brec


def test_plot_trajectory_single(episode, tmp_path):
    landscape, route, rec, _ = episode
    p = viz.plot_trajectory(landscape, route, rec, str(tmp_path / "t.png"))
    assert (tmp_path / "t.png").stat().st_size > 1000


def test_plot_trajectory_batch(episode, tmp_path):
    landscape, route, _, brec = episode
    viz.plot_trajectory(landscape, route, brec, str(tmp_path / "tb.png"))
    assert (tmp_path / "tb.png").stat().st_size > 1000


def test_plot_familiarity(episode, tmp_path):
    _, _, rec, brec = episode
    viz.plot_familiarity_trace(rec, str(tmp_path / "f.png"))
    viz.plot_familiarity_trace(brec, str(tmp_path / "fb.png"))
    assert (tmp_path / "f.png").exists() and (tmp_path / "fb.png").exists()


def test_animate_episode(episode, tmp_path):
    landscape, route, rec, _ = episode
    out = viz.animate_episode(landscape, route, rec, str(tmp_path / "e.mp4"), fps=10)
    import os

    assert os.path.getsize(out) > 1000  # mp4 or gif fallback


def test_animate_episode_rejects_batched_record(episode, tmp_path):
    """A [B, T] record boolean-masked would splice every agent's steps into
    one teleporting fake trajectory — reject it with guidance instead."""
    landscape, route, _, brec = episode
    with pytest.raises(ValueError, match="ONE episode"):
        viz.animate_episode(landscape, route, brec, str(tmp_path / "x.mp4"))


def test_axis_sort_key_orders_numerically():
    """Heatmap axis labels order by value, not lexicographically."""
    vals = ["10.0", "0.5", "2.0"]
    assert sorted(vals, key=viz._axis_sort_key) == ["0.5", "2.0", "10.0"]
    px = ["360x64u1", "18x4u20", "72x16u5"]
    assert sorted(px, key=viz._axis_sort_key) == [
        "18x4u20", "72x16u5", "360x64u1",
    ]
