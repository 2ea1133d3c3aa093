"""L3 end-to-end parity: the jitted lax.scan episode reproduces the NumPy
oracle's trajectory step-for-step (SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu import oracle
from navdv_tpu.agent import (
    STATUS_DIVERGED,
    STATUS_REACHED,
    init_state,
    make_navigate,
    make_navigate_batch,
    make_statics,
    point_to_polyline_dist,
)
from navdv_tpu.landscape import make_landscape
from navdv_tpu.metrics import episode_metrics, success_rate
from navdv_tpu.routes import make_route
from navdv_tpu.training import train_library


@pytest.fixture(scope="module")
def trained(small_cfg_module, small_world_module):
    landscape, route = small_world_module
    lib = train_library(jnp.asarray(landscape), route, small_cfg_module)
    st = make_statics(landscape, lib, route)
    return landscape, route, lib, st


# module-scoped aliases of the session fixtures (avoid re-jitting per test)
@pytest.fixture(scope="module")
def small_cfg_module(request):
    return request.getfixturevalue("small_cfg")


@pytest.fixture(scope="module")
def small_world_module(request):
    return request.getfixturevalue("small_world")


def test_trained_library_matches_oracle(trained, small_cfg_module):
    landscape, route, lib, _ = trained
    want = oracle.train_library(landscape, route, small_cfg_module)
    assert lib.views.shape == want.shape
    np.testing.assert_allclose(np.asarray(lib.views), want, atol=2e-4)


def test_open_loop_step_parity(trained, small_cfg_module):
    """At identical poses along the oracle's trajectory, the JAX step computes
    the same familiarity vector, and the same argmin whenever the best/second
    margin exceeds fp32 tolerance. (Closed-loop trajectories may diverge at
    near-ties — SURVEY.md §7 hard-part 5 — so parity is asserted open-loop.)"""
    from navdv_tpu.familiarity import distance_matrix, reduce_familiarity
    from navdv_tpu.sensor import make_candidate_views, make_render_panorama, scan_shift_sets

    landscape, route, lib, st = trained
    cfg = small_cfg_module
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    olib = oracle.train_library(landscape, route, cfg)
    want = oracle.navigate(landscape, olib, route, pts[0], headings[0], cfg)

    _, extended = scan_shift_sets(cfg.scan)
    render = make_render_panorama(cfg.sensor)
    views = make_candidate_views(cfg.sensor, extended)

    # oracle poses BEFORE each step: start pose then recorded ones
    poses = [(pts[0], headings[0])] + [
        (want["xy"][i], want["theta"][i]) for i in range(len(want["xy"]) - 1)
    ]
    for i, (xy, th) in enumerate(poses[: min(len(poses), 10)]):
        pano_o = oracle.render_panorama(landscape, xy[0], xy[1], th, cfg)
        fam_o = oracle.scan_familiarity(pano_o, olib, cfg)
        cand = views(render(st.landscape, jnp.asarray(xy, jnp.float32), jnp.float32(th)))
        fam_j = np.asarray(reduce_familiarity(distance_matrix(cand, lib, cfg.scan.metric), cfg.scan))
        np.testing.assert_allclose(fam_j, fam_o, atol=5e-2, rtol=1e-3)
        # the fp32 decision is epsilon-optimal under the fp64 oracle scoring
        k_j = int(np.argmin(fam_j))
        assert fam_o[k_j] - fam_o.min() < 5e-2, f"step {i}"


def test_closed_loop_statistics_match_oracle(trained, small_cfg_module):
    """Both implementations recall the route from the same start with similar
    path statistics (decision-level divergence at ties is tolerated)."""
    landscape, route, lib, st = trained
    cfg = small_cfg_module
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    olib = oracle.train_library(landscape, route, cfg)
    want = oracle.navigate(landscape, olib, route, pts[0], headings[0], cfg)

    final, rec = make_navigate(cfg)(init_state(pts[0], headings[0]), st)
    assert want["success"] and bool(final.status == STATUS_REACHED)
    active = ~np.asarray(rec.done)
    jerr = np.asarray(rec.dist_route)[active]
    oerr = [oracle.point_to_polyline_dist(p, route) for p in want["xy"]]
    assert jerr.max() < 3.0 and max(oerr) < 3.0
    # both reach in a comparable number of steps
    assert abs(int(active.sum()) - len(want["xy"])) <= 5


def test_metrics(trained, small_cfg_module):
    landscape, route, lib, st = trained
    cfg = small_cfg_module
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    final, rec = make_navigate(cfg)(init_state(pts[0], headings[0]), st)
    m = episode_metrics(final, rec)
    assert bool(m["success"])
    assert int(m["n_steps"]) > 5
    assert float(m["max_path_error"]) < 5.0


def test_batched_navigate(trained, small_cfg_module, rng):
    """BASELINE config 4 shape: vmapped agents from randomized starts."""
    landscape, route, lib, st = trained
    cfg = small_cfg_module
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    b = 8
    starts = pts[0][None, :] + rng.normal(0, 1.0, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.1, size=(b,))
    states0 = init_state(
        jnp.asarray(starts, jnp.float32), jnp.asarray(thetas, jnp.float32)
    )
    final, rec = make_navigate_batch(cfg)(states0, st)
    assert rec.xy.shape == (b, cfg.agent.max_steps, 2)
    rate = float(success_rate(final))
    assert rate >= 0.5  # near-route starts on a feature-rich landscape recall


def test_point_to_polyline_matches_oracle(trained, rng):
    _, route, _, st = trained
    for _ in range(5):
        p = rng.uniform(20, 100, size=2)
        got = float(point_to_polyline_dist(jnp.asarray(p, jnp.float32), st))
        want = oracle.point_to_polyline_dist(p, route)
        assert got == pytest.approx(want, abs=1e-3)


def test_divergence_stop(trained, small_cfg_module):
    """Start far off-route but inside the landscape: diverged immediately."""
    landscape, route, lib, st = trained
    cfg = small_cfg_module
    final, rec = make_navigate(cfg)(init_state(np.array([64.0, 100.0]), 0.0), st)
    assert int(final.status) == STATUS_DIVERGED
    assert int(np.asarray(rec.done).sum()) == cfg.agent.max_steps - 1


def test_prepared_aux_matches_inline_prepare(trained, small_cfg_module):
    """make_navigate_batch(...) with run.prepare(st) passed as aux returns
    results identical to the inline per-episode prepare (the prepare-once
    API callers use for repeated trials against one library)."""
    import jax.numpy as jnp

    from navdv_tpu.agent import init_state, make_navigate_batch
    from navdv_tpu.oracle import resample_route

    landscape, route, lib, st = trained
    cfg = small_cfg_module
    pts, hd = resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(3)
    b = 4
    starts = pts[0][None] + rng.normal(0, 0.5, (b, 2))
    thetas = hd[0] + rng.normal(0, 0.05, (b,))
    states0 = init_state(starts, thetas)

    run = make_navigate_batch(cfg, fam_impl="roll")
    assert run.prepare is not None
    aux = run.prepare(st)
    f_inline, rec_inline = run(states0, st)
    f_aux, rec_aux = run(states0, st, aux)
    np.testing.assert_array_equal(np.asarray(rec_inline.xy), np.asarray(rec_aux.xy))
    np.testing.assert_array_equal(np.asarray(rec_inline.fam), np.asarray(rec_aux.fam))
    np.testing.assert_array_equal(np.asarray(f_inline.status), np.asarray(f_aux.status))

    # impls without a prepare stage expose prepare=None and still run
    run_jnp = make_navigate_batch(cfg, fam_impl="jnp")
    assert run_jnp.prepare is None
    run_jnp(states0, st)


def test_train_library_chunking_equivalence(trained, small_cfg_module, monkeypatch):
    """TRAIN_CHUNK_VIEWS capture chunking (round-4 large-library envelope:
    one unchunked vmapped render OOMed at ~6k views) is bitwise-equivalent
    to the unchunked path — same per-view program, chunked only over poses."""
    import navdv_tpu.training as training

    landscape, route, lib, _ = trained
    monkeypatch.setattr(training, "TRAIN_CHUNK_VIEWS", 3)  # force many chunks
    lib_chunked = training.train_library(
        jnp.asarray(landscape), route, small_cfg_module
    )
    assert lib_chunked.views.shape == lib.views.shape
    np.testing.assert_array_equal(
        np.asarray(lib_chunked.views), np.asarray(lib.views)
    )


def test_train_library_pad_views_equivalence(trained, small_cfg_module, monkeypatch):
    """pad_views_to renders extra (repeated) poses and slices back — the
    returned library is identical to the unpadded capture, for both the
    single-launch and chunked paths (sweep lib_bucket reuses the capture
    compile through this)."""
    import navdv_tpu.training as training

    landscape, route, lib, _ = trained
    lib_pad = training.train_library(
        jnp.asarray(landscape), route, small_cfg_module, pad_views_to=64
    )
    assert lib_pad.views.shape == lib.views.shape
    np.testing.assert_array_equal(np.asarray(lib_pad.views), np.asarray(lib.views))
    np.testing.assert_array_equal(np.asarray(lib_pad.valid), np.asarray(lib.valid))

    monkeypatch.setattr(training, "TRAIN_CHUNK_VIEWS", 4)  # padded + chunked
    lib_pad_chunked = training.train_library(
        jnp.asarray(landscape), route, small_cfg_module, pad_views_to=6
    )
    assert lib_pad_chunked.views.shape == lib.views.shape
    np.testing.assert_array_equal(
        np.asarray(lib_pad_chunked.views), np.asarray(lib.views)
    )
