"""Learned familiarity (fam_impl="infomax", SEMANTICS.md §9): the Infomax
novelty network trains on the library and supports closed-loop route recall.

A different MODEL than perfect memory (Baddeley et al. 2012's second model),
so there is no numeric-parity oracle; the tests assert the model's own
contracts: trained-view suppression, rotation discrimination, closed-loop
recall, pad-invariant training, and the prepare-once plumbing."""

import dataclasses
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.agent import (
    STATUS_REACHED,
    init_state,
    make_navigate,
    make_navigate_batch,
    make_statics,
    make_step_batched,
)
from navdv_tpu.config import ScanConfig
from navdv_tpu.familiarity import zscore
from navdv_tpu.familiarity_infomax import train_infomax
from navdv_tpu.training import train_library


def _info_cfg(small_cfg, **knobs):
    return dataclasses.replace(
        small_cfg, scan=dataclasses.replace(small_cfg.scan, **knobs)
    )


@pytest.fixture(scope="module")
def trained(small_cfg, small_world):
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    return landscape, route, lib


def _novelty(pack, views):
    z = zscore(jnp.asarray(views))
    return np.asarray(jnp.mean(jnp.abs(z @ pack.w.T), axis=1))


def test_training_suppresses_trained_views(trained, rng):
    _, _, lib = trained
    pack = train_infomax(lib, n_units=lib.flat.shape[1], eta=0.1, epochs=10, seed=0)
    on_route = _novelty(pack, lib.flat)
    novel = _novelty(pack, rng.random(lib.flat.shape).astype(np.float32))
    # every trained view scores more familiar than every random view
    assert on_route.max() < novel.min()


def test_rotation_discrimination(trained):
    """A half-panorama rotation of a trained view must read as less familiar
    than the view itself — the property navigation rests on."""
    _, _, lib = trained
    pack = train_infomax(lib, n_units=lib.flat.shape[1], eta=0.1, epochs=10, seed=0)
    n_r = 4  # small_cfg sensor rows
    views = np.asarray(lib.flat).reshape(lib.flat.shape[0], n_r, -1)
    rotated = np.roll(views, views.shape[2] // 2, axis=2).reshape(lib.flat.shape)
    assert _novelty(pack, lib.flat).mean() < _novelty(pack, rotated).mean()


def test_closed_loop_recall_single_agent(small_cfg, trained):
    """make_navigate (single-agent path) must run the prepare stage itself."""
    landscape, route, lib = trained
    cfg = _info_cfg(small_cfg)
    st = make_statics(jnp.asarray(landscape), lib, route)
    from navdv_tpu.oracle import resample_route

    pts, headings = resample_route(route, cfg.capture_spacing)
    final, _ = make_navigate(cfg, fam_impl="infomax")(
        init_state(pts[0], headings[0]), st
    )
    assert int(final.status) == STATUS_REACHED


def test_prepare_once_batched_matches_inline(small_cfg, trained):
    """navigate(states, st) == navigate(states, st, aux=prepare(st))."""
    landscape, route, lib = trained
    cfg = _info_cfg(small_cfg)
    st = make_statics(jnp.asarray(landscape), lib, route)
    from navdv_tpu.oracle import resample_route

    pts, headings = resample_route(route, cfg.capture_spacing)
    states = init_state(jnp.asarray(pts[:4]), jnp.asarray(headings[:4]))
    run = make_navigate_batch(cfg, fam_impl="infomax")
    aux = run.prepare(st)
    f_inline, _ = run(states, st)
    f_prep, _ = run(states, st, aux)
    np.testing.assert_array_equal(np.asarray(f_inline.xy), np.asarray(f_prep.xy))
    np.testing.assert_array_equal(
        np.asarray(f_inline.status), np.asarray(f_prep.status)
    )


def test_padded_library_trains_identically(trained):
    """valid=0 rows are zero-masked updates: padding Nl must not change W."""
    _, _, lib = trained
    n, p = lib.flat.shape
    pad = 7
    padded = lib._replace(
        views=jnp.concatenate([lib.views, jnp.zeros((pad, *lib.views.shape[1:]))]),
        flat=jnp.concatenate([lib.flat, jnp.ones((pad, p))]),
        sq=jnp.concatenate([lib.sq, jnp.zeros(pad)]),
        z=jnp.concatenate([lib.z, jnp.ones((pad, p))]),
        valid=jnp.concatenate([lib.valid, jnp.zeros(pad)]),
    )
    w_ref = train_infomax(lib, n_units=32, eta=0.1, epochs=3, seed=1).w
    w_pad = train_infomax(padded, n_units=32, eta=0.1, epochs=3, seed=1).w
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_pad))


def test_knob_warnings(small_cfg):
    with pytest.warns(UserWarning, match="infomax_eta"):
        make_step_batched(_info_cfg(small_cfg, infomax_eta=0.5), fam_impl="jnp")
    with pytest.warns(UserWarning, match="metric"):
        make_step_batched(_info_cfg(small_cfg, metric="ncc"), fam_impl="infomax")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # defaults must not warn
        make_step_batched(_info_cfg(small_cfg), fam_impl="infomax")


def test_auto_epochs_arc_rule():
    """AUTO targets ~0.8*P updates per arc-pixel: total dose = epochs * Nl
    ~ 0.8 * P * arc is invariant to capture density (denser libraries get
    proportionally fewer epochs) and to shape padding (spacing can't pad)."""
    from navdv_tpu.familiarity_infomax import auto_epochs

    p = 1152
    arc = 160.0
    target = 0.8 * p * arc
    for nl in (100, 1000, 16000, 64000):
        spacing = arc / nl
        d = auto_epochs(nl, p, spacing) * nl
        # rounding to whole epochs bounds the dose within half a pass either
        # side (train_infomax's epochs=0 path is exact via fractional epochs)
        assert abs(d - target) <= 0.5 * nl + 1
    # spacing-free fallback keeps the sparse-capture 40*P plateau
    assert auto_epochs(61, p) * 61 >= 40 * p


def test_step_without_prepare_raises_clearly(small_cfg, trained):
    landscape, route, lib = trained
    st = make_statics(jnp.asarray(landscape), lib, route)
    step = make_step_batched(small_cfg, fam_impl="infomax")
    states = init_state(jnp.zeros((2, 2)), jnp.zeros(2))
    with pytest.raises(ValueError, match="lib_prepare"):
        step(states, st)


def test_sweep_bucketed_infomax_epochs_from_true_count(small_cfg, small_world):
    """Bucket padding must not starve AUTO training: a padded cell reaches
    the same success as the unpadded one (epochs sized from valid views)."""
    from navdv_tpu.sweep import run_cell

    landscape, route = small_world
    r_plain = run_cell(landscape, route, small_cfg, n_trials=4, seed=0,
                       fam_impl="infomax")
    r_bucket = run_cell(landscape, route, small_cfg, n_trials=4, seed=0,
                        fam_impl="infomax", lib_bucket=64)
    assert int(r_bucket["n_library_padded"]) > int(r_bucket["n_library_views"])
    assert float(r_bucket["success_rate"]) >= float(r_plain["success_rate"])


def test_sweep_cell_runs_infomax(small_cfg, small_world):
    """run_cell routes prepare-once through the learned model (the sweep's
    getattr(nav, "prepare") path) and yields a sane success rate."""
    from navdv_tpu.sweep import run_cell

    landscape, route = small_world
    res = run_cell(landscape, route, small_cfg, n_trials=4, seed=0,
                   fam_impl="infomax")
    assert 0.0 <= float(res["success_rate"]) <= 1.0
    assert res["status_counts"].sum() == 4


def test_simulator_facade_infomax(small_cfg, small_world):
    from navdv_tpu.simulator import NavigationSimulator

    landscape, route = small_world
    sim = NavigationSimulator(small_cfg, landscape, route, fam_impl="infomax")
    out = sim.train().navigate(n_trials=4, seed=0)
    assert out.success_rate >= 0.75  # the small world navigates (grid evidence)


def test_sharded_lib_axis_raises(small_cfg):
    from navdv_tpu.parallel.mesh import make_mesh, make_navigate_sharded

    mesh = make_mesh(n_data=2, n_lib=4)
    with pytest.raises(ValueError, match="infomax"):
        make_navigate_sharded(small_cfg, mesh, fam_impl="infomax", shard_lib=True)


def test_data_parallel_sharding_matches_unsharded(small_cfg, trained):
    """Data-parallel (shard_lib=False) infomax over the 8-device CPU mesh:
    the trained network replicates and every agent's episode matches the
    unsharded batched run bitwise (same impl, same shapes, no collectives
    in the familiarity path)."""
    from navdv_tpu.parallel.mesh import (
        make_mesh,
        make_navigate_sharded,
        shard_statics,
    )

    landscape, route, lib = trained
    st = make_statics(jnp.asarray(landscape), lib, route)
    from navdv_tpu.oracle import resample_route

    pts, headings = resample_route(route, small_cfg.capture_spacing)
    b = 8
    rng = np.random.default_rng(2)
    starts = pts[0][None, :] + rng.normal(0, 1.0, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.1, size=(b,))
    states = init_state(jnp.asarray(starts, jnp.float32),
                        jnp.asarray(thetas, jnp.float32))
    want, _ = make_navigate_batch(small_cfg, fam_impl="infomax")(states, st)
    mesh = make_mesh(n_data=8, n_lib=1)
    st_sh = shard_statics(st, mesh, shard_lib=False)
    nav = make_navigate_sharded(small_cfg, mesh, fam_impl="infomax",
                                shard_lib=False)
    got, _ = nav(states, st_sh)
    np.testing.assert_array_equal(np.asarray(got.xy), np.asarray(want.xy))
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(want.status)
    )


def test_infomax_checkpoint_roundtrip(trained, tmp_path):
    from navdv_tpu.checkpoint import load_infomax, save_infomax

    _, _, lib = trained
    pack = train_infomax(lib, n_units=16, eta=0.1, epochs=2, seed=0)
    path = str(tmp_path / "infomax_ckpt")
    save_infomax(path, pack)
    back = load_infomax(path)
    np.testing.assert_array_equal(np.asarray(pack.w), np.asarray(back.w))
    np.testing.assert_array_equal(np.asarray(pack.wsum), np.asarray(back.wsum))


def test_scoring_invariant_to_affine_intensity(trained):
    """The z-score fold makes novelty invariant to per-view affine intensity
    changes of the candidate (the same robustness NCC has, SEMANTICS.md §4) —
    the behavioral reason z-scored inputs were chosen for the learned model."""
    _, _, lib = trained
    pack = train_infomax(lib, n_units=64, eta=0.1, epochs=5, seed=0)
    views = jnp.asarray(lib.flat[:8])
    dimmed = 0.6 * views + 0.2
    np.testing.assert_allclose(
        _novelty(pack, views), _novelty(pack, dimmed), rtol=2e-4, atol=2e-4
    )


def test_auto_fractional_dose_exactness(trained):
    """epochs=0 + capture_spacing hits the 0.8*P*spacing*Nl dose exactly:
    a spacing that lands on a whole number of epochs matches explicit
    epochs bitwise, and a sub-epoch target trains less than one full pass."""
    _, _, lib = trained
    nl, p = lib.flat.shape
    spacing_2ep = 2.0 / (0.8 * p)  # target = exactly 2 * Nl updates
    w_auto = train_infomax(lib, n_units=16, eta=0.1, epochs=0, seed=0,
                           capture_spacing=spacing_2ep).w
    w_two = train_infomax(lib, n_units=16, eta=0.1, epochs=2, seed=0).w
    np.testing.assert_array_equal(np.asarray(w_auto), np.asarray(w_two))
    # sub-epoch: target = Nl/2 updates -> strictly between init and 1 epoch
    spacing_half = 0.5 / (0.8 * p)
    w_half = train_infomax(lib, n_units=16, eta=0.1, epochs=0, seed=0,
                           capture_spacing=spacing_half).w
    w_one = train_infomax(lib, n_units=16, eta=0.1, epochs=1, seed=0).w
    assert not np.array_equal(np.asarray(w_half), np.asarray(w_one))
    assert not np.array_equal(np.asarray(w_half), np.zeros_like(w_half))
