"""L4 sweep runner: grid execution, aggregation, on-disk resume."""

import os

import numpy as np

from navdv_tpu.checkpoint import load_library, load_results, save_library, save_results
from navdv_tpu.sweep import SweepSpec, run_cell, run_sweep
from navdv_tpu.trials import make_trials


def _tiny_spec():
    return SweepSpec(
        sensor_px=((24, 4, 3),),
        scan_granularity=((12, 2), (8, 3)),
        capture_spacing=(1.5,),
        n_trials=4,
        max_steps=16,
    )


def test_trials_reproducible(small_cfg, small_world):
    _, route = small_world
    s1, t1 = make_trials(route, small_cfg, 8, seed=3)
    s2, t2 = make_trials(route, small_cfg, 8, seed=3)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(t1, t2)
    s3, _ = make_trials(route, small_cfg, 8, seed=4)
    assert not np.array_equal(s1, s3)


def test_run_cell(small_cfg, small_world):
    landscape, route = small_world
    res = run_cell(landscape, route, small_cfg, n_trials=4, seed=0)
    assert 0.0 <= float(res["success_rate"]) <= 1.0
    assert res["status_counts"].sum() == 4
    assert float(res["agent_steps_per_s"]) > 0


def test_sweep_runs_and_resumes(small_world, tmp_path):
    landscape, route = small_world
    spec = _tiny_spec()
    out = str(tmp_path / "sweep")
    r1 = run_sweep(landscape, route, spec, out, verbose=False)
    assert len(r1) == 2
    assert os.path.exists(os.path.join(out, "summary.json"))
    # tamper with one result file; resume must keep it (proves skip-if-exists)
    key = next(iter(r1))
    path = os.path.join(out, f"cell_{key}.npz")
    tampered = dict(load_results(path))
    tampered["success_rate"] = np.asarray(0.123)
    save_results(path, tampered)
    r2 = run_sweep(landscape, route, spec, out, verbose=False)
    assert float(r2[key]["success_rate"]) == 0.123


def test_sweep_sharding_unions_to_full_grid(small_world, tmp_path):
    """Array-job pattern: two shards against one out_dir = the full sweep."""
    landscape, route = small_world
    spec = _tiny_spec()
    out = str(tmp_path / "sweep_shard")
    r0 = run_sweep(landscape, route, spec, out, verbose=False, shard=(0, 2))
    r1 = run_sweep(landscape, route, spec, out, verbose=False, shard=(1, 2))
    assert len(r0) == 1 and len(r1) == 1
    assert set(r0) | set(r1) == {k for k, _, _ in spec.cells()}
    # summary.json is the UNION of on-disk cells, not the last writer's
    # slice (each shard process only holds its own cells in memory)
    import json

    with open(os.path.join(out, "summary.json")) as f:
        assert set(json.load(f)) == set(r0) | set(r1)


def test_spec_from_json_rejects_unknown_keys(tmp_path):
    """A typo'd spec key (n_trails) must fail loudly, not silently run the
    whole grid with a default budget."""
    import json

    import pytest

    good = {"n_trials": 8, "max_steps": 16}
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(good))
    assert SweepSpec.from_json(str(p)).n_trials == 8
    p.write_text(json.dumps({**good, "n_trails": 4096}))
    with pytest.raises(ValueError, match="n_trails"):
        SweepSpec.from_json(str(p))


def test_run_cell_infomax_on_lib_sharded_mesh(small_cfg, small_world):
    """An infomax cell on a mesh with a lib axis replicates the library
    instead of crashing (the learned memory cannot shard over Nl)."""
    from navdv_tpu.parallel.mesh import make_mesh

    landscape, route = small_world
    res = run_cell(landscape, route, small_cfg, n_trials=4, seed=0,
                   fam_impl="infomax", mesh=make_mesh(2, 2))
    assert 0.0 <= float(res["success_rate"]) <= 1.0


def test_sweep_heatmap_uses_structured_metadata(small_world, tmp_path):
    """The heatmap reads ax_* entries from results — renaming every cell key
    (as a SweepSpec axis rename would) must not break it."""
    from navdv_tpu import viz

    landscape, route = small_world
    spec = _tiny_spec()
    out = str(tmp_path / "s")
    res = run_sweep(landscape, route, spec, out, verbose=False, tensorboard=False)
    renamed = {f"arbitrary_cell_{i}": v for i, v in enumerate(res.values())}
    p = viz.plot_sweep_heatmap(renamed, "scan", "spacing", str(tmp_path / "h.png"))
    assert os.path.getsize(p) > 1000
    # a missing axis entry fails loudly, not with a silently wrong plot
    import pytest

    broken = {k: {kk: vv for kk, vv in v.items() if kk != "ax_scan"}
              for k, v in res.items()}
    with pytest.raises(KeyError):
        viz.plot_sweep_heatmap(broken, "scan", "spacing", str(tmp_path / "h2.png"))


def test_tensorboard_logging(small_world, tmp_path):
    """Per-cell scalars land as real tensorboard event files (SURVEY.md §5.5)."""
    landscape, route = small_world
    spec = _tiny_spec()
    out = str(tmp_path / "tbsweep")
    res = run_sweep(landscape, route, spec, out, verbose=False)
    for key in res:
        cell_dir = os.path.join(out, "tb", key)
        assert os.path.isdir(cell_dir), cell_dir
        events = [f for f in os.listdir(cell_dir) if "tfevents" in f]
        assert events, f"no event file in {cell_dir}"
        assert os.path.getsize(os.path.join(cell_dir, events[0])) > 0


def test_trials_start_anywhere(small_cfg, small_world):
    """start_anywhere spreads starts along the route; episodes then finish in
    fewer steps (they begin closer to the goal on average) while recall on a
    feature-rich landscape stays alive."""
    landscape, route = small_world
    s_any, _ = make_trials(route, small_cfg, 64, seed=1, start_anywhere=True)
    s_start, _ = make_trials(route, small_cfg, 64, seed=1)
    span = np.ptp(s_any[:, 0]) + np.ptp(s_any[:, 1])
    span0 = np.ptp(s_start[:, 0]) + np.ptp(s_start[:, 1])
    assert span > 2.0 * span0, (span, span0)

    res_any = run_cell(landscape, route, small_cfg, n_trials=16, seed=0,
                       start_anywhere=True)
    res_start = run_cell(landscape, route, small_cfg, n_trials=16, seed=0)
    assert float(res_any["mean_steps"]) < float(res_start["mean_steps"])
    assert float(res_any["success_rate"]) > 0.5


def test_load_landscape_roundtrip(tmp_path):
    from navdv_tpu.landscape import load_landscape, make_landscape

    land = make_landscape("blobs", size=(64, 64), seed=1)
    np.save(tmp_path / "l.npy", land)
    got = load_landscape(str(tmp_path / "l.npy"))
    np.testing.assert_allclose(got, land, atol=1e-6)

    from PIL import Image

    Image.fromarray((land * 255).astype(np.uint8)).save(tmp_path / "l.png")
    got_png = load_landscape(str(tmp_path / "l.png"))
    assert got_png.shape == (64, 64)
    np.testing.assert_allclose(got_png, land, atol=0.01)  # 8-bit quantization


def test_library_checkpoint_roundtrip(small_cfg, small_world, tmp_path):
    import jax.numpy as jnp

    from navdv_tpu.training import train_library

    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    path = str(tmp_path / "lib_ckpt")
    save_library(path, lib)
    lib2 = load_library(path)
    np.testing.assert_array_equal(np.asarray(lib.views), np.asarray(lib2.views))
    np.testing.assert_array_equal(np.asarray(lib.valid), np.asarray(lib2.valid))


def test_auto_impl_resolution(small_cfg):
    """fam_impl="auto" resolves per the measured-winner rule (config.py):
    NCC -> fft; dense SSD library -> roll; sparse SSD -> fft."""
    import dataclasses

    from navdv_tpu.config import choose_fam_impl, baseline_config

    assert choose_fam_impl(baseline_config(1)) == "fft"
    assert choose_fam_impl(baseline_config(3)) == "fft"  # ncc
    assert choose_fam_impl(baseline_config(4)) == "fft"
    dense = dataclasses.replace(baseline_config(2), capture_spacing=0.2)
    assert choose_fam_impl(dense) == "roll"
    # small SSD sensors route to the exact extract-then-matmul path: the
    # extraction-free impls pay the full fine-azimuth circle for tiny views
    # (measured round 4: jnp 1.9-3.1x faster AND exact there)
    from navdv_tpu.config import SensorConfig

    small = dataclasses.replace(
        baseline_config(5),
        sensor=SensorConfig(n_azimuth=18, n_radial=4, az_upsample=20),
    )
    assert choose_fam_impl(small) == "jnp"
    small_dense = dataclasses.replace(small, capture_spacing=0.2)
    assert choose_fam_impl(small_dense) == "jnp"
    # the small-sensor rule precedes the metric branch (ADVICE r4): the
    # full-circle cost structure the rule encodes is metric-independent
    small_ncc = dataclasses.replace(
        small, scan=dataclasses.replace(small.scan, metric="ncc"))
    assert choose_fam_impl(small_ncc) == "jnp"


def test_infomax_auto_dose_resolution(small_cfg):
    """ADVICE r4: run_cell resolves the infomax AUTO dose to an integer for
    compile sharing ONLY when the integer is faithful (within 5%); at extreme
    density (ideal dose near 1) it keeps epochs=0 so train_infomax's exact
    fractional path runs, and the cell pays a per-cell recompile instead of
    a quantized (up to ~2x) overtraining dose."""
    import dataclasses

    from navdv_tpu.sweep import resolve_infomax_epochs

    p = small_cfg.sensor.n_pixels
    # moderate density: ideal = 0.8*P*spacing is large, rounding is faithful
    moderate = dataclasses.replace(small_cfg, capture_spacing=1.0)
    out = resolve_infomax_epochs(moderate, n_views_true=40)
    assert out.scan.infomax_epochs == round(0.8 * p * 1.0)
    # extreme density: ideal dose ~1.3 epochs -> rounding to 1 is a 23%
    # dose error; the config must keep the fractional path
    spacing = 1.3 / (0.8 * p)
    extreme = dataclasses.replace(small_cfg, capture_spacing=spacing)
    out = resolve_infomax_epochs(extreme, n_views_true=40)
    assert out.scan.infomax_epochs == 0
    # an explicit (non-AUTO) epochs count is never touched
    explicit = dataclasses.replace(
        extreme, scan=dataclasses.replace(extreme.scan, infomax_epochs=7))
    assert resolve_infomax_epochs(explicit, 40).scan.infomax_epochs == 7


def test_lib_bucket_equivalence(small_cfg, small_world):
    """Padding the library to a bucketed shape must not change any cell
    result: padded views carry +PAD_PENALTY distance and never win the min
    (SURVEY.md §7 hard-part 3 mitigation)."""
    landscape, route = small_world
    base = run_cell(landscape, route, small_cfg, n_trials=8, seed=0)
    bucketed = run_cell(landscape, route, small_cfg, n_trials=8, seed=0,
                        lib_bucket=64)
    assert int(bucketed["n_library_padded"]) % 64 == 0
    assert int(bucketed["n_library_views"]) == int(base["n_library_views"])
    assert int(bucketed["n_library_padded"]) > int(bucketed["n_library_views"])
    for k in ("success_rate", "mean_steps", "mean_path_error",
              "max_path_error"):
        np.testing.assert_array_equal(base[k], bucketed[k], err_msg=k)
    np.testing.assert_array_equal(base["status_counts"],
                                  bucketed["status_counts"])


def test_lib_bucket_shares_one_navigate_fn(small_cfg, small_world):
    """Cells differing only in capture_spacing hit one nav-cache entry (and
    therefore one XLA compilation, since the bucketed shapes match)."""
    import dataclasses

    landscape, route = small_world
    cache: dict = {}
    spacings = (1.0, 1.5, 2.0)
    nl_seen = set()
    for sp in spacings:
        cfg = dataclasses.replace(small_cfg, capture_spacing=sp)
        res = run_cell(landscape, route, cfg, n_trials=4, seed=0,
                       lib_bucket=64, nav_cache=cache)
        nl_seen.add(int(res["n_library_views"]))
        assert int(res["n_library_padded"]) == 64
    assert len(nl_seen) == len(spacings)  # the cells genuinely differ
    assert len(cache) == 1, list(cache)


def test_sweep_lib_bucket_end_to_end(small_world, tmp_path):
    """A bucketed sweep produces the same per-cell results as the unbucketed
    sweep, and records the padded shapes."""
    landscape, route = small_world
    spec = _tiny_spec()
    spec_b = SweepSpec(**{**dataclasses_asdict_shallow(spec), "lib_bucket": 32})
    r0 = run_sweep(landscape, route, spec, str(tmp_path / "plain"),
                   verbose=False, tensorboard=False)
    r1 = run_sweep(landscape, route, spec_b, str(tmp_path / "bucketed"),
                   verbose=False, tensorboard=False)
    assert set(r0) == set(r1)
    for k in r0:
        np.testing.assert_array_equal(r0[k]["success_rate"],
                                      r1[k]["success_rate"], err_msg=k)
        assert int(r1[k]["n_library_padded"]) % 32 == 0


def dataclasses_asdict_shallow(spec):
    import dataclasses

    return {f.name: getattr(spec, f.name) for f in dataclasses.fields(spec)}


def test_run_cell_auto_with_recall_check(small_cfg, small_world):
    """Auto-resolved cells record the resolved impl and, with
    recall_check_trials, a per-cell jnp cross-check of recall."""
    import dataclasses

    from navdv_tpu.sweep import run_cell

    landscape, route = small_world
    # a >=512-px NCC sensor resolves to the spectral path (small sensors of
    # EITHER metric resolve to jnp since ADVICE r4), so the jnp cross-check
    # branch is exercised
    from navdv_tpu.config import SensorConfig

    cfg = dataclasses.replace(
        small_cfg,
        sensor=SensorConfig(
            n_radial=8, n_azimuth=64, az_upsample=2, r_min=2.0, r_max=8.0
        ),
        scan=dataclasses.replace(small_cfg.scan, metric="ncc"),
    )
    res = run_cell(landscape, route, cfg, n_trials=8, seed=0,
                   fam_impl="auto", recall_check_trials=4)
    assert str(res["fam_impl"]) == "fft"
    assert "success_rate_jnp" in res and "success_rate_subset" in res
    assert int(res["recall_check_trials"]) == 4
    # exact-path recall and fast-impl recall agree on the subset within the
    # documented band
    assert abs(float(res["success_rate_jnp"])
               - float(res["success_rate_subset"])) <= 0.5


def test_sweep_cells_over_mesh_matches_serial(small_world, tmp_path):
    """SURVEY §3.5's last clause (VERDICT r4 item 6): distribute CELLS over
    the mesh data axis. Spacing-only cells share one traced program, so the
    4-cell spacing axis runs as ONE shard_map program over the 4-device
    group; per-cell metrics must match the serial per-cell path exactly."""
    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import SweepSpec, run_sweep

    landscape, route = small_world
    spec = SweepSpec(
        sensor_px=((24, 4, 3),),
        scan_granularity=((12, 2), (8, 3)),
        capture_spacing=(1.5, 2.0, 2.5, 3.0),
        n_trials=4,
        max_steps=16,
        lib_bucket=16,
    )
    serial = run_sweep(landscape, route, spec, str(tmp_path / "serial"),
                       verbose=False, tensorboard=False)
    mesh = make_mesh(4, 1)
    meshed = run_sweep(landscape, route, spec, str(tmp_path / "mesh"),
                       cells_mesh=mesh, verbose=False, tensorboard=False)
    assert set(serial) == set(meshed) and len(serial) == 8
    for k in serial:
        np.testing.assert_array_equal(
            serial[k]["success_rate"], meshed[k]["success_rate"], err_msg=k)
        np.testing.assert_allclose(
            serial[k]["mean_path_error"], meshed[k]["mean_path_error"],
            rtol=1e-5, err_msg=k)
        # a cell's group is exactly the cells sharing its traced program:
        # same scan granularity AND same bucketed library shape (the sparsest
        # spacing can fall into a smaller bucket and group alone)
        want_group = sum(
            1 for j in meshed
            if meshed[j]["ax_scan"] == meshed[k]["ax_scan"]
            and int(meshed[j]["n_library_padded"]) == int(meshed[k]["n_library_padded"])
        )
        assert int(meshed[k]["group_size"]) == want_group, k
    # at least one multi-cell group actually exercised the sharded cell axis
    assert max(int(v["group_size"]) for v in meshed.values()) >= 3


def test_sweep_cells_over_mesh_resume(small_world, tmp_path):
    """Per-cell resume is intact in cells-over-mesh mode: deleting one cell
    file and re-running recomputes only that cell (its group re-runs padded)
    and the union is complete."""
    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import SweepSpec, run_sweep

    landscape, route = small_world
    spec = SweepSpec(
        sensor_px=((24, 4, 3),),
        scan_granularity=((12, 2),),
        capture_spacing=(1.5, 2.0, 2.5),
        n_trials=4,
        max_steps=16,
        lib_bucket=16,
    )
    mesh = make_mesh(4, 1)
    out = str(tmp_path / "mesh")
    first = run_sweep(landscape, route, spec, out, cells_mesh=mesh,
                      verbose=False, tensorboard=False)
    # 3 cells on a 4-wide axis: one padding repeat
    assert all(int(v["group_pad"]) == 1 for v in first.values())
    victim = sorted(first)[1]
    os.remove(os.path.join(out, f"cell_{victim}.npz"))
    second = run_sweep(landscape, route, spec, out, cells_mesh=mesh,
                       verbose=False, tensorboard=False)
    assert set(second) == set(first)
    np.testing.assert_array_equal(
        first[victim]["success_rate"], second[victim]["success_rate"])


def test_sweep_cells_over_mesh_infomax(small_world, tmp_path):
    """The learned-memory impl works in cells-over-mesh mode: the prepare
    stage (Infomax training, a lax.scan) runs inside each vmapped cell, and
    per-cell recall matches the serial per-cell path."""
    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import SweepSpec, run_sweep

    landscape, route = small_world
    spec = SweepSpec(
        sensor_px=((24, 4, 3),),
        scan_granularity=((12, 2),),
        capture_spacing=(1.5, 2.0),
        n_trials=4,
        max_steps=16,
        lib_bucket=16,
    )
    serial = run_sweep(landscape, route, spec, str(tmp_path / "serial"),
                       fam_impl="infomax", verbose=False, tensorboard=False)
    meshed = run_sweep(landscape, route, spec, str(tmp_path / "mesh"),
                       fam_impl="infomax", cells_mesh=make_mesh(2, 1),
                       verbose=False, tensorboard=False)
    assert set(serial) == set(meshed)
    for k in serial:
        np.testing.assert_array_equal(
            serial[k]["success_rate"], meshed[k]["success_rate"], err_msg=k)


def test_sweep_cells_over_mesh_warns_on_singleton_groups(small_world, tmp_path, caplog):
    """Without lib_bucket every cell's library shape is unique, so each cell
    groups alone and pads to N replicated copies — the runner must say so
    instead of silently wasting (N-1)/N of the mesh."""
    import logging

    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import SweepSpec, run_sweep

    landscape, route = small_world
    spec = SweepSpec(
        sensor_px=((24, 4, 3),),
        scan_granularity=((12, 2),),
        capture_spacing=(1.5, 2.0),
        n_trials=4,
        max_steps=8,
        lib_bucket=0,
    )
    with caplog.at_level(logging.WARNING, logger="navdv_tpu.sweep"):
        run_sweep(landscape, route, spec, str(tmp_path / "s"),
                  cells_mesh=make_mesh(2, 1), verbose=False,
                  tensorboard=False)
    assert any("lib_bucket" in r.message for r in caplog.records)


def test_train_library_heading_jitter(small_cfg, small_world):
    """heading_jitter: seeded, off by default, and changes only the capture
    headings (the learned-memory straight-route mitigation; the recipe
    trains on a jittered library and navigates with the normal one)."""
    import jax.numpy as jnp

    from navdv_tpu.training import train_library

    landscape, route = small_world
    land = jnp.asarray(landscape)
    base = train_library(land, route, small_cfg)
    zero = train_library(land, route, small_cfg, heading_jitter=0.0)
    np.testing.assert_array_equal(np.asarray(base.views), np.asarray(zero.views))
    j1 = train_library(land, route, small_cfg, heading_jitter=0.3, jitter_seed=1)
    j1b = train_library(land, route, small_cfg, heading_jitter=0.3, jitter_seed=1)
    j2 = train_library(land, route, small_cfg, heading_jitter=0.3, jitter_seed=2)
    assert j1.views.shape == base.views.shape
    np.testing.assert_array_equal(np.asarray(j1.views), np.asarray(j1b.views))
    assert not np.array_equal(np.asarray(j1.views), np.asarray(base.views))
    assert not np.array_equal(np.asarray(j1.views), np.asarray(j2.views))
