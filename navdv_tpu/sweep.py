"""L4: parameter sweeps (BASELINE config 5: grid over sensor resolution x scan
granularity x library size, thousands of episodes per cell).

SURVEY.md §3.5 rebuild notes:
  - each grid cell changes array shapes -> one XLA compilation per cell;
    SweepSpec.lib_bucket pads libraries to bucketed shapes so cells that
    differ only in capture_spacing share ONE compilation (run_sweep keeps a
    navigate-fn cache across cells);
  - trials *within* a cell are vmapped (one device launch per cell);
  - across chips, cells run through the data-parallel mesh path;
  - per-cell results land on disk atomically -> preemption-safe resume at
    cell granularity (SURVEY.md §5.3–5.4).
"""

from __future__ import annotations

import dataclasses
import glob
import itertools
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
from navdv_tpu.checkpoint import load_results, save_results
from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
from navdv_tpu.metrics import episode_metrics
from navdv_tpu.trials import make_trials

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SweepSpec:
    """The BASELINE config-5 grid. Each axis is a tuple of values; the sweep
    is their cartesian product."""

    # sensor resolution axis: (n_azimuth, n_radial, az_upsample)
    sensor_px: tuple = ((72, 16, 5), (36, 8, 10))
    # scan granularity axis: (n_headings, scan_step_bins)
    scan_granularity: tuple = ((60, 2), (120, 1))
    # library density axis: capture spacing in world units (smaller = denser)
    capture_spacing: tuple = (1.0, 2.0)
    metric: str = "ssd"
    tol_bins: int = 0
    n_trials: int = 256
    max_steps: int = 256
    seed: int = 0
    # start trials uniformly along the route instead of at its start (the
    # harder "recall from anywhere" task; trials.make_trials)
    start_anywhere: bool = False
    # shape-bucketing (SURVEY.md §7 hard-part 3): pad every cell's library up
    # to a multiple of this many views (0 = off). Cells that differ only in
    # capture_spacing then share one array shape — and one XLA compilation
    # (run_sweep reuses the navigate fn across cells, so later cells skip the
    # ~30 s compile). Padded views carry +PAD_PENALTY distance in every
    # familiarity impl, so results are identical to the unpadded cell
    # (tests/test_sweep.py::test_lib_bucket_equivalence). Under a mesh with a
    # lib axis, pick a multiple of the lib-axis size.
    lib_bucket: int = 0

    @classmethod
    def from_json(cls, path: str) -> "SweepSpec":
        """Load a spec from a JSON file; lists become the grid tuples."""
        with open(path) as f:
            raw = json.load(f)

        def tup(x):
            return tuple(tuple(v) if isinstance(v, list) else v for v in x)

        kw = {}
        names = {field.name for field in dataclasses.fields(cls)}
        unknown = set(raw) - names
        if unknown:
            # a typo'd key (n_trails) silently running the grid with a
            # default budget is a worst-case failure for long sweeps
            raise ValueError(
                f"unknown SweepSpec keys in {path}: {sorted(unknown)} "
                f"(valid: {sorted(names)})"
            )
        for name in names & set(raw):
            v = raw[name]
            kw[name] = tup(v) if isinstance(v, list) else v
        return cls(**kw)

    def cells(self):
        """Yields ``(key, cfg, params)`` per grid cell; ``params`` carries the
        structured axis values (also persisted into each cell's results as
        ``ax_*`` entries, so downstream plots never parse key strings)."""
        for (px, gran, spacing) in itertools.product(
            self.sensor_px, self.scan_granularity, self.capture_spacing
        ):
            w, r, u = px
            nh, step_bins = gran
            cfg = SimConfig(
                sensor=SensorConfig(n_azimuth=w, n_radial=r, az_upsample=u),
                scan=ScanConfig(
                    n_headings=nh,
                    scan_step_bins=step_bins,
                    metric=self.metric,
                    tol_bins=self.tol_bins,
                ),
                agent=AgentConfig(max_steps=self.max_steps),
                capture_spacing=spacing,
            )
            params = {
                "px": f"{w}x{r}u{u}",
                "scan": f"{nh}x{step_bins}",
                "spacing": spacing,
            }
            key = f"px{params['px']}_scan{params['scan']}_sp{spacing}"
            yield key, cfg, params


def resolve_infomax_epochs(cfg, n_views_true: int):
    """Resolve an infomax AUTO training dose (``infomax_epochs=0``) into an
    explicit integer epoch count when — and only when — the integer is a
    faithful dose, so the nav-fn cache key can stay spacing-free and cells
    with equal resolved epochs share one compilation.

    At extreme density the ideal dose ``0.8*P*spacing`` approaches 1 and
    rounding quantizes it by up to ~2x into the measured overtraining-
    collapse region (ADVICE r4) — there the config keeps ``epochs=0``
    (train_infomax's exact fractional-final-epoch path) and run_cell accepts
    the per-cell recompile, keeping spacing in the cache key so no cell
    reuses another's training dose."""
    from navdv_tpu.familiarity_infomax import auto_epochs

    if cfg.scan.infomax_epochs != 0:
        return cfg
    ideal = 0.8 * cfg.sensor.n_pixels * cfg.capture_spacing
    resolved = auto_epochs(n_views_true, cfg.sensor.n_pixels, cfg.capture_spacing)
    if abs(resolved - ideal) > 0.05 * ideal:
        return cfg
    return dataclasses.replace(
        cfg, scan=dataclasses.replace(cfg.scan, infomax_epochs=resolved)
    )


def run_cell(
    landscape,
    route: np.ndarray,
    cfg: SimConfig,
    n_trials: int,
    seed: int,
    fam_impl: str = "auto",
    mesh=None,
    start_anywhere: bool = False,
    recall_check_trials: int = 0,
    lib_bucket: int = 0,
    nav_cache: dict | None = None,
) -> dict:
    """Train on the route, run n_trials randomized recall episodes, aggregate.

    With ``mesh`` (jax.sharding.Mesh from parallel.make_mesh), trials shard
    over the data axis and the library over the lib axis — one cell spanning
    all chips (n_trials must be a multiple of the data-axis size).

    ``fam_impl="auto"`` resolves per cell via ``config.choose_fam_impl`` (the
    measured per-workload winner; cells differ in exactly the quantities the
    rule reads). With ``recall_check_trials > 0`` and a non-jnp impl, the
    first that-many trials are re-run on the exact jnp path and the cell
    records ``success_rate_jnp`` / ``success_rate_subset`` — a per-cell
    cross-check that the fast impl's recall matches the exact metric.

    Timing discipline: the episode runs once for warmup/compile, then once
    timed; ``agent_steps_per_s`` counts the agent-steps that actually executed
    (sum of per-trial active steps — the early-exit path stops a cell once
    every trial resolves), not ``n_trials * max_steps``.

    ``lib_bucket > 1`` pads the library shape up to that multiple (see
    SweepSpec.lib_bucket); ``nav_cache`` (a dict the caller keeps across
    cells) then reuses one navigate fn — and its XLA compilation — for every
    cell whose traced program is identical (same sensor/scan/agent config and
    resolved impl; capture_spacing only changes the now-bucketed shapes).
    ``warmup_s`` in the results shows the reuse: compile-hit cells drop from
    ~30 s to the bare episode time.
    """
    from navdv_tpu.config import choose_fam_impl
    from navdv_tpu.training import train_library

    if fam_impl == "auto":
        fam_impl = choose_fam_impl(cfg)
    land_dev = jnp.asarray(landscape)
    # bucketed capture: the padded render shape lets spacing-only cells share
    # the capture-render compile too (the slowest compile in a cell)
    lib = train_library(land_dev, route, cfg, pad_views_to=lib_bucket)
    n_views_true = int(lib.views.shape[0])
    if lib_bucket > 1:
        from navdv_tpu.parallel.mesh import pad_library

        lib = pad_library(lib, lib_bucket)
    if fam_impl == "infomax":
        cfg = resolve_infomax_epochs(cfg, n_views_true)
    st = make_statics(land_dev, lib, route)
    starts, thetas = make_trials(
        route, cfg, n_trials, seed=seed, start_anywhere=start_anywhere
    )
    # the traced program does not depend on capture_spacing (it only sets the
    # library shape, which lib_bucket normalizes; infomax's spacing-derived
    # training budget was resolved into an explicit epochs count above) —
    # key the fn cache on everything else so shape-equal cells share one
    # compilation. Exception: an unresolved infomax AUTO dose (epochs still
    # 0, extreme-density fractional path) keeps spacing in the key — the
    # prepare stage's traced training length derives from it.
    if nav_cache is None:
        nav_cache = {}
    if fam_impl == "infomax" and cfg.scan.infomax_epochs == 0:
        cfg_key = cfg
    else:
        cfg_key = dataclasses.replace(cfg, capture_spacing=0.0)
    if mesh is not None:
        from navdv_tpu.parallel.mesh import (
            LIB_AXIS,
            make_navigate_sharded,
            shard_statics,
        )

        # infomax cannot shard the library axis (the learned memory is
        # constant in Nl; make_navigate_sharded rejects it) — replicate
        # instead of crashing the first infomax cell of a lib-sharded sweep
        shard_lib = mesh.shape[LIB_AXIS] > 1 and fam_impl != "infomax"
        st = shard_statics(st, mesh, shard_lib=shard_lib)
        # Mesh is hashable — keying on id(mesh) could alias a freed mesh's
        # recycled address in a long-lived nav_cache
        key = ("mesh", cfg_key, fam_impl, mesh, shard_lib)
        if key not in nav_cache:
            nav_cache[key] = make_navigate_sharded(
                cfg, mesh, fam_impl=fam_impl, shard_lib=shard_lib
            )
        nav = nav_cache[key]
    else:
        # early_exit: cells finish as soon as every trial resolves
        key = ("batch", cfg_key, fam_impl)
        if key not in nav_cache:
            nav_cache[key] = make_navigate_batch(
                cfg, fam_impl=fam_impl, early_exit=True
            )
        nav = nav_cache[key]
    states0 = init_state(starts, thetas)
    # per-library constants once per cell, reused by both runs
    prepare = getattr(nav, "prepare", None)
    aux = prepare(st) if prepare is not None else None
    args = (states0, st) if aux is None else (states0, st, aux)
    t_w = time.perf_counter()
    jax.block_until_ready(nav(*args))  # warmup: compile + first run
    warmup_s = time.perf_counter() - t_w
    t0 = time.perf_counter()
    final, rec = jax.block_until_ready(nav(*args))
    wall = time.perf_counter() - t0
    m = episode_metrics(final, rec)
    executed_steps = float(jnp.sum(m["n_steps"]))
    out = {
        "success_rate": np.asarray(jnp.mean(m["success"].astype(jnp.float32))),
        "mean_steps": np.asarray(jnp.mean(m["n_steps"].astype(jnp.float32))),
        "mean_path_error": np.asarray(jnp.mean(m["mean_path_error"])),
        "max_path_error": np.asarray(jnp.max(m["max_path_error"])),
        "status_counts": np.bincount(np.asarray(final.status), minlength=4),
        "n_library_views": np.asarray(n_views_true),
        # post-sharding: under a lib-axis mesh, shard_statics pads further
        # to a multiple of the axis size — record what the run actually used
        "n_library_padded": np.asarray(int(st.lib.views.shape[0])),
        "n_trials": np.asarray(n_trials),
        "wall_s": np.asarray(wall),
        "warmup_s": np.asarray(warmup_s),
        "executed_steps": np.asarray(executed_steps),
        "agent_steps_per_s": np.asarray(executed_steps / wall),
        "fam_impl": np.asarray(fam_impl),
    }
    if recall_check_trials > 0 and fam_impl != "jnp":
        nsub = min(recall_check_trials, n_trials)
        sub = jax.tree.map(lambda x: x[:nsub], states0)
        # the jnp check runs on the UNSHARDED statics even for mesh cells
        st_check = st if mesh is None else make_statics(land_dev, lib, route)
        key_jnp = ("batch", cfg_key, "jnp")
        if key_jnp not in nav_cache:
            nav_cache[key_jnp] = make_navigate_batch(
                cfg, fam_impl="jnp", early_exit=True
            )
        nav_jnp = nav_cache[key_jnp]
        final_jnp, rec_jnp = nav_jnp(sub, st_check)
        m_jnp = episode_metrics(final_jnp, rec_jnp)
        out["success_rate_jnp"] = np.asarray(
            jnp.mean(m_jnp["success"].astype(jnp.float32)))
        out["success_rate_subset"] = np.asarray(
            jnp.mean(m["success"][:nsub].astype(jnp.float32)))
        out["recall_check_trials"] = np.asarray(nsub)
    return out


def _log_tensorboard(out_dir: str, key: str, res: dict) -> None:
    """Tensorboard scalars per cell (SURVEY.md §5.5), via the torch (cpu)
    writer in the pinned stack. Failures are logged, never swallowed silently
    (exercised by tests/test_sweep.py::test_tensorboard_logging)."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception as e:  # pragma: no cover - stack always has torch here
        logger.warning("tensorboard writer unavailable (%s); skipping scalars", e)
        return
    w = SummaryWriter(log_dir=os.path.join(out_dir, "tb", key))
    try:
        for name in ("success_rate", "mean_path_error", "agent_steps_per_s"):
            w.add_scalar(name, float(res[name]), 0)
    finally:
        w.close()


def run_sweep(
    landscape,
    route: np.ndarray,
    spec: SweepSpec,
    out_dir: str,
    fam_impl: str = "auto",
    verbose: bool = True,
    shard: tuple[int, int] | None = None,
    mesh=None,
    tensorboard: bool = True,
    recall_check_trials: int = 0,
    cells_mesh=None,
) -> dict:
    """Run every cell, resuming from ``out_dir`` (cells with a result file are
    skipped). Returns {cell_key: results} and writes summary.json.

    ``shard=(i, n)`` runs only every n-th cell starting at i — the
    cluster-array-job pattern (SURVEY.md §1 L4): launch n sweep processes
    (one per host/VM) against a shared out_dir; resume makes the union
    complete and idempotent.

    ``mesh`` shards trials WITHIN each cell across the mesh (one big cell
    spanning all chips). ``cells_mesh`` instead distributes CELLS over the
    mesh's data axis (SURVEY.md §3.5): same-traced-program cells are stacked
    and run as one SPMD program via
    :func:`navdv_tpu.parallel.mesh.make_navigate_cells` — the right mode
    when the grid has many more cells than chips. Mutually exclusive with
    ``mesh`` and ``recall_check_trials``; per-cell resume is identical.
    """
    if cells_mesh is not None:
        if mesh is not None:
            raise ValueError("pass mesh OR cells_mesh, not both")
        if recall_check_trials:
            raise ValueError(
                "recall_check_trials is not supported with cells_mesh; run "
                "a per-cell pass (mesh=None) for the jnp cross-check")
        return _run_sweep_cells_mesh(
            landscape, route, spec, out_dir, fam_impl, verbose, shard,
            tensorboard, cells_mesh,
        )
    os.makedirs(out_dir, exist_ok=True)
    all_results = {}
    nav_cache: dict = {}  # one compile per traced program (see lib_bucket)
    for idx, (key, cfg, params) in enumerate(spec.cells()):
        if shard is not None and idx % shard[1] != shard[0]:
            continue
        path = os.path.join(out_dir, f"cell_{key}.npz")
        if os.path.exists(path):
            all_results[key] = load_results(path)
            if verbose:
                print(f"[sweep] {key}: resumed from disk")
            continue
        res = run_cell(
            landscape,
            route,
            cfg,
            spec.n_trials,
            spec.seed,
            fam_impl,
            mesh=mesh,
            start_anywhere=spec.start_anywhere,
            recall_check_trials=recall_check_trials,
            lib_bucket=spec.lib_bucket,
            nav_cache=nav_cache,
        )
        # carry the structured axis values with the results (viz reads these,
        # never the key string)
        for name, value in params.items():
            res[f"ax_{name}"] = np.asarray(value)
        save_results(path, res)
        all_results[key] = res
        if tensorboard:
            _log_tensorboard(out_dir, key, res)
        if verbose:
            print(
                f"[sweep] {key}: success={float(res['success_rate']):.3f} "
                f"steps/s={float(res['agent_steps_per_s']):,.0f}"
            )
    _write_summary(out_dir, all_results)
    return all_results


def _write_summary(out_dir: str, all_results: dict) -> None:
    """summary.json over every cell file ON DISK, written atomically.

    A sharded launch (``shard=(i, n)``) runs n processes against one
    out_dir: this process's ``all_results`` is only its slice, and a plain
    overwrite made the last finisher's partial view the whole summary. The
    union with on-disk cells keeps the summary complete whichever process
    writes last; the pid-unique tmp + ``os.replace`` keeps concurrent
    writers and readers from ever seeing a truncated file.
    """
    merged = dict(all_results)
    for path in sorted(glob.glob(os.path.join(out_dir, "cell_*.npz"))):
        key = os.path.basename(path)[len("cell_") : -len(".npz")]
        if key not in merged:
            try:
                merged[key] = load_results(path)
            except Exception:  # a sibling shard mid-write; its own
                continue  # _write_summary will include the cell
    summary = {
        k: {kk: np.asarray(vv).tolist() for kk, vv in v.items()}
        for k, v in merged.items()
    }
    tmp = os.path.join(out_dir, f"summary.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, "summary.json"))


def _run_sweep_cells_mesh(
    landscape,
    route: np.ndarray,
    spec: SweepSpec,
    out_dir: str,
    fam_impl: str,
    verbose: bool,
    shard: tuple[int, int] | None,
    tensorboard: bool,
    cells_mesh,
) -> dict:
    """Cells-over-mesh sweep mode (SURVEY.md §3.5 "distribute cells across
    chips/slices"; VERDICT r4 item 6).

    Pending cells are grouped by traced program (config with spacing
    stripped + resolved impl + bucketed library shape); each group stacks
    its cells' libraries and trial batches along a leading CELL axis and
    runs ONE jitted shard_map program with that axis sharded over the mesh
    ``data`` axis (parallel.mesh.make_navigate_cells). Groups whose cell
    count is not a multiple of the data-axis size are padded by repeating
    the last cell; padding results are dropped on unstack. Per-cell result
    files and resume behave exactly as the serial path.
    """
    from navdv_tpu.config import choose_fam_impl
    from navdv_tpu.parallel.mesh import (
        DATA_AXIS,
        make_navigate_cells,
        pad_library,
    )
    from navdv_tpu.training import train_library

    from navdv_tpu.oracle import resample_route

    os.makedirs(out_dir, exist_ok=True)
    land_dev = jnp.asarray(landscape)
    n_data = cells_mesh.shape[DATA_AXIS]
    all_results = {}

    # pass 1: resume hits + program grouping. Grouping needs only the view
    # COUNT (resample_route, host-side) — library training is deferred to
    # pass 2 so device memory scales with one group, not the whole grid.
    groups: dict = {}
    for idx, (key, cfg, params) in enumerate(spec.cells()):
        if shard is not None and idx % shard[1] != shard[0]:
            continue
        path = os.path.join(out_dir, f"cell_{key}.npz")
        if os.path.exists(path):
            all_results[key] = load_results(path)
            if verbose:
                print(f"[sweep] {key}: resumed from disk")
            continue
        impl = choose_fam_impl(cfg) if fam_impl == "auto" else fam_impl
        pts, _ = resample_route(
            np.asarray(route, np.float64), cfg.capture_spacing)
        n_views_true = len(pts)  # == train_library's count (training.py)
        nl_padded = n_views_true
        if spec.lib_bucket > 1:
            nl_padded += (-n_views_true) % spec.lib_bucket
        if impl == "infomax":
            cfg = resolve_infomax_epochs(cfg, n_views_true)
        strip = not (impl == "infomax" and cfg.scan.infomax_epochs == 0)
        cfg_key = dataclasses.replace(cfg, capture_spacing=0.0) if strip else cfg
        gkey = (cfg_key, impl, nl_padded)
        groups.setdefault(gkey, []).append((key, cfg, params, n_views_true))

    if groups and max(len(c) for c in groups.values()) == 1 and n_data > 1:
        logger.warning(
            "cells_mesh: every cell is alone in its traced-program group, so "
            "each group pads to %d replicated copies — (N-1)/N of the compute "
            "is wasted. Set SweepSpec.lib_bucket so spacing-only cells share "
            "a library shape (CLI: --lib-bucket).", n_data)

    # pass 2: one SPMD program per group (train + stack this group only)
    for (cfg_key, impl, nl_padded), cells in groups.items():
        cfg_repr = cells[0][1]
        c_true = len(cells)
        pad_n = (-c_true) % n_data
        libs, states = [], []
        for key, cfg, params, n_views_true in cells:
            lib = train_library(land_dev, route, cfg,
                                pad_views_to=spec.lib_bucket)
            if spec.lib_bucket > 1:
                lib = pad_library(lib, spec.lib_bucket)
            libs.append(lib)
            starts, thetas = make_trials(
                route, cfg, spec.n_trials, seed=spec.seed,
                start_anywhere=spec.start_anywhere,
            )
            states.append(init_state(starts, thetas))
        libs += [libs[-1]] * pad_n
        states += [states[-1]] * pad_n
        lib_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *libs)
        states0 = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        shared = make_statics(land_dev, libs[0], route)._replace(lib=None)
        nav_cells = make_navigate_cells(cfg_repr, cells_mesh, impl)
        # per-cell library constants ONCE per group, outside the timing —
        # with aux=None the prepare stage (spectra relayout; for infomax the
        # whole network TRAINING) would re-run inside warmup AND timed call
        aux_stack = (
            nav_cells.prepare(lib_stack, shared)
            if nav_cells.prepare is not None else None
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(
            nav_cells(states0, lib_stack, shared, aux_stack))
        warmup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(
            nav_cells(states0, lib_stack, shared, aux_stack))
        wall = time.perf_counter() - t0
        group_steps = float(np.sum(np.asarray(out["executed_steps"])[:c_true]))
        for i, (key, cfg, params, n_views_true) in enumerate(cells):
            res = {k: np.asarray(v[i]) for k, v in out.items()}
            res.update(
                n_library_views=np.asarray(n_views_true),
                n_library_padded=np.asarray(libs[i].views.shape[0]),
                n_trials=np.asarray(spec.n_trials),
                wall_s=np.asarray(wall),
                warmup_s=np.asarray(warmup_s),
                fam_impl=np.asarray(impl),
                # throughput is a GROUP quantity in this mode: the group ran
                # as one program with cells concurrent across devices
                agent_steps_per_s=np.asarray(group_steps / wall),
                group_size=np.asarray(c_true),
                group_pad=np.asarray(pad_n),
            )
            for name, value in params.items():
                res[f"ax_{name}"] = np.asarray(value)
            path = os.path.join(out_dir, f"cell_{key}.npz")
            save_results(path, res)
            all_results[key] = res
            if tensorboard:
                _log_tensorboard(out_dir, key, res)
            if verbose:
                print(
                    f"[sweep] {key}: success={float(res['success_rate']):.3f} "
                    f"group of {c_true} over {n_data} devices"
                )

    _write_summary(out_dir, all_results)
    return all_results
