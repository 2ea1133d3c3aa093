#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): agent-steps/sec/chip (render + familiarity) at
matched route-recall accuracy, target >= 1e5 on TPU v5e-1. The run reports the
recall success rate alongside throughput (the accuracy gate, BASELINE.md);
steps are counted as B * max_steps scan iterations actually executed on
device.

Workload fidelity (BASELINE.json:7-11): the spec'd library sizes are exact —
config 1/3/4 train ~50 views (one short route at ~1 px capture spacing;
sparser capture on a longer route breaks recall outright, so "~50 views"
means a short route, not sparse capture), config 2 exactly 500 views on the
same landscape. `--route-length 200` reproduces the denser round-1 variants.

Timing discipline: through the remote-TPU tunnel `jax.block_until_ready` can
return before execution finishes, so every timed call is synced by pulling the
scalar success rate to the host (which transitively awaits the episode).

Usage: python bench.py [--config N] [--batch B] [--steps T] [--views V]
                       [--impl jnp|fft|roll|conv|pallas|infomax] [--all]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import threading
import time
import traceback

import numpy as np

# spec'd stored-view counts per BASELINE.json config (config 4 = config 1's
# workload with the 1024-agent batch)
SPEC_VIEWS = {1: 50, 2: 500, 3: 50, 4: 50}
# config 4 is spec'd "vmap 1024 agents" (BASELINE.json:10) and stays at 1024;
# config 1/2/3 batches are implementation choices — with >=0.5 s chained
# timed windows (RTT amortized) the sweet spots are: config 1 B=1024
# (994k/1,121k/1,019k/788k at B=512/1024/2048/4096 — the round-2 B=2048
# choice was an RTT artifact), config 2 B=512 (292k/300k/269k at
# 256/512/1024), config 3 B=256 (388k/377k/258k at 256/512/1024).
SPEC_BATCH = {1: 1024, 2: 512, 3: 256, 4: 1024}
# headline impls per config — MUST mirror config.baseline_fam_impl (asserted
# by tests/test_bench_lines.py). Duplicated here because the outage path
# must not import navdv_tpu (its package __init__ imports jax, which hangs
# on a down tunnel — the exact failure this path defends against).
SPEC_IMPL = {1: "fft", 2: "roll", 3: "fft", 4: "fft"}

# ---------------------------------------------------------------------------
# Outage defense (VERDICT r4 item 1b). Round 4's official record was lost to
# one axon-tunnel hiccup at device_put: raw traceback, rc=1, parsed:null.
# Three layers, all active only when the axon TPU plugin would be used
# (PALLAS_AXON_POOL_IPS set, JAX_PLATFORMS not forcing cpu):
#   1. _probe_backend_with_retry: before any in-process jax import, probe
#      `jax.devices()` in a timeout-bounded SUBPROCESS (a down tunnel hangs
#      even `import jax` — memory: tunnel outage 2026-08-17), retrying with
#      backoff inside a bounded window (the tunnel has recovered on its own
#      before). Persistent outage -> one structured JSON line, rc 0.
#   2. _arm_watchdog: a daemon timer so a MID-run tunnel death (hang after a
#      healthy probe) still ends with a structured line instead of rc=124
#      and an empty tail.
#   3. main() wraps the run in try/except and converts any exception into a
#      structured line (full traceback to stderr, parseable stdout).
# ---------------------------------------------------------------------------
PROBE_TIMEOUT_S = float(os.environ.get("NAVDV_BENCH_PROBE_TIMEOUT_S", "90"))
PROBE_WINDOW_S = float(os.environ.get("NAVDV_BENCH_PROBE_WINDOW_S", "600"))


def _is_tpu_run() -> bool:
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    return os.environ.get("JAX_PLATFORMS", "").lower() != "cpu"


def _needs_tpu_probe() -> bool:
    # NAVDV_BENCH_SKIP_PROBE skips ONLY the probe (layer 1) on a known-up
    # tunnel; the mid-run watchdog (layer 2) stays armed for every TPU run
    return _is_tpu_run() and not os.environ.get("NAVDV_BENCH_SKIP_PROBE")


# Module-level so tests can substitute a hanging/failing stub and pin the
# timeout/rc branches without needing the tunnel to actually be down (the
# poisoned-IP simulation is inert while a live loopback relay is reachable).
PROBE_CODE = "import jax; d = jax.devices(); print(d[0].platform, len(d))"


def _probe_backend_once(timeout_s: float) -> tuple[bool, str]:
    code = PROBE_CODE
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s (tunnel hang)"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return False, tail[-1] if tail else f"probe rc={proc.returncode}"
    return True, (proc.stdout or "").strip()


def _probe_backend_with_retry() -> tuple[bool, int, float, str]:
    """Returns (up, attempts, elapsed_s, detail). Backoff 30/60/120/120...s
    within PROBE_WINDOW_S — sized to the observed self-recovering blips,
    bounded so a hard outage still yields a timely structured record."""
    t0 = time.monotonic()
    attempts = 0
    delay = 30.0
    while True:
        attempts += 1
        up, detail = _probe_backend_once(PROBE_TIMEOUT_S)
        elapsed = time.monotonic() - t0
        if up:
            return True, attempts, elapsed, detail
        print(f"[bench probe] attempt {attempts} failed ({detail}); "
              f"{elapsed:.0f}s/{PROBE_WINDOW_S:.0f}s window used",
              file=sys.stderr, flush=True)
        if elapsed + delay + PROBE_TIMEOUT_S > PROBE_WINDOW_S:
            return False, attempts, elapsed, detail
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


def _error_line(error: str, **extra) -> str:
    out = {
        "metric": "agent-steps/sec/chip",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "ok": False,
        "error": error,
    }
    out.update(extra)
    return json.dumps(out)


def _arm_watchdog(budget_s: float, context: str) -> None:
    def fire():
        print(_error_line("bench_budget_exceeded",
                          budget_s=budget_s, context=context), flush=True)
        os._exit(0)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()


# ---------------------------------------------------------------------------
# Line invariants + cross-round regression guard (VERDICT r4 items 3 and 7)
# ---------------------------------------------------------------------------
def check_line_invariant(result: dict) -> dict:
    """Every emitted JSON line must carry exactly one of `ok` (a machine
    verdict) or `gate` (an explicit skip marker with a reason) — a line with
    neither reads as a silent gate miss to a parser (VERDICT r4 weak 3)."""
    has_ok, has_gate = "ok" in result, "gate" in result
    if has_ok == has_gate:
        raise ValueError(
            f"bench line must carry exactly one of ok/gate, got "
            f"ok={'present' if has_ok else 'absent'} "
            f"gate={'present' if has_gate else 'absent'}: {result}"
        )
    return result


def _emit(result: dict) -> None:
    print(json.dumps(check_line_invariant(result)), flush=True)


def load_regression_baseline(path: str | None = None) -> dict:
    """Previous-round headline values keyed by (config, batch, impl, device)
    from the newest committed artifacts/bench_r*_final_all.jsonl (SURVEY §4
    item 6: perf 'tracked per commit'). Returns {} if none exists."""
    if path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = glob.glob(os.path.join(here, "artifacts", "bench_r*_final_all.jsonl"))
        if not cands:
            return {}
        def rnum(p):
            m = re.search(r"bench_r(\d+)_final_all", p)
            return int(m.group(1)) if m else -1
        path = max(cands, key=rnum)
    baseline = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("metric") != "agent-steps/sec/chip":
                    continue
                # outage/error lines share the headline metric name but
                # carry value=null — a committed artifact may contain them
                # (that is the outage design); never float(None) on them
                if not isinstance(rec.get("value"), (int, float)):
                    continue
                key = (rec.get("config"), rec.get("batch"), rec.get("impl"),
                       rec.get("device"))
                baseline[key] = float(rec["value"])
    except OSError:
        return {}
    return baseline


# >5% drop vs the previous round flags a regression; the measured run-to-run
# variance band on the tunnel is ±3% (memory: bench discipline), so 5% clears
# noise while catching real slowdowns.
REGRESSION_TOL = float(os.environ.get("NAVDV_BENCH_REGRESSION_TOL", "0.05"))


def apply_regression_guard(result: dict, baseline: dict) -> dict:
    key = (result.get("config"), result.get("batch"), result.get("impl"),
           result.get("device"))
    prev = baseline.get(key)
    if prev is None or not result.get("value"):
        return result
    result["prev_round_value"] = prev
    result["regression"] = bool(result["value"] < (1.0 - REGRESSION_TOL) * prev)
    return result


def _world(route_length: float, size: int = 512, kind: str = "blobs",
           n_features: int = 150, feature_scale: float | None = None):
    import jax.numpy as jnp

    import navdv_tpu as nav

    landscape = jnp.asarray(
        nav.make_landscape(kind, size=(size, size), seed=7,
                           n_features=n_features, feature_scale=feature_scale)
    )
    route = nav.make_route(
        "sine",
        size=(size, size),
        margin=60.0,
        length=route_length,
        amplitude=route_length / 8.0,
    )
    return landscape, route


def _setup(config_n: int, views: int | None = None, route_length: float = 40.0,
           steps: int | None = None, size: int = 512, land_kind: str = "blobs",
           n_features: int = 150, feature_scale: float | None = None):
    """Shared world + config construction for every bench entry point:
    spec-exact stored-view count and a step budget covering the route arc.
    Returns (cfg, landscape, route, pts, headings)."""
    import dataclasses

    from navdv_tpu import oracle
    from navdv_tpu.config import baseline_config

    if views is None:
        views = SPEC_VIEWS.get(config_n, 50)
    cfg = baseline_config(config_n)
    landscape, route = _world(route_length, size=size, kind=land_kind,
                              n_features=n_features, feature_scale=feature_scale)
    arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
    if steps is None:
        # success gate needs the budget to cover the route: arc length + 30%
        steps = int(arc / cfg.agent.step_size * 1.3)
    cfg = dataclasses.replace(
        cfg,
        # resample_route keeps floor(arc/spacing)+1 points, so arc/(views-.5)
        # lands on exactly `views` regardless of fp rounding (arc/views gave
        # views+1 whenever the division rounded down, e.g. --route-length 200)
        capture_spacing=arc / (views - 0.5),
        agent=dataclasses.replace(cfg.agent, max_steps=steps),
    )
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    return cfg, landscape, route, pts, headings


def _timed_windows(nav_fn, states0, st, repeats: int, min_window_s: float,
                   aux=None):
    """Timed measurement discipline (VERDICT round 2, weak item 1): chain
    episodes until every timed window covers >= ``min_window_s`` of device
    work. Single-episode windows (~0.13 s at the fast configs) sit inside the
    tunnel's ±3% variance AND pay one ~30 ms host-pull RTT per episode;
    chaining amortizes both. Each chained episode's inputs carry a
    zero-valued data dependency on the previous episode's outputs, so
    dispatches cannot overlap or reorder — one host pull at the end of the
    chain then syncs the whole window. Returns (success_rate, per-episode
    times over ``repeats`` windows, chain length)."""
    from navdv_tpu.agent import AgentState
    from navdv_tpu.metrics import success_rate

    # per-library constants (pre-rolled/spectral library) prepared ONCE and
    # reused across every episode — the production pattern for repeated
    # trials against one trained library. Fns without a prepare stage (or
    # 2-arg sharded fns) are called unchanged. Callers may pass a
    # precomputed ``aux`` (e.g. an infomax pack trained on a subsample).
    prepare = getattr(nav_fn, "prepare", None)
    if aux is None and prepare is not None:
        aux = prepare(st)
    if aux is not None:
        raw_fn = nav_fn
        nav_fn = lambda s, st_: raw_fn(s, st_, aux)

    # warmup + compile; the host pull of the scalar rate is the real sync
    final, _ = nav_fn(states0, st)
    rate = float(success_rate(final))

    def _chained(s_prev):
        return AgentState(
            xy=states0.xy + 0.0 * s_prev.xy,
            theta=states0.theta + 0.0 * s_prev.theta,
            done=states0.done,
            status=states0.status,
        )

    _dbg = bool(os.environ.get("NAVDV_BENCH_DEBUG"))

    def _window(n):
        """Wall time of one n-episode chained window (one host pull)."""
        t0 = time.perf_counter()
        s = states0
        for _ in range(n):
            f, _ = nav_fn(s, st)
            s = _chained(f)
        float(success_rate(f))  # host pull awaits the whole chain
        w = time.perf_counter() - t0
        if _dbg:
            print(f"  window n={n} wall={w:.3f}", flush=True)
        return w

    t0 = time.perf_counter()
    final, _ = nav_fn(states0, st)
    float(success_rate(final))
    t_one = time.perf_counter() - t0
    chain = max(1, int(np.ceil(min_window_s / t_one)))
    # Dispatch-flood cap: at tiny batches an episode is ~2-3 ms of device
    # time, so filling 0.5 s takes hundreds of async dispatches — floods the
    # axon tunnel occasionally stalls for minutes (measured round 4). Cap the
    # chain; if the cap binds, the reported wall_s is the honest (shorter)
    # window. Headline batches need chain <= ~16 and never hit it.
    max_chain = 256
    # t_one pays the ~30 ms host-pull RTT the chain exists to amortize, so a
    # chain sized from it alone lands short of min_window_s (VERDICT round 3,
    # weak 2): grow the chain until a MEASURED chained window covers
    # min_window_s with 5% margin. min of two probes — a single probe can
    # catch one-off dispatch warmup and exit with a chain the steady-state
    # (faster) windows then under-fill.
    chain = min(chain, max_chain)
    while True:
        wall = min(_window(chain), _window(chain))
        if wall >= 1.05 * min_window_s or chain >= max_chain:
            break
        chain = min(max_chain, max(
            chain + 1, int(np.ceil(chain * 1.1 * min_window_s / wall))))

    times = [_window(chain) / chain for _ in range(repeats)]
    # hard guarantee on the REPORTED window: wall_s = min(times) * chain must
    # cover min_window_s, whatever the probes said
    while min(times) * chain < min_window_s and chain < max_chain:
        chain = min(max_chain, int(np.ceil(
            chain * 1.1 * min_window_s / (min(times) * chain))))
        times = [_window(chain) / chain for _ in range(repeats)]
    return rate, times, chain


# Accuracy gate (VERDICT round 3, weak 1): every headline line asserts
# success_rate >= exact-path reference recall (measured IN THE SAME RUN with
# fam_impl="jnp" on the same world/workload) minus this per-config band, and
# carries ok=true/false — a recall regression now fails machine-readably
# instead of only in prose. The band is the documented accepted accuracy
# trade of the shipped impl plus the measured ±0.5pp trial-seed band:
# configs 1/4 ship the spectral family (standing ~1-2pp trade for ~4-7x
# throughput, adopted round 2 — ScanConfig.spectral_cutoff notes; measured
# 0.980-0.989 vs jnp 0.999), config 2 ships the matmul-identical rolled path
# (no metric change: band is seed noise + bf16x3 rounding), config 3's NCC
# measures 1.000 across seeds (band = seed noise only).
ACCURACY_BAND = {1: 0.025, 2: 0.010, 3: 0.010, 4: 0.025}
# jnp-path reference episodes don't need the full headline batch to estimate
# recall; cap to bound the [B, chunk, P] extraction cost of the exact path
GATE_BATCH = 256


# trained world+library per distinct workload: inside one process (--all) the
# config-4 line is config 1's exact workload at the same batch, and the
# B=1/16/64 latency lines re-enter with config 1 again — training the same
# library five times burns chip time inside the watchdog budget for zero
# information. Keyed on everything _setup derives from (the resolved frozen
# cfg covers config_n); entries are a few MB of HBM each, all four kept.
_SETUP_CACHE: dict = {}
_RECALL_REF_CACHE: dict = {}


def _setup_trained(config_n, views, route_length, steps, land_kind):
    import navdv_tpu as nav
    from navdv_tpu.agent import make_statics
    from navdv_tpu.config import baseline_config

    key = (baseline_config(config_n), views, route_length, steps, land_kind)
    hit = _SETUP_CACHE.get(key)
    if hit is None:
        cfg, landscape, route, pts, headings = _setup(
            config_n, views, route_length, steps, land_kind=land_kind
        )
        lib = nav.train_library(landscape, route, cfg)
        st = make_statics(landscape, lib, route)
        hit = (cfg, landscape, route, pts, headings, lib, st)
        _SETUP_CACHE[key] = hit
    return key, hit


def _exact_recall_ref(cfg, st, pts, headings, batch: int) -> float:
    """Route-recall of the exact jnp path on this exact world/workload: the
    in-run reference the accuracy gate subtracts its band from."""
    import dataclasses

    from navdv_tpu.agent import init_state, make_navigate_batch
    from navdv_tpu.metrics import success_rate

    # the reference is the EXACT metric: strip impl-specific approximation
    # knobs (they have no effect on jnp and would trip the applicability
    # warnings)
    cfg = dataclasses.replace(
        cfg, scan=dataclasses.replace(
            cfg.scan, spectral_cutoff=0, fused_dft_precision="off",
            roll_rank=0, fixed_point_bits=0))
    b = min(batch, GATE_BATCH)
    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(b,))
    final, _ = make_navigate_batch(cfg, fam_impl="jnp")(
        init_state(starts, thetas), st
    )
    return float(success_rate(final))


def run_bench(config_n: int = 1, batch: int | None = None, steps: int | None = None,
              impl: str = "default", repeats: int = 3, views: int | None = None,
              route_length: float = 40.0, min_window_s: float = 0.5,
              land_kind: str = "blobs", gated: bool = True) -> dict:
    import jax

    from navdv_tpu.agent import init_state, make_navigate_batch
    from navdv_tpu.config import baseline_fam_impl

    if impl == "default":
        impl = baseline_fam_impl(config_n)
    if batch is None:
        batch = SPEC_BATCH.get(config_n, 1024)

    setup_key, (cfg, landscape, route, pts, headings, lib, st) = _setup_trained(
        config_n, views, route_length, steps, land_kind
    )

    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    nav_fn = make_navigate_batch(cfg, fam_impl=impl)
    rate, times, chain = _timed_windows(nav_fn, states0, st, repeats, min_window_s)
    dt = min(times)
    agent_steps = batch * cfg.agent.max_steps
    result = {
        "metric": "agent-steps/sec/chip",
        "value": round(agent_steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": round(agent_steps / dt / 1e5, 3),
        "median": round(agent_steps / float(np.median(times)), 1),
        "config": config_n,
        "batch": batch,
        "max_steps": cfg.agent.max_steps,
        "library_views": int(lib.views.shape[0]),
        "success_rate": round(rate, 4),
        "impl": impl,
        "device": str(jax.devices()[0].platform),
        "wall_s": round(dt * chain, 4),
        "chain": chain,
        # one batched scan step's wall time (all B agents advance one step);
        # at B=1 this is the single-agent step latency (VERDICT round 3,
        # missing 2)
        "step_latency_ms": round(1000.0 * dt / cfg.agent.max_steps, 4),
    }
    if land_kind != "blobs":
        result["land_kind"] = land_kind
    if not gated:
        # recall gating needs a population; tiny-batch latency lines (B<64)
        # carry success_rate but an explicit skip marker, not a bare line
        # (VERDICT r4 weak 3: a bare line reads as a silent gate miss)
        result["gate"] = "skipped: recall gating needs a population (B < 64)"
    elif ACCURACY_BAND.get(config_n) is None:
        # e.g. --config 5: baseline_config accepts it but no accuracy band
        # is defined; flag instead of KeyError-after-the-timed-run
        result["gate"] = f"skipped: no accuracy band for config {config_n}"
    else:
        ref_key = (setup_key, batch)
        rate_ref = _RECALL_REF_CACHE.get(ref_key)
        if rate_ref is None:
            rate_ref = _exact_recall_ref(cfg, st, pts, headings, batch)
            _RECALL_REF_CACHE[ref_key] = rate_ref
        floor = max(0.0, rate_ref - ACCURACY_BAND[config_n])
        result["exact_recall_ref"] = round(rate_ref, 4)
        result["recall_floor"] = round(floor, 4)
        if impl == "infomax":
            # a different MODEL (SEMANTICS.md §9), not an impl of the
            # perfect-memory metric: its recall legitimately differs from
            # the jnp reference, so an ok verdict against that floor would
            # conflate model choice with an accuracy regression. The
            # reference and floor stay on the line for comparison.
            result["gate"] = "skipped: infomax is a different memory model"
        else:
            result["ok"] = bool(rate >= floor)
    return check_line_invariant(result)


def run_big_landscape(size: int = 4096, land_kind: str = "fractal",
                      batch: int = 1024, repeats: int = 3,
                      min_window_s: float = 0.5) -> dict:
    """Scale-envelope run (VERDICT round 2, item 6): a >=4096^2 landscape has
    >2M cells, past the window kernel's VMEM residency budget, so the renderer
    takes the per-agent DMA band source (ops/window_pallas.py) — the path
    built precisely for landscapes that cannot live in VMEM. Reports
    throughput + recall at the BASELINE config-1 workload on that landscape."""
    import jax

    import navdv_tpu as nav
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import baseline_fam_impl
    from navdv_tpu.ops.window_pallas import VMEM_LAND_MAX_ELEMS

    # keep feature DENSITY and SIZE constant as the landscape grows (150
    # 512-scaled blobs per 512^2 tile): a fixed count leaves the route
    # region featureless at 4096^2 (measured recall 0.0 — a world statistics
    # effect, not a renderer one)
    n_features = max(150, int(150 * (size / 512) ** 2))
    cfg, landscape, route, pts, headings = _setup(
        1, size=size, land_kind=land_kind, n_features=n_features,
        feature_scale=512.0 if land_kind == "blobs" else None,
    )
    cells = int(landscape.shape[0]) * int(landscape.shape[1])
    if cells <= VMEM_LAND_MAX_ELEMS:  # not assert: must survive python -O
        raise ValueError(
            f"{cells} cells fits VMEM; this gate needs the DMA band source"
        )
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    impl = baseline_fam_impl(1)
    nav_fn = make_navigate_batch(cfg, fam_impl=impl)
    rate, times, chain = _timed_windows(nav_fn, states0, st, repeats, min_window_s)
    dt = min(times)
    agent_steps = batch * cfg.agent.max_steps
    rate_ref = _exact_recall_ref(cfg, st, pts, headings, batch)
    floor = max(0.0, rate_ref - ACCURACY_BAND[1])
    return {
        "metric": "big_landscape_dma",
        "value": round(agent_steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": round(agent_steps / dt / 1e5, 3),
        "landscape": f"{land_kind}-{size}x{size}",
        "landscape_cells": cells,
        "band_source": "dma",
        "config": 1,
        "batch": batch,
        "max_steps": cfg.agent.max_steps,
        "library_views": int(lib.views.shape[0]),
        "success_rate": round(rate, 4),
        "impl": impl,
        "device": str(jax.devices()[0].platform),
        "wall_s": round(dt * chain, 4),
        "chain": chain,
        "exact_recall_ref": round(rate_ref, 4),
        "recall_floor": round(floor, 4),
        "ok": bool(rate >= floor),
    }


def run_pallas_gate(route_length: float = 40.0, config_n: int = 1,
                    batch: int = 256, n_sample: int = 32) -> dict:
    """On-TPU parity gate for the Pallas batched min-distance kernel
    (BASELINE.json:5): per-lag library minima from the kernel vs the jnp
    matmul path on real rendered panoramas, plus closed-loop recall through
    the kernel. Emitted by --all at config 1 (SSD) AND config 3 (NCC — the
    kernel's other metric branch, VERDICT round 2 item 5) so every round
    leaves an artifact proving both branches work on hardware."""
    import jax
    import jax.numpy as jnp

    import navdv_tpu as nav
    from navdv_tpu.agent import (
        _make_lib_min,
        init_state,
        make_navigate_batch,
        make_statics,
    )
    from navdv_tpu.familiarity import NCC_EPS
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.sensor import (
        make_lag_stats,
        make_pooled_panorama,
        make_render_batch,
        make_views_from_pooled,
        scan_lag_sets,
    )

    cfg, landscape, route, pts, headings = _setup(config_n, route_length=route_length)
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    rng = np.random.default_rng(0)
    b = batch
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(b,))
    states0 = init_state(starts, thetas)

    # open-loop: per-lag library minima, kernel vs jnp, on real panoramas
    lags, _ = scan_lag_sets(cfg.scan)
    render_b = make_render_batch(cfg.sensor)
    pooled = make_pooled_panorama(cfg.sensor)
    views = make_views_from_pooled(cfg.sensor, lags)
    lag_stats = make_lag_stats(cfg.sensor, lags)

    @jax.jit
    def both(states, st):
        s = pooled(render_b(st.landscape, states.xy, states.theta))
        cand = views(s)
        lag_sum, lag_sq = lag_stats(s)
        m_jnp = _make_lib_min(cfg, "jnp")(cand, st.lib, lag_sum, lag_sq)
        m_pal = _make_lib_min(cfg, "pallas")(cand, st.lib, lag_sum, lag_sq)
        return m_jnp, m_pal

    m_jnp, m_pal = both(states0, st)

    # accuracy vs a float64 NumPy oracle on a sample of agents
    s = pooled(render_b(st.landscape, states0.xy[:n_sample], states0.theta[:n_sample]))
    cand64 = np.asarray(views(s)).astype(np.float64)
    if cfg.scan.metric == "ssd":
        # on-route SSD minima sit near 0 (fp cancellation of the
        # |c|^2+|l|^2-2c.l decomposition), so errors are judged in absolute
        # terms against f64 truth, scaled by the norms the cancellation eats
        lib64 = np.asarray(st.lib.flat).astype(np.float64)
        d64 = (
            (cand64[:, :, None, :] - lib64[None, None, :, :]) ** 2
        ).sum(-1).min(-1)  # [n_sample, L]
        scale = float(np.mean(np.asarray(st.lib.sq)))
        tol = 1e-4 * scale
    else:
        # NCC: d = 1 - <z_c, z_l>/P on z-scored views; distances are O(1)
        # with no catastrophic cancellation, so the floor is plain fp32
        # rounding of a P-long dot (~sqrt(P)*eps)
        p = cand64.shape[-1]
        mu = cand64.mean(-1, keepdims=True)
        var = ((cand64 - mu) ** 2).mean(-1, keepdims=True)
        z64 = (cand64 - mu) / np.sqrt(var + NCC_EPS)
        zl64 = np.asarray(st.lib.z).astype(np.float64)
        d64 = (1.0 - (z64 @ zl64.T) / p).min(-1)  # [n_sample, L]
        scale = 1.0
        tol = 5e-4
    err_pal = float(np.max(np.abs(np.asarray(m_pal)[:n_sample] - d64)))
    err_jnp = float(np.max(np.abs(np.asarray(m_jnp)[:n_sample] - d64)))

    # closed loop through the kernel
    final, _ = make_navigate_batch(cfg, fam_impl="pallas")(states0, st)
    rate = float(success_rate(final))
    # gate: kernel at least as accurate as the production jnp path (2x slack)
    # and under the metric's fp32 floor; and it recalls
    ok = rate >= 0.9 and err_pal <= max(2.0 * err_jnp, tol)
    return {
        "metric": "pallas_parity_gate",
        "config": config_n,
        "distance_metric": cfg.scan.metric,
        "batch": b,
        "success_rate": round(rate, 4),
        "fam_abs_err_vs_f64": round(err_pal, 8),
        "jnp_abs_err_vs_f64": round(err_jnp, 8),
        "norm_scale": round(scale, 2),
        "ok": bool(ok),
        "device": str(jax.devices()[0].platform),
    }


def run_fam_precision_gate(impl: str, batch: int = 64, n_sample: int = 32) -> dict:
    """On-TPU f64-referenced precision gate for the extraction-free
    production familiarity paths (VERDICT r4 item 8). CPU CI cannot see TPU
    dot-precision behavior (tests/conftest.py forces JAX_PLATFORMS=cpu,
    where default-precision dots are f32 — this blindness bit the build once,
    STATUS.md round 2), so --all measures each production impl's per-lag
    library minima against a float64 NumPy oracle on real rendered panoramas,
    with the jnp path's error measured in the same run as the yardstick.

    impl="fft" gates the config-1 spectral circular-correlation path with
    spectral_cutoff stripped — the cutoff is a recall-gated APPROXIMATION
    (headline lines own it); this gate isolates arithmetic precision.
    impl="roll" gates the config-2 pre-rolled matmul path (matmul-identical
    numerics to jnp, so its error must track the jnp yardstick closely)."""
    import dataclasses

    import jax

    import navdv_tpu as nav
    from navdv_tpu.agent import (
        _make_lib_min,
        init_state,
        make_navigate_batch,
        make_statics,
    )
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.sensor import (
        make_lag_stats,
        make_pooled_panorama,
        make_render_batch,
        make_views_from_pooled,
        scan_lag_sets,
    )

    config_n = {"fft": 1, "roll": 2}[impl]
    cfg, landscape, route, pts, headings = _setup(config_n)
    # strip approximation knobs; keep the production matmul precision — the
    # quantity under test
    cfg = dataclasses.replace(
        cfg, scan=dataclasses.replace(
            cfg.scan, spectral_cutoff=0, fused_dft_precision="off",
            roll_rank=0, fixed_point_bits=0))
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    if impl == "fft":
        from navdv_tpu.familiarity_fft import make_lib_min_fft as _mk
    else:
        from navdv_tpu.familiarity_roll import make_lib_min_roll as _mk

    lags, _ = scan_lag_sets(cfg.scan)
    lib_min_impl = _mk(cfg.sensor, cfg.scan, lags)
    render_b = make_render_batch(cfg.sensor)
    pooled = make_pooled_panorama(cfg.sensor)
    lag_stats = make_lag_stats(cfg.sensor, lags)
    views = make_views_from_pooled(cfg.sensor, lags)
    lib_min_jnp = _make_lib_min(cfg, "jnp")

    aux = lib_min_impl.prepare(st.lib)

    @jax.jit
    def both(states, st, aux):
        s = pooled(render_b(st.landscape, states.xy, states.theta))
        lag_sum, lag_sq = lag_stats(s)
        m_impl = lib_min_impl(s, st.lib, lag_sum, lag_sq, aux=aux)
        m_jnp = lib_min_jnp(views(s), st.lib, lag_sum, lag_sq)
        return s, m_impl, m_jnp

    s, m_impl, m_jnp = jax.block_until_ready(both(states0, st, aux))

    # float64 oracle on a sample of agents (SSD: both gated configs)
    cand64 = np.asarray(views(s[:n_sample])).astype(np.float64)
    lib64 = np.asarray(st.lib.flat).astype(np.float64)
    d64 = (
        (cand64[:, :, None, :] - lib64[None, None, :, :]) ** 2
    ).sum(-1).min(-1)  # [n_sample, L]
    scale = float(np.mean(np.asarray(st.lib.sq)))
    tol = 1e-4 * scale
    err_impl = float(np.max(np.abs(np.asarray(m_impl)[:n_sample] - d64)))
    err_jnp = float(np.max(np.abs(np.asarray(m_jnp)[:n_sample] - d64)))

    # closed loop through the impl (exact variant, no cutoff)
    final, _ = make_navigate_batch(cfg, fam_impl=impl)(states0, st)
    rate = float(success_rate(final))
    ok = rate >= 0.9 and err_impl <= max(2.0 * err_jnp, tol)
    return {
        "metric": f"{impl}_precision_gate",
        "config": config_n,
        "distance_metric": cfg.scan.metric,
        "batch": batch,
        "library_views": int(lib.views.shape[0]),
        "success_rate": round(rate, 4),
        "fam_abs_err_vs_f64": round(err_impl, 8),
        "jnp_abs_err_vs_f64": round(err_jnp, 8),
        "norm_scale": round(scale, 2),
        "matmul_precision": cfg.scan.matmul_precision,
        "ok": bool(ok),
        "device": str(jax.devices()[0].platform),
    }


def run_sector_gate() -> dict:
    """On-TPU parity gate for the sector renderer (render_mode="sector"):
    the rolled-back phi-frame panorama must match the full-window renderer
    on real hardware (the unit tests run this check on CPU only), and the
    closed loop through sector+fft must recall. Emitted by --all so every
    round leaves an artifact proving the roll identity holds on the chip."""
    import jax
    import jax.numpy as jnp

    import navdv_tpu as nav
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.sensor import (
        make_render_batch,
        make_render_batch_rolled,
        unroll_panorama,
    )

    # config 3 is the sector-mode BASELINE config
    cfg, landscape, route, pts, headings = _setup(3)
    rng = np.random.default_rng(0)
    b = 64
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(b, 2))
    thetas = headings[0] + rng.normal(0, 0.5, size=(b,))

    pano_phi, k = jax.jit(make_render_batch_rolled(cfg.sensor))(
        jnp.asarray(landscape), jnp.asarray(starts, jnp.float32),
        jnp.asarray(thetas, jnp.float32),
    )
    want = jax.jit(make_render_batch(cfg.sensor))(
        jnp.asarray(landscape), jnp.asarray(starts, jnp.float32),
        jnp.asarray(thetas, jnp.float32),
    )
    err = float(np.max(np.abs(unroll_panorama(pano_phi, k) - np.asarray(want))))

    lib = nav.train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    final, _ = make_navigate_batch(cfg, fam_impl="fft")(
        init_state(starts, thetas), st
    )
    rate = float(success_rate(final))
    # bf16 hat weights bound the roll-identity mismatch at ~1e-2 pixel noise
    ok = err <= 3e-2 and rate >= 0.9
    return {
        "metric": "sector_parity_gate",
        "config": 3,
        "batch": b,
        "pano_roll_abs_err": round(err, 6),
        "success_rate": round(rate, 4),
        "ok": bool(ok),
        "device": str(jax.devices()[0].platform),
    }


def build_parser() -> argparse.ArgumentParser:
    """The bench arg surface, importable so `navdv_tpu.cli bench` can stay
    in exact parity (it seeds defaults from here instead of mirroring the
    arg list by hand)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--batch", type=int, default=None,
                    help="default: spec batch for the config")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: route arc length * 1.3")
    ap.add_argument("--views", type=int, default=None,
                    help="stored-view count (default: BASELINE spec)")
    ap.add_argument("--route-length", type=float, default=40.0,
                    help="sine route length; 40 -> ~51 px arc (spec), "
                         "200 -> ~257 px arc (dense round-1 variants)")
    ap.add_argument("--impl", default="default",
                    help="jnp|fft|roll|conv|pallas|infomax (default: fastest per config)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed episode repeats (min is reported)")
    ap.add_argument("--land-kind", default="blobs",
                    help="bench-world landscape kind (blobs|fractal|noise|"
                         "checker|flat); the accuracy gate re-measures its "
                         "exact-path reference on whatever world is chosen")
    ap.add_argument("--all", action="store_true",
                    help="run BASELINE configs 1-4, the B=1/16/64 config-1 "
                         "latency envelope, and the Pallas and sector parity "
                         "gates (one JSON line each)")
    ap.add_argument("--big-landscape", type=int, default=0, metavar="SIZE",
                    help="scale-envelope run on a SIZE^2 landscape (>2M cells "
                         "-> DMA band source), e.g. 4096")
    ap.add_argument("--big-kind", default="fractal",
                    help="landscape kind for --big-landscape")
    ap.add_argument("--jax-cache", default=None, metavar="DIR",
                    help="persist compiled XLA executables to DIR; repeat "
                         "runs skip the ~30 s first compiles "
                         "(navdv_tpu.utils.compile_cache)")
    return ap


def main() -> None:
    ap = build_parser()
    args = ap.parse_args()
    run_defended(args, ap)


def run_defended(args, ap) -> None:
    """The three-layer outage defense wrapped around :func:`_run_cli` —
    shared by ``python bench.py`` and ``python -m navdv_tpu.cli bench`` so
    the CLI entry cannot bypass it."""
    # --- layer 1: bounded probe + retry before any jax import can touch
    # the (possibly down) axon tunnel in this process ---
    probe_elapsed = 0.0
    if _needs_tpu_probe():
        up, attempts, elapsed, detail = _probe_backend_with_retry()
        if not up:
            extra = {}
            baseline = load_regression_baseline()
            prev = baseline.get(
                (args.config, SPEC_BATCH.get(args.config),
                 SPEC_IMPL.get(args.config), "tpu"))
            if prev is not None:
                # context only — the capability last measured on the chip
                # (committed artifact), clearly labeled as not-this-run
                extra["last_committed_tpu_value"] = prev
            print(_error_line(
                "tpu_unavailable", probe_attempts=attempts,
                probe_window_s=round(elapsed, 1), detail=detail,
                config=args.config, **extra), flush=True)
            return
        print(f"[bench probe] backend up after {attempts} attempt(s): {detail}",
              file=sys.stderr, flush=True)
        probe_elapsed = elapsed

    # --- layer 2: watchdog for a MID-run tunnel death (hang -> rc 124
    # with an empty tail is exactly round 4's MULTICHIP failure mode).
    # Armed for every TPU run (including NAVDV_BENCH_SKIP_PROBE ones); a
    # CPU-forced fallback run is legitimately 100-1000x slower and must
    # not be os._exit'd by a TPU-sized budget. Probe retry time comes OUT
    # of the budget so probe + watchdog stay inside an external wrapper's
    # timeout (e.g. run_tpu_queue.sh) instead of re-exposing rc=124.
    if _is_tpu_run():
        if args.big_landscape:
            default_budget, context = "2400", f"big-landscape {args.big_landscape}"
        elif args.all:
            default_budget, context = "3300", "--all"
        else:
            default_budget, context = "1200", f"config {args.config}"
        budget = max(
            120.0,
            float(os.environ.get("NAVDV_BENCH_BUDGET_S", default_budget))
            - probe_elapsed,
        )
        _arm_watchdog(budget, context)

    # --- layer 3: structured line instead of a raw traceback on any error ---
    try:
        _run_cli(args, ap)
    except Exception as e:  # noqa: BLE001 — the record must stay parseable
        traceback.print_exc(file=sys.stderr)
        print(_error_line(
            f"exception: {type(e).__name__}: {str(e)[:300]}",
            config=args.config), flush=True)


def _run_cli(args, ap) -> None:
    if args.jax_cache:
        from navdv_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache)
    if args.big_landscape:
        _emit(run_big_landscape(
            size=args.big_landscape, land_kind=args.big_kind,
            repeats=args.repeats))
        return
    if args.all:
        if args.config != 1:
            ap.error("--all runs configs 1-4; drop --config")
        regression_baseline = load_regression_baseline()
        # config 4 IS config 1's workload with the 1024-agent batch;
        # config 5 (sweep grid) runs via `python -m navdv_tpu.cli sweep`
        for cfg_n in (1, 2, 3, 4):
            _emit(apply_regression_guard(run_bench(
                cfg_n, batch=args.batch, steps=args.steps, impl=args.impl,
                repeats=args.repeats, views=args.views,
                route_length=args.route_length,
                land_kind=args.land_kind), regression_baseline))
        # single-agent / small-batch latency envelope at config 1 (VERDICT
        # round 3, missing 2): BASELINE.json names config 1 "single-agent";
        # these lines report the B=1 step latency the headline batch hides
        for b_small in (1, 16, 64):
            _emit(apply_regression_guard(run_bench(
                1, batch=b_small, steps=args.steps, impl=args.impl,
                repeats=args.repeats, views=args.views,
                route_length=args.route_length,
                land_kind=args.land_kind, gated=b_small >= 64),
                regression_baseline))
        _emit(run_pallas_gate(route_length=args.route_length))
        # NCC branch of the kernel at the config-3 sensor (23k px views:
        # small batch keeps the [B, L, P] candidate tensor in budget)
        _emit(run_pallas_gate(
            route_length=args.route_length, config_n=3, batch=32, n_sample=8))
        _emit(run_sector_gate())
        _emit(run_fam_precision_gate("fft"))
        _emit(run_fam_precision_gate("roll"))
        return
    result = run_bench(args.config, batch=args.batch, steps=args.steps,
                       impl=args.impl, repeats=args.repeats, views=args.views,
                       route_length=args.route_length,
                       land_kind=args.land_kind)
    _emit(result)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
