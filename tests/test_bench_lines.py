"""Bench output-record invariants (VERDICT r4 items 1b/3/7).

Round 4's official record was lost to an unhandled tunnel outage and its
ungated latency lines were ambiguous to a parser. These tests pin the
machine-readable contract of bench.py's JSON lines:

- every line carries exactly one of ``ok`` (a verdict) / ``gate`` (an
  explicit skip marker with a reason) — enforced at emit time by
  ``check_line_invariant`` and exercised here on real ``run_bench`` output;
- the structured outage line parses and is self-describing;
- the cross-round regression guard flags >5% drops against the committed
  previous-round artifact and stays quiet inside the tolerance.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


TINY = dict(batch=4, steps=6, views=8, route_length=20.0, min_window_s=0.02,
            repeats=1)


def test_invariant_rejects_bare_line():
    with pytest.raises(ValueError, match="exactly one of ok/gate"):
        bench.check_line_invariant({"metric": "m", "value": 1.0})


def test_invariant_rejects_both_fields():
    with pytest.raises(ValueError, match="exactly one of ok/gate"):
        bench.check_line_invariant({"metric": "m", "ok": True, "gate": "x"})


def test_invariant_passes_each_alone():
    assert bench.check_line_invariant({"ok": False}) == {"ok": False}
    assert bench.check_line_invariant({"gate": "skipped: reason"})


def test_ungated_line_carries_explicit_marker():
    # the B=1/B=16 latency lines of --all (gated=False): an explicit skip
    # marker, never a bare line (VERDICT r4 weak 3)
    result = bench.run_bench(1, gated=False, **TINY)
    assert "ok" not in result
    assert result["gate"].startswith("skipped:")
    assert "population" in result["gate"]


def test_config5_gets_gate_marker_not_keyerror():
    # ADVICE r4: ACCURACY_BAND[5] used to KeyError after the timed run
    result = bench.run_bench(5, gated=True, **TINY)
    assert "ok" not in result
    assert result["gate"] == "skipped: no accuracy band for config 5"


def test_gated_line_carries_ok_verdict():
    result = bench.run_bench(1, gated=True, **TINY)
    assert "gate" not in result
    assert isinstance(result["ok"], bool)
    assert "exact_recall_ref" in result and "recall_floor" in result
    json.dumps(result)  # line must be JSON-serializable


def test_error_line_is_structured_json():
    line = bench._error_line("tpu_unavailable", probe_attempts=3,
                             probe_window_s=600.0)
    rec = json.loads(line)
    assert rec["ok"] is False
    assert rec["error"] == "tpu_unavailable"
    assert rec["metric"] == "agent-steps/sec/chip"
    assert rec["value"] is None
    bench.check_line_invariant(rec)


def test_probe_gating_respects_env(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert not bench._needs_tpu_probe()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "192.0.2.55")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not bench._needs_tpu_probe()  # CPU-forced runs never probe
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert bench._needs_tpu_probe()
    monkeypatch.setenv("NAVDV_BENCH_SKIP_PROBE", "1")
    assert not bench._needs_tpu_probe()


def test_probe_detects_dead_tunnel_fast(monkeypatch):
    # A hung backend init must FAIL the probe (bounded), not hang the
    # parent — the round-4 failure mode. Simulated by substituting the
    # probe code (PROBE_CODE) with a hang: poisoning PALLAS_AXON_POOL_IPS
    # is inert while a live loopback relay is reachable (measured: probe
    # reaches the chip with the poisoned IP when the tunnel is up), so the
    # env-based simulation only worked while the tunnel was genuinely down.
    monkeypatch.setattr(bench, "PROBE_CODE", "import time; time.sleep(60)")
    up, detail = bench._probe_backend_once(timeout_s=3.0)
    assert not up
    assert "timed out" in detail

    # crashing init (rc != 0) is also a bounded failure with a detail tail
    monkeypatch.setattr(
        bench, "PROBE_CODE",
        "import sys; print('axon: UNAVAILABLE', file=sys.stderr); sys.exit(1)")
    up, detail = bench._probe_backend_once(timeout_s=8.0)
    assert not up
    assert "UNAVAILABLE" in detail


def test_watchdog_armed_when_probe_skipped(monkeypatch):
    """NAVDV_BENCH_SKIP_PROBE skips only layer 1: the mid-run watchdog
    (layer 2) must still arm for a TPU run, and its budget must deduct
    probe retry time so probe + watchdog fit an external wrapper timeout
    (run_tpu_queue.sh's `timeout 3500`)."""
    import argparse

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "192.0.2.55")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("NAVDV_BENCH_SKIP_PROBE", "1")
    armed = []
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda budget, context: armed.append((budget, context)))
    monkeypatch.setattr(bench, "_run_cli", lambda args, ap: None)
    ns = bench.build_parser().parse_args(["--all"])
    bench.run_defended(ns, argparse.ArgumentParser())
    assert armed == [(3300.0, "--all")]

    # probe path: elapsed probe time comes out of the budget
    monkeypatch.delenv("NAVDV_BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setattr(bench, "_probe_backend_with_retry",
                        lambda: (True, 3, 250.0, "tpu 1"))
    armed.clear()
    bench.run_defended(ns, argparse.ArgumentParser())
    assert armed == [(3050.0, "--all")]

    # big-landscape runs get their own budget + context
    ns_big = bench.build_parser().parse_args(["--big-landscape", "4096"])
    monkeypatch.setenv("NAVDV_BENCH_SKIP_PROBE", "1")
    monkeypatch.setattr(
        bench, "_run_cli",
        lambda args, ap: (_ for _ in ()).throw(RuntimeError("stop")),
    )
    armed.clear()
    bench.run_defended(ns_big, argparse.ArgumentParser())  # layer 3 absorbs
    assert armed == [(2400.0, "big-landscape 4096")]


def test_setup_cache_dedups_identical_workloads():
    """config 4 is config 1's workload: _setup_trained must hand back the
    SAME trained world/library (and the --all B=1/16/64 lines likewise)."""
    bench._SETUP_CACHE.clear()
    k1, v1 = bench._setup_trained(1, 8, 20.0, 6, "blobs")
    k4, v4 = bench._setup_trained(4, 8, 20.0, 6, "blobs")
    assert k1 == k4 and v1 is v4
    assert len(bench._SETUP_CACHE) == 1
    # a different workload gets its own entry
    k2, v2 = bench._setup_trained(2, 8, 20.0, 6, "blobs")
    assert k2 != k1 and v2 is not v1
    bench._SETUP_CACHE.clear()


def test_spec_impl_mirrors_baseline_fam_impl():
    # SPEC_IMPL is duplicated in bench.py because the outage path cannot
    # import navdv_tpu (package __init__ imports jax -> hangs on a down
    # tunnel); this pins the duplicate to the source of truth
    from navdv_tpu.config import baseline_fam_impl

    for n, impl in bench.SPEC_IMPL.items():
        assert impl == baseline_fam_impl(n), n


def test_regression_guard_flags_drop_and_passes_within_tol():
    baseline = {(1, 1024, "fft", "tpu"): 1_000_000.0}
    flagged = bench.apply_regression_guard(
        {"config": 1, "batch": 1024, "impl": "fft", "device": "tpu",
         "value": 900_000.0, "ok": True}, baseline)
    assert flagged["regression"] is True
    assert flagged["prev_round_value"] == 1_000_000.0
    quiet = bench.apply_regression_guard(
        {"config": 1, "batch": 1024, "impl": "fft", "device": "tpu",
         "value": 980_000.0, "ok": True}, baseline)
    assert quiet["regression"] is False
    # unmatched key (e.g. CPU fallback run vs TPU baseline): no judgement
    other = bench.apply_regression_guard(
        {"config": 1, "batch": 1024, "impl": "fft", "device": "cpu",
         "value": 3000.0, "ok": True}, baseline)
    assert "regression" not in other


def test_regression_baseline_loads_committed_artifact():
    baseline = bench.load_regression_baseline()
    # the repo ships artifacts/bench_r*_final_all.jsonl; config-1 headline
    # must be present under its (config, batch, impl, device) key
    assert any(k[0] == 1 and k[3] == "tpu" for k in baseline), baseline
    assert all(isinstance(v, float) and v > 0 for v in baseline.values())
