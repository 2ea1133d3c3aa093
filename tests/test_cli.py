"""CLI smoke tests: every subcommand runs end-to-end on tiny worlds."""

import json
import os

from navdv_tpu.cli import main


def test_cli_demo(tmp_path):
    out = str(tmp_path / "demo")
    main([
        "demo", "--size", "128", "--route", "line", "--route-length", "40",
        "--trials", "4", "--steps", "12", "--out", out,
    ])
    assert os.path.exists(os.path.join(out, "trajectories.png"))
    assert os.path.exists(os.path.join(out, "familiarity.png"))
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert 0.0 <= m["success_rate"] <= 1.0


def test_cli_sweep_with_spec(tmp_path):
    out = str(tmp_path / "sweep")
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "sensor_px": [[24, 4, 3]],
        "scan_granularity": [[12, 2]],
        "capture_spacing": [2.0],
        "n_trials": 4,
        "max_steps": 12,
    }))
    main([
        "sweep", "--size", "128", "--route", "line", "--route-length", "40",
        "--spec", str(spec), "--out", out, "--trial-seed", "1",
    ])
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert os.path.exists(os.path.join(out, "success_heatmap.png"))
