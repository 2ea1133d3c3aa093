"""Tracing / profiling helpers (SURVEY.md §5.1).

Usage::

    from navdv_tpu.utils.profiling import trace
    with trace("/tmp/navdv_trace"):
        jax.block_until_ready(nav_fn(states0, st))

Inspect with ``tensorboard --logdir /tmp/navdv_trace`` (xprof plugin) or
:func:`top_hlo_ops` for a quick terminal breakdown.
"""

from __future__ import annotations

import contextlib
import glob
import json

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler.trace with block_until_ready discipline reminder."""
    with jax.profiler.trace(log_dir):
        yield


def top_hlo_ops(log_dir: str, n: int = 10, divisor: float = 1.0) -> list[dict]:
    """Parse the newest xplane in ``log_dir`` -> top-n self-time HLO ops.

    ``divisor`` scales times (e.g. steps per episode) to per-step numbers.
    Requires the xprof package (present in the dev stack).
    """
    from xprof.convert import raw_to_tool_data as rttd

    pbs = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    out = rttd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    raw = out[0] if isinstance(out[0], str) else out[0].decode()
    j = json.loads(raw)
    cols = [c["label"] for c in j["cols"]]
    idx = {k: cols.index(k) for k in ["Total self time (us)", "HLO op text", "Bound by"]}
    rows = [[c.get("v") for c in r["c"]] for r in j["rows"]]
    rows.sort(key=lambda v: -(v[idx["Total self time (us)"]] or 0))
    return [
        {
            "self_us": round((v[idx["Total self time (us)"]] or 0) / divisor, 1),
            "bound_by": v[idx["Bound by"]],
            "op": str(v[idx["HLO op text"]])[:120],
        }
        for v in rows[:n]
    ]
