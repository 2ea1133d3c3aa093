"""navdv_tpu — TPU-native scene-familiarity navigation framework.

A brand-new JAX/XLA/Pallas rebuild with the capabilities of
``Linux-cpp-lisp/navigation-by-deja-vu`` (see SURVEY.md; the reference mount was
empty this session, so semantics are frozen in SEMANTICS.md and enforced by the
NumPy oracle in :mod:`navdv_tpu.oracle`).

Layer map (SURVEY.md §1):
  L0 landscape   -> :mod:`navdv_tpu.landscape`
  L1 sensor      -> :mod:`navdv_tpu.sensor`
  L2 familiarity -> :mod:`navdv_tpu.familiarity` (+ :mod:`navdv_tpu.ops` Pallas)
  L3 agent loop  -> :mod:`navdv_tpu.agent`
  L4 sweeps      -> :mod:`navdv_tpu.sweep`
  L5 viz         -> :mod:`navdv_tpu.viz` + :mod:`navdv_tpu.analysis`

The package exports resolve LAZILY (PEP 562): ``import navdv_tpu`` touches no
JAX until an attribute is first used. This is deliberate outage engineering —
on this environment a down axon tunnel hangs ``import jax`` at backend
registration, and eager re-exports would hang every entry point (including
``python -m navdv_tpu.cli``) before any probe/defense code could run
(round-4 postmortem; bench.py's layer-1 probe relies on this).
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# attribute -> defining submodule (the public surface; mirrors __all__)
_EXPORTS = {
    "AgentConfig": "navdv_tpu.config",
    "ScanConfig": "navdv_tpu.config",
    "SensorConfig": "navdv_tpu.config",
    "SimConfig": "navdv_tpu.config",
    "baseline_config": "navdv_tpu.config",
    "make_landscape": "navdv_tpu.landscape",
    "make_route": "navdv_tpu.routes",
    "train_library": "navdv_tpu.training",
    "init_state": "navdv_tpu.agent",
    "make_navigate": "navdv_tpu.agent",
    "make_navigate_batch": "navdv_tpu.agent",
    "make_statics": "navdv_tpu.agent",
    "navigate": "navdv_tpu.agent",
    "step": "navdv_tpu.agent",
    "catchment": "navdv_tpu.analysis",
    "full_circle_scan": "navdv_tpu.analysis",
    "heading_error": "navdv_tpu.analysis",
    "familiarity_map": "navdv_tpu.analysis",
    "make_familiarity_probe": "navdv_tpu.analysis",
    "ridf": "navdv_tpu.analysis",
    "episode_metrics": "navdv_tpu.metrics",
    "success_rate": "navdv_tpu.metrics",
    "NavigationResult": "navdv_tpu.simulator",
    "NavigationSimulator": "navdv_tpu.simulator",
    "make_trials": "navdv_tpu.trials",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'navdv_tpu' has no attribute {name!r}")
    value = getattr(importlib.import_module(mod), name)
    globals()[name] = value  # cache: subsequent lookups skip __getattr__
    return value


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
