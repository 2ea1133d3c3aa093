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
  L5 viz         -> :mod:`navdv_tpu.viz`
"""

from navdv_tpu.config import (
    AgentConfig,
    ScanConfig,
    SensorConfig,
    SimConfig,
    baseline_config,
)
from navdv_tpu.landscape import make_landscape
from navdv_tpu.routes import make_route
from navdv_tpu.training import train_library
from navdv_tpu.agent import (
    init_state,
    make_navigate,
    make_navigate_batch,
    make_statics,
    navigate,
    step,
)
from navdv_tpu.metrics import episode_metrics, success_rate
from navdv_tpu.simulator import NavigationResult, NavigationSimulator
from navdv_tpu.trials import make_trials

__version__ = "0.1.0"

__all__ = [
    "AgentConfig",
    "ScanConfig",
    "SensorConfig",
    "SimConfig",
    "baseline_config",
    "make_landscape",
    "make_route",
    "train_library",
    "init_state",
    "make_navigate",
    "make_navigate_batch",
    "make_statics",
    "make_trials",
    "NavigationResult",
    "NavigationSimulator",
    "navigate",
    "step",
    "episode_metrics",
    "success_rate",
]
