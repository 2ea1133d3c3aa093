"""High-level OO facade: the one-stop entry point for users coming from the
reference's single-simulator-class style (SURVEY.md §1 L3 recalls a
``NavBySceneFamiliarity`` class owning pose, step size, scan arc, sensor dims
and the library; this wraps the functional core in that shape).

>>> sim = NavigationSimulator.from_config(nav.baseline_config(1),
...                                       landscape, route)
>>> sim.train()
>>> result = sim.navigate(n_trials=1024, seed=0)
>>> result.success_rate
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.agent import (
    init_state,
    make_navigate_batch,
    make_statics,
)
from navdv_tpu.config import SimConfig
from navdv_tpu.metrics import episode_metrics, success_rate
from navdv_tpu.oracle import resample_route
from navdv_tpu.trials import make_trials


@dataclasses.dataclass
class NavigationResult:
    """Batched recall outcome with the trajectory record attached."""

    success_rate: float
    metrics: dict[str, Any]
    final_state: Any
    record: Any  # StepRecord [B, T, ...]

    def plot(self, landscape, route, out_path: str) -> str:
        from navdv_tpu import viz

        return viz.plot_trajectory(landscape, route, self.record, out_path)


class NavigationSimulator:
    """Owns landscape + route + trained library + compiled navigate fn."""

    def __init__(self, cfg: SimConfig, landscape, route, fam_impl: str = "auto"):
        from navdv_tpu.config import choose_fam_impl

        self.cfg = cfg
        self.landscape = jnp.asarray(landscape, jnp.float32)
        self.route = np.asarray(route, np.float64)
        # "auto" resolves to the measured per-workload winner (config.py);
        # pass fam_impl="jnp" explicitly for the exact reference numerics
        self.fam_impl = choose_fam_impl(cfg) if fam_impl == "auto" else fam_impl
        self.library = None
        self._statics = None
        self._navigate = None
        self._aux = None

    @classmethod
    def from_config(cls, cfg: SimConfig, landscape, route, **kw) -> "NavigationSimulator":
        return cls(cfg, landscape, route, **kw)

    def train(self) -> "NavigationSimulator":
        """Capture the training-view library along the route (SEMANTICS.md §6)."""
        from navdv_tpu.training import train_library

        self.library = train_library(self.landscape, self.route, self.cfg)
        self._statics = make_statics(self.landscape, self.library, self.route)
        self._navigate = make_navigate_batch(self.cfg, fam_impl=self.fam_impl)
        self._aux = self._prepare_aux()
        return self

    def _prepare_aux(self):
        """Per-library constants (pre-rolled/spectral library), built once at
        train/load time and reused by every navigate() call."""
        if self._navigate is not None and self._navigate.prepare is not None:
            return self._navigate.prepare(self._statics)
        return None

    def save_library(self, path: str) -> None:
        from navdv_tpu.checkpoint import save_library

        save_library(path, self.library)

    def load_library(self, path: str) -> "NavigationSimulator":
        from navdv_tpu.checkpoint import load_library

        self.library = load_library(path)
        self._statics = make_statics(self.landscape, self.library, self.route)
        self._navigate = make_navigate_batch(self.cfg, fam_impl=self.fam_impl)
        self._aux = self._prepare_aux()
        return self

    def navigate(
        self,
        n_trials: int = 1,
        seed: int = 0,
        pos_sigma: float = 1.5,
        heading_sigma: float = 0.15,
        starts=None,
        headings=None,
        start_anywhere: bool = False,
    ) -> NavigationResult:
        """Run batched recall episodes from randomized (or given) starts;
        ``start_anywhere`` samples starts uniformly along the route. When
        ``starts`` is given without ``headings``, each agent faces the route
        tangent at its nearest captured route point."""
        if self.library is None:
            raise RuntimeError("call train() or load_library() first")
        if starts is None:
            if headings is not None:
                raise ValueError("headings given without starts")
            starts, headings = make_trials(
                self.route, self.cfg, n_trials, seed=seed,
                pos_sigma=pos_sigma, heading_sigma=heading_sigma,
                start_anywhere=start_anywhere,
            )
        else:
            # normalize BOTH explicit-start call styles: an unbatched [2]
            # start otherwise crashes deep in the jitted renderer
            starts = np.atleast_2d(np.asarray(starts, np.float64))
            if headings is None:
                pts, hd = resample_route(self.route, self.cfg.capture_spacing)
                nearest = np.argmin(
                    ((starts[:, None, :] - pts[None, :, :]) ** 2).sum(-1),
                    axis=1,
                )
                headings = hd[nearest]
            else:
                headings = np.atleast_1d(np.asarray(headings, np.float64))
                if headings.shape[0] != starts.shape[0]:
                    raise ValueError(
                        f"headings batch {headings.shape[0]} != starts "
                        f"batch {starts.shape[0]}"
                    )
        final, rec = jax.block_until_ready(
            self._navigate(init_state(starts, headings), self._statics, self._aux)
        )
        m = episode_metrics(final, rec)
        return NavigationResult(
            success_rate=float(success_rate(final)),
            metrics={k: np.asarray(v) for k, v in m.items()},
            final_state=final,
            record=rec,
        )

    def start_pose(self) -> tuple[np.ndarray, float]:
        """(route start point, initial tangent heading)."""
        pts, hd = resample_route(self.route, self.cfg.capture_spacing)
        return pts[0], float(hd[0])
