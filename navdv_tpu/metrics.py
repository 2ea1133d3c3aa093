"""L4: route-recall metrics (SEMANTICS.md §7; SURVEY.md §2.1 route-recall row).

Operates on the stacked StepRecord arrays from :func:`navdv_tpu.agent.navigate`
(works on both single [T] and batched [B, T] records via the same code —
reductions are over the last/time axis).
"""

from __future__ import annotations

import jax.numpy as jnp

from navdv_tpu.agent import STATUS_REACHED, AgentState, StepRecord


def episode_metrics(final: AgentState, rec: StepRecord) -> dict:
    """Per-episode summary. ``active`` masks steps taken before termination
    (rec.done is the *pre-step* done flag, so ~done marks real steps)."""
    active = ~rec.done  # [.., T]
    n_steps = jnp.sum(active, axis=-1)
    # avoid 0/0 on immediately-done episodes
    denom = jnp.maximum(n_steps, 1)
    mean_err = jnp.sum(jnp.where(active, rec.dist_route, 0.0), axis=-1) / denom
    max_err = jnp.max(jnp.where(active, rec.dist_route, 0.0), axis=-1)
    # familiarity at the last step actually taken (early-exit runs zero-pad
    # the tail, so [..., -1] would be wrong there)
    last_idx = jnp.maximum(n_steps - 1, 0)
    final_fam = jnp.take_along_axis(rec.fam, last_idx[..., None], axis=-1)[..., 0]
    return {
        "success": final.status == STATUS_REACHED,
        "status": final.status,
        "n_steps": n_steps,
        "mean_path_error": mean_err,
        "max_path_error": max_err,
        "final_fam": final_fam,
    }


def success_rate(final: AgentState) -> jnp.ndarray:
    """Route-recall success rate over a batch of trials (SEMANTICS.md §7)."""
    return jnp.mean((final.status == STATUS_REACHED).astype(jnp.float32))
