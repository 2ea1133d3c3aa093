"""Learned familiarity: Infomax novelty network (fam_impl="infomax").

The scene-familiarity literature this framework implements (SURVEY.md §0.2
[LIT]) has TWO memory models: the perfect-memory min-over-library the
reference uses (every other fam_impl here), and a LEARNED single-layer
"Infomax" novelty network (Baddeley, Graham, Husbands, Philippides 2012,
PLoS Comput Biol 8(1):e1002336, their route-navigation model; training rule
from Lulham, Bogacz, Vogt, O'Connell 2009). This module adds the learned
model as a drop-in familiarity impl:

  - training (once per library, in the prepare-once stage): each z-scored
    library view x is presented to a weight matrix W[M, P]; with
    h = Wx, y = tanh(h), the Infomax anti-Hebbian update is

        dW = eta / P * (W - (y + h) (h^T W))

    (the (y+h) outer (h^T W) factoring keeps the update O(M*P) instead of
    the naive O(M^2 P)). Presented once per epoch in library order —
    sequential by construction, so it runs as a lax.scan.
  - scoring (per step): novelty d(x) = mean_i |(Wx)_i| over the M units,
    computed for every candidate view as ONE MXU matmul [B*L, P] x [P, M];
    the per-candidate z-score folds in algebraically exactly like the NCC
    path (agent._make_lib_min): W zscore(x) = (Wx - mu_x * W1) / sigma_x.
    Familiar views produce small responses; argmin over headings is
    unchanged.

Why it exists beyond parity: memory and per-step cost are O(M*P), CONSTANT
in library size — the complement to the measured Nl-proportional walls of
the perfect-memory paths (a 5.5 MB weight matrix replaces the 3.5 GB
pre-rolled aux at 32k views; artifacts/biglib_ext.jsonl). It is a different
MODEL (recall differs from perfect memory), so "auto" never selects it.

Semantic choices frozen in SEMANTICS.md §9: z-scored inputs, normal(0, 1/P)
init, eta/P scaling, library presentation order, mean-|h| readout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from navdv_tpu.familiarity import NCC_EPS, LibraryPack, matmul_precision


class InfomaxPack(NamedTuple):
    """Trained novelty network: the prepare-once aux for fam_impl="infomax".

    w:    f32[M, P] trained weights
    wsum: f32[M]    per-unit weight sums (folds the candidate z-score into
                    the scoring matmul algebraically)
    """

    w: jnp.ndarray
    wsum: jnp.ndarray


def auto_epochs(n_views: int, n_pixels: int) -> int:
    """Epochs for ``infomax_epochs=0``: total updates ~ 40 * n_pixels.

    Measured at eta=0.1: closed-loop recall has a sharp onset knee near
    10*P total updates (512^2 blobs world, P=1152, Nl=61: 0.00/0.97/1.00 at
    100/189/400 epochs), a plateau from ~40*P (BASELINE config-1 workload
    with noisy starts: 0.61 at 20*P, then 0.92 flat across 40/60/100*P), and
    an OVERTRAINING decline on some worlds past it (128^2 noise world:
    0.81/0.875/0.625 at 20/40/80*P — Infomax converges toward whitening,
    which eventually erodes rotational discrimination). 40*P is the measured
    cross-workload optimum. Dense libraries (Nl >= 40*P, e.g. the >=46k-view
    envelope) need one pass, so training stays bounded at ~max(Nl, 40*P)
    updates — no upper clamp: epochs * Nl is ~constant in Nl, so a tiny
    library just reruns its few views more times at the same total cost
    (a clamp here would silently land small-Nl configs under the knee).

    ``n_views`` should be the VALID view count where the caller knows it:
    shape-padded libraries (sweep bucketing, lib sharding) contribute
    zero-masked updates for pad rows, so sizing epochs from the padded shape
    undertrains by the pad fraction. train_infomax only has the padded
    shape; sweep.run_cell passes the true count via infomax_epochs."""
    return max(1, -(-40 * n_pixels // max(1, n_views)))


def train_infomax(
    lib: LibraryPack,
    n_units: int,
    eta: float,
    epochs: int,
    seed: int,
) -> InfomaxPack:
    """Train W on the library's z-scored views (jittable; lax.scan over the
    inherently sequential per-view updates). Padded views (valid=0) are
    presented with a zero-masked update, so bucketed/sharded-shape libraries
    train identically to unpadded ones. ``epochs=0`` -> :func:`auto_epochs`."""
    z = lib.z.astype(jnp.float32)  # [Nl, P]
    p = z.shape[1]
    if epochs == 0:
        epochs = auto_epochs(z.shape[0], p)
    key = jax.random.PRNGKey(seed)
    w0 = jax.random.normal(key, (n_units, p), jnp.float32) / jnp.sqrt(
        jnp.asarray(p, jnp.float32)
    )
    scale = eta / p

    def update(w, zv):
        zvec, valid = zv
        h = w @ zvec  # [M]
        hw = h @ w  # [P] == h^T W
        dw = scale * (w - (jnp.tanh(h) + h)[:, None] * hw[None, :])
        return w + valid * dw, None

    def epoch(w, _):
        w, _ = jax.lax.scan(update, w, (z, lib.valid))
        return w, None

    w, _ = jax.lax.scan(epoch, w0, None, length=epochs)
    return InfomaxPack(w=w, wsum=jnp.sum(w, axis=1))


def make_lib_min_infomax(sensor_cfg, scan_cfg):
    """Scorer with the extraction-path lib_min signature
    ``(cand f32[B,L,P], lib, lag_sum f32[B,L], lag_sq f32[B,L], aux) ->
    novelty f32[B,L]`` plus a ``.prepare(lib) -> InfomaxPack`` stage."""
    p = float(sensor_cfg.n_pixels)
    m_units = scan_cfg.infomax_units or sensor_cfg.n_pixels
    prec = matmul_precision(scan_cfg.matmul_precision)

    def prepare(lib: LibraryPack) -> InfomaxPack:
        return train_infomax(
            lib,
            n_units=m_units,
            eta=scan_cfg.infomax_eta,
            epochs=scan_cfg.infomax_epochs,
            seed=scan_cfg.infomax_seed,
        )

    def lib_min(cand, lib, lag_sum, lag_sq, aux: InfomaxPack):
        if aux is None:
            raise ValueError(
                "fam_impl='infomax' needs its trained network: call "
                "step.lib_prepare(statics) (or navigate.prepare) once per "
                "library and pass the result as aux — make_navigate_batch/"
                "make_navigate do this automatically"
            )
        mu = lag_sum / p  # [B, L]
        var = jnp.maximum(lag_sq / p - mu * mu, 0.0)
        sigma = jnp.sqrt(var + NCC_EPS)
        wx = jnp.einsum("blp,mp->blm", cand, aux.w, precision=prec)
        h = (wx - mu[:, :, None] * aux.wsum[None, None, :]) / sigma[:, :, None]
        return jnp.mean(jnp.abs(h), axis=2)

    lib_min.prepare = prepare
    return lib_min
