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


def auto_epochs(
    n_views: int, n_pixels: int, capture_spacing: float | None = None
) -> int:
    """Epochs for ``infomax_epochs=0``: ~0.8*P total updates per arc-PIXEL
    of route, i.e. ``epochs = ceil(0.8 * P * capture_spacing)``.

    The dose-response is an onset knee -> plateau -> overtraining decline
    (Infomax converges toward whitening, which eventually erodes rotational
    discrimination), and the measured optimum is invariant NOT in total
    updates but in updates per unit of unique route content (~arc pixels):
    at eta=0.1 the peak sits at 0.78-1.0 * P updates/arc-px on every
    measured workload — config-1 world (arc 51 px): plateau 40-100*P total;
    biglib 1000-view dense cell (arc 26 px): sharp peak at 20*P total, 0.99
    -> 0.15 by 40*P; 128^2 noise world (arc 40 px): peak at 40*P total. The
    same rule fits dense and strided training on one workload (both 0.99 at
    20*P on the biglib cell), so epochs scale with SPACING: denser capture
    of the same route gets proportionally fewer epochs, and the total dose
    ~0.8*P*arc is density- and shape-pad-invariant by construction.

    Returned epochs are ROUNDED to the nearest integer; at extreme density
    (ideal epochs near 1, e.g. >=64k views on a 160-px arc) even rounding
    quantizes the dose by up to ~50% into the measured collapse region —
    :func:`train_infomax`'s ``epochs=0`` path avoids that entirely by
    training a fractional final epoch on an evenly strided subset, hitting
    the target dose exactly. Prefer ``epochs=0`` over calling this helper.

    ``capture_spacing=None`` falls back to 40*P total updates — the plateau
    measured at ~1 px capture. Callers without route information on a much
    DENSER library should derive a dose themselves: no constant-in-Nl
    epoch count is safe across densities (0.99 -> 0.15 on the biglib dense
    cell between 20*P and 40*P total)."""
    if capture_spacing is not None:
        return max(1, round(0.8 * n_pixels * capture_spacing))
    return max(1, -(-40 * n_pixels // max(1, n_views)))


def train_infomax(
    lib: LibraryPack,
    n_units: int,
    eta: float,
    epochs: int,
    seed: int,
    capture_spacing: float | None = None,
) -> InfomaxPack:
    """Train W on the library's z-scored views (jittable; lax.scan over the
    inherently sequential per-view updates). Padded views (valid=0) are
    presented with a zero-masked update, so bucketed/sharded-shape libraries
    train identically to unpadded ones.

    ``epochs=0`` = AUTO: with ``capture_spacing``, the target dose
    ``0.8 * P * spacing * Nl`` updates is hit EXACTLY — whole epochs via
    scan plus one fractional epoch over an evenly strided subset of the
    views (integer epochs would quantize the dose up to ~2x at extreme
    density, landing in the measured overtraining-collapse region);
    without spacing, :func:`auto_epochs`'s 40*P fallback."""
    z = lib.z.astype(jnp.float32)  # [Nl, P]
    p = z.shape[1]
    nl = z.shape[0]
    frac_n = 0
    if epochs == 0:
        if capture_spacing is not None:
            target = 0.8 * p * capture_spacing * nl  # updates
            epochs = int(target // nl)
            frac_n = min(nl, int(round(target - epochs * nl)))
            if epochs == 0 and frac_n == 0:
                frac_n = 1
        else:
            epochs = auto_epochs(nl, p, None)
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

    w = w0
    if epochs > 0:
        w, _ = jax.lax.scan(epoch, w, None, length=epochs)
    if frac_n > 0:
        # fractional epoch: evenly strided subset spans the whole route
        # instead of biasing the extra dose toward its start
        step = max(1, nl // frac_n)
        zs, vs = z[::step][:frac_n], lib.valid[::step][:frac_n]
        w, _ = jax.lax.scan(update, w, (zs, vs))
    return InfomaxPack(w=w, wsum=jnp.sum(w, axis=1))


def make_lib_min_infomax(sensor_cfg, scan_cfg, capture_spacing=None):
    """Scorer with the extraction-path lib_min signature
    ``(cand f32[B,L,P], lib, lag_sum f32[B,L], lag_sq f32[B,L], aux) ->
    novelty f32[B,L]`` plus a ``.prepare(lib) -> InfomaxPack`` stage.

    ``capture_spacing`` feeds the AUTO training budget (auto_epochs's
    updates-per-arc-pixel rule) when ``infomax_epochs=0``."""
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
            capture_spacing=capture_spacing,
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
