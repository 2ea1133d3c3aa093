"""Bounded infomax noise-world mitigation attempt (VERDICT r4 item 5).

Round 4 measured the learned memory's recall as strongly world-dependent:
on the 512^2 NOISE world it reaches only ~0.27 at the AUTO budget (vs
perfect-memory ~0.94), and no training budget passed ~0.56. This script
tries the literature's standard mitigations (Lulham et al. 2009 training
rule variants; SURVEY §0.2 [LIT]) on exactly that regime, closed-loop:

  - base:          production train_infomax at the AUTO dose (the control)
  - renorm_epoch:  W rows rescaled to unit norm after every epoch
  - renorm_update: W rows rescaled to unit norm after every presentation
  - eta_linear:    eta decays linearly to 0 over the total presentations
  - eta_exp:       eta decays exponentially (x0.01 over the run)
  - shuffle:       presentation order re-shuffled every epoch
  - units x{0.25, 0.5, 2}: infomax_units != n_pixels at the AUTO dose

plus the perfect-memory jnp reference on the same trials. Model-property
measurement (recall, not throughput): runs on CPU. Two network seeds per
variant; bench trial noise (sigma = 1.5 px / 0.15 rad), B = 64.

Output: one JSON line per (variant, seed) appended to
artifacts/infomax_noise.jsonl. Verdict goes to RESULTS.md + the
ScanConfig.infomax_* knob docs (adoption or refutation).
"""

import os

# model-property measurement (recall): CPU-only. The axon sitecustomize
# registers the TPU plugin at interpreter STARTUP, so env edits here come
# too late — re-exec once with a cleaned environment (conftest.py pattern).
if os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get("JAX_PLATFORMS") != "cpu":
    import sys as _sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execvpe(_sys.executable, [_sys.executable] + _sys.argv, env)

import dataclasses
import json
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import navdv_tpu as nav
from navdv_tpu import oracle
from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
from navdv_tpu.config import baseline_config
from navdv_tpu.familiarity_infomax import InfomaxPack
from navdv_tpu.metrics import success_rate

B = 64
ROUTE_LEN = 60.0
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "infomax_noise.jsonl")


def train_variant(lib, n_units, eta, capture_spacing, seed, variant):
    """train_infomax generalized with the mitigation variants, as ONE jitted
    ``lax.scan`` over every presentation (a Python loop at this dose — ~72k
    updates of a 1152^2 network — costs ~8 min/run; the scan runs in ~1 min).
    Matches the production trainer's semantics for variant='base' (same
    init, same update rule, same AUTO dose: whole epochs in library order
    plus an evenly strided fractional epoch)."""
    z = lib.z.astype(jnp.float32)
    valid = jnp.asarray(lib.valid, jnp.float32)
    nl, p = z.shape
    target = 0.8 * p * capture_spacing * nl
    epochs = int(target // nl)
    frac_n = min(nl, int(round(target - epochs * nl)))
    if epochs == 0 and frac_n == 0:
        frac_n = 1
    total = epochs * nl + frac_n

    key = jax.random.PRNGKey(seed)
    w0 = jax.random.normal(key, (n_units, p), jnp.float32) / np.sqrt(p)
    rng = np.random.default_rng(seed + 1000)

    # presentation order [total]
    chunks = [
        rng.permutation(nl) if variant == "shuffle" else np.arange(nl)
        for _ in range(epochs)
    ]
    if frac_n > 0:
        stride = max(1, nl // frac_n)
        chunks.append(np.arange(nl)[::stride][:frac_n])
    order = np.concatenate(chunks) if chunks else np.zeros(0, np.int64)

    # per-presentation learning rate [total]
    t = np.arange(total, dtype=np.float32)
    if variant == "eta_linear":
        etas = eta * np.maximum(0.0, 1.0 - t / total)
    elif variant == "eta_exp":
        etas = eta * (0.01 ** (t / total))
    else:
        etas = np.full(total, eta, np.float32)

    # row-renormalization points [total]: every update, or each epoch end
    if variant == "renorm_update":
        flags = np.ones(total, bool)
    elif variant == "renorm_epoch":
        flags = np.zeros(total, bool)
        flags[nl - 1 :: nl] = True
    else:
        flags = np.zeros(total, bool)

    @jax.jit
    def train(w0, order, etas, flags):
        def update(w, xs):
            i, eta_t, flag = xs
            zvec = z[i]
            h = w @ zvec
            hw = h @ w
            dw = (eta_t / p) * (w - (jnp.tanh(h) + h)[:, None] * hw[None, :])
            w = w + valid[i] * dw
            norms = jnp.linalg.norm(w, axis=1, keepdims=True)
            w = jnp.where(flag, w / jnp.maximum(norms, 1e-12), w)
            return w, None

        w, _ = jax.lax.scan(
            update, w0,
            (jnp.asarray(order), jnp.asarray(etas, jnp.float32),
             jnp.asarray(flags)))
        return w

    w = train(w0, order, etas, flags)
    return InfomaxPack(w=w, wsum=jnp.sum(w, axis=1)), total


def main():
    # route shape selects the REGIME (measured, /tmp probe + this jsonl):
    # on the curved (sine) route through the same noise world the learned
    # memory already works (infomax 0.83 vs jnp 0.70); on the straight
    # (line) route it collapses (0.17 vs jnp 1.00 — the round-4 regime this
    # artifact exists to attack: a line route's training views share one
    # heading and translate through decorrelating noise, the near-duplicate
    # regime of the measured density law). Pass the route kind as argv[1].
    route_kind = sys.argv[1] if len(sys.argv) > 1 else "sine"
    cfg = baseline_config(1)
    # the AUTO dose path reads capture_spacing through the config; keep the
    # default spacing=1.0 of the round-4 world-dependence measurement
    size = 512
    landscape = jnp.asarray(nav.make_landscape(
        "noise", size=(size, size), seed=7, n_features=150))
    route_kw = {} if route_kind == "line" else {"amplitude": ROUTE_LEN / 8.0}
    route = nav.make_route(route_kind, size=(size, size), margin=60.0,
                           length=ROUTE_LEN, **route_kw)
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    starts = pts[0][None] + rng.normal(0, 1.5, (B, 2))
    thetas = headings[0] + rng.normal(0, 0.15, (B,))
    s0 = init_state(starts, thetas)
    p = cfg.sensor.n_pixels
    arc = float(np.hypot(*np.diff(route, axis=0).T).sum())

    rows = []

    def emit(row):
        row.update(world="noise-512", route=route_kind,
                   route_arc=round(arc, 1), B=B,
                   n_views=int(lib.views.shape[0]), n_pixels=p)
        rows.append(row)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    # perfect-memory reference on the same trials
    run_jnp = make_navigate_batch(cfg, fam_impl="jnp")
    final, _ = jax.block_until_ready(run_jnp(s0, st))
    emit({"variant": "jnp_reference", "recall": round(float(success_rate(final)), 4)})

    # control validity: the script's generalized trainer at variant='base'
    # must reproduce the PRODUCTION train_infomax weights
    from navdv_tpu.familiarity_infomax import train_infomax

    ref = train_infomax(lib, n_units=p, eta=cfg.scan.infomax_eta, epochs=0,
                        seed=0, capture_spacing=cfg.capture_spacing)
    got, _ = train_variant(lib, p, cfg.scan.infomax_eta, cfg.capture_spacing,
                           0, "base")
    trainer_err = float(jnp.max(jnp.abs(ref.w - got.w)))
    emit({"variant": "trainer_parity", "max_w_err": trainer_err})
    assert trainer_err < 1e-4 * float(jnp.max(jnp.abs(ref.w))), trainer_err

    run_inf = make_navigate_batch(cfg, fam_impl="infomax")

    variants = [
        ("base", {}),
        ("renorm_epoch", {}),
        ("renorm_update", {}),
        ("eta_linear", {}),
        ("eta_exp", {}),
        ("shuffle", {}),
        ("units_x0.25", {"units": p // 4}),
        ("units_x0.5", {"units": p // 2}),
        ("units_x2", {"units": 2 * p}),
    ]
    for name, kw in variants:
        # 2 seeds for the training-rule variants; 1 for the units ablation
        # (its question is the trend, and units_x2 doubles the train cost)
        for seed in ((0,) if name.startswith("units") else (0, 1)):
            units = kw.get("units", cfg.scan.infomax_units or p)
            variant_rule = name if not name.startswith("units") else "base"
            aux, total = train_variant(
                lib, units, cfg.scan.infomax_eta, cfg.capture_spacing,
                seed, variant_rule)
            final, _ = jax.block_until_ready(run_inf(s0, st, aux))
            emit({
                "variant": name, "seed": seed, "units": units,
                "eta": cfg.scan.infomax_eta, "total_updates": total,
                "recall": round(float(success_rate(final)), 4),
            })

    by_v = {}
    for r in rows:
        if "seed" in r:
            by_v.setdefault(r["variant"], []).append(r["recall"])
    print("\nsummary (mean recall over seeds):")
    for v, rs in sorted(by_v.items(), key=lambda kv: -np.mean(kv[1])):
        print(f"  {v:15s} {np.mean(rs):.3f}  ({', '.join(f'{x:.2f}' for x in rs)})")


if __name__ == "__main__":
    main()
