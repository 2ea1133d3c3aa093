"""Infomax hyperparameter grid: open-loop heading error + closed-loop recall
over (world kind, epochs, eta, units), vs the exact jnp path on the same
worlds. Evidence for the eta=0.1/epochs=10 defaults (SEMANTICS.md §9): the
literature's single presentation at eta=0.01 is undertrained at this sensor
scale. Output: artifacts/infomax_grid.jsonl. Runs on CPU in ~3 min."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.agent import (
    STATUS_REACHED,
    init_state,
    make_navigate,
    make_statics,
    make_step_batched,
)
from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
from navdv_tpu.landscape import make_landscape
from navdv_tpu.oracle import resample_route
from navdv_tpu.routes import make_route
from navdv_tpu.training import train_library

BASE = SimConfig(
    sensor=SensorConfig(n_radial=4, n_azimuth=24, az_upsample=3, r_min=2.0, r_max=8.0),
    scan=ScanConfig(n_headings=12, scan_step_bins=2),
    agent=AgentConfig(step_size=1.0, goal_radius=2.0, corridor=15.0, max_steps=48),
    capture_spacing=1.5,
)


def world(kind):
    landscape = make_landscape(kind, size=(128, 128), seed=3, n_features=60)
    route = make_route("line", size=(128, 128), margin=32.0, length=40.0)
    return landscape, route


def openloop_heading_err(cfg, landscape, lib, route, impl):
    """Place agent exactly on each route point w/ true heading; report the
    distribution of |chosen heading - true heading| in degrees."""
    pts, headings = resample_route(route, cfg.capture_spacing)
    step = make_step_batched(cfg, fam_impl=impl)
    st = make_statics(jnp.asarray(landscape), lib, route)
    aux = None
    lp = getattr(step, "lib_prepare", None)
    if lp is not None:
        aux = lp(st)
    states = init_state(jnp.asarray(pts), jnp.asarray(headings))
    new_states, _ = step(states, st, aux) if aux is not None else step(states, st)
    # chosen heading after one step = new theta
    derr = np.degrees(
        np.abs(
            ((np.asarray(new_states.theta) - headings + np.pi) % (2 * np.pi)) - np.pi
        )
    )
    return float(np.mean(derr)), float(np.median(derr)), float(np.max(derr))


def closed_loop(cfg, landscape, lib, route, impl):
    pts, headings = resample_route(route, cfg.capture_spacing)
    nav = make_navigate(cfg, fam_impl=impl)
    st = make_statics(jnp.asarray(landscape), lib, route)
    final, _ = nav(init_state(pts[0], headings[0]), st)
    return int(final.status) == STATUS_REACHED


out = open("artifacts/infomax_grid.jsonl", "w")


def emit(line, flush=True):
    print(line, flush=flush)
    out.write(line + "\n")
    out.flush()


for kind in ["blobs", "noise"]:
    landscape, route = world(kind)
    lib = train_library(jnp.asarray(landscape), route, BASE)
    m, md, mx = openloop_heading_err(BASE, landscape, lib, route, "jnp")
    ok = closed_loop(BASE, landscape, lib, route, "jnp")
    emit(json.dumps({"kind": kind, "impl": "jnp", "herr_mean": round(m, 2),
                      "herr_med": round(md, 2), "herr_max": round(mx, 2),
                      "reached": ok}), flush=True)
    for epochs in [1, 10, 50]:
        for eta in [0.01, 0.1]:
            for units in [0, 4]:  # 0 => P units; 4 => 4P units
                scan = dataclasses.replace(
                    BASE.scan, infomax_epochs=epochs, infomax_eta=eta,
                    infomax_units=(units * BASE.sensor.n_pixels) or 0)
                cfg = dataclasses.replace(BASE, scan=scan)
                try:
                    m, md, mx = openloop_heading_err(cfg, landscape, lib, route, "infomax")
                    ok = closed_loop(cfg, landscape, lib, route, "infomax")
                    emit(json.dumps({"kind": kind, "epochs": epochs, "eta": eta,
                                      "units_mult": units or 1,
                                      "herr_mean": round(m, 2),
                                      "herr_med": round(md, 2),
                                      "herr_max": round(mx, 2),
                                      "reached": ok}), flush=True)
                except Exception as e:
                    emit(json.dumps({"kind": kind, "epochs": epochs, "eta": eta,
                                      "units_mult": units or 1,
                                      "error": str(e)[:120]}), flush=True)
