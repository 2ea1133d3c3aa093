"""Multi-chip parallelism (SURVEY.md §2.3, §5.7–5.8).

Domain-mapped parallelism inventory:
  - data parallel  -> agents/trials sharded over the ``data`` mesh axis
    (embarrassingly parallel; no collectives);
  - tensor-parallel analogue -> the view LIBRARY axis sharded over the
    ``lib`` mesh axis; the only real collective in the system is the
    ``lax.pmin`` of per-heading familiarity partial minima across library
    shards (rides ICI);
  - pipeline/sequence/expert parallel -> absent in this domain (the per-step
    pose feedback is inherently sequential; handled by lax.scan).

All sharding is expressed with ``jax.sharding.Mesh`` + ``shard_map``; XLA
inserts the collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from navdv_tpu.agent import (
    AgentState,
    EpisodeStatics,
    StepRecord,
    make_navigate_batch_fn,
)
from navdv_tpu.config import SimConfig
from navdv_tpu.familiarity import LibraryPack

DATA_AXIS = "data"
LIB_AXIS = "lib"


def make_mesh(n_data: int, n_lib: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_lib, (devices.size, n_data, n_lib)
    return Mesh(
        devices[: n_data * n_lib].reshape(n_data, n_lib), (DATA_AXIS, LIB_AXIS)
    )


def pad_library(lib: LibraryPack, multiple: int) -> LibraryPack:
    """Pad Nl up to a multiple with zero views marked invalid; the familiarity
    kernels add +PAD_PENALTY to invalid columns so they never win the min
    (also used for sweep shape-bucketing, SURVEY.md §7 hard-part 3)."""
    nl = lib.views.shape[0]
    rem = (-nl) % multiple
    if rem == 0:
        return lib

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((rem,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    return LibraryPack(
        views=pad(lib.views),
        flat=pad(lib.flat),
        sq=pad(lib.sq),
        z=pad(lib.z),
        valid=pad(lib.valid, 0.0),
    )


def _lib_specs() -> LibraryPack:
    return LibraryPack(
        views=P(LIB_AXIS, None, None),
        flat=P(LIB_AXIS, None),
        sq=P(LIB_AXIS),
        z=P(LIB_AXIS, None),
        valid=P(LIB_AXIS),
    )


def _statics_specs(shard_lib: bool) -> EpisodeStatics:
    lib = _lib_specs() if shard_lib else jax.tree.map(lambda _: P(), _lib_specs())
    return EpisodeStatics(
        landscape=P(None, None),
        lib=lib,
        route_a=P(None, None),
        route_ab=P(None, None),
        route_denom=P(None),
        goal=P(None),
    )


def _state_specs() -> AgentState:
    return AgentState(
        xy=P(DATA_AXIS, None), theta=P(DATA_AXIS), done=P(DATA_AXIS), status=P(DATA_AXIS)
    )


def _record_specs() -> StepRecord:
    t = P(DATA_AXIS, None)
    return StepRecord(
        xy=P(DATA_AXIS, None, None), theta=t, fam=t, k=t, dist_route=t, done=t
    )


def shard_statics(st: EpisodeStatics, mesh: Mesh, shard_lib: bool = True) -> EpisodeStatics:
    """Place statics on the mesh: library sharded over LIB_AXIS (padded to a
    multiple of its size), everything else replicated."""
    rep = NamedSharding(mesh, P())
    if shard_lib:
        lib = pad_library(st.lib, mesh.shape[LIB_AXIS])
        lib = LibraryPack(
            *(
                jax.device_put(x, NamedSharding(mesh, spec))
                for x, spec in zip(lib, _lib_specs())
            )
        )
    else:
        lib = jax.tree.map(lambda x: jax.device_put(x, rep), st.lib)
    return EpisodeStatics(
        landscape=jax.device_put(st.landscape, rep),
        lib=lib,
        route_a=jax.device_put(st.route_a, rep),
        route_ab=jax.device_put(st.route_ab, rep),
        route_denom=jax.device_put(st.route_denom, rep),
        goal=jax.device_put(st.goal, rep),
    )


def make_navigate_sharded(
    cfg: SimConfig, mesh: Mesh, fam_impl: str = "jnp", shard_lib: bool = True
):
    """Jitted batched episode over the mesh.

    Agents are sharded over DATA_AXIS (pure DP). With ``shard_lib`` the
    library is sharded over LIB_AXIS and per-shard familiarity minima are
    ``lax.pmin``-ed inside every step. Batch B must be a multiple of the
    data-axis size; statics must come from :func:`shard_statics`.

    The returned fn is ``run(states0, st, aux=None)`` with a ``run.prepare``
    mirroring :func:`navdv_tpu.agent.make_navigate_batch`: callers running
    many episodes against ONE library should call ``aux = run.prepare(st)``
    once and pass it to every episode — otherwise each sharded call rebuilds
    the pre-rolled/spectral library constants inside ``shard_map`` (~6 ms of
    HBM relayout per episode at BASELINE config 2; agent.py documents the
    unsharded figure). ``run.prepare`` is None for impls with no prepare
    stage.
    """
    lib_axis = LIB_AXIS if shard_lib and mesh.shape[LIB_AXIS] > 1 else None
    if fam_impl == "infomax" and lib_axis is not None:
        raise ValueError(
            "fam_impl='infomax' cannot shard the library axis: the Infomax "
            "network trains sequentially over ALL library views, so a "
            "per-shard prepare would silently train on a fraction of them. "
            "Use shard_lib=False (the learned memory is O(units x pixels), "
            "constant in library size — sharding it buys nothing)."
        )
    navigate_local = make_navigate_batch_fn(cfg, fam_impl=fam_impl, lib_axis=lib_axis)
    st_specs = _statics_specs(shard_lib=lib_axis is not None)
    nav_out_specs = (_state_specs(), _record_specs())
    base = jax.jit(shard_map(
        lambda states0, st: navigate_local(states0, st),
        mesh=mesh,
        in_specs=(_state_specs(), st_specs),
        out_specs=nav_out_specs,
        check_vma=False,
    ))
    lib_prepare = getattr(navigate_local, "lib_prepare", None)

    if lib_prepare is None:
        def run(states0: AgentState, st: EpisodeStatics, aux=None):
            # a ValueError, not an assert: under `python -O` an assert strips
            # and a caller-supplied aux would be silently ignored (ADVICE r4)
            if aux is not None:
                raise ValueError(
                    f"fam_impl={fam_impl!r} has no prepare stage; got aux"
                )
            return base(states0, st)

        run.prepare = None
        return run

    n_lib = mesh.shape[LIB_AXIS]

    def _aux_specs(st: EpisodeStatics):
        """PartitionSpecs for the prepared aux, inferred structurally: the
        prepare stage is a pure per-view function of the library, so an aux
        leaf axis is LIB_AXIS-sharded exactly where preparing a 1/n_lib
        library shard shrinks that axis by n_lib (and replicated where the
        local shape matches the global)."""
        as_shape = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype)
        glob_st = jax.tree.map(as_shape, st)
        glob = jax.eval_shape(lib_prepare, glob_st)
        if lib_axis is None:
            return jax.tree.map(lambda _: P(), glob)
        nl = st.lib.views.shape[0]
        if nl % n_lib:
            raise ValueError(
                f"library Nl={nl} not divisible by lib axis {n_lib}; "
                "statics must come from shard_statics (which pads)")
        lib_local = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                (x.shape[0] // n_lib,) + tuple(x.shape[1:]), x.dtype),
            glob_st.lib)
        loc = jax.eval_shape(lib_prepare, glob_st._replace(lib=lib_local))

        def spec_of(g, l):
            axes = []
            for gd, ld in zip(g.shape, l.shape):
                if gd == ld:
                    axes.append(None)
                elif gd == ld * n_lib:
                    axes.append(LIB_AXIS)
                else:
                    raise ValueError(
                        f"cannot infer lib sharding for aux leaf: global "
                        f"{g.shape} vs per-shard {l.shape} (n_lib={n_lib})")
            return P(*axes)

        return jax.tree.map(spec_of, glob, loc)

    _built = {}

    def _build(st: EpisodeStatics):
        key = tuple(
            (tuple(x.shape), str(x.dtype)) for x in jax.tree.leaves(st)
        )
        if key not in _built:
            aux_specs = _aux_specs(st)
            if lib_axis is None:
                prep = jax.jit(lib_prepare)
            else:
                prep = jax.jit(shard_map(
                    lib_prepare, mesh=mesh, in_specs=(st_specs,),
                    out_specs=aux_specs, check_vma=False,
                ))
            nav = jax.jit(shard_map(
                navigate_local, mesh=mesh,
                in_specs=(_state_specs(), st_specs, aux_specs),
                out_specs=nav_out_specs, check_vma=False,
            ))
            _built[key] = (prep, nav)
        return _built[key]

    def run(states0: AgentState, st: EpisodeStatics, aux=None):
        if aux is None:
            return base(states0, st)
        _, nav = _build(st)
        return nav(states0, st, aux)

    def prepare(st: EpisodeStatics):
        prep, _ = _build(st)
        return prep(st)

    run.prepare = prepare
    return run


def make_navigate_cells(cfg: SimConfig, mesh: Mesh, fam_impl: str = "jnp",
                        early_exit: bool = True):
    """SPMD over sweep CELLS (SURVEY.md §3.5's last clause: "distribute
    cells across chips/slices via a device mesh").

    Sweep cells are embarrassingly parallel, so the idiomatic TPU mapping is
    to make the CELL axis a sharded data axis: a stack of same-traced-program
    cells (identical sensor/scan/agent config; bucketed library shape;
    per-cell library CONTENTS and trial batches) runs as ONE program with the
    leading cell axis sharded over the mesh ``data`` axis. Each device runs
    its cells' whole episode batches and reduces them to per-cell metric
    aggregates on device — only [C]-shaped scalars ever reach the host.

    Returns ``run(states0 [C, B, ...], lib_stack [C, ...], shared, aux_stack
    =None)`` where ``shared`` is an :class:`EpisodeStatics` with ``lib=None``
    (landscape and route constants are replicated; the library is the only
    per-cell static). Output: dict of per-cell aggregates, each ``[C]`` (or
    ``[C, 4]`` for ``status_counts``). C must be a multiple of the data-axis
    size; the sweep runner pads with repeated cells and drops the padding on
    unstack.

    For impls with a library prepare stage (fft/roll spectra, infomax
    TRAINING), ``run.prepare(lib_stack, shared)`` builds the per-cell aux
    stack once — pass it to every ``run`` call, or each invocation (warmup
    AND timed) re-runs prepare inside the jitted program, which both skews
    the timing and retrains the infomax network twice per group.
    ``run.prepare`` is None when the impl has no prepare stage.

    ``mesh`` must have a size-1 ``lib`` axis: within-cell library sharding
    composes with trial sharding (make_navigate_sharded), not with cell
    sharding — a cell small enough to co-run with others on one device has
    no reason to split its library.
    """
    from navdv_tpu.metrics import episode_metrics

    if mesh.shape[LIB_AXIS] != 1:
        raise ValueError(
            f"make_navigate_cells wants a (data, lib=1) mesh; got lib axis "
            f"size {mesh.shape[LIB_AXIS]} — use make_navigate_sharded for "
            f"within-cell library sharding"
        )
    n_data = mesh.shape[DATA_AXIS]
    nav = make_navigate_batch_fn(cfg, fam_impl, early_exit=early_exit)
    lib_prepare = getattr(nav, "lib_prepare", None)

    def _one(shared, s0, lib_c, aux_c):
        st = shared._replace(lib=lib_c)
        final, rec = nav(s0, st) if aux_c is None else nav(s0, st, aux_c)
        m = episode_metrics(final, rec)
        succ = m["success"].astype(jnp.float32)
        return {
            "success_rate": jnp.mean(succ),
            "mean_steps": jnp.mean(m["n_steps"].astype(jnp.float32)),
            "mean_path_error": jnp.mean(m["mean_path_error"]),
            "max_path_error": jnp.max(m["max_path_error"]),
            "executed_steps": jnp.sum(m["n_steps"]),
            "status_counts": jnp.sum(
                final.status[:, None] == jnp.arange(4)[None, :], axis=0
            ),
        }

    def cells_fn(states0, lib_stack, shared):
        return jax.vmap(
            lambda s0, lib_c: _one(shared, s0, lib_c, None)
        )(states0, lib_stack)

    def cells_fn_aux(states0, lib_stack, shared, aux_stack):
        return jax.vmap(
            lambda s0, lib_c, aux_c: _one(shared, s0, lib_c, aux_c)
        )(states0, lib_stack, aux_stack)

    fn = jax.jit(shard_map(
        cells_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS), check_vma=False,
    ))
    fn_aux = jax.jit(shard_map(
        cells_fn_aux, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False,
    ))

    def _validate(states0, shared):
        c = states0.theta.shape[0]
        if c % n_data != 0:
            raise ValueError(
                f"cell count {c} must be a multiple of the data-axis size "
                f"{n_data} (pad by repeating cells)"
            )
        if shared.lib is not None:
            raise ValueError("shared statics must carry lib=None; the "
                             "library stack is the per-cell argument")

    def run(states0: AgentState, lib_stack: LibraryPack,
            shared: EpisodeStatics, aux_stack=None):
        _validate(states0, shared)
        if aux_stack is None:
            return fn(states0, lib_stack, shared)
        return fn_aux(states0, lib_stack, shared, aux_stack)

    if lib_prepare is None:
        run.prepare = None
    else:
        prep = jax.jit(shard_map(
            lambda lib_stack, shared: jax.vmap(
                lambda lib_c: lib_prepare(shared._replace(lib=lib_c))
            )(lib_stack),
            mesh=mesh, in_specs=(P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS), check_vma=False,
        ))

        def prepare(lib_stack: LibraryPack, shared: EpisodeStatics):
            if shared.lib is not None:
                raise ValueError("shared statics must carry lib=None; the "
                                 "library stack is the per-cell argument")
            return prep(lib_stack, shared)

        run.prepare = prepare
    return run
