"""Checkpoint / resume (SURVEY.md §5.4): orbax for device pytrees (trained
libraries, sweep state); plain ``.npz`` for small host-side result tables.

The sweep runner (sweep.py) resumes at *cell* granularity — each completed
cell's results land on disk atomically, so a preempted TPU VM re-runs only
unfinished cells (SURVEY.md §5.3).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from navdv_tpu.familiarity import LibraryPack


def save_library(path: str, lib: LibraryPack) -> None:
    """Persist a trained view library with orbax (async-safe, atomic)."""
    _save_pack(path, lib)


def load_library(path: str) -> LibraryPack:
    return _load_pack(path, LibraryPack)


def save_results(path: str, results: dict) -> None:
    """Atomic npz write (tmp + rename) for per-cell sweep results."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, **results)
    os.replace(tmp, path)


def load_results(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def _save_pack(path: str, pack) -> None:
    ckpt = ocp.StandardCheckpointer()
    # force: overwrite semantics match save_results — without it a re-run
    # dies on "destination exists" AFTER the expensive retrain it followed
    ckpt.save(
        os.path.abspath(path),
        jax.tree.map(np.asarray, pack._asdict()),
        force=True,
    )
    ckpt.wait_until_finished()


def _load_pack(path: str, cls):
    import jax.numpy as jnp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    return cls(**{k: jnp.asarray(v) for k, v in restored.items()})


def save_infomax(path: str, pack) -> None:
    """Persist a trained Infomax network (familiarity_infomax.InfomaxPack).

    Worth checkpointing where the library itself is not: at the large-library
    scale the learned model exists for (SEMANTICS.md §9), retraining means
    re-rendering tens of thousands of views, while the pack is a few MB."""
    _save_pack(path, pack)


def load_infomax(path: str):
    from navdv_tpu.familiarity_infomax import InfomaxPack

    return _load_pack(path, InfomaxPack)
