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
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), jax.tree.map(np.asarray, lib._asdict()))
    ckpt.wait_until_finished()


def load_library(path: str) -> LibraryPack:
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    import jax.numpy as jnp

    return LibraryPack(**{k: jnp.asarray(v) for k, v in restored.items()})


def save_results(path: str, results: dict) -> None:
    """Atomic npz write (tmp + rename) for per-cell sweep results."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, **results)
    os.replace(tmp, path)


def load_results(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def save_infomax(path: str, pack) -> None:
    """Persist a trained Infomax network (familiarity_infomax.InfomaxPack).

    Worth checkpointing where the library itself is not: at the large-library
    scale the learned model exists for (SEMANTICS.md §9), retraining means
    re-rendering tens of thousands of views, while the pack is a few MB."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), jax.tree.map(np.asarray, pack._asdict()))
    ckpt.wait_until_finished()


def load_infomax(path: str):
    from navdv_tpu.familiarity_infomax import InfomaxPack

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    import jax.numpy as jnp

    return InfomaxPack(**{k: jnp.asarray(v) for k, v in restored.items()})
