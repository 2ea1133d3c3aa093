"""Window-gather kernel parity: BOTH band sources (vmem-resident and DMA) at
a batch size that actually selects the vmem variant in production.

The vmem branch needs B >= VMEM_MIN_BATCH (512), so the renderer-level tests
(B <= 16) only ever exercise the DMA branch off-TPU; this pins the vmem
variant in interpret mode too (VERDICT round 2, weak item 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu.ops import window_pallas
from navdv_tpu.ops.window_pallas import make_window_gather_pallas


@pytest.fixture(scope="module")
def world_and_bases():
    rng = np.random.default_rng(3)
    h, w = 96, 384  # 36,864 cells: far under VMEM_LAND_MAX_ELEMS
    wy = wx = 24
    land = rng.uniform(size=(h, w)).astype(np.float32)
    # landscape carries >= 8 replicated bottom rows per the kernel contract
    land = np.concatenate([land, np.tile(land[-1:], (8, 1))], axis=0)
    b = 512
    base_y = rng.integers(0, h - wy, size=b).astype(np.int32)
    base_x = rng.integers(0, w - wx, size=b).astype(np.int32)
    want = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(jnp.asarray(land), (y, x), (wy, wx))
    )(jnp.asarray(base_y), jnp.asarray(base_x))
    return land, base_y, base_x, np.asarray(want), (wy, wx)


def test_vmem_branch_parity_b512(world_and_bases):
    land, base_y, base_x, want, (wy, wx) = world_and_bases
    gather = make_window_gather_pallas(wy, wx, interpret=True)
    # B=512 + small landscape -> the vmem-resident branch is selected
    assert 512 >= window_pallas.VMEM_MIN_BATCH
    assert land.size <= window_pallas.VMEM_LAND_MAX_ELEMS
    got = gather(jnp.asarray(land), jnp.asarray(base_y), jnp.asarray(base_x))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_dma_branch_parity_b512(world_and_bases, monkeypatch):
    """Same windows through the DMA band source (the big-landscape path)."""
    land, base_y, base_x, want, (wy, wx) = world_and_bases
    monkeypatch.setattr(window_pallas, "VMEM_LAND_MAX_ELEMS", 0)
    gather = make_window_gather_pallas(wy, wx, interpret=True)
    got = gather(jnp.asarray(land), jnp.asarray(base_y), jnp.asarray(base_x))
    np.testing.assert_array_equal(np.asarray(got), want)
