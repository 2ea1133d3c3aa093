"""L2 parity: matmul-decomposed SSD/NCC == oracle's direct formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from navdv_tpu import oracle
from navdv_tpu.config import ScanConfig
from navdv_tpu.familiarity import (
    distance_matrix,
    ncc_matrix,
    pack_library,
    reduce_familiarity,
    ssd_matrix,
    zscore,
)


@pytest.fixture()
def cand_lib(rng):
    cand = rng.uniform(size=(6, 96)).astype(np.float32)
    lib = rng.uniform(size=(5, 4, 24)).astype(np.float32)
    return jnp.asarray(cand), pack_library(jnp.asarray(lib))


def test_ssd_matrix_matches_oracle(cand_lib):
    cand, lib = cand_lib
    got = np.asarray(ssd_matrix(cand, lib))
    for i in range(cand.shape[0]):
        for j in range(lib.flat.shape[0]):
            want = oracle.ssd(np.asarray(cand[i], np.float64), np.asarray(lib.flat[j], np.float64))
            assert got[i, j] == pytest.approx(want, rel=1e-3, abs=1e-2)


def test_ncc_matrix_matches_oracle(cand_lib):
    cand, lib = cand_lib
    got = np.asarray(ncc_matrix(cand, lib))
    for i in range(cand.shape[0]):
        for j in range(lib.flat.shape[0]):
            want = oracle.ncc_distance(
                np.asarray(cand[i], np.float64), np.asarray(lib.flat[j], np.float64)
            )
            assert got[i, j] == pytest.approx(want, abs=1e-4)


def test_ssd_self_distance_zero(cand_lib):
    _, lib = cand_lib
    d = np.asarray(ssd_matrix(lib.flat, lib))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-2)
    assert (d >= 0).all()


def test_ncc_affine_invariance(rng):
    v = jnp.asarray(rng.uniform(size=(3, 96)).astype(np.float32))
    lib = pack_library(v.reshape(3, 4, 24))
    d = np.asarray(ncc_matrix(2.5 * v + 0.3, lib))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-4)


def test_zscore_stats(rng):
    z = np.asarray(zscore(jnp.asarray(rng.uniform(size=(4, 50)).astype(np.float32))))
    np.testing.assert_allclose(z.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(z.var(axis=1), 1.0, atol=1e-3)


def test_reduce_familiarity_ridf(rng):
    """RIDF min-pool: fam[k] = min over (tolerance window x library)."""
    scan = ScanConfig(n_headings=4, scan_step_bins=2, tol_bins=1)
    d_ext = jnp.asarray(rng.uniform(size=(4 * 3, 5)).astype(np.float32))
    fam = np.asarray(reduce_familiarity(d_ext, scan))
    want = np.asarray(d_ext).reshape(4, 3, 5).min(axis=(1, 2))
    np.testing.assert_allclose(fam, want)


def test_library_permutation_invariance(cand_lib, rng):
    """Property (SURVEY.md §4.2): familiarity is invariant to library order."""
    cand, lib = cand_lib
    scan = ScanConfig(n_headings=cand.shape[0], scan_step_bins=1, tol_bins=0)
    fam1 = np.asarray(reduce_familiarity(distance_matrix(cand, lib, "ssd"), scan))
    perm = rng.permutation(lib.views.shape[0])
    lib2 = pack_library(lib.views[perm])
    fam2 = np.asarray(reduce_familiarity(distance_matrix(cand, lib2, "ssd"), scan))
    np.testing.assert_allclose(fam1, fam2, rtol=1e-5)
