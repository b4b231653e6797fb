"""Explicit sparse backend vs matrix-free: strong differential tests.

The native C++ CSR assembly (native/csr_assemble.cpp) and the matrix-free
composite apply were written independently from the same spec (the
reference's assembly semantics) — agreement on random vectors is a real
cross-implementation check (SURVEY.md section 4 item 3 style).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.composite import composite_apply
from multigrid_petsc_tpu.ops.sparse import SparseLevelOp
from multigrid_petsc_tpu.problems import stencil_coefficients


def _random_state(shapes, seed):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal(s)) for s in shapes)


@pytest.mark.parametrize("mesh_type", [0, 1, 2])
@pytest.mark.parametrize("gids", [(0,), (1,)])
def test_sparse_matches_matrix_free_single_grid(mesh_type, gids):
    npts = 17
    op = SparseLevelOp(npts, mesh_type, gids)
    st = tuple(
        stencil_coefficients(MeshType(mesh_type), ny, nx)
        for (ny, nx) in op.shapes
    )
    u = _random_state(op.shapes, 1)
    ref = composite_apply(st, gids, u)
    got = op.apply(u)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("mesh_type", [0, 2])
@pytest.mark.parametrize("gids", [(0, 1), (0, 1, 2), (1, 3)])
def test_sparse_matches_matrix_free_composite(mesh_type, gids):
    npts = 33
    op = SparseLevelOp(npts, mesh_type, gids)
    st = tuple(
        stencil_coefficients(MeshType(mesh_type), ny, nx)
        for (ny, nx) in op.shapes
    )
    u = _random_state(op.shapes, 2)
    ref = composite_apply(st, gids, u)
    got = op.apply(u)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-8)


def test_sparse_diag_coupling_split():
    gids = (0, 1)
    npts = 17
    full = SparseLevelOp(npts, 0, gids)
    diag = SparseLevelOp(npts, 0, gids, include_couplings=False)
    coup = SparseLevelOp(npts, 0, gids, include_diag=False)
    u = _random_state(full.shapes, 3)
    yf = full.apply(u)
    yd = diag.apply(u)
    yc = coup.apply(u)
    for f, d, c in zip(yf, yd, yc):
        np.testing.assert_allclose(np.asarray(f), np.asarray(d + c), rtol=1e-12)


def test_nnz_counts():
    """5-point interior rows have 5 entries; corners 3 (Dirichlet
    elimination, reference src/solver.c:239-251)."""
    op = SparseLevelOp(17, 0, (0,))
    n = 15
    assert op.nnz == 5 * n * n - 4 * n  # 2n boundary rows lose 1, each edge
