"""Unit tests for mesh, problem and stencil coefficients.

Oracle values are closed forms from the reference's formulas
(src/problem.c:3-22, src/mesh.c:29-107) evaluated independently here —
SURVEY.md section 4 unit-test tier.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_petsc_tpu.mesh import MeshType, physical_coords, make_mesh
from multigrid_petsc_tpu.problems import (
    poisson_sin_problem,
    rhs_grid,
    exact_grid,
    stencil_coefficients,
)
from multigrid_petsc_tpu.ops.stencil import apply_stencil5


def test_uniform_coords():
    xs = np.asarray(physical_coords(MeshType.UNIFORM, 17, 0))
    assert xs[0] == 0.0 and xs[-1] == 1.0
    np.testing.assert_allclose(np.diff(xs), 1.0 / 16, rtol=1e-14)


def test_nonuniform1_coords():
    # y_j = 1 - cos(pi/2 * j/(n-1)) (src/mesh.c:165 with [0,1] bounds)
    n = 9
    ys = np.asarray(physical_coords(MeshType.NONUNIFORM1, n, 1))
    expect = 1.0 - np.cos(np.pi * 0.5 * np.arange(n) / (n - 1))
    np.testing.assert_allclose(ys, expect, atol=1e-14)


def test_nonuniform2_coords():
    n = 9
    ys = np.asarray(physical_coords(MeshType.NONUNIFORM2, n, 1))
    xi = np.arange(n) / (n - 1)
    expect = (np.exp(2 * xi) - 1.0) / (math.exp(2.0) - 1.0)
    np.testing.assert_allclose(ys, expect, atol=1e-14)


def test_uniform_stencil_is_standard_5point():
    # Uniform metrics: A = [1/h^2, 1/h^2, -4/h^2, 1/h^2, 1/h^2].
    n = 15
    h = 1.0 / (n + 1)
    st = stencil_coefficients(MeshType.UNIFORM, n, n)
    for c, expect in [
        (st.cs, 1 / h**2),
        (st.cw, 1 / h**2),
        (st.cc, -4 / h**2),
        (st.ce, 1 / h**2),
        (st.cn, 1 / h**2),
    ]:
        np.testing.assert_allclose(np.asarray(c), expect, rtol=1e-13)


@pytest.mark.parametrize("mesh_type", [MeshType.NONUNIFORM1, MeshType.NONUNIFORM2])
def test_stretched_stencil_truncation_error(mesh_type):
    """A u_exact ~ f with O(h^2)-ish truncation error: validates the
    metric-coefficient discretization end to end.

    NONUNIFORM1's mapping y = 1 - cos(pi xi/2) has dy/dxi = 0 at y = 0
    (src/mesh.c:165), so its metrics blow up at that edge and truncation
    is not uniformly 2nd order there; measure on the smooth subregion
    y > 0.25 (the solver still converges globally — see test_vcycle).
    """
    errs = []
    for n in (31, 63):
        st = stencil_coefficients(mesh_type, n, n)
        u = exact_grid(poisson_sin_problem(), mesh_type, n, n)
        f = rhs_grid(poisson_sin_problem(), mesh_type, n, n)
        r = np.asarray(apply_stencil5(st, u) - f)
        # Exclude a one-cell rim (eliminated-boundary rows omit the
        # zero-valued boundary terms of u_exact) and, for the singular
        # cosine mapping, the region near y = 0.
        from multigrid_petsc_tpu.mesh import physical_coords
        y = np.asarray(physical_coords(mesh_type, n + 2, 1))[1:-1]
        rows = (y > 0.25) if mesh_type == MeshType.NONUNIFORM1 else slice(1, -1)
        errs.append(np.max(np.abs(r[rows, 1:-1][1:-1] if mesh_type == MeshType.NONUNIFORM1 else r[1:-1, 1:-1])))
    # 2nd-order interior truncation: error ratio ~ 4 when h halves.
    assert errs[1] < errs[0] / 2.5


def test_rhs_and_exact_values():
    prob = poisson_sin_problem()
    n = 7
    f = np.asarray(rhs_grid(prob, MeshType.UNIFORM, n, n))
    u = np.asarray(exact_grid(prob, MeshType.UNIFORM, n, n))
    x = (np.arange(1, n + 1)) / (n + 1)
    expect_u = np.outer(np.sin(np.pi * x), np.sin(np.pi * x))
    np.testing.assert_allclose(u, expect_u, atol=1e-14)
    np.testing.assert_allclose(f, -2 * np.pi**2 * expect_u, atol=1e-11)


def test_mesh_max_spacing():
    m = make_mesh(MeshType.UNIFORM, 17)
    assert abs(m.max_spacing - math.sqrt(2) / 16) < 1e-14
