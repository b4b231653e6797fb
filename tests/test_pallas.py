"""Pallas kernel correctness tests (interpreter mode on CPU).

The compiled path is exercised on real TPU hardware by bench.py and the
driver's entry compile check; here the interpreter validates the kernel
logic bit-for-bit against the jnp reference ops, including ragged last
blocks and boundary (phantom-row) handling.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    apply_stencil5_pallas,
    jacobi_sweeps_pallas,
)
from multigrid_petsc_tpu.ops.stencil import apply_stencil5, jacobi_sweeps
from multigrid_petsc_tpu.problems import stencil_coefficients

CASES = [(63, 63), (100, 63), (127, 31), (257, 129)]


@pytest.mark.parametrize("shape", CASES)
def test_apply_matches(shape):
    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM2, ny, nx)
    rng = np.random.default_rng(ny)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = apply_stencil5(st, u)
    got = apply_stencil5_pallas(st, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("shape", CASES)
@pytest.mark.parametrize("sweeps", [1, 3, 5])
def test_fused_jacobi_matches(shape, sweeps):
    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM1, ny, nx)
    rng = np.random.default_rng(nx + sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = jacobi_sweeps(st, b, u, sweeps, 0.8)
    got = jacobi_sweeps_pallas(st, b, u, sweeps, 0.8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


def test_too_small_raises():
    st = stencil_coefficients(MeshType.UNIFORM, 7, 7)
    u = jnp.zeros((7, 7))
    with pytest.raises(ValueError):
        jacobi_sweeps_pallas(st, u, u, 3, 0.8, interpret=True)


@pytest.mark.parametrize("shape", [(63, 63), (100, 63)])
@pytest.mark.parametrize("sweeps", [1, 4])
def test_fused_chebyshev_matches(shape, sweeps):
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        chebyshev_sweeps_pallas,
    )
    from multigrid_petsc_tpu.solvers.smoothers import chebyshev

    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM2, ny, nx)
    rng = np.random.default_rng(ny + sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    lmax = 1.9
    dinv = (1.0 / st.cc,)
    ref = chebyshev(
        lambda s: (None,) and ( __import__("multigrid_petsc_tpu.ops.stencil", fromlist=["apply_stencil5"]).apply_stencil5(st, s[0]),),
        dinv, (b,), (u,), sweeps, lmax,
    )[0]
    got = chebyshev_sweeps_pallas(st, b, u, sweeps, lmax, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
