"""Transfer-operator tests: stencil weights, adjointness, composition.

Oracles: the reference's stencil constructors (src/matbuild.c:398-431) and
composition algebra (src/matbuild.c:355-396), plus linear-algebra
properties (P = 4 R^T for full-weighting/bilinear).
"""

import numpy as np
import jax.numpy as jnp

from multigrid_petsc_tpu.ops.transfer import (
    PROLONG_3x3,
    RESTRICT_3x3,
    composed_transfer_stencil,
    prolong_bilinear,
    prolong_multi,
    prolong_with_stencil,
    restrict_fw,
    restrict_multi,
    restrict_with_stencil,
)


def test_base_stencil_weights():
    expect = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=float)
    np.testing.assert_allclose(RESTRICT_3x3, expect / 16)
    np.testing.assert_allclose(PROLONG_3x3, expect / 4)


def _restrict_matrix(nf):
    """Dense matrix of restrict_fw acting on (nf, nf) -> (nc, nc)."""
    nc = (nf - 1) // 2
    cols = []
    for k in range(nf * nf):
        e = jnp.zeros(nf * nf).at[k].set(1.0).reshape(nf, nf)
        cols.append(np.asarray(restrict_fw(e)).ravel())
    return np.stack(cols, axis=1)  # (nc*nc, nf*nf)


def _prolong_matrix(nc):
    nf = 2 * nc + 1
    cols = []
    for k in range(nc * nc):
        e = jnp.zeros(nc * nc).at[k].set(1.0).reshape(nc, nc)
        cols.append(np.asarray(prolong_bilinear(e)).ravel())
    return np.stack(cols, axis=1)  # (nf*nf, nc*nc)


def test_prolong_is_4_restrict_transpose():
    R = _restrict_matrix(7)
    P = _prolong_matrix(3)
    np.testing.assert_allclose(P, 4.0 * R.T, atol=1e-14)


def test_restrict_constant_away_from_boundary():
    # Full weighting preserves constants in the interior (weights sum to 1).
    r = jnp.ones((15, 15))
    rc = np.asarray(restrict_fw(r))
    np.testing.assert_allclose(rc[1:-1, 1:-1], 1.0, atol=1e-14)


def test_prolong_exact_on_bilinear_functions():
    # Bilinear prolongation reproduces linear functions away from the
    # Dirichlet rim.
    nc = 7
    xc = np.arange(1, nc + 1) / (nc + 1)
    e = jnp.asarray(np.add.outer(2 * xc, 3 * xc))
    ef = np.asarray(prolong_bilinear(e))
    nf = 2 * nc + 1
    xf = np.arange(1, nf + 1) / (nf + 1)
    expect = np.add.outer(2 * xf, 3 * xf)
    np.testing.assert_allclose(ef[1:-1, 1:-1], expect[1:-1, 1:-1], atol=1e-13)


def test_composed_stencil_sizes():
    # Sizes 3, 7, 15 (src/matbuild.c:336-340).
    assert composed_transfer_stencil(RESTRICT_3x3, 1).shape == (3, 3)
    assert composed_transfer_stencil(RESTRICT_3x3, 2).shape == (7, 7)
    assert composed_transfer_stencil(RESTRICT_3x3, 3).shape == (15, 15)


def test_repeated_restrict_equals_composed_stencil():
    rng = np.random.default_rng(0)
    for gap in (1, 2, 3):
        nf = 2 ** (gap + 3) - 1  # fine size supporting `gap` coarsenings
        r = jnp.asarray(rng.standard_normal((nf, nf)))
        via_repeat = np.asarray(restrict_multi(r, gap))
        st = composed_transfer_stencil(RESTRICT_3x3, gap)
        via_conv = np.asarray(restrict_with_stencil(r, st, 2**gap))
        np.testing.assert_allclose(via_repeat, via_conv, atol=1e-12)


def test_repeated_prolong_equals_composed_stencil():
    rng = np.random.default_rng(1)
    for gap in (1, 2, 3):
        nc = 3
        e = jnp.asarray(rng.standard_normal((nc, nc)))
        via_repeat = np.asarray(prolong_multi(e, gap))
        st = composed_transfer_stencil(PROLONG_3x3, gap)
        via_conv = np.asarray(prolong_with_stencil(e, st, 2**gap))
        np.testing.assert_allclose(via_repeat, via_conv, atol=1e-12)


def test_restrict_shapes():
    assert restrict_fw(jnp.zeros((15, 15))).shape == (7, 7)
    assert restrict_fw(jnp.zeros((7, 15))).shape == (3, 7)
    assert prolong_bilinear(jnp.zeros((7, 7))).shape == (15, 15)
    assert prolong_bilinear(jnp.zeros((3, 7))).shape == (7, 15)
