"""Composite-level ("merged grid") operator + cycle-zoo tests.

Covers the reference's central capability: several grids coupled in one
smoothing system (src/solver.c:255-487) and the I/E/D1/D2/D1PS/additive
drivers over it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_petsc_tpu.hierarchy import build_hierarchy
from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.composite import composite_apply, composite_rhs
from multigrid_petsc_tpu.ops.stencil import apply_stencil5
from multigrid_petsc_tpu.ops.transfer import prolong_multi, restrict_multi
from multigrid_petsc_tpu.postprocess import error_norms
from multigrid_petsc_tpu.problems import stencil_coefficients
from multigrid_petsc_tpu.solvers.solve import solve
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig


def _cfg(**kw):
    base = dict(npts=17, grids=2, levels=1, max_iter=2000)
    base.update(kw)
    return SolverConfig(**base)


def test_hierarchy_layout():
    specs = build_hierarchy(33, 4, 2)
    assert len(specs) == 2
    assert [g.g for g in specs[0].grids] == [0]
    assert [g.g for g in specs[1].grids] == [1, 2, 3]
    assert [g.ny for g in specs[1].grids] == [15, 7, 3]


def test_composite_apply_blocks():
    """Composite matvec = diag blocks + R*A_f + A_f*P couplings."""
    gids = (0, 1)
    n0, n1 = 15, 7
    st = tuple(stencil_coefficients(MeshType.UNIFORM, n, n) for n in (n0, n1))
    rng = np.random.default_rng(2)
    u = (jnp.asarray(rng.standard_normal((n0, n0))),
         jnp.asarray(rng.standard_normal((n1, n1))))

    y = composite_apply(st, gids, u)
    # Expected, assembled from the independent pieces:
    y0 = apply_stencil5(st[0], u[0]) + apply_stencil5(st[0], prolong_multi(u[1], 1))
    y1 = apply_stencil5(st[1], u[1]) + restrict_multi(apply_stencil5(st[0], u[0]), 1)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y1), rtol=1e-12)

    # A = A1 + A2 split (E-cycle path, src/solver.c:512-556).
    y_diag = composite_apply(st, gids, u, include_couplings=False)
    y_coup = composite_apply(st, gids, u, include_diag=False)
    for a, b, c in zip(y, y_diag, y_coup):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b + c), rtol=1e-12)


def test_composite_rhs():
    f0 = jnp.asarray(np.random.default_rng(3).standard_normal((15, 15)))
    b = composite_rhs(f0, (0, 1, 2))
    assert b[0].shape == (15, 15)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(restrict_multi(f0, 1)))
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(restrict_multi(f0, 2)))


def _check(res, mesh=MeshType.UNIFORM, tol=5e-3):
    assert res.converged, f"not converged: {res.iters} iters, rnorm {res.rnorm[-1]}"
    errs = error_norms(res.ctx.problem, mesh, res.u_fine)
    assert errs[0] < tol


def test_icycle():
    """I-cycle: single iteration on the merged matrix.  Intrinsically slow
    (exact block-GS on the merged system has rho ~ 0.98 because the Schur
    complement A1 - R A0 P is nearly singular) — converges, in O(1000)
    iterations on 9^2, exactly like the merged-system math predicts."""
    res = solve(_cfg(npts=9, cycle=CycleType.ICYCLE, max_iter=5000))
    _check(res, tol=2e-2)
    assert res.iters > 100  # genuinely the slow merged iteration


def test_ecycle_plateau_identity():
    """The E-cycle's own convergence metric ||b - A1 u|| plateaus at
    exactly ||R f|| / ||b|| (at the merged fixed point u1 = 0, u0 = A0^-1 f
    so the coarse diag-residual equals R f).  The reference computes the
    same norm (src/solver.c:2126-2128) and therefore plateaus identically;
    meanwhile the fine-grid iterate DOES converge to the solution."""
    import jax.numpy as jnp

    res = solve(_cfg(npts=9, cycle=CycleType.ECYCLE, max_iter=1500))
    b = res.ctx.b0
    plateau = float(
        jnp.linalg.norm(b[1])
        / jnp.sqrt(jnp.linalg.norm(b[0]) ** 2 + jnp.linalg.norm(b[1]) ** 2)
    )
    assert abs(res.rnorm[-1] - plateau) < 1e-6
    errs = error_norms(res.ctx.problem, MeshType.UNIFORM, res.u_fine)
    assert errs[0] < 2e-2  # discretization level for h=1/8
    assert np.abs(res.u[1]).max() < 1e-5  # coarse variables vanish


@pytest.mark.parametrize(
    "cycle", [CycleType.D1CYCLE, CycleType.D2CYCLE, CycleType.D1PSCYCLE]
)
def test_delayed_cycles(cycle):
    """Delayed cycles converge when the per-block smoothing is strong
    enough relative to the grid (the reference relies on ILU-strength
    sweeps; with damped Jacobi that means small grids or more sweeps)."""
    _check(solve(_cfg(npts=9, cycle=cycle, max_iter=3000)), tol=2e-2)


def test_d1_larger_grid_more_sweeps():
    _check(solve(_cfg(npts=17, cycle=CycleType.D1CYCLE, v=(10, 10),
                      max_iter=3000)), tol=5e-3)


def test_additive():
    _check(solve(_cfg(cycle=CycleType.ADDITIVE, grids=3, levels=3, max_iter=500)))


def test_additive2():
    _check(solve(_cfg(cycle=CycleType.ADDITIVE2, grids=2, levels=2, max_iter=500)))


def test_vcycle_composite_last_level():
    """V-cycle with >1 grid merged into the last level: the reference's
    grids > levels configuration."""
    _check(solve(_cfg(npts=33, grids=4, levels=2, cycle=CycleType.VCYCLE,
                      max_iter=200)), tol=2e-3)


def test_config_guards():
    with pytest.raises(ValueError):
        SolverConfig(levels=2, cycle=CycleType.D1CYCLE).validate()
    with pytest.raises(ValueError):
        SolverConfig(grids=3, levels=3, cycle=CycleType.ADDITIVE2).validate()
    with pytest.raises(ValueError):
        SolverConfig(grids=2, levels=3).validate()


def test_morenorm_monitors():
    """moreNorm: per-inner-sweep global + per-grid residual norms
    (reference C20, src/solver.c:1382-1399)."""
    res = solve(_cfg(npts=9, cycle=CycleType.D1CYCLE, max_iter=500,
                     more_norm=True))
    assert res.aux is not None
    v = res.ctx.config.v[0]
    n_inner = res.iters * (v + 1)
    assert res.aux["r_global"].shape == (n_inner,)
    assert res.aux["r_grid"].shape == (2, n_inner)
    assert res.aux["r_global"][0] == 1.0  # normalized by first entry
    assert np.all(res.aux["r_grid"][:, 0] == 1.0)
    # Monitoring must not change the iteration itself.
    plain = solve(_cfg(npts=9, cycle=CycleType.D1CYCLE, max_iter=500))
    assert plain.iters == res.iters
    np.testing.assert_allclose(plain.rnorm, res.rnorm, rtol=1e-12)
