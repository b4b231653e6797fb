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


# ---------------------------------------------------------------------------
# Fused V-cycle level visits (correct -> smooth -> residual -> restrict).
# ---------------------------------------------------------------------------

from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (  # noqa: E402
    fused_level_visit_pallas,
    jacobi_step_coeffs,
    residual5_pallas,
)
from multigrid_petsc_tpu.ops.stencil import residual  # noqa: E402
from multigrid_petsc_tpu.ops.transfer import (  # noqa: E402
    prolong_bilinear,
    restrict_fw,
)


@pytest.mark.parametrize("shape", CASES)
def test_residual_fused_matches(shape):
    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM1, ny, nx)
    rng = np.random.default_rng(ny + nx)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = residual(st, b, u)
    got = residual5_pallas(st, b, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("shape", [(63, 63), (127, 63), (257, 129)])
@pytest.mark.parametrize("sweeps", [1, 3])
def test_visit_down_matches(shape, sweeps):
    """emit='rc': smoothed u AND restrict_fw(b - A u) in one kernel."""
    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM2, ny, nx)
    rng = np.random.default_rng(ny + sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    steps = jacobi_step_coeffs(sweeps, 0.8)
    u_ref = jacobi_sweeps(st, b, u, sweeps, 0.8)
    rc_ref = restrict_fw(residual(st, b, u_ref))
    u_got, rc_got = fused_level_visit_pallas(st, b, u, steps, emit="rc",
                                             interpret=True)
    # Last-bit reassociation (omega*(x/cc) vs (omega/cc)*x) scales with the
    # O(n^2) stencil magnitude; compare relative to the array scale.
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)
    np.testing.assert_allclose(np.asarray(rc_got), np.asarray(rc_ref),
                               rtol=1e-12,
                               atol=1e-12 * float(np.abs(rc_ref).max()))


@pytest.mark.parametrize("shape", [(63, 63), (127, 63), (257, 129)])
@pytest.mark.parametrize("sweeps", [1, 3])
@pytest.mark.parametrize("emit_r", [False, True])
def test_visit_up_matches(shape, sweeps, emit_r):
    """Correction input: u + P e fused before the sweeps (and optionally
    the post-smooth residual out)."""
    ny, nx = shape
    st = stencil_coefficients(MeshType.UNIFORM, ny, nx)
    rng = np.random.default_rng(nx + sweeps + emit_r)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    e = jnp.asarray(rng.standard_normal(((ny - 1) // 2, (nx - 1) // 2)))
    steps = jacobi_step_coeffs(sweeps, 0.8)
    u_corr = u + prolong_bilinear(e)
    u_ref = jacobi_sweeps(st, b, u_corr, sweeps, 0.8)
    out = fused_level_visit_pallas(
        st, b, u, steps, emit="ur" if emit_r else "u", e_coarse=e,
        interpret=True,
    )
    if emit_r:
        u_got, r_got = out
        r_ref = residual(st, b, u_ref)
        np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                                   rtol=1e-12,
                                   atol=1e-12 * float(np.abs(r_ref).max()))
    else:
        u_got = out
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)


@pytest.mark.parametrize("sweeps", [2, 4])
def test_visit_chebyshev_matches(sweeps):
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        chebyshev_step_coeffs,
    )
    from multigrid_petsc_tpu.ops.stencil import apply_stencil5
    from multigrid_petsc_tpu.solvers.smoothers import chebyshev

    ny, nx = 127, 63
    st = stencil_coefficients(MeshType.NONUNIFORM1, ny, nx)
    rng = np.random.default_rng(sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    e = jnp.asarray(rng.standard_normal(((ny - 1) // 2, (nx - 1) // 2)))
    lmax = 1.9
    steps = chebyshev_step_coeffs(sweeps, lmax)
    u_corr = u + prolong_bilinear(e)
    u_ref = chebyshev(lambda s: (apply_stencil5(st, s[0]),), (1.0 / st.cc,),
                      (b,), (u_corr,), sweeps, lmax)[0]
    rc_ref = restrict_fw(residual(st, b, u_ref))
    u_got, rc_got = fused_level_visit_pallas(st, b, u, steps, emit="rc",
                                             e_coarse=e, interpret=True)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)
    np.testing.assert_allclose(np.asarray(rc_got), np.asarray(rc_ref),
                               rtol=1e-12,
                               atol=1e-12 * float(np.abs(rc_ref).max()))


# ---------------------------------------------------------------------------
# 9-point kernels (anisotropic family; ops/pallas/stencil9_kernel.py).
# ---------------------------------------------------------------------------


def _aniso_st9(ny, nx):
    from multigrid_petsc_tpu.problems import AnisoProblem, stencil9_coefficients

    return stencil9_coefficients(AnisoProblem(1.0, 0.5, 100.0), ny, nx)


def _rand_st9(ny, nx, seed):
    """Fully-variable 9-point stencil: all coefficients (ny, nx) fields,
    diagonally-dominant center (invertible for the smoother)."""
    from multigrid_petsc_tpu.ops.stencil import Stencil9

    rng = np.random.default_rng(seed)
    offs = [jnp.asarray(rng.standard_normal((ny, nx))) for _ in range(8)]
    cc = -(8.0 + jnp.asarray(rng.random((ny, nx))) * 4.0)
    c = iter(offs)
    return Stencil9(csw=next(c), cs=next(c), cse=next(c), cw=next(c),
                    cc=cc, ce=next(c), cnw=next(c), cn=next(c), cne=next(c))


def _ref_smooth9(st, b, u, steps):
    from multigrid_petsc_tpu.ops.stencil import apply_stencil9

    dinv = 1.0 / jnp.broadcast_to(st.cc, u.shape)
    p = jnp.zeros_like(u)
    for (alpha, beta) in steps:
        z = dinv * (b - apply_stencil9(st, u))
        p = beta * p + alpha * z
        u = u + p
    return u


@pytest.mark.parametrize("shape", [(63, 63), (100, 63), (127, 31)])
@pytest.mark.parametrize("make_st", [_aniso_st9, _rand_st9])
def test_apply9_matches(shape, make_st):
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        apply_stencil9_pallas,
    )
    from multigrid_petsc_tpu.ops.stencil import apply_stencil9

    ny, nx = shape
    st = make_st(ny, nx) if make_st is _aniso_st9 else make_st(ny, nx, ny)
    rng = np.random.default_rng(ny + nx)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = apply_stencil9(st, u)
    got = apply_stencil9_pallas(st, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("shape", [(63, 63), (100, 63)])
def test_residual9_matches(shape):
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import residual9_pallas
    from multigrid_petsc_tpu.ops.stencil import apply_stencil9

    ny, nx = shape
    st = _aniso_st9(ny, nx)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = b - apply_stencil9(st, u)
    got = residual9_pallas(st, b, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("shape", [(63, 63), (100, 63), (127, 31)])
@pytest.mark.parametrize("sweeps", [1, 3])
@pytest.mark.parametrize("kind", ["jacobi", "chebyshev"])
def test_smooth9_matches(shape, sweeps, kind):
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        smooth9_sweeps_pallas,
    )
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        chebyshev_step_coeffs,
        jacobi_step_coeffs,
    )

    ny, nx = shape
    st = _aniso_st9(ny, nx) if kind == "jacobi" else _rand_st9(ny, nx, 3)
    steps = (jacobi_step_coeffs(sweeps, 0.8) if kind == "jacobi"
             else chebyshev_step_coeffs(sweeps, 1.9))
    rng = np.random.default_rng(ny + sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    ref = _ref_smooth9(st, b, u, steps)
    got = smooth9_sweeps_pallas(st, b, u, steps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_smooth9_too_small_raises():
    st = _aniso_st9(7, 7)
    u = jnp.zeros((7, 7))
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        smooth9_sweeps_pallas,
    )

    with pytest.raises(ValueError):
        smooth9_sweeps_pallas(st, u, u, ((0.8, 0.0),) * 3, interpret=True)


@pytest.mark.parametrize("shape", [(63, 63), (127, 63), (257, 129)])
@pytest.mark.parametrize("sweeps", [1, 3])
def test_visit_down_zero_guess_matches(shape, sweeps):
    """u=None: the zero-initial-guess down visit (no u input at all) must
    equal the explicit-zeros visit bit-for-bit."""
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        fused_level_visit_pallas,
        jacobi_step_coeffs,
    )

    ny, nx = shape
    st = stencil_coefficients(MeshType.NONUNIFORM2, ny, nx)
    rng = np.random.default_rng(ny + sweeps)
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    steps = jacobi_step_coeffs(sweeps, 0.8)
    u0 = jnp.zeros((ny, nx), b.dtype)
    u_ref, rc_ref = fused_level_visit_pallas(st, b, u0, steps, emit="rc",
                                             interpret=True)
    u_got, rc_got = fused_level_visit_pallas(st, b, None, steps, emit="rc",
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(u_got), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(rc_got), np.asarray(rc_ref))


def test_cg_papply_matches():
    """(p', A p', <p', A p'>) fused CG direction step vs jnp composition."""
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        cg_papply_pallas,
    )
    from multigrid_petsc_tpu.ops.stencil import apply_stencil5

    ny, nx = 127, 63
    st = stencil_coefficients(MeshType.NONUNIFORM1, ny, nx)
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((ny, nx)))
    p = jnp.asarray(rng.standard_normal((ny, nx)))
    for beta in (0.0, 0.37):
        pn_ref = z + beta * p
        ap_ref = apply_stencil5(st, pn_ref)
        dot_ref = float(jnp.vdot(pn_ref.ravel(), ap_ref.ravel()))
        pn, ap, dot = cg_papply_pallas(st, z, p, beta, interpret=True)
        np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_ref),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref),
                                   rtol=1e-12, atol=1e-10)
        assert abs(float(dot) - dot_ref) <= 1e-9 * abs(dot_ref)


def test_visit_up_emit_dot_matches():
    """emit_dot: the up-visit's <b, u''> equals the separate inner product."""
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        fused_level_visit_pallas,
        jacobi_step_coeffs,
    )

    ny, nx = 127, 63
    st = stencil_coefficients(MeshType.UNIFORM, ny, nx)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    e = jnp.asarray(rng.standard_normal(((ny - 1) // 2, (nx - 1) // 2)))
    steps = jacobi_step_coeffs(3, 0.8)
    # Fresh copies per call: the visit kernels DONATE u (io-aliasing).
    u_ref = fused_level_visit_pallas(st, b, jnp.array(u, copy=True), steps,
                                     emit="u", e_coarse=e, interpret=True)
    u_got, dot = fused_level_visit_pallas(st, b, jnp.array(u, copy=True),
                                          steps, emit="u", e_coarse=e,
                                          emit_dot=True, interpret=True)
    # The extra in-kernel reduction may reassociate the last bit of the
    # u computation under the interpreter — compare to f64 roundoff.
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-13, atol=1e-14)
    dot_ref = float(jnp.vdot(b.ravel(), u_ref.ravel()))
    assert abs(float(dot) - dot_ref) <= 1e-9 * abs(dot_ref)


def test_mgcg_fused_path_matches_generic():
    """The fused-CG fast path (papply + visit_up_dot wired onto a CPU
    context via interpret-mode kernels) reproduces the generic PCG
    iterate-for-iterate to f32 roundoff."""
    import functools

    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        cg_papply_pallas,
        cg_visit_down_pallas,
        fused_level_visit_pallas,
        jacobi_step_coeffs,
    )
    from multigrid_petsc_tpu.solvers.context import build_context
    from multigrid_petsc_tpu.solvers.krylov import solve_mgcg
    from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

    cfg = SolverConfig(npts=129, grids=4, levels=4, cycle=CycleType.MGCG,
                       dtype="float64", rtol=1e-8)
    ctx = build_context(cfg)
    ref = solve_mgcg(ctx)
    assert ctx.levels[0].papply is None  # CPU: generic path ran

    st0 = ctx.levels[0].stencils[0]
    steps_fn = lambda s: jacobi_step_coeffs(s, cfg.omega)

    def visit_down(b, u, sweeps):
        u0, rc1 = fused_level_visit_pallas(
            st0, b[0], None if u is None else u[0], steps_fn(sweeps),
            emit="rc", interpret=True)
        return (u0,), rc1

    def visit_up_dot(b, u, e_c, sweeps):
        z, dot = fused_level_visit_pallas(
            st0, b[0], u[0], steps_fn(sweeps), emit="u", e_coarse=e_c,
            emit_dot=True, interpret=True)
        return (z,), dot

    def cg_visit_down(r, ap, alpha, sweeps):
        return cg_visit_down_pallas(st0, r, ap, alpha, steps_fn(sweeps),
                                    interpret=True)

    ctx.levels[0].visit_down = visit_down
    ctx.levels[0].visit_up_dot = visit_up_dot
    ctx.levels[0].papply = functools.partial(
        cg_papply_pallas, st0, interpret=True)
    ctx.levels[0].cg_visit_down = cg_visit_down
    got = solve_mgcg(ctx)

    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.u[0]), np.asarray(ref.u[0]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.rnorm_history),
                               np.asarray(ref.rnorm_history),
                               rtol=1e-8, atol=1e-12)


def test_mgcg_fused_guard_one_level():
    """A 1-level MGCG config with the fused kernels attached must stay on
    the generic PCG loop: mg_apply_cgdown indexes ctx.levels[1], so the
    fast-path guard requires a coarse level (ADVICE r3 regression)."""
    import functools

    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        cg_papply_pallas,
        cg_visit_down_pallas,
        jacobi_step_coeffs,
    )
    from multigrid_petsc_tpu.solvers.context import build_context
    from multigrid_petsc_tpu.solvers.krylov import solve_mgcg
    from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

    cfg = SolverConfig(npts=65, grids=1, levels=1, cycle=CycleType.MGCG,
                       dtype="float64", rtol=1e-8, max_iter=200)
    ctx = build_context(cfg)
    st0 = ctx.levels[0].stencils[0]
    steps_fn = lambda s: jacobi_step_coeffs(s, cfg.omega)
    # Wire the fused kernels exactly as _build_visits would on a
    # Pallas-eligible TPU grid; the guard must ignore them at 1 level.
    ctx.levels[0].papply = functools.partial(
        cg_papply_pallas, st0, interpret=True)
    ctx.levels[0].cg_visit_down = (
        lambda r, ap, alpha, sweeps: cg_visit_down_pallas(
            st0, r, ap, alpha, steps_fn(sweeps), interpret=True))
    res = solve_mgcg(ctx)  # would IndexError at trace time before the fix
    assert bool(res.converged)


# ---------------------------------------------------------------------------
# Fused 9-point level visits (stencil9_kernel.fused_level_visit9_pallas).
# ---------------------------------------------------------------------------


def _residual9(st, b, u):
    from multigrid_petsc_tpu.ops.stencil import apply_stencil9

    return b - apply_stencil9(st, u)


@pytest.mark.parametrize("shape", [(63, 63), (127, 63), (257, 129)])
@pytest.mark.parametrize("sweeps", [1, 3])
@pytest.mark.parametrize("zero_guess", [False, True])
def test_visit_down9_matches(shape, sweeps, zero_guess):
    """9-pt emit='rc': smoothed u AND restrict_fw(b - A u) in one kernel
    (incl. the zero-guess variant used by preconditioner visits)."""
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        fused_level_visit9_pallas,
    )

    ny, nx = shape
    st = _aniso_st9(ny, nx)
    rng = np.random.default_rng(ny + sweeps)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    steps = jacobi_step_coeffs(sweeps, 0.8)
    u_ref = _ref_smooth9(st, b, jnp.zeros_like(u) if zero_guess else u,
                         steps)
    rc_ref = restrict_fw(_residual9(st, b, u_ref))
    u_got, rc_got = fused_level_visit9_pallas(
        st, b, None if zero_guess else u, steps, emit="rc", interpret=True)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)
    np.testing.assert_allclose(np.asarray(rc_got), np.asarray(rc_ref),
                               rtol=1e-12,
                               atol=1e-12 * float(np.abs(rc_ref).max()))


@pytest.mark.parametrize("shape", [(63, 63), (257, 129)])
@pytest.mark.parametrize("sweeps", [1, 3])
@pytest.mark.parametrize("emit_r", [False, True])
def test_visit_up9_matches(shape, sweeps, emit_r):
    """9-pt up-visit semantics as composed by the context closure: the
    coarse correction u + P e runs as the XLA pass, the fused kernel
    smooths (emit='u'/'ur')."""
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        fused_level_visit9_pallas,
    )

    ny, nx = shape
    st = _aniso_st9(ny, nx)
    rng = np.random.default_rng(nx + sweeps + emit_r)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    e = jnp.asarray(rng.standard_normal(((ny - 1) // 2, (nx - 1) // 2)))
    steps = jacobi_step_coeffs(sweeps, 0.8)
    u_corr = u + prolong_bilinear(e)
    u_ref = _ref_smooth9(st, b, u_corr, steps)
    out = fused_level_visit9_pallas(
        st, b, u_corr, steps, emit="ur" if emit_r else "u", interpret=True)
    if emit_r:
        u_got, r_got = out
        r_ref = _residual9(st, b, u_ref)
        np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                                   rtol=1e-12,
                                   atol=1e-12 * float(np.abs(r_ref).max()))
    else:
        u_got = out
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)


def test_visit_up9_in_kernel_correct_and_dot():
    """The in-kernel correction path (e_coarse=...) and emit_dot."""
    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        fused_level_visit9_pallas,
    )

    ny, nx = 127, 63
    st = _aniso_st9(ny, nx)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((ny, nx)))
    b = jnp.asarray(rng.standard_normal((ny, nx)))
    e = jnp.asarray(rng.standard_normal(((ny - 1) // 2, (nx - 1) // 2)))
    steps = jacobi_step_coeffs(2, 0.8)
    u_ref = _ref_smooth9(st, b, u + prolong_bilinear(e), steps)
    u_got = fused_level_visit9_pallas(st, b, u, steps, emit="u",
                                      e_coarse=e, interpret=True)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-11)
    z_got, dot = fused_level_visit9_pallas(
        st, b, None, steps, emit="u", emit_dot=True, interpret=True)
    z_ref = _ref_smooth9(st, b, jnp.zeros_like(b), steps)
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               rtol=1e-12, atol=1e-11)
    dot_ref = float(jnp.vdot(b.ravel(), z_ref.ravel()))
    assert abs(float(dot) - dot_ref) <= 1e-9 * abs(dot_ref)


def test_aniso_fused_visits_wired_and_match_generic():
    """On a context with the 9-pt fused visits wired (interpret mode),
    the mg-CG solve reproduces the generic-path solve iterate-for-iterate
    (same wiring _build_visits does on TPU)."""
    import dataclasses

    from multigrid_petsc_tpu.ops.pallas.stencil9_kernel import (
        fused_level_visit9_pallas,
    )
    from multigrid_petsc_tpu.solvers.context import build_context
    from multigrid_petsc_tpu.solvers.krylov import solve_mgcg
    from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

    cfg = SolverConfig(npts=129, grids=4, levels=4, cycle=CycleType.MGCG,
                       problem="aniso", aniso=(1.0, 0.0, 100.0, 0.0, 0.0),
                       dtype="float64", rtol=1e-8)
    ctx = build_context(cfg)
    ref = solve_mgcg(ctx)

    steps_fn = lambda s: jacobi_step_coeffs(s, cfg.omega)
    for lc in ctx.levels[:-1]:
        st9 = lc.stencils[0]

        def visit_down(b, u, sweeps, _st=st9):
            u0, rc1 = fused_level_visit9_pallas(
                _st, b[0], None if u is None else u[0], steps_fn(sweeps),
                emit="rc", interpret=True)
            return (u0,), rc1

        def visit_up(b, u, e_c, sweeps, emit_r=False, _st=st9):
            u0 = u[0] + prolong_bilinear(e_c)
            out = fused_level_visit9_pallas(
                _st, b[0], u0, steps_fn(sweeps),
                emit="ur" if emit_r else "u", interpret=True)
            if emit_r:
                return (out[0],), (out[1],)
            return (out,)

        lc.visit_down = visit_down
        lc.visit_up = visit_up
    got = solve_mgcg(ctx)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.u[0]), np.asarray(ref.u[0]),
                               rtol=1e-9, atol=1e-11)


# ---------------------------------------------------------------------------
# Halo-window builders: the block-reshape fast path (round 4 — the per-row
# strided-gather form measured ~1 ms per window set at 8191^2, comparable
# to the visit kernel itself) must reproduce the brute-force windows for
# every edge/ragged case.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ny,t,k", [
    (33, 16, 3), (32, 16, 3), (31, 16, 5), (47, 16, 2), (160, 16, 5),
    (37, 16, 4),
])
def test_halo_windows_reference(ny, t, k):
    from jax.experimental import pallas as pl

    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import _halo_windows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ny, 7)), jnp.float32)
    g = pl.cdiv(ny, t)
    top, bot = _halo_windows(x, t, g, k)
    xn = np.asarray(x)
    for i in range(g):
        t_ref = np.zeros((k, 7), np.float32)
        lo = i * t - k
        a, b_ = max(lo, 0), min(i * t, ny)
        if b_ > a:
            t_ref[a - lo : b_ - lo] = xn[a:b_]
        np.testing.assert_array_equal(np.asarray(top[i]), t_ref)
        b_ref = np.zeros((k, 7), np.float32)
        lo = (i + 1) * t
        a, b_ = lo, min(lo + k, ny)
        if b_ > a:
            b_ref[: b_ - a] = xn[a:b_]
        np.testing.assert_array_equal(np.asarray(bot[i]), b_ref)


@pytest.mark.parametrize("n,g,stride,lo,rows", [
    (40, 6, 8, -3, 3), (40, 6, 8, 8, 2), (17, 5, 4, -2, 4), (16, 4, 4, 0, 4),
    (21, 6, 4, 2, 3), (9, 8, 2, -1, 2),
])
def test_gather_rows_reference(n, g, stride, lo, rows):
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import _gather_rows

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    out = _gather_rows(x, g, stride, lo, rows)
    xn = np.asarray(x)
    for i in range(g):
        ref = np.zeros((rows, 5), np.float32)
        s0 = i * stride + lo
        a, b_ = max(s0, 0), min(s0 + rows, n)
        if b_ > a:
            ref[a - s0 : b_ - s0] = xn[a:b_]
        np.testing.assert_array_equal(np.asarray(out[i]), ref)
