"""Coarsest-level solvers.

The reference's coarsest "solve" is v1 Richardson sweeps whose PETSc
default ILU preconditioner makes them near-direct on small grids
(src/solver.c:1495-1510).  Plain damped Jacobi is NOT an adequate stand-in
(the V-cycle degenerates to rate ~1 - O(h_coarse^2)), so the framework
provides real coarse solvers:

  * "direct": dense LU of the (possibly composite) coarsest operator,
    built once at setup by probing the matrix-free apply with identity
    columns; application is a pair of triangular solves (a small dense
    op — MXU-friendly on TPU).  Exact + linear, so Krylov outers stay
    happy.  Used when the coarsest level has <= max_direct_size unknowns.
  * "cg": fixed-iteration conjugate gradients, matrix-free (for coarse
    grids too large to densify).
  * "smooth": the reference-faithful v1 smoother sweeps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _flatten(state):
    return jnp.concatenate([x.ravel() for x in state])


def _unflatten(vec, shapes):
    out, off = [], 0
    for s in shapes:
        n = s[0] * s[1]
        out.append(vec[off : off + n].reshape(s))
        off += n
    return tuple(out)


def build_direct_solver(apply_fn: Callable, shapes, dtype) -> Callable:
    """Probe A column-by-column, invert once on host, return b -> A^-1 b.

    The inversion happens on host in f64 at setup (LAPACK; TPU XLA has no
    f64 LU, and a one-time host factorization is the right place for it —
    the analogue of the reference's assembly step).  The per-cycle
    application is a single dense (N, N) matvec — MXU work on TPU.
    """
    import numpy as np

    N = sum(ny * nx for ny, nx in shapes)

    def mv(xflat):
        return _flatten(apply_fn(_unflatten(xflat, shapes)))

    # vmap over identity rows: row k of the result is A e_k = column k of A.
    at = jax.vmap(mv)(jnp.eye(N, dtype=dtype))
    a_inv = jnp.asarray(
        np.linalg.inv(np.asarray(at, dtype=np.float64).T), dtype=dtype
    )

    def solve(b_state):
        x = a_inv @ _flatten(b_state)
        return _unflatten(x, shapes)

    return solve


def build_cg_solver(
    apply_fn: Callable, shapes, iters: int = 64
) -> Callable:
    """Fixed-iteration matrix-free CG (valid for the negative-definite
    operator: both inner products flip sign).  Fixed trip count keeps the
    coarse solve linear, so outer Krylov methods remain consistent."""

    def solve(b_state):
        b = _flatten(b_state)

        def mv(x):
            return _flatten(apply_fn(_unflatten(x, shapes)))

        x = jnp.zeros_like(b)
        r = b
        p = r
        rr = jnp.vdot(r, r)

        def body(_, carry):
            x, r, p, rr = carry
            ap = mv(p)
            denom = jnp.vdot(p, ap)
            alpha = jnp.where(denom != 0, rr / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            rr_new = jnp.vdot(r, r)
            beta = jnp.where(rr != 0, rr_new / rr, 0.0)
            p = r + beta * p
            return (x, r, p, rr_new)

        x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, p, rr))
        return _unflatten(x, shapes)

    return solve
