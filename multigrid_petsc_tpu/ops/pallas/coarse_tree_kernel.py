"""Single-dispatch coarse-hierarchy V-cycle kernel (round 5).

Below ~1023^2 every remaining level of the hierarchy fits in VMEM
simultaneously (sum of 8 live temporaries over 1023^2 + 511^2 + ... is
~45 MB f32 against 128 MB), yet the generic composition spends ~1 ms per
preconditioner application on DISPATCH: ~2 visits x ~8 levels x many XLA
ops each, all on sub-megabyte arrays (probe_mdma_glue_r05: 2.1 ms for
the whole sub-hierarchy, far above its byte cost).  This kernel runs the
ENTIRE sub-tree — zero-guess down visits, the dense direct coarsest
solve (an MXU matmul against the precomputed inverse), and the
correct+post-smooth up leg — as ONE Pallas call: one read of the entry
rhs, one write of the entry solution.

Numerics: identical step bodies, transfer stencils, and coarse solve as
the generic _cycle composition (solvers/vcycle.py:58-77) on simple
Stencil5 chains — the (alpha, beta) smoother schedules reproduce
sm.jacobi/sm.chebyshev exactly, the in-VMEM transfers are the library
full-weighting/bilinear forms, and the direct solve applies the same
host-inverted dense operator (solvers/coarse.build_direct_solver).

Reference analogue: the entire mid+coarse KSPSolve chain of the
reference's down/up legs (/root/reference/src/solver.c:1533-1544) plus
its coarsest solve, collapsed into one device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.pallas.line_kernel import (
    _prolong_y_vmem,
    _restrict_y_vmem,
    _sb,
    _sf,
)
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _prolong_x_vmem,
    _restrict_x_vmem,
    _shift_e,
    _shift_w,
    _x64_scope,
)


def tree_vmem_bytes(shapes, itemsize: int) -> int:
    """~8 live temporaries per level during its visit + the persistent
    (b, u) pair per level."""
    per_level = [ny * nx * itemsize for ny, nx in shapes]
    return 8 * max(per_level) + 3 * sum(per_level)


def coarse_tree_viable(shapes, dtype, budget: int = 80 * 2**20,
                       direct: bool = False) -> bool:
    if len(shapes) < 2:
        return False
    it = jnp.dtype(dtype).itemsize
    if tree_vmem_bytes(shapes, max(it, 4)) > budget:
        return False
    for (ny, nx), (nyc, nxc) in zip(shapes[:-1], shapes[1:]):
        if nyc != (ny - 1) // 2 or nxc != (nx - 1) // 2:
            return False  # gap-1 chain only
    if direct and shapes[-1][0] > 8:
        # The in-kernel dense solve unrolls ny_L^2 row-block dots (Mosaic
        # cannot flatten sublanes into lanes — reshape AND slice-concat
        # both fail layout legalization on tiny arrays).
        return False
    return True


def _apply5_cols(cs, v):
    c_s, cw, cc, ce, cn = cs
    return (cc * v + c_s * _sf(v, 1) + cn * _sb(v, 1)
            + cw * _shift_w(v) + ce * _shift_e(v))


def _smooth_steps(cs, b, u, steps, zero_guess):
    dinv = 1.0 / cs[2]
    p = jnp.zeros_like(b)
    first = zero_guess
    for (a, bt) in steps:
        z = dinv * b if first else dinv * (b - _apply5_cols(cs, u))
        first = False
        p = bt * p + a * z
        u = u + p
    return u


def make_coarse_tree_solver(
    stencils,         # list of Stencil5, one per level (entry first)
    shapes,           # [(ny, nx), ...]
    steps_list,       # list of static (alpha, beta) tuples per level
    a_inv=None,       # (N, N) dense inverse of the coarsest operator
    interpret: bool = False,
):
    """b (entry shape) -> u: the full sub-tree V-cycle as one kernel.

    ``a_inv`` None means the coarsest level smooths from zero with its
    own steps instead of the direct solve (cfg.coarse_solver='smooth')."""
    L = len(shapes)
    direct = a_inv is not None
    ny0, nx0 = shapes[0]
    w_blocks = None
    if direct:
        nyL, nxL = shapes[-1]
        # W[(i, k)][l, j] = ainv[i*nxL + j, k*nxL + l] (see kernel body).
        A4 = np.asarray(a_inv).reshape(nyL, nxL, nyL, nxL)
        w_blocks = jnp.asarray(
            A4.transpose(0, 2, 3, 1).reshape(nyL * nyL, nxL, nxL))

    # Coefficient columns, broadcast to (ny, 1) host-side (tiny).
    coeff_ops = []
    for st, (ny, nx) in zip(stencils, shapes):
        for c in (st.cs, st.cw, st.cc, st.ce, st.cn):
            coeff_ops.append(
                jnp.broadcast_to(jnp.asarray(c, jnp.float32)
                                 if jnp.asarray(c).dtype == jnp.bfloat16
                                 else jnp.asarray(c), (ny, 1)))

    def kernel(*refs):
        it = iter(refs)
        coeffs = []
        for l in range(L):
            coeffs.append([next(it)[:] for _ in range(5)])
        ainv_ref = next(it) if direct else None
        b_ref = next(it)
        out_ref = next(it)

        b = b_ref[:]
        if b.dtype == jnp.bfloat16:
            b = b.astype(jnp.float32)

        bs = [b]
        us = []
        for l in range(L - 1):
            u = _smooth_steps(coeffs[l], bs[l], jnp.zeros_like(bs[l]),
                              steps_list[l], zero_guess=True)
            rr = bs[l] - _apply5_cols(coeffs[l], u)
            bs.append(_restrict_x_vmem(_restrict_y_vmem(rr)))
            us.append(u)

        if direct:
            nyL, nxL = shapes[-1]
            # Mosaic cannot flatten sublanes into lanes (both the
            # (7,7)->(1,49) reshape and a slice-concat along lanes fail
            # layout legalization), so the dense solve runs as ny_L^2
            # unrolled row-block dots on the 2-D layout:
            #   u[i, :] = sum_k b[k, :] @ W[i*nyL + k]
            # with W[(i,k)][l, j] = ainv[i*nxL + j, k*nxL + l] prepared
            # host-side.  ~50 tiny MXU ops for the 7^2 coarsest grids the
            # viability gate admits.
            bL = bs[-1]
            w = ainv_ref[:]
            rows = []
            for i in range(nyL):
                acc = None
                for k in range(nyL):
                    r = jax.lax.dot_general(
                        bL[k : k + 1, :], w[i * nyL + k],
                        (((1,), (0,)), ((), ())),
                        # Full f32: the MXU's default bf16-split precision
                        # costs ~5e-4 relative error on the coarse solve
                        # (measured), which the up-leg then propagates.
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=bL.dtype,
                    )  # (1, nxL)
                    acc = r if acc is None else acc + r
                rows.append(acc)
            uL = jnp.concatenate(rows, axis=0)
        else:
            uL = _smooth_steps(coeffs[-1], bs[-1],
                               jnp.zeros_like(bs[-1]), steps_list[-1],
                               zero_guess=True)

        u_next = uL
        for l in range(L - 2, -1, -1):
            e = _prolong_x_vmem(_prolong_y_vmem(u_next))
            u = us[l] + e
            u = _smooth_steps(coeffs[l], bs[l], u, steps_list[l],
                              zero_guess=False)
            u_next = u
        out_ref[:] = u_next.astype(out_ref.dtype)

    def full(a):
        return pl.BlockSpec(a.shape, lambda: tuple([0] * a.ndim),
                            memory_space=pltpu.VMEM)

    def solve(b):
        ops = list(coeff_ops)
        if direct:
            ops.append(w_blocks.astype(b.dtype))
        ops.append(b)
        in_specs = [full(a) for a in ops]
        out_shape = jax.ShapeDtypeStruct((ny0, nx0), b.dtype)
        with _x64_scope(b.dtype):
            return pl.pallas_call(
                kernel,
                in_specs=in_specs,
                out_specs=full(b),
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 2**20,
                ),
                interpret=interpret,
            )(*ops)

    return solve
