"""Pallas TPU kernels for the 9-point stencil hot path.

The anisotropic / mixed-derivative operator family (BASELINE.md config 4;
capability analogue of the reference's variable-coefficient 5-point fill,
reference: src/solver.c:185-253 + src/problem.c:3-22, widened to the
9-point cross-derivative discretization) runs on `Stencil9` coefficient
fields.  The XLA jnp-shift apply costs ~4-5 HBM passes (pad
materialization + partially-fused shifts); these kernels do the minimum:

  * ``apply_stencil9_pallas``: y = A u (or b - A u) in ONE read of
    (u [, b], non-broadcast coefficients) + one write.
  * ``smooth9_sweeps_pallas``: k fused polynomial-smoother steps
    (damped Jacobi / Chebyshev via static (alpha, beta) sequences) with
    temporal blocking — (u, b, coeffs) read ONCE per k sweeps.

Coefficient canonicalization: each of the 9 coefficients is broadcastable
to (ny, nx) but usually much smaller — scalars (the mixed term), (1, nx)
x-profiles, (ny, 1) y-profiles, or a full field (the center).  Each is
shipped to the kernel in its COMPACT form — index-clamped column slabs,
one replicated row, or (for genuine 2-D fields) plain auto-pipelined
row blocks plus strided halo windows — so HBM traffic stays at
"u + the genuinely 2-D coefficients", not 9 full fields and no gathers.

Same Mosaic constraints as stencil_kernel.py: i32-pinned index math, x64
scoped off for 32-bit data, ragged last blocks masked in-kernel, halo
windows gathered outside the kernel as auto-pipelined BlockSpec operands,
and lane shifts applied to ALIGNED slabs before any sublane slicing
(pad-concat on sublane-sliced vectors fails Mosaic layout legalization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _halo_rows,
    _halo_windows,
    _pick_tile,
    _shift_e,
    _shift_w,
    _x64_scope,
)
from multigrid_petsc_tpu.ops.stencil import Stencil9


def _coeff9_operands(st: Stencil9, ny, nx, dtype, g, t, h):
    """Ship each coefficient compactly: (kinds, arrays, specs).

    Every coefficient spans rows ``t + 2h`` per block (``h`` = 0 for the
    plain apply, k for the fused smoother whose intermediate halo rows are
    smoothed too):

    kind 'col':   (g, t+2h, 1) index-CLAMPED row slabs (scalars and
                  (ny, 1) y-profiles; a cheap 1-D gather at setup —
                  clamping keeps the center real/invertible everywhere).
    kind 'row':   (1, nx), replicated to every program.
    kind 'field': a plain (t, nx) pipelined block, plus two (h, nx)
                  strided halo windows when h > 0 (zero-filled outside
                  the domain) — NO gathers on the 2-D data.
    """
    rows = t + 2 * h
    idx = np.clip(
        (np.arange(g) * t - h)[:, None] + np.arange(rows)[None, :], 0, ny - 1
    )
    jidx = jnp.asarray(idx)
    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, h, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kinds, arrays, specs = [], [], []
    for c in st:
        c = jnp.asarray(c, dtype)
        if c.ndim < 2:
            c = c.reshape(1, 1)
        cy, cx = c.shape
        if cx == 1:
            col = jnp.broadcast_to(c, (ny, 1))[:, 0]
            arrays.append(col[jidx][..., None])  # (g, rows, 1)
            specs.append(
                pl.BlockSpec((1, rows, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            kinds.append("col")
        elif cy == 1:
            arrays.append(c)
            specs.append(
                pl.BlockSpec((1, nx), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            kinds.append("row")
        else:
            f = jnp.broadcast_to(c, (ny, nx))
            arrays.append(f)
            specs.append(mid)
            if h > 0:
                top, bot = _halo_windows(f, t, g, h)
                arrays += [top, bot]
                specs += [halo, halo]
            kinds.append("field")
    return tuple(kinds), arrays, specs


def _unpack_coeffs(refs, kinds, h):
    """Kernel-side: 9 blocks, each broadcastable against (t+2h, nx)."""
    out, it = [], iter(refs)
    for kd in kinds:
        r = next(it)
        if kd == "row":
            out.append(r[:])  # (1, nx)
        elif kd == "col":
            out.append(r[0])  # (rows, 1)
        else:  # field: mid block (+ halo windows when h > 0)
            if h > 0:
                top, bot = next(it), next(it)
                out.append(
                    jnp.concatenate([top[0], r[:], bot[0]], axis=0)
                )
            else:
                out.append(r[:])
    return tuple(out)


def _n_coeff_refs(kinds, h):
    return sum(3 if (kd == "field" and h > 0) else 1 for kd in kinds)


def _apply9(coeffs, up):
    """A u over a halo-extended slab: ``up`` has one extra row top+bottom
    relative to the rows produced; coefficient blocks span exactly the
    produced rows.  Zero x-edges = eliminated Dirichlet.

    The lane shifts run on the ALIGNED full slab before the row slices —
    Mosaic lowers pad-concat on aligned vectors but rejects it on
    sublane-sliced operands ("offset mismatch on non-concat dimension").
    """
    (csw, cs, cse, cw, cc, ce, cnw, cn, cne) = coeffs
    uw, ue = _shift_w(up), _shift_e(up)
    s, m, n = up[:-2], up[1:-1], up[2:]
    return (
        cc * m + cs * s + cn * n
        + cw * uw[1:-1] + ce * ue[1:-1]
        + csw * uw[:-2] + cse * ue[:-2]
        + cnw * uw[2:] + cne * ue[2:]
    )


def _make_apply9_kernel(g, t, ny, kinds, with_b):
    tl = ny - (g - 1) * t
    ncr = _n_coeff_refs(kinds, 0)

    def kernel(*refs):
        crefs, rest = refs[:ncr], refs[ncr:]
        if with_b:
            b_r, u_r, top_r, bot_r, out_r = rest
        else:
            u_r, top_r, bot_r, out_r = rest
        i = pl.program_id(0).astype(jnp.int32)
        u = u_r[:]
        if tl != t:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            u = jnp.where(
                (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl)), u, 0.0
            )
        up = jnp.concatenate([top_r[0], u, bot_r[0]], axis=0)  # (t+2, nx)
        coeffs = _unpack_coeffs(crefs, kinds, 0)
        au = _apply9(coeffs, up)
        out_r[:] = (b_r[:] - au) if with_b else au

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_stencil9_pallas(
    st: Stencil9, u: jnp.ndarray, b: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A u (or r = b - A u when ``b`` is given), 9-point, one pass."""
    ny, nx = u.shape
    with_b = b is not None
    t = _pick_tile(nx, u.dtype, bufs=8 + 2 * with_b)
    g = pl.cdiv(ny, t)
    tops, bots = _halo_rows(u, t, g)
    tops = tops.reshape(g, 1, nx)
    bots = bots.reshape(g, 1, nx)
    kinds, carrs, cspecs = _coeff9_operands(st, ny, nx, u.dtype, g, t, h=0)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    args = carrs + ([b] if with_b else []) + [u, tops, bots]
    in_specs = cspecs + [mid] * (1 + with_b) + [halo, halo]
    with _x64_scope(u.dtype):
        return pl.pallas_call(
            _make_apply9_kernel(g, t, ny, kinds, with_b),
            grid=(g,),
            in_specs=in_specs,
            out_specs=mid,
            out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*args)


def residual9_pallas(st, b, u, interpret=False):
    """r = b - A u fused in one kernel."""
    return apply_stencil9_pallas(st, u, b=b, interpret=interpret)


def _make_smooth9_kernel(ny, t, k, g, kinds, steps):
    """Fused k-step polynomial smoother (see stencil_kernel.
    _make_smooth_kernel for the (alpha, beta) recurrence and the halo-
    pollution argument — one extra ring per A-application, identical for
    9-point: corners travel diagonally but still one ring per step)."""
    tl = ny - (g - 1) * t
    ncr = _n_coeff_refs(kinds, k)

    def kernel(*refs):
        crefs = refs[:ncr]
        u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref, out_ref = refs[ncr:]
        i = pl.program_id(0).astype(jnp.int32)
        u = u_ref[:]
        bmid = b_ref[:]
        if tl != t:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            valid = (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl))
            u = jnp.where(valid, u, 0.0)
            bmid = jnp.where(valid, bmid, 0.0)
        u = jnp.concatenate([ut_ref[0], u, ub_ref[0]], axis=0)  # (t+2k, nx)
        b = jnp.concatenate([bt_ref[0], bmid, bb_ref[0]], axis=0)
        coeffs = _unpack_coeffs(crefs, kinds, k)
        cc = coeffs[4]
        # Field-kind halo windows are zero-filled outside the domain and
        # the ragged tail carries block padding: keep the inverse finite
        # there (those rows are masked/discarded, but 1/0 -> inf would
        # turn 0*inf into NaN inside the masked region).
        dinv = 1.0 / jnp.where(cc == 0.0, 1.0, cc)

        grow = (i * jnp.int32(t) - jnp.int32(k)
                + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))

        def apply_a(v):
            vp = jnp.concatenate(
                [jnp.zeros_like(v[:1]), v, jnp.zeros_like(v[:1])], axis=0
            )
            return _apply9(coeffs, vp)

        p = jnp.zeros_like(u)
        for (alpha, beta) in steps:
            z = dinv * (b - apply_a(u))
            p = beta * p + alpha * z
            u = jnp.where(inside, u + p, 0.0)
        out_ref[:] = u[k : k + t]

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def smooth9_sweeps_pallas(
    st: Stencil9,
    b: jnp.ndarray,
    u: jnp.ndarray,
    steps: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """k = len(steps) fused 9-point polynomial-smoother steps in ONE read
    of (u, b, coeffs) and one write of u.

    The zero-padded boundary ring inside apply_a makes the halo-edge rows
    see phantom-zero neighbors; combined with the ``inside`` mask this
    reproduces the eliminated-Dirichlet exterior exactly, so stored rows
    match the unfused jnp smoother (pollution travels one ring per step
    and never reaches rows within distance k of the slab interior).

    Raises ValueError for grids too small to carry the k-row halo —
    callers fall back to the jnp smoothers.
    """
    ny, nx = u.shape
    k = len(steps)
    t = _pick_tile(nx, u.dtype, bufs=10, cap=256)
    if ny < t + 2 * k:
        t = max(8, ((ny - 2 * k) // 8) * 8)
        if t < 8 or ny < t + 2 * k:
            raise ValueError("grid too small for fused Pallas smoother")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused Pallas smoother")

    u_top, u_bot = _halo_windows(u, t, g, k)
    b_top, b_bot = _halo_windows(b, t, g, k)
    kinds, carrs, cspecs = _coeff9_operands(st, ny, nx, u.dtype, g, t, h=k)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, k, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    with _x64_scope(u.dtype):
        return pl.pallas_call(
            _make_smooth9_kernel(ny, t, k, g, kinds, steps),
            grid=(g,),
            in_specs=cspecs + [mid, halo, halo, mid, halo, halo],
            out_specs=mid,
            out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
            # u' aliases the dead-after input u (see stencil_kernel.
            # smooth_sweeps_pallas): elides XLA's backedge copy around
            # carried kernel outputs; in-place is safe because each
            # program reads only its own u slab.
            input_output_aliases={len(carrs): 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*carrs, u, u_top, u_bot, b, b_top, b_bot)
