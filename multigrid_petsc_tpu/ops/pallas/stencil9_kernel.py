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


# --------------------------------------------------------------------------
# Fused 9-point V-cycle level visits: [u += P e] -> k smoothing steps ->
# [residual | y-restricted residual], one read of (u, b, coeffs) per visit
# — the 9-point counterpart of stencil_kernel._make_vcycle_kernel, so the
# anisotropic family (BASELINE config 4) runs the same fused fast path as
# 5-point Poisson instead of the unfused smooth/residual/transfer
# composition (reference treats every operator identically through
# assembled MatMult, src/solver.c:489-556).  Transfer split is identical:
# y-halves in-kernel (sublane interleaves), x-halves as XLA strided passes
# over half-height intermediates (restrict_x_fw / prolong_x_bilinear).
# --------------------------------------------------------------------------

from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (  # noqa: E402
    _gather_rows,
    prolong_x_bilinear,
    restrict_x_fw,
)


def _make_vcycle9_kernel(ny, nx, t, k, g, h, kinds, steps, emit, correct,
                         zero_guess=False, emit_dot=False):
    """Fused 9-point level-visit kernel body (see stencil_kernel.
    _make_vcycle_kernel for the emit/zero_guess/correct semantics)."""
    t2 = t + 2 * h
    th = h // 2 + 1 if h % 2 == 0 else (h + 1) // 2
    nyc = (ny - 1) // 2
    ncr = _n_coeff_refs(kinds, h)

    def kernel(*refs):
        crefs, rest = refs[:ncr], refs[ncr:]
        if correct:
            (u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref,
             em_ref, et_ref, eb_ref, *outs) = rest
        elif zero_guess:
            b_ref, bt_ref, bb_ref, *outs = rest
        else:
            u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref, *outs = rest

        i = pl.program_id(0).astype(jnp.int32)
        b = jnp.concatenate([bt_ref[0], b_ref[:], bb_ref[0]], axis=0)
        if zero_guess:
            u = jnp.zeros_like(b)
        else:
            u = jnp.concatenate([ut_ref[0], u_ref[:], ub_ref[0]], axis=0)
        grow = (i * jnp.int32(t) - jnp.int32(h)
                + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        if not zero_guess:
            u = jnp.where(inside, u, 0.0)
        b = jnp.where(inside, b, 0.0)

        if correct:
            # y-half of the bilinear prolongation (x-half pre-applied by
            # the XLA prolong_x_bilinear pass) — same parity split as the
            # 5-point kernel.
            em = em_ref[:]
            crow = (i * jnp.int32(t // 2)
                    + jax.lax.broadcasted_iota(jnp.int32, em.shape, 0))
            em = jnp.where(crow < jnp.int32(nyc), em, 0.0)
            e_loc = jnp.concatenate([et_ref[0], em, eb_ref[0]], axis=0)
            prev, cur = e_loc[:-1], e_loc[1:]
            if h % 2 == 0:
                pe = jnp.stack([0.5 * (prev + cur), cur], axis=1)
            else:
                pe = jnp.stack([prev, 0.5 * (prev + cur)], axis=1)
            pe = pe.reshape(t2, pe.shape[-1])
            u = jnp.where(inside, u + pe, 0.0)

        coeffs = _unpack_coeffs(crefs, kinds, h)
        cc = coeffs[4]
        dinv = 1.0 / jnp.where(cc == 0.0, 1.0, cc)

        def apply_a(v):
            vp = jnp.concatenate(
                [jnp.zeros_like(v[:1]), v, jnp.zeros_like(v[:1])], axis=0
            )
            return _apply9(coeffs, vp)

        p = jnp.zeros_like(u)
        first = zero_guess
        for (alpha, beta) in steps:
            if first:
                z = dinv * b  # A u = 0 for the zero initial guess
                first = False
            else:
                z = dinv * (b - apply_a(u))
            p = beta * p + alpha * z
            u = jnp.where(inside, u + p, 0.0)

        if emit == "r":
            outs[0][:] = (b - apply_a(u))[h : h + t]
            return
        outs[0][:] = u[h : h + t]
        if emit_dot:
            outs[-1][i, 0] = jnp.sum(b[h : h + t] * u[h : h + t])
        if emit == "ur":
            outs[1][:] = (b - apply_a(u))[h : h + t]
        elif emit == "rc":
            r = b - apply_a(u)
            v = r[h : h + t].reshape(t // 2, 2, r.shape[-1])
            ev, od = v[:, 0], v[:, 1]
            ev_next = jnp.concatenate([ev[1:], r[h + t : h + t + 1]], axis=0)
            outs[1][:] = ev + 2.0 * od + ev_next

    return kernel


def fused_level_visit9_pallas(
    st: Stencil9,
    b: jnp.ndarray,
    u: jnp.ndarray | None,
    steps: tuple,
    emit: str = "u",
    e_coarse: jnp.ndarray | None = None,
    emit_dot: bool = False,
    interpret: bool = False,
):
    """One fused 9-point V-cycle level visit (see stencil_kernel.
    fused_level_visit_pallas — identical contract, Stencil9 operator).

    Raises ValueError when the grid cannot carry the halo; callers fall
    back to the unfused composition (``fused_visit_viable`` pre-checks).
    """
    assert emit in ("u", "ur", "r", "rc")
    assert not emit_dot or emit == "u", "emit_dot: final-u visits only"
    zero_guess = u is None
    ny, nx = b.shape
    k = len(steps)
    h = k + (0 if emit == "u" else 1 if emit in ("ur", "r") else 2)
    correct = e_coarse is not None
    assert not (zero_guess and correct), "zero-guess visit cannot correct"
    if emit == "rc" or correct:
        if ny % 2 == 0 or nx % 2 == 0:
            raise ValueError("transfers need odd (2n+1) grid dims")
    t = _pick_tile(nx, b.dtype, bufs=14, cap=256)
    if ny < t + 2 * h:
        t = max(16, ((ny - 2 * h) // 16) * 16)
        if ny < t + 2 * h:
            raise ValueError("grid too small for fused Pallas level visit")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused Pallas level visit")
    nyc = (ny - 1) // 2

    kinds, carrs, cspecs = _coeff9_operands(st, ny, nx, b.dtype, g, t, h=h)
    b_top, b_bot = _halo_windows(b, t, g, h)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, h, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if zero_guess:
        in_specs = cspecs + [mid, halo, halo]
        args = carrs + [b, b_top, b_bot]
    else:
        u_top, u_bot = _halo_windows(u, t, g, h)
        in_specs = cspecs + [mid, halo, halo, mid, halo, halo]
        args = carrs + [u, u_top, u_bot, b, b_top, b_bot]

    if correct:
        e_x = prolong_x_bilinear(e_coarse.astype(b.dtype))  # (nyc, nx)
        th = h // 2 + 1 if h % 2 == 0 else (h + 1) // 2
        rows = t // 2 + h + 1
        bh = rows - t // 2 - th
        e_top = _gather_rows(e_x, g, t // 2, -th, th)
        e_bot = _gather_rows(e_x, g, t // 2, t // 2, bh)
        in_specs += [
            pl.BlockSpec((t // 2, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [e_x, e_top, e_bot]

    out_specs = [mid]
    out_shape = [jax.ShapeDtypeStruct((ny, nx), b.dtype)]
    if emit == "ur":
        out_specs.append(mid)
        out_shape.append(jax.ShapeDtypeStruct((ny, nx), b.dtype))
    elif emit == "rc":
        out_specs.append(
            pl.BlockSpec((t // 2, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nyc, nx), b.dtype))
    if emit_dot:
        out_specs.append(
            pl.BlockSpec((g, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((g, 1), b.dtype))

    # u (when present) is dead after the visit: donate it into the u'
    # output to elide XLA's backedge copy (same as the 5-point kernels).
    n_c = len(carrs)
    aliases = {} if (emit == "r" or zero_guess) else {n_c: 0}

    with _x64_scope(b.dtype):
        out = pl.pallas_call(
            _make_vcycle9_kernel(ny, nx, t, k, g, h, kinds, steps, emit,
                                 correct, zero_guess, emit_dot),
            grid=(g,),
            in_specs=in_specs,
            out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
            out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*args)
    if emit == "rc":
        return out[0], restrict_x_fw(out[1])
    if emit_dot:
        return out[0], jnp.sum(out[1])
    return out
