"""Distributed (shard_map) variants of the fused Pallas level-visit kernels.

This is the composition the reference's hot path is built on: every SpMV is
a *distributed* operator application with a neighbor halo exchange under it
(reference: src/solver.c:1516,1535,1540 — MatMult on row-partitioned AIJ;
SURVEY.md C23).  Here the fine grid is 1-D row-partitioned over the device
mesh (the TPU counterpart of the reference's GetRanges block-row partition,
src/matbuild.c:120-144), each device runs the SAME fused Pallas kernels as
the single-device path on its local row block, and the k-row halo windows
that cross a device boundary ride a ``lax.ppermute`` over ICI instead of a
host-side strided gather.

Key design points (vs. ops/pallas/stencil_kernel.py):

  * **One pad row.** shard_map needs even shards; multigrid row counts are
    ``2^m - 1``.  Sharded levels therefore carry exactly one extra zero row
    so ``ny + 1`` (= ``2^m``) divides the device count.  Pad and phantom
    (outside-the-domain) rows are encoded IN THE COEFFICIENTS as the
    absorbing identity ``cc = 1, cs = cw = ce = cn = 0`` with ``b = 0``:
    every polynomial smoother step then maps ``u_pad = 0`` to ``0`` exactly,
    so no in-kernel masking is needed at all — Dirichlet semantics come from
    zero-filled ppermute edges (missing pairs deliver zeros) plus the
    identity rows.  The restriction emit masks the single global coarse pad
    row in-kernel (it would otherwise read the last real fine row).
  * **Per-device coefficient slabs** are precomputed host-side once per
    (tile, halo) signature — they are tiny ((ny,1) metric columns) and
    static, so only u/b/e move over ICI at runtime.
  * The kernel bodies are otherwise the same folded visit as the
    single-device mega-kernels: [u += P e] -> k smoothing steps ->
    [residual | restricted residual], one HBM read of (u, b) per visit.

Halo traffic per visit is ``2 * h * nx`` elements per device pair (h = k+2
at most) — for an 8193^2 f32 grid on 8 devices that is ~320 KB against a
~100 MB local slab read: <0.5% of the kernel's HBM time, so the exchange
hides entirely behind XLA's scheduling of the independent ppermutes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.stencil import Stencil5, Stencil9
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _compute_dtype,
    _load_f32,
    _shift_e,
    _shift_w,
    _store,
    _x64_scope,
    prolong_x_bilinear,
    restrict_x_fw,
)

# Extra halo rows beyond the smoothing steps, per emit mode (the trailing
# residual apply costs one row; the y-restriction window one more).
_EXTRA_H = {"u": 0, "a": 1, "r": 1, "ur": 1, "rc": 2}


def halo_rows(sweeps: int, emit: str) -> int:
    return sweeps + _EXTRA_H[emit]


def _e_halo_rows(h: int) -> tuple[int, int]:
    """(top, bottom) coarse-correction halo rows for fine halo ``h``
    (same formulas as the single-device fused visit)."""
    th = h // 2 + 1 if h % 2 == 0 else (h + 1) // 2
    return th, h + 1 - th


def pick_tile(R: int, h: int, nx: int | None = None, itemsize: int = 4,
              cap: int = 256) -> int | None:
    """Largest even divisor of the per-device row count ``R`` that is
    <= cap, can carry the halo (h < t, e-halo <= t//2), and keeps the
    kernel's VMEM stack within budget; None if R cannot host the kernel.

    VMEM sizing: the fused visit holds ~13 (t+2h, nx)-shaped values live
    in the worst (correct + 'ur'/'rc') variants; Mosaic's scoped-vmem
    allocator OOMs past ~100MB (observed 104.3M at t=256, nx=8191), so
    the row tile shrinks with the row width."""
    if nx is not None:
        budget = 80 * 2**20
        max_t2 = budget // (13 * max(nx, 1) * itemsize)
        cap = max(2, min(cap, max_t2 - 2 * h))
    th, bh = _e_halo_rows(h)
    for t in range(min(R, cap), 1, -1):
        if R % t == 0 and t % 2 == 0 and t > h and t // 2 >= max(th, bh):
            return t
    return None


def dist_coeff_slabs(
    st: Stencil5, ny: int, R: int, P: int, t: int, h: int, dtype
) -> np.ndarray:
    """Per-device, per-slab halo-extended coefficient windows,
    shape (P * g, 5, t + 2h, 1) with g = R // t slabs per device.

    Rows are indexed in the PADDED global row space [0, P*R); rows >= ny
    (the pad row) and rows outside the space (phantom halo rows at the
    domain edge) carry the absorbing identity (0, 0, 1, 0, 0).
    """
    g = R // t
    t2 = t + 2 * h
    ny_pad = P * R
    dt = np.dtype(dtype)
    # Virtual row table over [-h, ny_pad + h), offset by h.
    ext = np.zeros((5, ny_pad + 2 * h), dt)
    ext[2] = 1.0
    for j, c in enumerate(st):
        col = np.broadcast_to(np.asarray(c, dt).reshape(-1, 1), (ny, 1))
        ext[j, h : h + ny] = col[:, 0]
    # Slab i on device p covers padded rows [p*R + i*t - h, ... + t + h).
    base = (np.arange(P)[:, None] * R + np.arange(g)[None, :] * t).reshape(-1)
    idx = base[:, None] + np.arange(t2)[None, :]  # ext is offset by h already
    return ext[:, idx].transpose(1, 0, 2)[..., None]  # (P*g, 5, t2, 1)


def _split_additive(a: np.ndarray, ny: int, nx: int):
    """(col (ny,), row (nx,)) with a == col[:, None] + row[None, :], or
    None if ``a`` is not additively separable (to dtype roundoff).

    The problem modules build coefficients as sums of x- and y-profiles
    (e.g. cc = -2a(x)/hx^2 - 2c(y)/hy^2, problems.py:193-197), so even a
    materialized (ny, nx) field decomposes exactly this way."""
    a = np.broadcast_to(np.asarray(a), (ny, nx))
    col = a[:, 0] - a[0, 0]
    row = a[0, :]
    approx = col[:, None] + row[None, :]
    scale = float(np.abs(a).max()) or 1.0
    eps = 1e-12 if a.dtype.itemsize >= 8 else 1e-6
    if not np.allclose(approx, a, rtol=0.0, atol=eps * scale):
        return None
    return col, row


def separable9(st: Stencil9, ny: int, nx: int) -> bool:
    """Can every coefficient ship as an additive col+row pair?"""
    return all(_split_additive(c, ny, nx) is not None for c in st)


def dist_coeff9_slabs(
    st: Stencil9, ny: int, nx: int, R: int, P: int, t: int, h: int, dtype
) -> tuple[np.ndarray, np.ndarray]:
    """9-point coefficients for the distributed kernel as an ADDITIVE
    col + row decomposition: (P*g, 9, t2, 1) per-slab y-columns plus a
    (9, 1, nx) x-row profile, with coeff = col + row.

    Every problem family in the repo is additively separable this way
    (x-profiles + y-profiles; see _split_additive); genuinely
    non-separable fields raise.  Rows are CLAMPED into [0, ny) (keeps the
    center real and invertible at pad/phantom rows); Dirichlet/pad
    semantics come from the kernel's in-kernel row mask (the 5-pt path's
    coefficient-encoded identity cannot express x-dependent centers)."""
    g = R // t
    t2 = t + 2 * h
    ny_pad = P * R
    dt = np.dtype(dtype)
    cols = np.zeros((9, ny), dt)
    rows = np.zeros((9, 1, nx), dt)
    for j, c in enumerate(st):
        sp = _split_additive(c, ny, nx)
        if sp is None:
            raise ValueError(
                "distributed 9-pt path needs additively separable "
                f"coefficients; coefficient {j} is not"
            )
        cols[j] = sp[0].astype(dt)
        rows[j, 0] = sp[1].astype(dt)
    # Clamped virtual row table over [-h, ny_pad + h).
    vidx = np.clip(np.arange(-h, ny_pad + h), 0, ny - 1)
    ext = cols[:, vidx]  # (9, ny_pad + 2h)
    base = (np.arange(P)[:, None] * R + np.arange(g)[None, :] * t).reshape(-1)
    idx = base[:, None] + np.arange(t2)[None, :]
    return ext[:, idx].transpose(1, 0, 2)[..., None], rows


def _make_dist9_kernel(t: int, g: int, h: int, ny: int, R: int, steps,
                       emit: str, correct: bool,
                       i0: int = 0, stride: int = 1, n_pass: int = 0):
    """9-point variant of _make_dist_kernel: coefficient = col slab + row
    profile; Dirichlet/pad semantics via an in-kernel global-row mask
    (``base_ref`` = this device's first padded global row)."""
    t2 = t + 2 * h

    def kernel(*refs):
        if correct:
            (flag_ref, base_ref, ccol_ref, crow_ref,
             u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref,
             em_ref, et_ref, eb_ref, *outs) = refs
        else:
            (flag_ref, base_ref, ccol_ref, crow_ref,
             u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref, *outs) = refs
        outs = outs[n_pass:]
        i = (jnp.int32(i0)
             + pl.program_id(0).astype(jnp.int32) * jnp.int32(stride))
        u = jnp.concatenate(
            [_load_f32(ut_ref)[0], _load_f32(u_ref), _load_f32(ub_ref)[0]],
            axis=0)
        b = jnp.concatenate(
            [_load_f32(bt_ref)[0], _load_f32(b_ref), _load_f32(bb_ref)[0]],
            axis=0)

        if correct:
            e_loc = jnp.concatenate(
                [_load_f32(et_ref)[0], _load_f32(em_ref),
                 _load_f32(eb_ref)[0]], axis=0)
            prev, cur = e_loc[:-1], e_loc[1:]
            if h % 2 == 0:
                pe = jnp.stack([0.5 * (prev + cur), cur], axis=1)
            else:
                pe = jnp.stack([prev, 0.5 * (prev + cur)], axis=1)
            u = u + pe.reshape(t2, pe.shape[-1])

        cs9 = [ccol_ref[0, j] + crow_ref[j] for j in range(9)]
        (csw, c_s, cse, cw, cc, ce, cnw, cn, cne) = cs9
        dinv = 1.0 / cc

        # Global row mask: slab rows map to padded global rows
        # base + i*t - h + j; rows >= ny (the pad row + phantoms) are
        # pinned to zero every step — the masked analogue of the 5-pt
        # path's coefficient-encoded absorbing identity.
        grow = (base_ref[0, 0] + i * jnp.int32(t) - jnp.int32(h)
                + jax.lax.broadcasted_iota(jnp.int32, (t2, u.shape[-1]), 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        u = jnp.where(inside, u, 0.0)
        b = jnp.where(inside, b, 0.0)

        def apply_a(v):
            south = jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]], axis=0)
            north = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)
            return (cc * v + c_s * south + cn * north
                    + cw * _shift_w(v) + ce * _shift_e(v)
                    + csw * _shift_w(south) + cse * _shift_e(south)
                    + cnw * _shift_w(north) + cne * _shift_e(north))

        p = jnp.zeros_like(u)
        for (alpha, beta) in steps:
            z = dinv * (b - apply_a(u))
            p = beta * p + alpha * z
            u = jnp.where(inside, u + p, 0.0)

        if emit == "a":
            _store(outs[0], jnp.where(inside, apply_a(u), 0.0)[h : h + t])
            return
        if emit == "r":
            _store(outs[0],
                   jnp.where(inside, b - apply_a(u), 0.0)[h : h + t])
            return
        _store(outs[0], u[h : h + t])
        if emit == "ur":
            _store(outs[1],
                   jnp.where(inside, b - apply_a(u), 0.0)[h : h + t])
        elif emit == "rc":
            r = jnp.where(inside, b - apply_a(u), 0.0)
            v = r[h : h + t].reshape(t // 2, 2, r.shape[-1])
            ev, od = v[:, 0], v[:, 1]
            ev_next = jnp.concatenate([ev[1:], r[h + t : h + t + 1]], axis=0)
            ry = ev + 2.0 * od + ev_next
            rows = jax.lax.broadcasted_iota(jnp.int32, ry.shape, 0)
            pad_row = ((flag_ref[0, 0] == 1)
                       & (i == jnp.int32(g - 1))
                       & (rows == jnp.int32(t // 2 - 1)))
            _store(outs[1], jnp.where(pad_row, jnp.zeros_like(ry), ry))

    return kernel


def _make_dist_kernel(t: int, g: int, h: int, steps, emit: str, correct: bool,
                      i0: int = 0, stride: int = 1, n_pass: int = 0):
    """Fused distributed level-visit kernel body (one device's row block).

    No global-row masking: Dirichlet/pad semantics live in the coefficient
    slabs + zero-filled halos (see module docstring).  ``flag_ref`` is 1 on
    the last device — used only to zero the global coarse pad row of the
    'rc' emit.

    ``i0``/``stride`` map program ids to BLOCK indices (block = i0 +
    pid * stride): the overlapped two-call split runs interior blocks
    (i0=1, stride=1) and edge blocks (i0=0, stride=g-1) as separate
    pallas_calls so the halo ppermutes can overlap interior compute.
    ``n_pass`` = number of donated passthrough inputs appended after the
    regular inputs (see the kernel body note).
    """
    t2 = t + 2 * h

    def kernel(*refs):
        if correct:
            (flag_ref, c_ref, u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref,
             em_ref, et_ref, eb_ref, *outs) = refs
        else:
            (flag_ref, c_ref, u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref,
             *outs) = refs
        # Overlapped edge call: donated passthrough inputs (the interior
        # call's partial outputs) ride at the end of the inputs — ignored
        # by the body, their buffers ARE the outputs being edge-filled.
        outs = outs[n_pass:]
        i = (jnp.int32(i0)
             + pl.program_id(0).astype(jnp.int32) * jnp.int32(stride))
        u = jnp.concatenate(
            [_load_f32(ut_ref)[0], _load_f32(u_ref), _load_f32(ub_ref)[0]],
            axis=0)
        b = jnp.concatenate(
            [_load_f32(bt_ref)[0], _load_f32(b_ref), _load_f32(bb_ref)[0]],
            axis=0)

        if correct:
            # y-half of the bilinear prolongation (parity-split sublane
            # interleave); the x-half arrived pre-applied by the XLA
            # prolong_x_bilinear pass (same split as the single-device
            # kernel — the in-VMEM transposes it replaced cost 4-5x the
            # extra half-height HBM pass).
            e_loc = jnp.concatenate(
                [_load_f32(et_ref)[0], _load_f32(em_ref),
                 _load_f32(eb_ref)[0]], axis=0)
            prev, cur = e_loc[:-1], e_loc[1:]
            if h % 2 == 0:
                # Slab starts on an even (padded-)global fine row.
                pe = jnp.stack([0.5 * (prev + cur), cur], axis=1)
            else:
                pe = jnp.stack([prev, 0.5 * (prev + cur)], axis=1)
            u = u + pe.reshape(t2, pe.shape[-1])

        cs = c_ref[0, 0]
        cw = c_ref[0, 1]
        cc = c_ref[0, 2]
        ce = c_ref[0, 3]
        cn = c_ref[0, 4]
        dinv = 1.0 / cc

        def apply_a(v):
            south = jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]], axis=0)
            north = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)
            return (cc * v + cs * south + cn * north
                    + cw * _shift_w(v) + ce * _shift_e(v))

        p = jnp.zeros_like(u)
        for (alpha, beta) in steps:
            z = dinv * (b - apply_a(u))
            p = beta * p + alpha * z
            u = u + p

        if emit == "a":
            _store(outs[0], apply_a(u)[h : h + t])
            return
        if emit == "r":
            _store(outs[0], (b - apply_a(u))[h : h + t])
            return
        _store(outs[0], u[h : h + t])
        if emit == "ur":
            _store(outs[1], (b - apply_a(u))[h : h + t])
        elif emit == "rc":
            # y-half of the restriction only; x-half runs as one XLA
            # strided pass outside (restrict_x_fw).
            r = b - apply_a(u)
            v = r[h : h + t].reshape(t // 2, 2, r.shape[-1])
            ev, od = v[:, 0], v[:, 1]
            ev_next = jnp.concatenate([ev[1:], r[h + t : h + t + 1]], axis=0)
            ry = ev + 2.0 * od + ev_next
            # The global coarse PAD row (last coarse row of the last
            # device) reads the last REAL fine residual row — pin it to 0
            # so the coarse RHS keeps the pad-absorbing invariant.
            rows = jax.lax.broadcasted_iota(jnp.int32, ry.shape, 0)
            pad_row = ((flag_ref[0, 0] == 1)
                       & (i == jnp.int32(g - 1))
                       & (rows == jnp.int32(t // 2 - 1)))
            _store(outs[1], jnp.where(pad_row, jnp.zeros_like(ry), ry))

    return kernel


def _edge_exchange(x: jnp.ndarray, n: int, axis: str):
    """(from_prev, from_next): ``n`` boundary rows from each neighbor along
    the sharded ``axis`` (zeros at the global edges — missing ppermute
    pairs deliver zeros, which IS the eliminated Dirichlet boundary)."""
    P = lax.axis_size(axis)
    fwd = [(i, i + 1) for i in range(P - 1)]
    bwd = [(i + 1, i) for i in range(P - 1)]
    return lax.ppermute(x[-n:], axis, fwd), lax.ppermute(x[:n], axis, bwd)


def _windows(x: jnp.ndarray, t: int, g: int, h: int, ext_top, ext_bot):
    """(g, h, nx) top/bottom halo windows for each row slab: interior
    windows from neighbor slabs, edge windows from the ppermuted rows."""
    blocks = x.reshape(g, t, x.shape[1])
    if g == 1:
        return ext_top[None], ext_bot[None]
    tops = jnp.concatenate([ext_top[None], blocks[:-1, t - h :]], axis=0)
    bots = jnp.concatenate([blocks[1:, :h], ext_bot[None]], axis=0)
    return tops, bots


def dist_level_visit_local(
    c_slabs: jnp.ndarray,  # (g, 5, t+2h, 1) this device's coefficient slabs
    u: jnp.ndarray,        # (R, nx) local row block
    b: jnp.ndarray,
    e: jnp.ndarray | None = None,  # (R//2, nxc) local coarse correction
    *,
    steps: tuple,
    emit: str,
    t: int,
    axis: str = "y",
    interpret: bool = False,
    crow: jnp.ndarray | None = None,  # (9, 1, nx): 9-pt x-row profiles
    ny: int | None = None,            # real interior rows (9-pt mask)
):
    """One fused level visit on this device's row block (shard_map body).

    Exchanges the halo rows with the axis neighbors via ppermute, then runs
    the fused Pallas kernel over the local slabs.  Returns per ``emit``:
    "u" -> u', "a" -> A u, "r" -> b - A u, "ur" -> (u', r), "rc" -> (u', R r).

    **Halo/compute overlap** (g >= 3 blocks): the visit runs as TWO
    pallas_calls — interior blocks 1..g-2 first (they depend only on
    locally-gathered windows), then the two edge blocks consuming the
    ppermuted remote rows.  Nothing forces the exchange to finish before
    the interior call, so XLA's latency-hiding scheduler can hoist the
    collective-starts over the interior kernel — PETSc's scatter-begin /
    local-SpMV / scatter-end pattern (reference: src/solver.c:1516,1535,
    1540) in XLA-async form.  The edge call's outputs alias the interior
    call's partial outputs (donated passthrough), so the split moves no
    extra HBM bytes beyond re-fetching the two edge blocks (~2t rows).
    """
    R, nx = u.shape
    k = len(steps)
    h = halo_rows(k, emit)
    g = R // t
    correct = e is not None
    is9 = crow is not None

    u_ext_t, u_ext_b = _edge_exchange(u, h, axis)
    b_ext_t, b_ext_b = _edge_exchange(b, h, axis)

    flag = (lax.axis_index(axis) == lax.axis_size(axis) - 1)
    flag = flag.astype(jnp.int32).reshape(1, 1)
    base = (lax.axis_index(axis).astype(jnp.int32)
            * jnp.int32(R)).reshape(1, 1)

    def halo_spec(hh):
        return pl.BlockSpec((1, hh, nx), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    flag_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    e_x = e_ext_t = e_ext_b = None
    th = bh = 0
    if correct:
        # x-half of the prolongation on the local quarter-size block
        # BEFORE the halo exchange (x is unsharded, so this is a purely
        # local XLA pass; the exchanged rows are ~2x wider but still tiny).
        e_x = prolong_x_bilinear(e)  # (R//2, nx)
        th, bh = _e_halo_rows(h)
        e_ext_t, e_ext_b = _edge_exchange(e_x, max(th, bh), axis)

    n_out = 2 if emit in ("ur", "rc") else 1

    def build_call(i0, stride, n_prog, mid_map, cmid_map, passthrough):
        """One pallas_call over the blocks {i0 + j*stride}."""
        mid = pl.BlockSpec((t, nx), mid_map, memory_space=pltpu.VMEM)
        midc = pl.BlockSpec((t // 2, nx), mid_map, memory_space=pltpu.VMEM)
        if is9:
            coeff = pl.BlockSpec((1, 9, t + 2 * h, 1), cmid_map,
                                 memory_space=pltpu.VMEM)
            crow_spec = pl.BlockSpec((9, 1, nx), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
            in_specs = [flag_spec, flag_spec, coeff, crow_spec]
        else:
            coeff = pl.BlockSpec((1, 5, t + 2 * h, 1), cmid_map,
                                 memory_space=pltpu.VMEM)
            in_specs = [flag_spec, coeff]
        u_idx = len(in_specs)
        in_specs += [mid, halo_spec(h), halo_spec(h),
                     mid, halo_spec(h), halo_spec(h)]
        if correct:
            in_specs += [midc, halo_spec(th), halo_spec(bh)]
        out_specs = [mid]
        out_shape = [jax.ShapeDtypeStruct((R, nx), u.dtype)]
        if emit == "ur":
            out_specs.append(mid)
            out_shape.append(jax.ShapeDtypeStruct((R, nx), u.dtype))
        elif emit == "rc":
            # Half-height FULL-width y-restricted residual; x-half applied
            # below (restrict_x_fw) as a local XLA pass.
            out_specs.append(midc)
            out_shape.append(jax.ShapeDtypeStruct((R // 2, nx), u.dtype))
        n_pass = len(passthrough)
        aliases = {}
        n_fixed = len(in_specs)
        if emit not in ("a", "r"):
            # u' aliases the dead-after input u (see stencil_kernel.
            # smooth_sweeps_pallas): elides XLA's copy pass around carried
            # kernel outputs; safe in-place since each program reads only
            # its own u slab (halos ride separate exchanged arrays).  In
            # the edge call the u input IS the interior call's partial u'.
            aliases[u_idx] = 0
        if n_pass:
            # Donated passthrough partials for the TRAILING outputs (the
            # edge call fills its own blocks; interior rows ride through
            # the shared buffer).  Specs mirror the matching outputs.
            base = n_out - n_pass
            in_specs += [out_specs[base + j] for j in range(n_pass)]
            for j in range(n_pass):
                aliases[n_fixed + j] = base + j

        if is9:
            body_kernel = _make_dist9_kernel(
                t, g, h, ny, R, steps, emit, correct,
                i0=i0, stride=stride, n_pass=n_pass)
        else:
            body_kernel = _make_dist_kernel(
                t, g, h, steps, emit, correct,
                i0=i0, stride=stride, n_pass=n_pass)

        def run(*args):
            with _x64_scope(u.dtype):
                return pl.pallas_call(
                    body_kernel,
                    grid=(n_prog,),
                    in_specs=in_specs,
                    out_specs=(out_specs if len(out_specs) > 1
                               else out_specs[0]),
                    out_shape=(out_shape if len(out_shape) > 1
                               else out_shape[0]),
                    input_output_aliases=aliases,
                    compiler_params=cp,
                    interpret=interpret,
                )(*args, *passthrough)

        return run

    prefix = ([flag, base, c_slabs, crow] if is9 else [flag, c_slabs])

    if g < 3:
        # Too few blocks to split: single call over all slabs (the
        # pre-overlap composition; exchange completes before the kernel).
        u_top, u_bot = _windows(u, t, g, h, u_ext_t, u_ext_b)
        b_top, b_bot = _windows(b, t, g, h, b_ext_t, b_ext_b)
        args = prefix + [u, u_top, u_bot, b, b_top, b_bot]
        if correct:
            eblocks = e_x.reshape(g, t // 2, nx)
            if g == 1:
                e_top = e_ext_t[-th:][None]
                e_bot = e_ext_b[:bh][None]
            else:
                e_top = jnp.concatenate(
                    [e_ext_t[-th:][None], eblocks[:-1, t // 2 - th :]],
                    axis=0)
                e_bot = jnp.concatenate(
                    [eblocks[1:, :bh], e_ext_b[:bh][None]], axis=0)
            args += [e_x, e_top, e_bot]
        out = build_call(0, 1, g, lambda i: (i, 0),
                         lambda i: (i, 0, 0, 0), ())(*args)
        if emit == "rc":
            u_out, ry = out
            return u_out, restrict_x_fw(ry)
        return out

    # ---- overlapped two-call path -------------------------------------
    # Local-only neighbor windows (no ppermute dependency): tops[j] serves
    # block j+1, bots[j] serves block j.
    ublocks = u.reshape(g, t, nx)
    bblocks = b.reshape(g, t, nx)
    u_tops_loc = ublocks[:-1, t - h :]   # (g-1, h, nx)
    u_bots_loc = ublocks[1:, :h]
    b_tops_loc = bblocks[:-1, t - h :]
    b_bots_loc = bblocks[1:, :h]

    int_args = prefix + [u, u_tops_loc[: g - 2], u_bots_loc[1:],
                         b, b_tops_loc[: g - 2], b_bots_loc[1:]]
    if correct:
        eblocks = e_x.reshape(g, t // 2, nx)
        e_tops_loc = eblocks[:-1, t // 2 - th :]
        e_bots_loc = eblocks[1:, :bh]
        int_args += [e_x, e_tops_loc[: g - 2], e_bots_loc[1:]]
    interior = build_call(1, 1, g - 2, lambda i: (i + 1, 0),
                          lambda i: (i + 1, 0, 0, 0), ())(*int_args)
    part = interior if isinstance(interior, (tuple, list)) else (interior,)

    # Edge call: blocks {0, g-1}; remote halos + the adjacent local
    # windows (pre-gathered above, so the in-place interior write cannot
    # clobber them).
    u_top_e = jnp.stack([u_ext_t, u_tops_loc[g - 2]])
    u_bot_e = jnp.stack([u_bots_loc[0], u_ext_b])
    b_top_e = jnp.stack([b_ext_t, b_tops_loc[g - 2]])
    b_bot_e = jnp.stack([b_bots_loc[0], b_ext_b])
    edge_args = prefix + [part[0], u_top_e, u_bot_e, b, b_top_e, b_bot_e]
    if emit in ("a", "r"):
        # Output is not u-aliased: the edge call's u input is the ORIGINAL
        # u (interior call did not donate it), its out passthrough is the
        # interior partial.
        edge_args[len(prefix)] = u
    if correct:
        e_top_e = jnp.stack([e_ext_t[-th:], e_tops_loc[g - 2]])
        e_bot_e = jnp.stack([e_bots_loc[0], e_ext_b[:bh]])
        edge_args += [e_x, e_top_e, e_bot_e]
    passthrough = ((part[0],) if emit in ("a", "r")
                   else tuple(part[1:n_out]))
    edge_gm = g - 1
    out = build_call(0, edge_gm, 2, lambda i: (i * edge_gm, 0),
                     lambda i: (i * edge_gm, 0, 0, 0),
                     passthrough)(*edge_args)
    if emit == "rc":
        u_out, ry = out
        return u_out, restrict_x_fw(ry)
    return out
