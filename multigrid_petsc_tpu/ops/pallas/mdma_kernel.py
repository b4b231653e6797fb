"""Manual-DMA fused visit kernels (round 4).

Why these exist: the BlockSpec auto-pipelined visit kernels measure as
*additive* DMA + VPU (no overlap), on top of a fresh-output streaming
rate of ~0.5x the XLA triad (probe_dma.py, probe_attribution_r04.txt).
A manual in-kernel double-buffered DMA loop streams at ~0.91x triad on
the same runtime, and with explicit start/compute/wait scheduling the
stencil compute overlaps the copies by construction.  These kernels
re-implement the fused-CG fine-level visits in that regime:

  * inputs/outputs live in HBM (``pl.ANY``); each sequential grid step
    copies its halo-extended row window in and its result blocks out
    through double-buffered VMEM scratch,
  * the halo rides IN the window (offset DMA) — no separately gathered
    halo-window arrays at all,
  * block i's compute runs while block i+1's window is in flight,
  * (round 5) BOTH halves of the inter-level transfers run in VMEM: the
    down kernels emit the FULLY restricted residual in the next level's
    padded layout (transpose-trick x-restriction, _restrict_x_pad) and
    the up kernel consumes the COARSE-width correction (_prolong_x_pad)
    — for adjacent single-grid levels there is zero XLA transfer glue
    between kernels (measured: precond 11.3 -> 7.6 ms at 8193^2,
    benchmarks/results/probe_mdma_glue_r05.txt).

**Lane padding.**  Mosaic rejects HBM row-slices (static or dynamic) on
arrays whose LANE dimension is not a multiple of 128 ("failed to prove a
tile index divisible" — bisected in /tmp offset tests, round 4), so the
(2^m - 1)-wide solver arrays are carried lane-padded to ``lane_pad(nx)``
columns on this path.  The pad columns hold zeros — which IS the
eliminated-Dirichlet east boundary, so ``shift_e`` semantics come for
free — and every kernel masks its stores with the (row, lane) inside
predicate so the pads stay exactly zero through the whole CG loop.

DMA geometry: halo fixed at H = 8 rows (>= k+2 for k <= 6 sweeps);
tiles are multiples of 16, so every slice offset (i*t + H, i*t, i*t/2)
is 8-row aligned.  Round-5 CARRY-HALO scheme (see ``_in_sched``): each
HBM row is read exactly once — a block's leading 2H halo rows come from
the previous block's buffer tail via a VMEM copy, so there are no halo
re-reads, no realignment rolls, and input windows never overlap output
rows (out-DMAs overlap in-DMAs even on donated in-place streams).
``mdma_viable`` requires the last block to hold >= 17 rows so every
window stays inside the row-padded array.

Numerics: identical step bodies and masks as ``stencil_kernel``'s
auto-pipelined kernels (interpret-mode parity is exact); only data
movement differs.  Reference analogue: these replace the per-level
smoother + residual + transfer MatMult chain of the reference's inner
KSPSolve (/root/reference/src/solver.c:1516-1550).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.stencil import Stencil5
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _coeff_cols,
    _compute_dtype,
    _shift_e,
    _shift_w,
    _x64_scope,
)

H = 8  # fixed halo rows


def lane_pad(nx: int) -> int:
    """Padded lane count (multiple of 128) the mdma path carries."""
    return ((nx + 127) // 128) * 128


def shape_pad(ny: int, nx: int) -> tuple[int, int]:
    """The (rows, lanes) the mdma path carries a logical (ny, nx) array
    as: rows to a multiple of 8, lanes to a multiple of 128 — every DMA
    window/length is then 8-aligned AND in logical bounds.  Pad rows and
    columns hold zeros (the eliminated Dirichlet boundary) and every
    kernel's inside mask keeps them zero."""
    return ((ny + 7) // 8) * 8, lane_pad(nx)


def _pick_tile_mdma(nx_p: int, itemsize: int, slabs: int = 6,
                    cap: int = 160) -> int:
    """Row tile (multiple of 16) keeping ``slabs`` double-buffered
    (t+2H, nx_p)-ish buffers plus ~10 compute temporaries inside ~90MB.

    ALL mdma entry points use the same ``slabs=6`` (the papply kernel's
    buffer count, the most conservative) so that the tile — and with it
    the last-block geometry that ``mdma_viable`` certifies — is ONE value
    per (nx, dtype).  Per-kernel slab counts previously let the gate
    approve shapes whose actual kernels picked a different tile with a
    <2H+1-row last block (zero-length/undefined DMA geometry); the r4
    tile sweep showed 64-224 rows perform identically, so pinning the
    conservative count costs nothing."""
    row_b = max(1, nx_p) * itemsize
    budget = 112 * 2**20
    t = budget // ((2 * slabs + 10) * row_b) - 2 * H
    t = max(16, min(cap, (t // 16) * 16))
    return t


def _tile_geometry(ny: int, nx_p: int, itemsize: int) -> tuple[int, int]:
    """(tile, grid) the mdma kernels actually run with.

    Scans downward from the VMEM-budget tile to the largest 16-multiple
    whose LAST block still holds >= 2H+1 rows (the invariant every DMA
    window relies on); e.g. ny=8191 rejects t=112 (15-row last block) and
    lands on t=96.  Returns (0, 0) when no tile works — mdma_viable then
    reports the shape as out of envelope."""
    t_max = _pick_tile_mdma(nx_p, itemsize)
    for t in range(t_max, 15, -16):
        g = (ny + t - 1) // t
        if g >= 3 and ny >= t + 2 * H and ny - (g - 1) * t >= 2 * H + 1:
            return t, g
    return 0, 0


def _check_tile(ny: int, t: int, g: int) -> None:
    """The invariant every kernel's DMA geometry relies on (also certified
    by mdma_viable; asserted here so an entry point can never run with a
    different tile than the gate checked)."""
    last = ny - (g - 1) * t
    if not (g >= 3 and ny >= t + 2 * H and last >= 2 * H + 1):
        raise ValueError(
            f"mdma tile geometry invalid: ny={ny} t={t} g={g} last={last}"
        )


def mdma_viable(ny: int, nx: int, sweeps: int, dtype) -> bool:
    """Shape/sweep envelope of the manual-DMA visits."""
    if sweeps + 2 > H or ny % 2 == 0 or nx % 2 == 0:
        return False
    # _tile_geometry only returns tiles whose last block holds >= 2H+1
    # rows (every other block's (t+2H)-row window and every
    # coarse-correction window then stays inside the array); (0, 0) means
    # no such tile exists.
    t, _g = _tile_geometry(ny, lane_pad(nx), jnp.dtype(dtype).itemsize)
    return t > 0


def _aligned(x):
    return pl.multiple_of(x, 8)


def _ceil8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _in_sched(hbm, buf, sems, sidx, *, stride, halo, n_src, t_len, g):
    """(start, wait, carry) closures for one input stream under the
    CARRY-HALO scheme (round 5).

    Window i = [i*stride - halo, i*stride + t_len + halo).  Each row of
    HBM is DMA'd exactly ONCE:

      * block 0 DMAs rows [0, t_len + halo) to buffer offset ``halo``
        (buffer rows [0, halo) are out-of-grid and masked by the caller),
      * block i >= 1 receives its first 2*halo rows from the PREVIOUS
        block's buffer tail via ``carry`` (a VMEM copy — the tail of
        window i-1 IS the head of window i) and DMAs only the fresh rows
        [i*stride + halo, i*stride + t_len + halo) to offset 2*halo.

    Consequences (probe_mdma_vpu.py, r5): no halo re-reads from HBM, no
    realignment roll (windows land at fixed offsets), and — because a
    fresh window now never overlaps any output block's rows — out-DMAs
    can be issued WITHOUT waiting for input completion even on donated
    in-place streams, so input and output transfers overlap (the old
    wait-input-before-output order strictly alternated them: the "pure
    pipeline" ablation measured 0.54x triad).

    ``halo=0`` degenerates to exact blocks with a no-op carry.

    Compiled Mosaic requires 8-multiple slice LENGTHS; the short
    last-block length is rounded up — the over-read stays in bounds
    because every mdma-path array is row-padded to a multiple of 8 by
    shape_pad/pad2, and is masked by the caller's ``inside`` predicate.
    A last block whose real rows are fully covered by the carried halo
    (len <= 0, possible for the half-stride e-stream) skips its DMA
    statically on both start and wait."""
    off = 2 * halo if halo else 0
    first_len = t_len + halo
    last_lo = (g - 1) * stride + halo
    last_len = _ceil8(n_src - last_lo)  # in-bounds: arrays are row-padded

    def dma(slot, blk, which):
        if which == "first":
            return pltpu.make_async_copy(
                hbm.at[pl.ds(0, first_len)],
                buf.at[slot, pl.ds(halo, first_len)],
                sems.at[slot, sidx])
        if which == "last":
            return pltpu.make_async_copy(
                hbm.at[pl.ds(last_lo, last_len)],
                buf.at[slot, pl.ds(off, last_len)],
                sems.at[slot, sidx])
        src = _aligned(blk * stride + halo)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(src, t_len)],
            buf.at[slot, pl.ds(off, t_len)],
            sems.at[slot, sidx])

    def emit(slot, blk, fn):
        @pl.when(blk == 0)
        def _():
            fn(dma(slot, blk, "first"))

        @pl.when((blk > 0) & (blk < g - 1))
        def _():
            fn(dma(slot, blk, "mid"))

        if last_len > 0:
            @pl.when(blk == g - 1)
            def _():
                fn(dma(slot, blk, "last"))

    def start(slot, blk):
        emit(slot, blk, lambda d: d.start())

    def wait(slot, blk):
        emit(slot, blk, lambda d: d.wait())

    def carry(slot, nxt):
        if halo:
            buf[nxt, pl.ds(0, 2 * halo)] = buf[slot,
                                               pl.ds(t_len, 2 * halo)]

    return start, wait, carry


def _out_sched(buf, hbm, sems, sidx, *, stride, n_dst, g):
    """(start, wait_prev, drain) closures for one output's block DMA.
    The short last-block length is rounded up to 8 in compiled mode (the
    extra rows land in the destination's own tile padding — logical rows
    >= n_dst are never read back); see _in_sched."""
    last_len = _ceil8(n_dst - (g - 1) * stride)

    def dma(slot, blk, full):
        rows = stride if full else last_len
        return pltpu.make_async_copy(
            buf.at[slot, pl.ds(0, rows)],
            hbm.at[pl.ds(_aligned(blk * stride), rows)],
            sems.at[slot, sidx])

    def start(slot, blk):
        @pl.when(blk < g - 1)
        def _():
            dma(slot, blk, True).start()

        @pl.when(blk == g - 1)
        def _():
            dma(slot, blk, False).start()

    def wait_prev(slot, blk):
        # Mid-pipeline waits only ever target non-last blocks.
        dma(slot, blk, True).wait()

    def drain(slot_last):
        dma(1 - slot_last, g - 2, True).wait()
        dma(slot_last, g - 1, False).wait()

    return start, wait_prev, drain


def _restrict_x_pad(rc_y: jnp.ndarray, nxc: int, nxc_p: int) -> jnp.ndarray:
    """In-VMEM x-direction half of full weighting on a lane-PADDED
    y-restricted slab, (tc, nx_p) -> (tc, nxc_p), including the overall
    1/16 scale — same math as stencil_kernel.restrict_x_fw.

    Round-5 split (probe_transpose.py): the [1,2,1] arithmetic runs in
    LANE form via two lane-rolls (0.07 ms/visit at 8191^2), and only the
    even-lane COMPACTION uses the transpose -> sublane de-interleave ->
    transpose-back shuffle (0.24 ms) — doing the arithmetic on the
    transposed slab (sublane concats) cost 0.42 ms more per visit.
    Mosaic cannot stride lanes, hence the shuffle for the compaction.

    Roll safety: lanes >= nx of ``rc_y`` are zero (callers mask), and the
    used lanes 2J+2 <= 2*nxc = nx - 1 < nx_p - 1 never see the cyclic
    wrap (nx odd < nx_p)."""
    tc, nx_p = rc_y.shape
    # s[:, 2J] = rc_y[2J] + 2 rc_y[2J+1] + rc_y[2J+2]
    s = (rc_y + 2.0 * pltpu.roll(rc_y, nx_p - 1, 1)
         + pltpu.roll(rc_y, nx_p - 2, 1))
    st = s.T  # (nx_p, tc)
    res = 0.0625 * st[: 2 * nxc].reshape(nxc, 2, tc)[:, 0]  # even lanes
    if nxc_p > nxc:
        res = jnp.concatenate(
            [res, jnp.zeros((nxc_p - nxc, tc), res.dtype)], axis=0)
    return res.T


def _prolong_x_pad(e: jnp.ndarray, nxc: int, nx: int,
                   nx_p: int) -> jnp.ndarray:
    """In-VMEM x-direction half of bilinear prolongation on a lane-PADDED
    coarse slab, (rows, nxc_p) -> (rows, nx_p): fine col 2J+1 = e[:, J],
    col 2J = neighbor average (zero Dirichlet edges), fine lane pads
    zero.  The up kernel thus consumes the COARSE-width correction (half
    the e bytes, no XLA prolong/pad passes).

    Round-5 split (probe_transpose.py, like _restrict_x_pad): only the
    even-lane SPREAD (coarse J -> fine lane 2J, zeros between) uses the
    transpose shuffle; the neighbor-average/interleave arithmetic runs
    in lane form with two rolls and a parity select (the all-transposed
    form cost 0.59 ms/visit vs ~0.33 for this split).

    Roll safety: ``sp``'s lanes >= 2*nxc are zero and nx_p >= nx + 1, so
    the right-roll wrap (lane 0 <- sp[nx_p - 1], lane 1 <- sp[nx_p - 2])
    only ever injects zeros."""
    rows, nxc_p = e.shape
    # Spread: sp[:, 2J] = e[:, J] (J < nxc), other lanes zero.
    et = e.T[:nxc]  # (nxc, rows) — sublane slice after transpose
    z = jnp.zeros((nxc, rows), e.dtype)
    sp = jnp.stack([et, z], axis=1).reshape(2 * nxc, rows)
    if nx_p > 2 * nxc:
        sp = jnp.concatenate(
            [sp, jnp.zeros((nx_p - 2 * nxc, rows), e.dtype)], axis=0)
    sp = sp.T  # (rows, nx_p)
    # odd fine lane 2J+1 <- e[J] = sp[2J];  even fine lane 2J <-
    # 0.5 (e[J-1] + e[J]) = 0.5 (sp[2J-2] + sp[2J]);  e[-1] = e[nxc] = 0.
    odd = pltpu.roll(sp, 1, 1)
    even = 0.5 * (sp + pltpu.roll(sp, 2, 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1)
    return jnp.where(lane % 2 == 0, even, odd)


def _apply5(c_ref, v):
    cs = c_ref[0, 0]
    cw = c_ref[0, 1]
    cc = c_ref[0, 2]
    ce = c_ref[0, 3]
    cn = c_ref[0, 4]
    south = jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]], axis=0)
    north = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)
    return (cc * v + cs * south + cn * north
            + cw * _shift_w(v) + ce * _shift_e(v))


def _coeff_slabs(st, ny, t, g, dtype):
    cols = jnp.concatenate(
        [c.reshape(1, -1) for c in _coeff_cols(st, ny, dtype)], axis=0)
    t2 = t + 2 * H
    idx = jnp.asarray(np.clip(
        (np.arange(g) * t - H)[:, None] + np.arange(t2)[None, :], 0, ny - 1))
    return cols[:, idx].transpose(1, 0, 2)[..., None]  # (g, 5, t2, 1)


def _inside(i, t, ny, nx, shape, halo=H):
    grow = (i.astype(jnp.int32) * jnp.int32(t) - jnp.int32(halo)
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
            & (lane < jnp.int32(nx)))


# --------------------------------------------------------------------------
# Kernel 1: fused CG residual update + zero-guess down visit.
#   (r, ap, alpha) -> u0 = smooth_k(b=r', 0), R_y(r' - A u0), r' = r-a*ap,
#   per-block ||r'||^2 partials.  r -> r', ap -> u0 donated.
# --------------------------------------------------------------------------


def _cg_down_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, nxc_p):
    t2 = t + 2 * H

    def kernel(c_ref, alpha_ref, r_hbm, ap_hbm,
               u_hbm, rc_hbm, rn_hbm, nrm_ref,
               rbuf, apbuf, ubuf, rcbuf, rnbuf, in_sems, out_sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        r_start, r_wait, r_carry = _in_sched(
            r_hbm, rbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        a_start, a_wait, a_carry = _in_sched(
            ap_hbm, apbuf, in_sems, 1,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        u_start, u_wait, u_drain = _out_sched(ubuf, u_hbm, out_sems, 0,
                                              stride=t, n_dst=ny, g=g)
        c_start, c_wait, c_drain = _out_sched(rcbuf, rc_hbm, out_sems, 1,
                                              stride=t // 2, n_dst=nyc, g=g)
        n_start, n_wait, n_drain = _out_sched(rnbuf, rn_hbm, out_sems, 2,
                                              stride=t, n_dst=ny, g=g)

        # Pipeline invariant: block i's fresh rows were started by block
        # i-1 and are waited here; block 0 bootstraps itself.  Exactly
        # one wait per start.  Donation safety is BY CONSTRUCTION under
        # the carry-halo scheme: a fresh input window [i*t + H,
        # i*t + t + H) never overlaps any output block's rows [j*t,
        # j*t + t) for j < i, so the in-place r/ap streams are safe with
        # out-DMAs issued before input completion.
        @pl.when(i == 0)
        def _():
            r_start(slot, i)
            a_start(slot, i)

        r_wait(slot, i)
        a_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            r_carry(slot, nxt)
            a_carry(slot, nxt)
            r_start(nxt, i + 1)
            a_start(nxt, i + 1)

        r = rbuf[slot]
        ap = apbuf[slot]
        if r.dtype == jnp.bfloat16:
            r = r.astype(jnp.float32)
            ap = ap.astype(jnp.float32)

        inside = _inside(i, t, ny, nx, r.shape)
        alpha = alpha_ref[0, 0]
        b = jnp.where(inside, r - alpha * ap, 0.0)

        dinv = 1.0 / c_ref[0, 2]
        u = jnp.zeros_like(b)
        p = jnp.zeros_like(b)
        first = True
        for (alpha_s, beta_s) in steps:
            z = dinv * b if first else dinv * (b - _apply5(c_ref, u))
            first = False
            p = beta_s * p + alpha_s * z
            u = jnp.where(inside, u + p, 0.0)

        b_mid = b[H : H + t]
        nrm_ref[i, 0] = jnp.sum(b_mid * b_mid)
        rr = b - _apply5(c_ref, u)
        v = rr[H : H + t].reshape(t // 2, 2, rr.shape[-1])
        ev, od = v[:, 0], v[:, 1]
        ev_next = jnp.concatenate([ev[1:], rr[H + t : H + t + 1]], axis=0)
        rc_y = ev + 2.0 * od + ev_next
        rc = _restrict_x_pad(rc_y, nxc, nxc_p)
        # Coarse-row mask: the last block's pad rows would otherwise pick
        # up real fine-grid values (row 2j of a pad row j is in-grid) —
        # rc's pads must stay exactly zero (it IS the next level's padded
        # rhs).
        rc = jnp.where(_inside(i, t // 2, nyc, nxc_p, rc.shape, halo=0),
                       rc, 0.0)

        @pl.when(i >= 2)
        def _():
            u_wait(slot, i - 2)
            c_wait(slot, i - 2)
            n_wait(slot, i - 2)

        ubuf[slot] = u[H : H + t].astype(ubuf.dtype)
        rnbuf[slot] = b_mid.astype(rnbuf.dtype)
        rcbuf[slot] = rc.astype(rcbuf.dtype)

        u_start(slot, i)
        c_start(slot, i)
        n_start(slot, i)

        @pl.when(i == g - 1)
        def _():
            u_drain(slot)
            c_drain(slot)
            n_drain(slot)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ny", "nx", "steps", "interpret"))
def cg_visit_down_mdma(
    st: Stencil5,
    r: jnp.ndarray,
    ap: jnp.ndarray,
    alpha,
    steps: tuple,
    ny: int | None = None,
    nx: int | None = None,
    interpret: bool = False,
):
    """(u0, rc, r', ||r'||^2 partial-sum) on shape_pad-PADDED arrays.

    ``r``/``ap`` are shape_pad(ny, nx) arrays with zero pads and are
    DONATED (r -> r', ap -> u0).  ``rc`` is the FULLY restricted
    residual (both halves of full weighting, in-kernel x-restriction) in
    the NEXT level's padded layout shape_pad(nyc, nxc) — for a 1-gap
    coarser level it is that level's padded rhs verbatim.  ``ny``/``nx``
    are the REAL interior dims."""
    ny_p, nx_p = r.shape
    ny = ny_p if ny is None else ny
    nx = nx_p if nx is None else nx
    k = len(steps)
    if not mdma_viable(ny, nx, k, r.dtype):
        raise ValueError("shape not viable for mdma visit")
    t, g = _tile_geometry(ny, nx_p, jnp.dtype(r.dtype).itemsize)
    _check_tile(ny, t, g)
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2
    nyc_p, nxc_p = shape_pad(nyc, nxc)
    t2 = t + 2 * H

    c_slabs = _coeff_slabs(st, ny, t, g, _compute_dtype(r.dtype))
    cdt = _compute_dtype(r.dtype)
    alpha_arr = jnp.full((1, 1), alpha, cdt)

    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    nrm_spec = pl.BlockSpec((g, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    with _x64_scope(r.dtype):
        u0, rc, r_new, nrm = pl.pallas_call(
            _cg_down_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, nxc_p),
            grid=(g,),
            in_specs=[coeff, smem1, any_spec, any_spec],
            out_specs=[any_spec, any_spec, any_spec, nrm_spec],
            out_shape=[
                jax.ShapeDtypeStruct((ny_p, nx_p), r.dtype),    # u0
                jax.ShapeDtypeStruct((nyc_p, nxc_p), r.dtype),  # rc
                jax.ShapeDtypeStruct((ny_p, nx_p), r.dtype),    # r'
                jax.ShapeDtypeStruct((g, 1), cdt),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t2, nx_p), r.dtype),
                pltpu.VMEM((2, t2, nx_p), r.dtype),
                pltpu.VMEM((2, t, nx_p), r.dtype),
                pltpu.VMEM((2, t // 2, nxc_p), r.dtype),
                pltpu.VMEM((2, t, nx_p), r.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            input_output_aliases={3: 0, 2: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=124 * 2**20,
            ),
            interpret=interpret,
        )(c_slabs, alpha_arr, r, ap)
    return u0, rc, r_new, jnp.sum(nrm)


# --------------------------------------------------------------------------
# Kernel 1b: plain zero-guess down visit (no CG update): the mid-hierarchy
# down leg.  (b) -> u0 = smooth_k(b, 0), R_y(b - A u0).
# --------------------------------------------------------------------------


def _down_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, nxc_p):
    t2 = t + 2 * H

    def kernel(c_ref, b_hbm, u_hbm, rc_hbm,
               bbuf, ubuf, rcbuf, in_sems, out_sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        b_start, b_wait, b_carry = _in_sched(
            b_hbm, bbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        u_start, u_wait, u_drain = _out_sched(ubuf, u_hbm, out_sems, 0,
                                              stride=t, n_dst=ny, g=g)
        c_start, c_wait, c_drain = _out_sched(rcbuf, rc_hbm, out_sems, 1,
                                              stride=t // 2, n_dst=nyc, g=g)

        @pl.when(i == 0)
        def _():
            b_start(slot, i)

        b_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            b_carry(slot, nxt)
            b_start(nxt, i + 1)

        b = bbuf[slot]
        if b.dtype == jnp.bfloat16:
            b = b.astype(jnp.float32)
        inside = _inside(i, t, ny, nx, b.shape)
        b = jnp.where(inside, b, 0.0)

        dinv = 1.0 / c_ref[0, 2]
        u = jnp.zeros_like(b)
        p = jnp.zeros_like(b)
        first = True
        for (alpha_s, beta_s) in steps:
            z = dinv * b if first else dinv * (b - _apply5(c_ref, u))
            first = False
            p = beta_s * p + alpha_s * z
            u = jnp.where(inside, u + p, 0.0)

        rr = b - _apply5(c_ref, u)
        v = rr[H : H + t].reshape(t // 2, 2, rr.shape[-1])
        ev, od = v[:, 0], v[:, 1]
        ev_next = jnp.concatenate([ev[1:], rr[H + t : H + t + 1]], axis=0)
        rc_y = ev + 2.0 * od + ev_next
        rc = _restrict_x_pad(rc_y, nxc, nxc_p)
        # Coarse-row mask — see _cg_down_kernel.
        rc = jnp.where(_inside(i, t // 2, nyc, nxc_p, rc.shape, halo=0),
                       rc, 0.0)

        @pl.when(i >= 2)
        def _():
            u_wait(slot, i - 2)
            c_wait(slot, i - 2)

        ubuf[slot] = u[H : H + t].astype(ubuf.dtype)
        rcbuf[slot] = rc.astype(rcbuf.dtype)

        # Carry-halo scheme: fresh input windows never overlap these
        # output rows, so the out-DMAs issue immediately and overlap the
        # next window's transfer (block i+1 waits it at its own top).
        u_start(slot, i)
        c_start(slot, i)

        @pl.when(i == g - 1)
        def _():
            u_drain(slot)
            c_drain(slot)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ny", "nx", "steps", "interpret"))
def visit_down_mdma(
    st: Stencil5,
    b: jnp.ndarray,
    steps: tuple,
    ny: int | None = None,
    nx: int | None = None,
    interpret: bool = False,
):
    """(u0, rc): the zero-guess down visit on a shape_pad-PADDED b —
    the mid-hierarchy down leg (every level below the finest smooths
    from zero; reference src/solver.c:1533-1538).  ``rc`` is the FULLY
    restricted residual in the next level's padded layout
    shape_pad(nyc, nxc) (see cg_visit_down_mdma)."""
    ny_p, nx_p = b.shape
    ny = ny_p if ny is None else ny
    nx = nx_p if nx is None else nx
    k = len(steps)
    if not mdma_viable(ny, nx, k, b.dtype):
        raise ValueError("shape not viable for mdma visit")
    t, g = _tile_geometry(ny, nx_p, jnp.dtype(b.dtype).itemsize)
    _check_tile(ny, t, g)
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2
    nyc_p, nxc_p = shape_pad(nyc, nxc)
    t2 = t + 2 * H

    c_slabs = _coeff_slabs(st, ny, t, g, _compute_dtype(b.dtype))
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    with _x64_scope(b.dtype):
        u0, rc = pl.pallas_call(
            _down_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, nxc_p),
            grid=(g,),
            in_specs=[coeff, any_spec],
            out_specs=[any_spec, any_spec],
            out_shape=[
                jax.ShapeDtypeStruct((ny_p, nx_p), b.dtype),
                jax.ShapeDtypeStruct((nyc_p, nxc_p), b.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t2, nx_p), b.dtype),
                pltpu.VMEM((2, t, nx_p), b.dtype),
                pltpu.VMEM((2, t // 2, nxc_p), b.dtype),
                pltpu.SemaphoreType.DMA((2, 1)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=124 * 2**20,
            ),
            interpret=interpret,
        )(c_slabs, b)
    return u0, rc


# --------------------------------------------------------------------------
# Kernel 2: up visit with in-kernel coarse correction + <b, u''> emission.
#   (b, u, e_c) -> z = smooth_k(b, u + P e_c), <b, z> partials.
#   u -> z donated.  e_c is the COARSE correction, shape_pad(nyc, nxc);
#   both halves of the bilinear prolongation run in VMEM.
# --------------------------------------------------------------------------


def _up_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, emit_dot):
    t2 = t + 2 * H
    s = t // 2

    def kernel(c_ref, b_hbm, u_hbm, e_hbm, z_hbm, *rest):
        if emit_dot:
            dot_ref = rest[0]
            bufs = rest[1:]
        else:
            bufs = rest
        bbuf, ubuf, ebuf, zbuf, in_sems, out_sems = bufs
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        b_start, b_wait, b_carry = _in_sched(
            b_hbm, bbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        u_start, u_wait, u_carry = _in_sched(
            u_hbm, ubuf, in_sems, 1,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        e_start, e_wait, e_carry = _in_sched(
            e_hbm, ebuf, in_sems, 2,
            stride=s, halo=H, n_src=nyc, t_len=s, g=g)
        z_start, z_wait, z_drain = _out_sched(zbuf, z_hbm, out_sems, 0,
                                              stride=t, n_dst=ny, g=g)

        @pl.when(i == 0)
        def _():
            b_start(slot, i)
            u_start(slot, i)
            e_start(slot, i)

        b_wait(slot, i)
        u_wait(slot, i)
        e_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            b_carry(slot, nxt)
            u_carry(slot, nxt)
            e_carry(slot, nxt)
            b_start(nxt, i + 1)
            u_start(nxt, i + 1)
            e_start(nxt, i + 1)

        b = bbuf[slot]
        u = ubuf[slot]
        e = ebuf[slot]
        if b.dtype == jnp.bfloat16:
            b = b.astype(jnp.float32)
            u = u.astype(jnp.float32)
            e = e.astype(jnp.float32)

        inside = _inside(i, t, ny, nx, b.shape)
        b = jnp.where(inside, b, 0.0)
        u = jnp.where(inside, u, 0.0)
        # Coarse rows of the e slab: global row i*s - H + j.
        e_inside = _inside(i, s, nyc, nxc, e.shape)
        e = jnp.where(e_inside, e, 0.0)

        # x-half of the bilinear prolongation in VMEM (transpose trick;
        # only the rows the y-half below consumes), then the y-half.
        # Fine slab row j is global i*t - H + j (even offset), so pairs
        # (2m, 2m+1) map to coarse slab rows (m + H/2 - 1, m + H/2) /
        # (m + H/2):
        #   even fine row 2m  -> 0.5*(e[m + H/2 - 1] + e[m + H/2])
        #   odd  fine row 2m+1 ->      e[m + H/2]
        es = e[H // 2 - 1 : H // 2 - 1 + t2 // 2 + 1]
        es = _prolong_x_pad(es, nxc, nx, nx_p)
        prev, cur = es[:-1], es[1:]
        pe = jnp.stack([0.5 * (prev + cur), cur], axis=1)
        u = jnp.where(inside, u + pe.reshape(t2, pe.shape[-1]), 0.0)

        dinv = 1.0 / c_ref[0, 2]
        p = jnp.zeros_like(u)
        for (alpha_s, beta_s) in steps:
            z = dinv * (b - _apply5(c_ref, u))
            p = beta_s * p + alpha_s * z
            u = jnp.where(inside, u + p, 0.0)

        u_mid = u[H : H + t]
        if emit_dot:
            dot_ref[i, 0] = jnp.sum(b[H : H + t] * u_mid)

        @pl.when(i >= 2)
        def _():
            z_wait(slot, i - 2)

        zbuf[slot] = u_mid.astype(zbuf.dtype)

        z_start(slot, i)

        @pl.when(i == g - 1)
        def _():
            z_drain(slot)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ny", "nx", "steps", "emit_dot",
                                    "interpret"))
def visit_up_mdma(
    st: Stencil5,
    b: jnp.ndarray,
    u: jnp.ndarray,
    e_c: jnp.ndarray,
    steps: tuple,
    ny: int | None = None,
    nx: int | None = None,
    emit_dot: bool = True,
    interpret: bool = False,
):
    """z = smooth_k(b, u + P e_c) [, <b, z>] on shape_pad-PADDED
    arrays.  ``u`` is DONATED (u -> z); ``e_c`` is the COARSE correction
    in shape_pad(nyc, nxc) layout (a 1-gap coarser mdma level's solution
    verbatim), with zero pads; both halves of the bilinear prolongation
    run in VMEM."""
    ny_p, nx_p = b.shape
    ny = ny_p if ny is None else ny
    nx = nx_p if nx is None else nx
    k = len(steps)
    if not mdma_viable(ny, nx, k, b.dtype):
        raise ValueError("shape not viable for mdma visit")
    t, g = _tile_geometry(ny, nx_p, jnp.dtype(b.dtype).itemsize)
    _check_tile(ny, t, g)
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2
    nxc_p = lane_pad(nxc)
    if e_c.shape != (shape_pad(nyc, nxc)):
        raise ValueError(
            f"e_c must be shape_pad(nyc, nxc) = {shape_pad(nyc, nxc)}, "
            f"got {e_c.shape}"
        )
    t2 = t + 2 * H

    c_slabs = _coeff_slabs(st, ny, t, g, _compute_dtype(b.dtype))
    cdt = _compute_dtype(b.dtype)

    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [any_spec]
    out_shape = [jax.ShapeDtypeStruct((ny_p, nx_p), b.dtype)]
    if emit_dot:
        out_specs.append(pl.BlockSpec((g, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((g, 1), cdt))

    with _x64_scope(b.dtype):
        out = pl.pallas_call(
            _up_kernel(ny, nx, nx_p, t, g, steps, nyc, nxc, emit_dot),
            grid=(g,),
            in_specs=[coeff, any_spec, any_spec, any_spec],
            out_specs=out_specs if emit_dot else out_specs[0],
            out_shape=out_shape if emit_dot else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((2, t2, nx_p), b.dtype),       # b windows
                pltpu.VMEM((2, t2, nx_p), b.dtype),       # u windows
                pltpu.VMEM((2, t // 2 + 2 * H, nxc_p), b.dtype),  # e windows
                pltpu.VMEM((2, t, nx_p), b.dtype),        # z staging
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2, 1)),
            ],
            input_output_aliases={2: 0},  # u -> z
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=124 * 2**20,
            ),
            interpret=interpret,
        )(c_slabs, b, u, e_c)
    if emit_dot:
        z, dots = out
        return z, jnp.sum(dots)
    return out


# --------------------------------------------------------------------------
# Kernel 3: CG direction step + LAGGED solution update.
#   (z, p, u, alpha_prev, beta) ->
#       u' = u + alpha_prev * p          (the previous iteration's axpy)
#       p' = z + beta * p;  ap = A p';  <p', ap> partials
#   z -> ap, p -> p', u -> u' donated.  Folding the axpy here removes the
#   separate 3-pass XLA update from the loop (callers flush the final
#   u += alpha * p once after the loop).
# --------------------------------------------------------------------------


def _papply_kernel(ny, nx, nx_p, t, g):
    t2 = t + 2 * H

    def kernel(c_ref, sc_ref, z_hbm, p_hbm, u_hbm,
               pn_hbm, ap_hbm, un_hbm, dot_ref,
               zbuf, pbuf, ubuf, pnbuf, apbuf, unbuf, in_sems, out_sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        z_start, z_wait, z_carry = _in_sched(
            z_hbm, zbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        p_start, p_wait, p_carry = _in_sched(
            p_hbm, pbuf, in_sems, 1,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        u_start, u_wait, u_carry = _in_sched(
            u_hbm, ubuf, in_sems, 2,
            stride=t, halo=0, n_src=ny, t_len=t, g=g)
        pn_s, pn_w, pn_d = _out_sched(pnbuf, pn_hbm, out_sems, 0,
                                      stride=t, n_dst=ny, g=g)
        ap_s, ap_w, ap_d = _out_sched(apbuf, ap_hbm, out_sems, 1,
                                      stride=t, n_dst=ny, g=g)
        un_s, un_w, un_d = _out_sched(unbuf, un_hbm, out_sems, 2,
                                      stride=t, n_dst=ny, g=g)

        @pl.when(i == 0)
        def _():
            z_start(slot, i)
            p_start(slot, i)
            u_start(slot, i)

        z_wait(slot, i)
        p_wait(slot, i)
        u_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            z_carry(slot, nxt)
            p_carry(slot, nxt)
            z_start(nxt, i + 1)
            p_start(nxt, i + 1)
            u_start(nxt, i + 1)

        z = zbuf[slot]
        p = pbuf[slot]
        uu = ubuf[slot]
        if z.dtype == jnp.bfloat16:
            z = z.astype(jnp.float32)
            p = p.astype(jnp.float32)
            uu = uu.astype(jnp.float32)

        alpha_prev = sc_ref[0, 0]
        beta = sc_ref[0, 1]
        inside = _inside(i, t, ny, nx, z.shape)
        pn = jnp.where(inside, z + beta * p, 0.0)
        ap = jnp.where(inside, _apply5(c_ref, pn), 0.0)

        pn_mid = pn[H : H + t]
        ap_mid = ap[H : H + t]
        # Mask the lagged solution update too: the last block's ubuf rows
        # beyond the loaded length hold stale VMEM — unmasked they'd write
        # garbage into u's row-pad region and break the zero-pad invariant.
        un = jnp.where(inside[H : H + t],
                       uu + alpha_prev * p[H : H + t], 0.0)
        dot_ref[i, 0] = jnp.sum(pn_mid * ap_mid)

        @pl.when(i >= 2)
        def _():
            pn_w(slot, i - 2)
            ap_w(slot, i - 2)
            un_w(slot, i - 2)

        pnbuf[slot] = pn_mid.astype(pnbuf.dtype)
        apbuf[slot] = ap_mid.astype(apbuf.dtype)
        unbuf[slot] = un.astype(unbuf.dtype)

        pn_s(slot, i)
        ap_s(slot, i)
        un_s(slot, i)

        @pl.when(i == g - 1)
        def _():
            pn_d(slot)
            ap_d(slot)
            un_d(slot)

    return kernel


@functools.partial(jax.jit, static_argnames=("ny", "nx", "interpret"))
def cg_papply_u_mdma(
    st: Stencil5,
    z: jnp.ndarray,
    p: jnp.ndarray,
    u: jnp.ndarray,
    alpha_prev,
    beta,
    ny: int | None = None,
    nx: int | None = None,
    interpret: bool = False,
):
    """(p', A p', u + alpha_prev*p, <p', A p'>) on shape_pad-PADDED
    arrays.  ``z``/``p``/``u`` are DONATED (z -> ap, p -> p', u -> u')."""
    ny_p, nx_p = z.shape
    ny = ny_p if ny is None else ny
    nx = nx_p if nx is None else nx
    if not mdma_viable(ny, nx, 1, z.dtype):
        raise ValueError("shape not viable for mdma papply")
    t, g = _tile_geometry(ny, nx_p, jnp.dtype(z.dtype).itemsize)
    _check_tile(ny, t, g)
    t2 = t + 2 * H

    c_slabs = _coeff_slabs(st, ny, t, g, _compute_dtype(z.dtype))
    cdt = _compute_dtype(z.dtype)
    sc = jnp.stack([jnp.asarray(alpha_prev, cdt),
                    jnp.asarray(beta, cdt)]).reshape(1, 2)

    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    smem2 = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dot_spec = pl.BlockSpec((g, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    with _x64_scope(z.dtype):
        pn, ap, un, dots = pl.pallas_call(
            _papply_kernel(ny, nx, nx_p, t, g),
            grid=(g,),
            in_specs=[coeff, smem2, any_spec, any_spec, any_spec],
            out_specs=[any_spec, any_spec, any_spec, dot_spec],
            out_shape=[
                jax.ShapeDtypeStruct((ny_p, nx_p), z.dtype),   # p'
                jax.ShapeDtypeStruct((ny_p, nx_p), z.dtype),   # ap
                jax.ShapeDtypeStruct((ny_p, nx_p), z.dtype),   # u'
                jax.ShapeDtypeStruct((g, 1), cdt),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t2, nx_p), z.dtype),
                pltpu.VMEM((2, t2, nx_p), z.dtype),
                pltpu.VMEM((2, t, nx_p), z.dtype),
                pltpu.VMEM((2, t, nx_p), z.dtype),
                pltpu.VMEM((2, t, nx_p), z.dtype),
                pltpu.VMEM((2, t, nx_p), z.dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            input_output_aliases={3: 0, 2: 1, 4: 2},  # p->p', z->ap, u->u'
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=124 * 2**20,
            ),
            interpret=interpret,
        )(c_slabs, sc, z, p, u)
    return pn, ap, un, jnp.sum(dots)
