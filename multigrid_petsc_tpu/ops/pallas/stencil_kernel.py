"""Pallas TPU kernels for the 5-point stencil hot path.

The XLA jnp-shift stencil costs ~5-6 HBM passes per apply (pad
materialization + unfused shifts); these kernels do the minimum:

  * ``apply_stencil5_pallas``: y = A u in ONE read of u + one write of y.
    Row-slab grid; each program gets its (T, n) block plus two
    one-row halo arrays gathered outside the kernel (strided slices —
    cheap), so every input is an auto-pipelined BlockSpec: no manual DMA,
    and Pallas double-buffers the slabs for us.  Column neighbors come
    from in-VMEM shifts with a zero edge (eliminated Dirichlet).
  * ``jacobi_sweeps_pallas``: k fused damped-Jacobi sweeps with temporal
    blocking: reads u and b ONCE and writes u ONCE per k sweeps (the
    jnp path moves ~6 arrays per sweep).  Each double-buffered slab
    carries a k-row halo; pollution from the unknown slab edges travels
    one row per sweep and never reaches the stored rows, so the result
    equals plain Jacobi exactly.

Both kernels replace the SpMV inside the smoother/residual loops — the
reference's distributed MatMult hot path (reference: src/solver.c:1530-1550
inner KSPSolve sweeps; SURVEY.md C23 "every MatMult is a halo exchange").
Coefficients are (ny, 1) columns (y-dependent metrics) or scalars —
broadcast in-kernel, adding negligible traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.stencil import Stencil5


def _pick_tile(n_cols: int, dtype, bufs: int, cap: int = 512) -> int:
    """Row-tile size keeping ``bufs`` (T, n) buffers within ~64MB of VMEM
    (v5e/v5p have 128MB; every kernel here raises Mosaic's scoped limit to
    100MB).  Tiles are multiples of 16 so the 'rc' emit's half-height
    coarse block stays 8-row aligned.  Bigger tiles amortize per-program
    overhead and halo re-reads — measured 1.4-2.2x on the fused visits at
    nx=8191 going from the old 12MB budget (t=32) to 64MB (t=160)."""
    row_bytes = max(1, n_cols) * jnp.dtype(dtype).itemsize
    t = max(16, min(cap, (64 * 2**20) // (bufs * row_bytes)))
    return max(16, (t // 16) * 16)


def _x64_scope(dtype):
    """Disable x64 inside pallas_call tracing for 32-bit data (Mosaic
    cannot legalize i64 index math); keep it for 64-bit data (interpret
    mode / CPU only)."""
    import contextlib

    if jnp.dtype(dtype).itemsize >= 8:
        return contextlib.nullcontext()
    return jax.enable_x64(False)


def _coeff_cols(st: Stencil5, ny: int, dtype):
    return [jnp.broadcast_to(c, (ny, 1)).astype(dtype) for c in st]


def _load_f32(ref):
    """Read a ref upcast to f32 when it stores bf16: Mosaic's sublane
    reshape/stack interleaves (transfers) and squeezes only lower for
    32-bit lanes ('unsupported shape cast' on bf16 vectors, observed on
    v5e).  HBM<->VMEM traffic stays in the storage dtype — the bf16
    preconditioner's bandwidth win — while VMEM compute runs f32."""
    x = ref[:]
    if x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)
    return x


def _store(ref, val):
    ref[:] = val.astype(ref.dtype)


def _compute_dtype(dtype):
    """In-kernel compute dtype: f32 for bf16 storage (see _load_f32)."""
    return jnp.float32 if jnp.dtype(dtype) == jnp.bfloat16 else dtype


def _shift_w(x):
    """West neighbor (u[i, j-1]) with zero at the left edge."""
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0)))


def _shift_e(x):
    return jnp.pad(x[:, 1:], ((0, 0), (0, 1)))


# --------------------------------------------------------------------------
# Plain apply: auto-pipelined row blocks + separately gathered halo rows.
# --------------------------------------------------------------------------

def _halo_rows(u: jnp.ndarray, t: int, g: int):
    """(g, n) arrays: row i holds u[i*t - 1] / u[(i+1)*t], zeros at the
    domain boundary (eliminated Dirichlet)."""
    tops = jnp.zeros((g, u.shape[1]), u.dtype)
    top_src = u[t - 1 :: t]
    tops = tops.at[1 : 1 + min(top_src.shape[0], g - 1)].set(top_src[: g - 1])
    bots = jnp.zeros((g, u.shape[1]), u.dtype)
    bot_src = u[t::t]
    bots = bots.at[: min(bot_src.shape[0], g - 1)].set(bot_src[: g - 1])
    return tops, bots


def _make_apply_kernel(g: int, t: int, ny: int):
    tl = ny - (g - 1) * t  # valid rows in the (possibly ragged) last block

    def kernel(cs_ref, cw_ref, cc_ref, ce_ref, cn_ref,
               u_ref, top_ref, bot_ref, out_ref):
        # Index math pinned to i32: under jax_enable_x64, python-int mixing
        # would promote to i64, which Mosaic cannot legalize.
        i = pl.program_id(0).astype(jnp.int32)
        u = _load_f32(u_ref)
        if tl != t:
            # Ragged last block: rows >= tl are padding garbage; they feed
            # the north-shift of row tl-1, so zero them explicitly.
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            u = jnp.where(
                (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl)), u, 0.0
            )
        south = jnp.concatenate([_load_f32(top_ref)[0], u[:-1]], axis=0)
        north = jnp.concatenate([u[1:], _load_f32(bot_ref)[0]], axis=0)
        _store(out_ref, (
            cc_ref[:] * u
            + cs_ref[:] * south
            + cn_ref[:] * north
            + cw_ref[:] * _shift_w(u)
            + ce_ref[:] * _shift_e(u)
        ))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_stencil5_pallas(
    st: Stencil5, u: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """y = A u; one HBM read of u + one write of y."""
    ny, nx = u.shape
    t = _pick_tile(nx, u.dtype, bufs=6)
    g = pl.cdiv(ny, t)
    tops, bots = _halo_rows(u, t, g)
    # (g, 1, nx) so the per-program block (1, 1, nx) satisfies the TPU
    # tiling rule (last two dims equal to the array's).
    tops = tops.reshape(g, 1, nx)
    bots = bots.reshape(g, 1, nx)
    coeffs = _coeff_cols(st, ny, _compute_dtype(u.dtype))

    coeff_spec = pl.BlockSpec((t, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # Mosaic cannot legalize the i64 index arithmetic that jax_enable_x64
    # induces inside pallas_call — trace the kernel with x64 scoped off
    # unless the data itself is 64-bit (f64 runs use interpret/CPU).
    with _x64_scope(u.dtype):
        return pl.pallas_call(
            _make_apply_kernel(g, t, ny),
            grid=(g,),
            in_specs=[coeff_spec] * 5
            + [
                pl.BlockSpec((t, nx), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                halo_spec,
                halo_spec,
            ],
            out_specs=pl.BlockSpec((t, nx), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*coeffs, u, tops, bots)


# --------------------------------------------------------------------------
# Fused k-sweep Jacobi: auto-pipelined blocks + k-row halo windows.
#
# Manual HBM DMA requires (8, 128)-aligned slice shapes, which odd multigrid
# widths (2^m - 1) cannot satisfy; BlockSpec pipelining handles ragged
# blocks, so the k-row overlap comes from separately gathered halo-window
# arrays (g, k, nx) instead of overlapping DMAs.
# --------------------------------------------------------------------------


def _halo_windows(x: jnp.ndarray, t: int, g: int, k: int):
    """(g, k, nx) halo windows: top[i] = x[i*t-k : i*t], bot[i] =
    x[(i+1)*t : (i+1)*t+k], zeros outside the domain."""
    ny, nx = x.shape
    top = jnp.zeros((g, k, nx), x.dtype)
    rows = jnp.stack([x[t - k + j :: t][: g - 1] for j in range(k)], axis=1)
    top = top.at[1:].set(rows)
    bot = jnp.zeros((g, k, nx), x.dtype)
    for j in range(k):
        src = x[t + j :: t]
        m = min(src.shape[0], g - 1)
        bot = bot.at[:m, j].set(src[:m])
    return top, bot

def _make_smooth_kernel(ny, t, k, g, steps):
    """Generic fused k-step polynomial smoother kernel.

    ``steps`` is a static list of (alpha_s, beta_s) scalars defining

        z_s = D^-1 (b - A u_s)
        p_{s+1} = beta_s * p_s + alpha_s * z_s
        u_{s+1} = u_s + p_{s+1}

    Damped Jacobi is (omega, 0) repeated; Chebyshev uses its static
    rho-recurrence coefficients.  Pollution from the unknown slab edges
    still travels one row per A-application, so the k-row halo argument of
    the Jacobi kernel holds unchanged.
    """
    tl = ny - (g - 1) * t  # valid rows in the ragged last block

    def kernel(c_ref, u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref, out_ref):
        # i32-pinned index math (see apply kernel note re jax_enable_x64).
        i = pl.program_id(0).astype(jnp.int32)
        u = _load_f32(u_ref)
        bmid = _load_f32(b_ref)
        if tl != t:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            valid = (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl))
            u = jnp.where(valid, u, 0.0)
            bmid = jnp.where(valid, bmid, 0.0)
        u = jnp.concatenate([_load_f32(ut_ref)[0], u, _load_f32(ub_ref)[0]],
                            axis=0)  # (t+2k, nx)
        b = jnp.concatenate([_load_f32(bt_ref)[0], bmid,
                             _load_f32(bb_ref)[0]], axis=0)
        cs = c_ref[0, 0]
        cw = c_ref[0, 1]
        cc = c_ref[0, 2]
        ce = c_ref[0, 3]
        cn = c_ref[0, 4]
        dinv = 1.0 / cc
        # Slab rows outside [0, ny) are phantom Dirichlet cells: they must
        # stay ZERO through every step (a step would otherwise update them
        # from their neighbors and feed the error back inward).
        grow = (i * jnp.int32(t) - jnp.int32(k)
                + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        p = jnp.zeros_like(u)
        for (alpha, beta) in steps:
            south = jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]], axis=0)
            north = jnp.concatenate([u[1:], jnp.zeros_like(u[:1])], axis=0)
            au = (cc * u + cs * south + cn * north
                  + cw * _shift_w(u) + ce * _shift_e(u))
            z = dinv * (b - au)
            p = beta * p + alpha * z
            u = jnp.where(inside, u + p, 0.0)
        _store(out_ref, u[k : k + t])

    return kernel


def jacobi_step_coeffs(sweeps: int, omega: float):
    return tuple((omega, 0.0) for _ in range(sweeps))


def chebyshev_step_coeffs(sweeps: int, lmax: float,
                          lmin_frac: float = 0.1, lmax_scale: float = 1.05):
    """Static (alpha, beta) sequence reproducing solvers.smoothers.chebyshev
    exactly (same theta/delta/rho recurrence)."""
    lo = lmin_frac * lmax
    hi = lmax_scale * lmax
    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    sigma = theta / delta
    steps = [(1.0 / theta, 0.0)]
    rho = 1.0 / sigma
    for _ in range(sweeps - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        steps.append((2.0 * rho_new / delta, rho_new * rho))
        rho = rho_new
    return tuple(steps)


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def smooth_sweeps_pallas(
    st: Stencil5,
    b: jnp.ndarray,
    u: jnp.ndarray,
    steps: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused polynomial smoother: k = len(steps) stencil applications in
    ONE read of (u, b) and one write of u (temporal blocking).

    Raises ValueError for grids too small to carry a k-row halo (callers
    fall back to the jnp smoothers there).
    """
    ny, nx = u.shape
    k = len(steps)
    t = _pick_tile(nx, u.dtype, bufs=8, cap=256)
    if ny < t + 2 * k:
        t = max(8, ((ny - 2 * k) // 8) * 8)
        if t < 8 or ny < t + 2 * k:
            raise ValueError("grid too small for fused Pallas smoother")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused Pallas smoother")

    u_top, u_bot = _halo_windows(u, t, g, k)
    b_top, b_bot = _halo_windows(b, t, g, k)

    # Coefficient slabs (g, 5, t+2k, 1): rows [i*t-k, i*t+t+k) of each
    # (ny, 1) coefficient column, index-clamped into range (out-of-range
    # rows only influence discarded results, but cc feeds dinv so it must
    # stay nonzero — clamping guarantees real values).
    t2k = t + 2 * k
    cols = jnp.concatenate(
        [c.reshape(1, -1)
         for c in _coeff_cols(st, ny, _compute_dtype(u.dtype))], axis=0
    )  # (5, ny)
    idx = jnp.clip(
        (jnp.arange(g) * t - k)[:, None] + jnp.arange(t2k)[None, :], 0, ny - 1
    )  # (g, t2k)
    c_slabs = cols[:, idx].transpose(1, 0, 2)[..., None]  # (g, 5, t2k, 1)

    mid_spec = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, k, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    coeff_spec = pl.BlockSpec((1, 5, t2k, 1), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    # x64 scoped off for Mosaic (see apply_stencil5_pallas note).
    with _x64_scope(u.dtype):
        return pl.pallas_call(
            _make_smooth_kernel(ny, t, k, g, steps),
            grid=(g,),
            in_specs=[coeff_spec, mid_spec, halo_spec, halo_spec,
                      mid_spec, halo_spec, halo_spec],
            out_specs=pl.BlockSpec((t, nx), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
            # u is dead after a smooth: writing u' into u's buffer lets
            # XLA elide the loop-backedge copy that otherwise caps any
            # carried pallas output at ~half the HBM rate (probe_dma.py).
            # Safe in-place: each program reads only its OWN u slab (the
            # halo rows ride in separate gathered arrays).
            input_output_aliases={1: 0},
            # The unrolled k-sweep temporaries exceed Mosaic's default
            # 16MB scoped-vmem at production row widths (observed 16.55M
            # at nx=8191, t=48); v5e/v5p have 128MB VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(c_slabs, u, u_top, u_bot, b, b_top, b_bot)


def jacobi_sweeps_pallas(
    st: Stencil5,
    b: jnp.ndarray,
    u: jnp.ndarray,
    sweeps: int,
    omega: float = 0.8,
    interpret: bool = False,
) -> jnp.ndarray:
    """k fused damped-Jacobi sweeps (temporal blocking)."""
    return smooth_sweeps_pallas(
        st, b, u, jacobi_step_coeffs(sweeps, omega), interpret=interpret
    )


def chebyshev_sweeps_pallas(
    st: Stencil5,
    b: jnp.ndarray,
    u: jnp.ndarray,
    sweeps: int,
    lmax: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """k fused Chebyshev-accelerated Jacobi steps — same HBM traffic as
    fused Jacobi (the direction state p lives entirely in VMEM)."""
    return smooth_sweeps_pallas(
        st, b, u, chebyshev_step_coeffs(sweeps, lmax), interpret=interpret
    )


# --------------------------------------------------------------------------
# Full-field coefficient apply: y = A u with (ny, nx) coefficient ARRAYS
# (fully variable coefficients / the explicit banded-matrix backend in
# stencil form).  Coefficients multiply the center row's neighbors, so
# they need no halo — 5 plain pipelined blocks alongside u.
# --------------------------------------------------------------------------


def _make_field_apply_kernel(g, t, ny, with_b):
    tl = ny - (g - 1) * t

    def kernel(*refs):
        if with_b:
            cs_r, cw_r, cc_r, ce_r, cn_r, b_r, u_r, top_r, bot_r, out_r = refs
        else:
            cs_r, cw_r, cc_r, ce_r, cn_r, u_r, top_r, bot_r = refs[:-1]
            out_r = refs[-1]
        i = pl.program_id(0).astype(jnp.int32)
        u = u_r[:]
        if tl != t:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            u = jnp.where(
                (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl)), u, 0.0
            )
        south = jnp.concatenate([top_r[0], u[:-1]], axis=0)
        north = jnp.concatenate([u[1:], bot_r[0]], axis=0)
        au = (
            cc_r[:] * u
            + cs_r[:] * south
            + cn_r[:] * north
            + cw_r[:] * _shift_w(u)
            + ce_r[:] * _shift_e(u)
        )
        out_r[:] = (b_r[:] - au) if with_b else au

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_stencil5_field_pallas(
    st: Stencil5, u: jnp.ndarray, b: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A u (or b - A u when ``b`` is given) with full (ny, nx)
    coefficient fields — the Pallas explicit-SpMV path for banded level
    matrices in stencil form (ops/sparse.py): one read of (coeffs, u)
    + one write, no gathers, no lane rotations."""
    ny, nx = u.shape
    with_b = b is not None
    t = _pick_tile(nx, u.dtype, bufs=16 + 2 * with_b)
    g = pl.cdiv(ny, t)
    tops, bots = _halo_rows(u, t, g)
    tops = tops.reshape(g, 1, nx)
    bots = bots.reshape(g, 1, nx)
    coeffs = [jnp.broadcast_to(c, (ny, nx)).astype(u.dtype) for c in st]

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    args = coeffs + ([b] if with_b else []) + [u, tops, bots]
    with _x64_scope(u.dtype):
        return pl.pallas_call(
            _make_field_apply_kernel(g, t, ny, with_b),
            grid=(g,),
            in_specs=[mid] * (5 + with_b) + [mid, halo, halo],
            out_specs=mid,
            out_shape=jax.ShapeDtypeStruct((ny, nx), u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*args)


# --------------------------------------------------------------------------
# V-cycle mega-kernels: correct -> smooth -> residual -> restrict fused.
#
# A textbook V-cycle level visit spends most of its HBM passes AROUND the
# smoother: the residual is an unfused apply + subtract, the restriction
# re-reads the residual, and the coarse correction rewrites u before the
# post-smoother re-reads it.  These kernels fold all of that into the
# smoother's single read of (u, b):
#
#   down-leg:  (u, b)            -> smooth -> u', restrict(b - A u')
#   up-leg:    (u, b, e_coarse)  -> u + P e -> smooth -> u' [, b - A u']
#
# Transfer split: the y-direction (sublane) halves of the restriction/
# prolongation run IN-KERNEL (Mosaic lowers sublane reshape-interleaves
# cheaply; strided lane slices do NOT lower — verified on v5p), while the
# x-direction (lane) halves run as single XLA strided passes over the
# HALF-HEIGHT intermediates outside the kernel.  Round 2 did the x-halves
# in-kernel via transposed sublane interleaves; measured on v5e at 8191^2
# those VPU transposes cost ~1.5-2 ms per visit — 4-5x the HBM cost of
# simply streaming the half-height intermediate through one fused XLA
# pass (~0.4 ms), so the split is a large net win and keeps the exact
# restrict_fw/bilinear op order (bit-identical sums).
#
# Halo sizing: with ``h`` exact halo rows and k smoothing steps, rows
# within distance h-k of the slab stay exact; the trailing residual apply
# costs one more row, and the y-restriction window [2c, 2c+2] one more:
#   emit="u"    h = k        emit="ur"  h = k + 1     emit="rc"  h = k + 2.
# --------------------------------------------------------------------------


def restrict_x_fw(ry: jnp.ndarray) -> jnp.ndarray:
    """x-direction half of full weighting on a y-restricted residual,
    (nyc, 2*nxc+1) -> (nyc, nxc), including the overall 1/16 scale —
    the same strided-slice composition as transfer.restrict_fw's column
    pass (bit-identical)."""
    return 0.0625 * (ry[:, 0:-2:2] + 2.0 * ry[:, 1::2] + ry[:, 2::2])


def prolong_x_bilinear(e: jnp.ndarray) -> jnp.ndarray:
    """x-direction half of bilinear prolongation, (n, m) -> (n, 2m+1):
    fine col 2J+1 = e[:, J], col 2J = neighbor average (zero Dirichlet
    edges) — the same averaging order as the in-kernel y-half applies
    afterwards, so the composition matches the fused 2-D prolongation."""
    n, m = e.shape
    z = jnp.zeros((n, 1), e.dtype)
    ep = jnp.concatenate([z, e, z], axis=1)  # (n, m+2)
    ph = 0.5 * (ep[:, :-1] + ep[:, 1:])  # (n, m+1): fine even cols
    body = jnp.stack([ph[:, :m], e], axis=2).reshape(n, 2 * m)
    return jnp.concatenate([body, ph[:, m:]], axis=1)


def _gather_rows(x: jnp.ndarray, g: int, stride: int, lo: int, rows: int):
    """(g, rows, nx): window i holds x[i*stride + lo : i*stride + lo + rows]
    with zeros outside [0, x.shape[0]) (eliminated Dirichlet / block pad).

    Built from ``rows`` strided slices (one per window row, like
    ``_halo_windows``) — integer-array indexing here lowers to an XLA
    Gather, which measured several times slower than the strided form on
    the up-visit's coarse-correction halos."""
    n = x.shape[0]
    out = jnp.zeros((g, rows, x.shape[1]), x.dtype)
    for j in range(rows):
        start = lo + j
        i0 = (-start + stride - 1) // stride if start < 0 else 0
        src = x[start + i0 * stride :: stride]
        m = min(src.shape[0], g - i0)
        if m > 0:
            out = out.at[i0 : i0 + m, j].set(src[:m])
    return out


def _prolong_x_vmem(e_loc: jnp.ndarray) -> jnp.ndarray:
    """In-kernel x-direction half of bilinear prolongation,
    (hc, nxc) -> (hc, 2*nxc+1): fine col 2J+1 = e[:, J], col 2J = average
    of neighbors (zero Dirichlet edges).

    Mosaic cannot interleave LANES (strided lane slices and minor-dim
    reshapes fail to lower — verified on v5e), but SUBLANE stack+reshape
    interleaves lower fine, so the slab is transposed, interleaved along
    sublanes, and transposed back — all in VMEM (the slab is ~t/2 rows,
    so the transposes are cheap shuffles, no HBM traffic)."""
    hc, nxc = e_loc.shape
    et = e_loc.T  # (nxc, hc)
    z = jnp.zeros((1, hc), e_loc.dtype)
    ep = jnp.concatenate([z, et, z], axis=0)
    ph = 0.5 * (ep[:-1] + ep[1:])  # (nxc + 1, hc): fine even cols
    body = jnp.stack([ph[:nxc], et], axis=1).reshape(2 * nxc, hc)
    out = jnp.concatenate([body, ph[nxc : nxc + 1]], axis=0)  # (nx, hc)
    return out.T


def _restrict_x_vmem(ry: jnp.ndarray) -> jnp.ndarray:
    """In-kernel x-direction half of full weighting,
    (tc, 2*nxc+1) -> (tc, nxc), including the overall 1/16 scaling.
    Same transpose trick as _prolong_x_vmem (sublane de-interleave via
    reshape + middle-axis slice lowers; lane-strided slices do not)."""
    tc, nx = ry.shape
    nxc = (nx - 1) // 2
    rt = ry.T  # (nx, tc)
    v = rt[: 2 * nxc].reshape(nxc, 2, tc)
    ev, od = v[:, 0], v[:, 1]
    ev_next = jnp.concatenate([ev[1:], rt[2 * nxc : 2 * nxc + 1]], axis=0)
    return (0.0625 * (ev + 2.0 * od + ev_next)).T  # (tc, nxc)


def _make_vcycle_kernel(ny, nx, t, k, g, h, steps, emit, correct,
                        zero_guess=False, emit_dot=False):
    """Fused level-visit kernel body.  ``emit`` in {"u", "ur", "r", "rc"}
    ("r" = residual only, no u output — the standalone-residual case);
    ``correct`` adds the prolonged coarse correction before smoothing.
    ``zero_guess`` drops the u inputs entirely (u = 0): the down-leg
    below the finest level — and every preconditioner application —
    smooths from a zero initial guess, so reading (and materializing) a
    zeros array plus its halo windows is pure wasted HBM traffic, and the
    first smoothing step simplifies to z = D^-1 b (A·0 = 0)."""
    t2 = t + 2 * h
    th = h // 2 + 1 if h % 2 == 0 else (h + 1) // 2  # e_loc top-halo rows
    nyc = (ny - 1) // 2

    def kernel(*refs):
        if correct:
            (c_ref, u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref,
             em_ref, et_ref, eb_ref, *outs) = refs
        elif zero_guess:
            c_ref, b_ref, bt_ref, bb_ref, *outs = refs
        else:
            c_ref, u_ref, ut_ref, ub_ref, b_ref, bt_ref, bb_ref, *outs = refs

        i = pl.program_id(0).astype(jnp.int32)
        b = jnp.concatenate(
            [_load_f32(bt_ref)[0], _load_f32(b_ref), _load_f32(bb_ref)[0]],
            axis=0)
        if zero_guess:
            u = jnp.zeros_like(b)
        else:
            u = jnp.concatenate(
                [_load_f32(ut_ref)[0], _load_f32(u_ref),
                 _load_f32(ub_ref)[0]], axis=0)
        # Global fine row of each slab row; phantom/ragged rows masked to 0.
        grow = (i * jnp.int32(t) - jnp.int32(h)
                + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        if not zero_guess:
            u = jnp.where(inside, u, 0.0)
        b = jnp.where(inside, b, 0.0)

        if correct:
            # y-direction half of the bilinear prolongation (parity-split
            # sublane interleave); the x-half arrived pre-applied by the
            # XLA prolong_x_bilinear pass, so e_loc rows are already
            # full-width.  e_loc rows cover coarse rows [i*t/2 - th, ...);
            # main block is BlockSpec-aligned, halos host-gathered
            # (zero-filled OOR).
            em = _load_f32(em_ref)
            crow = (i * jnp.int32(t // 2)
                    + jax.lax.broadcasted_iota(jnp.int32, em.shape, 0))
            em = jnp.where(crow < jnp.int32(nyc), em, 0.0)  # ragged pad
            e_loc = jnp.concatenate(
                [_load_f32(et_ref)[0], em, _load_f32(eb_ref)[0]], axis=0)
            prev, cur = e_loc[:-1], e_loc[1:]
            if h % 2 == 0:
                # slab starts on an even fine row: (even, odd) pairs.
                pe = jnp.stack([0.5 * (prev + cur), cur], axis=1)
            else:
                # slab starts on an odd fine row: (odd, even) pairs.
                pe = jnp.stack([prev, 0.5 * (prev + cur)], axis=1)
            pe = pe.reshape(t2, pe.shape[-1])
            u = jnp.where(inside, u + pe, 0.0)

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
        first = zero_guess
        for (alpha, beta) in steps:
            if first:
                # Zero initial guess: A u = 0 — the first step is z = D^-1 b
                # (identical numerics, one stencil application saved).
                z = dinv * b
                first = False
            else:
                z = dinv * (b - apply_a(u))
            p = beta * p + alpha * z
            u = jnp.where(inside, u + p, 0.0)
        if emit == "r":
            # Residual only: skipping the u write saves one full HBM pass
            # (the standalone-residual case, LevelCtx.residual).
            _store(outs[0], (b - apply_a(u))[h : h + t])
            return
        _store(outs[0], u[h : h + t])
        if emit_dot:
            # Per-block partial of <b, u_final> — the preconditioner inner
            # product <r, M r> the CG outer needs, for free (b = r and
            # u_final = z inside a zero-guess preconditioner visit); rows
            # outside the domain are already masked to zero.  The (g, 1)
            # SMEM accumulator is one full-array block (TPU tiling rules
            # reject sub-(8,128) blocks); program i writes row i.
            outs[-1][i, 0] = jnp.sum(b[h : h + t] * u[h : h + t])

        if emit == "ur":
            r = b - apply_a(u)
            _store(outs[1], r[h : h + t])
        elif emit == "rc":
            # y-direction half of the full-weighting restriction (window
            # rows [2c, 2c+2] global); the x-half is a single XLA strided
            # pass over this half-height output (restrict_x_fw).
            r = b - apply_a(u)
            v = r[h : h + t].reshape(t // 2, 2, r.shape[-1])
            ev, od = v[:, 0], v[:, 1]
            ev_next = jnp.concatenate([ev[1:], r[h + t : h + t + 1]], axis=0)
            _store(outs[1], ev + 2.0 * od + ev_next)

    return kernel


def fused_level_visit_pallas(
    st: Stencil5,
    b: jnp.ndarray,
    u: jnp.ndarray | None,
    steps: tuple,
    emit: str = "u",
    e_coarse: jnp.ndarray | None = None,
    emit_dot: bool = False,
    interpret: bool = False,
):
    """One fused V-cycle level visit on the hot path.

    [optionally u += P e_coarse] -> k = len(steps) smoothing steps ->
    [optionally residual r = b - A u or restricted residual R r], all in a
    single read of (u, b) plus half-height transfer intermediates.  Returns
    u, (u, r), r alone, or (u, rc) according to ``emit`` ("r" skips the u
    output entirely — one fewer HBM write for standalone residuals).

    ``u=None`` is the zero-initial-guess visit (the down-leg below the
    finest level, and every preconditioner application): the u inputs and
    their halo windows are dropped entirely and the first smoothing step
    runs as z = D^-1 b — two fewer full HBM passes per visit.

    Raises ValueError when the grid is too small for the halo carry —
    callers fall back to the unfused jnp composition (see
    ``fused_visit_viable`` for the pre-check).
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
    t = _pick_tile(nx, b.dtype, bufs=12, cap=256)
    if ny < t + 2 * h:
        # 16-multiples keep the 'rc' half-height coarse block 8-aligned.
        t = max(16, ((ny - 2 * h) // 16) * 16)
        if ny < t + 2 * h:
            raise ValueError("grid too small for fused Pallas level visit")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused Pallas level visit")
    t2 = t + 2 * h
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2

    b_top, b_bot = _halo_windows(b, t, g, h)

    cols = jnp.concatenate(
        [c.reshape(1, -1)
         for c in _coeff_cols(st, ny, _compute_dtype(b.dtype))], axis=0
    )  # (5, ny)
    import numpy as np

    idx = jnp.asarray(np.clip(
        (np.arange(g) * t - h)[:, None] + np.arange(t2)[None, :], 0, ny - 1
    ))
    c_slabs = cols[:, idx].transpose(1, 0, 2)[..., None]  # (g, 5, t2, 1)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, h, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    if zero_guess:
        in_specs = [coeff, mid, halo, halo]
        args = [c_slabs, b, b_top, b_bot]
    else:
        u_top, u_bot = _halo_windows(u, t, g, h)
        in_specs = [coeff, mid, halo, halo, mid, halo, halo]
        args = [c_slabs, u, u_top, u_bot, b, b_top, b_bot]

    if correct:
        # x-half of the prolongation as one cheap XLA pass over the
        # quarter-size coarse grid; the kernel only y-interleaves.
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
    out_shape = [jax.ShapeDtypeStruct((ny, nx), b.dtype)]  # u (or r for "r")
    if emit == "ur":
        out_specs.append(mid)
        out_shape.append(jax.ShapeDtypeStruct((ny, nx), b.dtype))
    elif emit == "rc":
        # Half-height, FULL-width y-restricted residual; the x-half runs
        # as one XLA strided pass after the call (restrict_x_fw).
        out_specs.append(
            pl.BlockSpec((t // 2, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nyc, nx), b.dtype))
    if emit_dot:
        # Per-block <b, u> partials in SMEM; summed (g tiny scalars)
        # outside.  One full-(g,1) block resident across the sequential
        # grid — sub-(8,128) SMEM blocks don't satisfy TPU tiling rules.
        out_specs.append(
            pl.BlockSpec((g, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((g, 1), _compute_dtype(b.dtype))
        )

    with _x64_scope(b.dtype):
        out = pl.pallas_call(
            _make_vcycle_kernel(ny, nx, t, k, g, h, steps, emit, correct,
                                zero_guess, emit_dot),
            grid=(g,),
            in_specs=in_specs,
            out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
            out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
            # Output u' aliases the (dead-after) input u — elides the
            # XLA backedge/copy pass around carried kernel outputs (see
            # smooth_sweeps_pallas note).  emit="r" outputs r, not u;
            # zero-guess visits have no u input to donate.
            input_output_aliases=(
                {} if (emit == "r" or zero_guess) else {1: 0}
            ),
            # The kernel's in-VMEM temporaries (k unrolled sweeps over the
            # halo-extended slab) exceed Mosaic's default 16MB scoped-vmem
            # limit at production widths; v5e/v5p have 128MB VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(*args)
    if emit == "rc":
        return out[0], restrict_x_fw(out[1])
    if emit_dot:
        return out[0], jnp.sum(out[1])
    return out  # u, (u, r) or (u, rc)


def fused_visit_viable(ny: int, sweeps: int, emit: str = "rc") -> bool:
    """True when ``fused_level_visit_pallas``/``smooth_sweeps_pallas`` can
    carry the halo on a grid of ``ny`` rows (the exact complement of their
    ValueError conditions) — callers pre-check this and keep the unfused
    jnp composition otherwise."""
    h = sweeps + {"u": 0, "ur": 1, "r": 1, "rc": 2}[emit]
    return ny >= 16 + 2 * h


@functools.partial(jax.jit, static_argnames=("interpret",))
def residual5_pallas(
    st: Stencil5, b: jnp.ndarray, u: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """r = b - A u fused in one kernel: one read of (u, b), ONE write of r
    (emit="r" skips materializing the untouched u)."""
    return fused_level_visit_pallas(st, b, u, steps=(), emit="r",
                                    interpret=interpret)


# --------------------------------------------------------------------------
# Fused CG residual update + zero-guess down visit:
#   r' = r - alpha ap;  ||r'||^2;  u0 = smooth_k(b=r', 0);  R_y(r' - A u0)
# in ONE kernel.  Composed separately these cost read r, ap, write r'
# (3 passes) + a separate norm + the down visit's read of r' (1); fused,
# the kernel reads (r, ap) and writes (r', u0, y-restricted residual)
# with the norm riding as SMEM partials — one fewer full pass and a free
# norm, and both CG vectors (r, ap) are donated (r -> r', ap -> u0), so
# neither loop-carried buffer pays a backedge copy.
# --------------------------------------------------------------------------


def _make_cg_down_kernel(ny, nx, t, k, g, h, steps):
    t2 = t + 2 * h

    def kernel(c_ref, alpha_ref, r_ref, rt_ref, rb_ref,
               ap_ref, apt_ref, apb_ref, u_ref, rc_ref, rn_ref, nrm_ref):
        i = pl.program_id(0).astype(jnp.int32)
        alpha = alpha_ref[0, 0]
        r = jnp.concatenate(
            [_load_f32(rt_ref)[0], _load_f32(r_ref), _load_f32(rb_ref)[0]],
            axis=0)
        ap = jnp.concatenate(
            [_load_f32(apt_ref)[0], _load_f32(ap_ref),
             _load_f32(apb_ref)[0]], axis=0)
        grow = (i * jnp.int32(t) - jnp.int32(h)
                + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        b = jnp.where(inside, r - alpha * ap, 0.0)

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

        u = jnp.zeros_like(b)
        p = jnp.zeros_like(b)
        first = True
        for (alpha_s, beta_s) in steps:
            z = dinv * b if first else dinv * (b - apply_a(u))
            first = False
            p = beta_s * p + alpha_s * z
            u = jnp.where(inside, u + p, 0.0)

        _store(u_ref, u[h : h + t])
        b_mid = b[h : h + t]
        _store(rn_ref, b_mid)
        nrm_ref[i, 0] = jnp.sum(b_mid * b_mid)
        rr = b - apply_a(u)
        v = rr[h : h + t].reshape(t // 2, 2, rr.shape[-1])
        ev, od = v[:, 0], v[:, 1]
        ev_next = jnp.concatenate([ev[1:], rr[h + t : h + t + 1]], axis=0)
        _store(rc_ref, ev + 2.0 * od + ev_next)

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def cg_visit_down_pallas(
    st: Stencil5,
    r: jnp.ndarray,
    ap: jnp.ndarray,
    alpha,
    steps: tuple,
    interpret: bool = False,
):
    """(u0, rc1, r', ||r'||^2) with r' = r - alpha ap and (u0, rc1) the
    zero-guess down visit on b = r'.  ``r`` and ``ap`` are DONATED
    (aliased to r' and u0)."""
    ny, nx = r.shape
    k = len(steps)
    h = k + 2  # residual + y-restriction on top of the smoothing carry
    if ny % 2 == 0 or nx % 2 == 0:
        raise ValueError("transfers need odd (2n+1) grid dims")
    t = _pick_tile(nx, r.dtype, bufs=12, cap=256)
    if ny < t + 2 * h:
        t = max(16, ((ny - 2 * h) // 16) * 16)
        if ny < t + 2 * h:
            raise ValueError("grid too small for fused CG down visit")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused CG down visit")
    t2 = t + 2 * h
    nyc = (ny - 1) // 2

    r_top, r_bot = _halo_windows(r, t, g, h)
    ap_top, ap_bot = _halo_windows(ap, t, g, h)
    cols = jnp.concatenate(
        [c.reshape(1, -1)
         for c in _coeff_cols(st, ny, _compute_dtype(r.dtype))], axis=0
    )
    import numpy as np

    idx = jnp.asarray(np.clip(
        (np.arange(g) * t - h)[:, None] + np.arange(t2)[None, :], 0, ny - 1
    ))
    c_slabs = cols[:, idx].transpose(1, 0, 2)[..., None]
    cdt = _compute_dtype(r.dtype)
    alpha_arr = jnp.full((1, 1), alpha, cdt)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, h, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    nrm_spec = pl.BlockSpec((g, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    with _x64_scope(r.dtype):
        u0, rc_y, r_new, nrm = pl.pallas_call(
            _make_cg_down_kernel(ny, nx, t, k, g, h, steps),
            grid=(g,),
            in_specs=[coeff, smem1, mid, halo, halo, mid, halo, halo],
            out_specs=[
                mid,
                pl.BlockSpec((t // 2, nx), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                mid,
                nrm_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ny, nx), r.dtype),
                jax.ShapeDtypeStruct((nyc, nx), r.dtype),
                jax.ShapeDtypeStruct((ny, nx), r.dtype),
                jax.ShapeDtypeStruct((g, 1), cdt),
            ],
            # ap (arg 5) -> u0 (out 0); r (arg 2) -> r' (out 2).
            input_output_aliases={5: 0, 2: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(c_slabs, alpha_arr, r, r_top, r_bot, ap, ap_top, ap_bot)
    return u0, restrict_x_fw(rc_y), r_new, jnp.sum(nrm)


# --------------------------------------------------------------------------
# Fused CG direction step: p' = z + beta p; ap = A p'; <p', ap>.
#
# The CG outer's own fine-grid work is ~half its HBM traffic at scale.
# Composed from jnp ops, the direction update + operator apply + curvature
# inner product cost read z, read p, write p' (3) + read p', write ap (2)
# + read p', read ap (2) = 7 passes; this kernel does it in 4 (read z,
# read p, write p', write ap; the dot rides along as per-block SMEM
# partials), and donates z -> ap and p -> p' so the while-loop-carried
# direction vector p never pays XLA's backedge copy (see
# smooth_sweeps_pallas).  The reference's equivalent step is the MatMult +
# VecTDot pair inside PETSc's KSPSolve (reference: src/solver.c:1530-1550).
# --------------------------------------------------------------------------


def _make_cg_papply_kernel(ny, t, g):
    # Ragged last block is handled by the grow/inside mask (no tl needed).
    def kernel(c_ref, beta_ref, z_ref, zt_ref, zb_ref, p_ref, pt_ref, pb_ref,
               pn_ref, ap_ref, dot_ref):
        i = pl.program_id(0).astype(jnp.int32)
        beta = beta_ref[0, 0]
        # (t+2, nx) slabs with one halo row on each side; p' = z + beta p
        # computed on the full slab so A p' sees correct neighbor rows.
        z = jnp.concatenate(
            [_load_f32(zt_ref)[0], _load_f32(z_ref), _load_f32(zb_ref)[0]],
            axis=0)
        p = jnp.concatenate(
            [_load_f32(pt_ref)[0], _load_f32(p_ref), _load_f32(pb_ref)[0]],
            axis=0)
        grow = (i * jnp.int32(t) - jnp.int32(1)
                + jax.lax.broadcasted_iota(jnp.int32, z.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        pn = jnp.where(inside, z + beta * p, 0.0)

        cs = c_ref[0, 0]
        cw = c_ref[0, 1]
        cc = c_ref[0, 2]
        ce = c_ref[0, 3]
        cn = c_ref[0, 4]
        south = jnp.concatenate([jnp.zeros_like(pn[:1]), pn[:-1]], axis=0)
        north = jnp.concatenate([pn[1:], jnp.zeros_like(pn[:1])], axis=0)
        ap = (cc * pn + cs * south + cn * north
              + cw * _shift_w(pn) + ce * _shift_e(pn))
        pn_mid = pn[1 : 1 + t]
        ap_mid = jnp.where(inside, ap, 0.0)[1 : 1 + t]
        _store(pn_ref, pn_mid)
        _store(ap_ref, ap_mid)
        # (g, 1) SMEM partials: one full-array block, program i writes
        # row i (sub-(8,128) SMEM blocks fail TPU tiling rules).
        dot_ref[i, 0] = jnp.sum(pn_mid * ap_mid)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_papply_pallas(
    st: Stencil5,
    z: jnp.ndarray,
    p: jnp.ndarray,
    beta,
    interpret: bool = False,
):
    """(p', A p', <p', A p'>) with p' = z + beta p, in one fused kernel.

    Returns ``(p_new, ap, pap)``.  ``z`` and ``p`` are DONATED (aliased to
    ap and p_new respectively) — callers must not reuse them afterwards.
    The first CG iteration passes beta=0 with any same-shape ``p``.
    """
    ny, nx = z.shape
    t = _pick_tile(nx, z.dtype, bufs=8)
    if ny < t + 2:
        t = max(8, ((ny - 2) // 8) * 8)
        if t < 8 or ny < t + 2:
            raise ValueError("grid too small for fused CG step")
    g = pl.cdiv(ny, t)
    if g < 2:
        raise ValueError("grid too small for fused CG step")

    z_top, z_bot = _halo_windows(z, t, g, 1)
    p_top, p_bot = _halo_windows(p, t, g, 1)
    t2 = t + 2
    cols = jnp.concatenate(
        [c.reshape(1, -1)
         for c in _coeff_cols(st, ny, _compute_dtype(z.dtype))], axis=0
    )  # (5, ny)
    import numpy as np

    idx = jnp.asarray(np.clip(
        (np.arange(g) * t - 1)[:, None] + np.arange(t2)[None, :], 0, ny - 1
    ))
    c_slabs = cols[:, idx].transpose(1, 0, 2)[..., None]  # (g, 5, t2, 1)
    cdt = _compute_dtype(z.dtype)
    beta_arr = jnp.full((1, 1), beta, cdt)

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dot_spec = pl.BlockSpec((g, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    with _x64_scope(z.dtype):
        pn, ap, dots = pl.pallas_call(
            _make_cg_papply_kernel(ny, t, g),
            grid=(g,),
            in_specs=[coeff, smem1, mid, halo, halo, mid, halo, halo],
            out_specs=[mid, mid, dot_spec],
            out_shape=[
                jax.ShapeDtypeStruct((ny, nx), z.dtype),
                jax.ShapeDtypeStruct((ny, nx), z.dtype),
                jax.ShapeDtypeStruct((g, 1), cdt),
            ],
            # p (arg 5) -> p' (out 0); z (arg 2) -> ap (out 1): both dead
            # after this kernel in the CG loop, and both outputs are
            # while-loop-carried — donation elides the backedge copies.
            input_output_aliases={5: 0, 2: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(c_slabs, beta_arr, z, z_top, z_bot, p, p_top, p_bot)
    return pn, ap, jnp.sum(dots)
