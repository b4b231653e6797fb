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
    """Row-tile size keeping ``bufs`` (T, n) buffers within ~12MB of VMEM."""
    row_bytes = max(1, n_cols) * jnp.dtype(dtype).itemsize
    t = max(8, min(cap, (12 * 2**20) // (bufs * row_bytes)))
    return max(8, (t // 8) * 8)


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
        u = u_ref[:]
        if tl != t:
            # Ragged last block: rows >= tl are padding garbage; they feed
            # the north-shift of row tl-1, so zero them explicitly.
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            u = jnp.where(
                (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl)), u, 0.0
            )
        south = jnp.concatenate([top_ref[0], u[:-1]], axis=0)
        north = jnp.concatenate([u[1:], bot_ref[0]], axis=0)
        out_ref[:] = (
            cc_ref[:] * u
            + cs_ref[:] * south
            + cn_ref[:] * north
            + cw_ref[:] * _shift_w(u)
            + ce_ref[:] * _shift_e(u)
        )

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
    coeffs = _coeff_cols(st, ny, u.dtype)

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
        u = u_ref[:]
        bmid = b_ref[:]
        if tl != t:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            valid = (i < jnp.int32(g - 1)) | (rows < jnp.int32(tl))
            u = jnp.where(valid, u, 0.0)
            bmid = jnp.where(valid, bmid, 0.0)
        u = jnp.concatenate([ut_ref[0], u, ub_ref[0]], axis=0)  # (t+2k, nx)
        b = jnp.concatenate([bt_ref[0], bmid, bb_ref[0]], axis=0)
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
        out_ref[:] = u[k : k + t]

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
        [c.reshape(1, -1) for c in _coeff_cols(st, ny, u.dtype)], axis=0
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
