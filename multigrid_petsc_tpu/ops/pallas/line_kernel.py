"""Whole-array-in-VMEM fused y-line-smoother visit kernels (round 5).

BASELINE config 4 (anisotropic 9-point + y-line relaxation) previously
paid ~13 full-array HBM passes per smoothing sweep: the XLA composition
streams the residual, each of ~log2(ny) PCR passes, and the blend
separately (VERDICT r4 weak-6/#5).  At line-smoother problem sizes the
ENTIRE level fits in VMEM (1023^2 f32 = 4 MB/array; v5e has 128 MB), so
these kernels run the whole visit — k line-Jacobi sweeps, each an
off-line 9-point apply + batched PCR tridiagonal solve + damped blend,
plus the residual/restriction or coarse-correction — as ONE single-block
Pallas call: b and u are read once and u (+ the quarter-size restricted
residual) written once, ~3 HBM passes per visit regardless of k.

The PCR elimination factor (matrix-only; ops/stencil.pcr_factor) is
precomputed at trace time from the (ny, 1)-broadcastable line
coefficients and shipped as one stacked (S, ny, 1) operand — the hoist
VERDICT r4 asked for (ops/stencil.py:281).

Reference analogue: the smoother+residual+transfer chain of the inner
KSPSolve (/root/reference/src/solver.c:1516-1550) with a line-relaxation
PC; the reference treats every operator identically through assembled
MatMult (src/solver.c:489-556) — this kernel restores that uniformity of
speed class for the line-smoothed 9-point family.

Scope: y-line relaxation with x-tensor-product line coefficients (the
PCR factor must be (ny, 1)-broadcastable; true for every problem family
in the repo).  LINE_X / alternating and VMEM-exceeding sizes keep the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.stencil import Stencil9, pcr_factor
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _prolong_x_vmem,
    _restrict_x_vmem,
    _shift_e,
    _shift_w,
    _x64_scope,
)


def collapse_stencil(st: Stencil9) -> Stencil9:
    """Collapse coefficient fields that are numerically constant along an
    axis to their compact broadcast shape ((1, nx) -> (1, 1) etc.).

    Problem modules materialize e.g. a constant-in-x center coefficient
    as a (1, nx) field (broadcast against the x grid); the line kernel's
    PCR factor must be (ny, 1)-broadcastable, so the caller collapses the
    CONCRETE setup-time arrays once before gating/launch."""
    import numpy as np

    out = []
    for c in st:
        a = np.asarray(c)
        if a.ndim == 2:
            if a.shape[0] > 1 and np.all(a == a[:1]):
                a = a[:1]
            if a.shape[1] > 1 and np.all(a == a[:, :1]):
                a = a[:, :1]
        out.append(jnp.asarray(a))
    return Stencil9(*out)


def line_visit_viable(ny: int, nx: int, dtype, st: Stencil9 | None = None,
                      budget: int = 95 * 2**20) -> bool:
    """Whole-array kernel envelope: ~12 live (ny, nx) temporaries must fit
    the VMEM budget, and the PCR factor must be x-tensor-product
    ((ny, 1)-broadcastable line coefficients)."""
    itemsize = jnp.dtype(dtype).itemsize
    if ny < 4 or nx < 4 or 12 * ny * nx * itemsize > budget:
        return False
    if st is not None:
        for c in (st.cs, st.cc, st.cn):
            c = jnp.asarray(c)
            if c.ndim == 2 and c.shape[1] != 1:
                return False
    return True


def _sf(x, s):
    """Rows shifted toward larger i (out[i] = x[i-s]), zero fill."""
    return jnp.concatenate(
        [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)


def _sb(x, s):
    """out[i] = x[i+s], zero fill."""
    return jnp.concatenate(
        [x[s:], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0)


def _prolong_y_vmem(e):
    """y-half of bilinear prolongation, (nyc, w) -> (2*nyc+1, w)."""
    nyc, w = e.shape
    z = jnp.zeros((1, w), e.dtype)
    ep = jnp.concatenate([z, e, z], axis=0)  # (nyc + 2, w)
    pv = 0.5 * (ep[:-1] + ep[1:])  # (nyc + 1, w): even fine rows
    body = jnp.stack([pv[:nyc], e], axis=1).reshape(2 * nyc, w)
    return jnp.concatenate([body, pv[nyc:]], axis=0)


def _restrict_y_vmem(r):
    """y-half of full weighting (unscaled [1,2,1]), (ny, w) -> (nyc, w)."""
    ny, w = r.shape
    nyc = (ny - 1) // 2
    v = r[: 2 * nyc].reshape(nyc, 2, w)
    ev, od = v[:, 0], v[:, 1]
    ev_next = jnp.concatenate([ev[1:], r[2 * nyc : 2 * nyc + 1]], axis=0)
    return ev + 2.0 * od + ev_next


def _canon_coeffs(st: Stencil9, dtype):
    """Each coefficient in its compact broadcast shape (>= 2-D)."""
    out = []
    for c in st:
        c = jnp.asarray(c, dtype)
        if c.ndim < 2:
            c = c.reshape(1, 1)
        out.append(c)
    return out


def _apply9_vmem(cs, u):
    csw, c_s, cse, cw, cc, ce, cnw, cn, cne = cs
    u_s = _sf(u, 1)
    u_n = _sb(u, 1)
    return (cc * u + c_s * u_s + cn * u_n
            + cw * _shift_w(u) + ce * _shift_e(u)
            + csw * _shift_w(u_s) + cse * _shift_e(u_s)
            + cnw * _shift_w(u_n) + cne * _shift_e(u_n))


def _off_line_vmem(cs, u):
    """All terms except the y-line (cs, cc, cn) tridiagonal."""
    csw, c_s, cse, cw, cc, ce, cnw, cn, cne = cs
    u_s = _sf(u, 1)
    u_n = _sb(u, 1)
    return (cw * _shift_w(u) + ce * _shift_e(u)
            + csw * _shift_w(u_s) + cse * _shift_e(u_s)
            + cnw * _shift_w(u_n) + cne * _shift_e(u_n))


def _make_line_kernel(ny, nx, sweeps, omega, strides, emit, correct,
                      zero_guess, emit_dot):
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2

    def kernel(*refs):
        it = iter(refs)
        al_ref = next(it)  # (S, ny, 1)
        ga_ref = next(it)
        di_ref = next(it)  # (ny, 1)
        cs = [next(it)[:] for _ in range(9)]
        b = next(it)[:]
        u = jnp.zeros_like(b) if zero_guess else next(it)[:]
        if correct:
            e = next(it)[:]
            out_refs = list(it)
            ef = _prolong_x_vmem(_prolong_y_vmem(e))
            u = u + ef
        else:
            out_refs = list(it)

        alphas = al_ref[:]
        gammas = ga_ref[:]
        dinv_line = di_ref[:]

        def pcr(r):
            for k, s in enumerate(strides):
                r = r + alphas[k] * _sf(r, s) + gammas[k] * _sb(r, s)
            return dinv_line * r

        for _ in range(sweeps):
            rhs = b - _off_line_vmem(cs, u)
            u_line = pcr(rhs)
            u = (1.0 - omega) * u + omega * u_line

        oi = 0
        out_refs[oi][:] = u.astype(out_refs[oi].dtype)
        oi += 1
        if emit in ("r", "rc", "ur"):
            rr = b - _apply9_vmem(cs, u)
            if emit == "rc":
                rc1 = _restrict_x_vmem(_restrict_y_vmem(rr))
                out_refs[oi][:] = rc1.astype(out_refs[oi].dtype)
            else:
                out_refs[oi][:] = rr.astype(out_refs[oi].dtype)
            oi += 1
        if emit_dot:
            # Whole-(1,1)-block store: Mosaic rejects scalar stores to
            # VMEM ("Cannot store scalars to VMEM") in compiled mode.
            out_refs[oi][:, :] = jnp.sum(b * u).reshape(1, 1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "omega", "emit", "emit_dot", "interpret"))
def line_visit9_pallas(
    st: Stencil9,
    b: jnp.ndarray,
    u: jnp.ndarray | None,
    sweeps: int,
    omega: float = 1.0,
    emit: str = "u",
    e_coarse: jnp.ndarray | None = None,
    emit_dot: bool = False,
    interpret: bool = False,
):
    """Fused y-line-Jacobi level visit, whole array in VMEM.

    emit='u'  -> u' = linesmooth_k(b, u [+ P e_coarse])
    emit='ur' -> (u', b - A u')
    emit='rc' -> (u', restrict_fw(b - A u'))   (u=None = zero guess)
    emit_dot  -> additionally <b, u'> (the CG <r, M r> for free).

    Numerics identical to ops/stencil.line_jacobi_sweeps_y composed with
    the library transfers (same PCR recurrence, same blend)."""
    ny, nx = b.shape
    dtype = b.dtype
    if not line_visit_viable(ny, nx, dtype, st):
        raise ValueError(f"line visit not viable at ({ny}, {nx})")
    zero_guess = u is None
    correct = e_coarse is not None
    cdt = dtype if dtype != jnp.bfloat16 else jnp.float32

    cs = _canon_coeffs(st, cdt)
    fac = pcr_factor(st.cs, st.cc, st.cn, ny)
    alphas = jnp.stack([jnp.broadcast_to(a, (ny, 1)) for a in fac.alphas])
    gammas = jnp.stack([jnp.broadcast_to(g, (ny, 1)) for g in fac.gammas])
    dinv_line = jnp.broadcast_to(fac.dinv, (ny, 1))
    strides = tuple(2 ** k for k in range(len(fac.alphas)))

    full = lambda a: pl.BlockSpec(a.shape, lambda: tuple([0] * a.ndim),
                                  memory_space=pltpu.VMEM)
    ops = [alphas.astype(cdt), gammas.astype(cdt), dinv_line.astype(cdt),
           *cs, b]
    if not zero_guess:
        ops.append(u)
    if correct:
        ops.append(e_coarse.astype(dtype))
    in_specs = [full(a) for a in ops]

    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    out_shape = [jax.ShapeDtypeStruct((ny, nx), dtype)]
    if emit == "rc":
        out_shape.append(jax.ShapeDtypeStruct((nyc, nxc), dtype))
    elif emit in ("r", "ur"):
        out_shape.append(jax.ShapeDtypeStruct((ny, nx), dtype))
    if emit_dot:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), cdt))
    out_specs = [full(s) for s in out_shape]

    with _x64_scope(dtype):
        out = pl.pallas_call(
            _make_line_kernel(ny, nx, sweeps, float(omega), strides, emit,
                              correct, zero_guess, emit_dot),
            in_specs=in_specs,
            out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
            out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2**20,
            ),
            interpret=interpret,
        )(*ops)
    if emit_dot:
        out = list(out)
        out[-1] = out[-1][0, 0]  # (1, 1) -> scalar
        return tuple(out) if len(out) > 2 else (out[0], out[1])
    return out
