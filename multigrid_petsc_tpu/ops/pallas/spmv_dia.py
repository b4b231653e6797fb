"""Pallas TPU kernel for explicit sparse SpMV in DIA (diagonal) form.

The explicit-operator backend's fast path (BASELINE.json: "explicit
CSR/BSR SpMV in Pallas" alongside the matrix-free kernels).  The
reference's level matrices (assembled CSR, reference: src/solver.c:489-556
levelMatrixA*) are BANDED for 1-grid-per-level hierarchies: every nonzero
sits on one of a handful of constant diagonals (col - row in
{-nx, -1, 0, +1, +nx} for the 5-point operator).  DIA storage turns the
SpMV into K shifted elementwise multiply-adds — no gathers, which are not
the TPU's fast path — so the kernel runs at HBM-bandwidth speed-of-light:

    y = sum_k  vals[k, :] * shift_flat(x, offsets[k])

The flat vector is viewed as (rows, L) lanes; a flat shift by d =
q*L + r decomposes into a sublane (row) shift q and a lane rotation r
with carry from the next row — all static slices and concatenates, which
Mosaic lowers (strided/dynamic lane ops do not — see stencil_kernel.py).

Matrices with irregular rows (composite merged-grid coupling blocks)
cannot be expressed as a few diagonals; ``dia_from_csr`` raises and the
caller keeps the ELL gather path (ops/sparse.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.pallas.stencil_kernel import _x64_scope

LANES = 512  # flat-view width: multiple of 128, small enough for odd grids


def dia_from_csr(indptr, indices, data, max_diags: int = 16):
    """(offsets, vals): DIA form of a CSR matrix.

    ``vals[k, r]`` is the entry A[r, r + offsets[k]] (0 where absent).
    Raises ValueError when the matrix has more than ``max_diags`` distinct
    diagonals — the signal that ELL/gather storage fits better.
    """
    rows = len(indptr) - 1
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    data = np.asarray(data)
    r_of = np.repeat(np.arange(rows), np.diff(indptr))
    offs = indices - r_of
    uniq = np.unique(offs)
    if len(uniq) > max_diags:
        raise ValueError(
            f"{len(uniq)} distinct diagonals > {max_diags}: not DIA-shaped"
        )
    k_of = np.searchsorted(uniq, offs)
    vals = np.zeros((len(uniq), rows), dtype=data.dtype)
    vals[k_of, r_of] = data
    return tuple(int(d) for d in uniq), vals


def _make_dia_kernel(offsets, t, lo, k, n_rows):
    def kernel(v_ref, x_ref, xt_ref, xb_ref, o_ref):
        # Ragged final block: mid rows past the array end are block-padding
        # garbage (can be NaN/inf; 0 * inf = NaN) — zero them explicitly.
        i0 = pl.program_id(0).astype(jnp.int32)
        xm = x_ref[:]
        vm = v_ref[:]
        grow = (i0 * jnp.int32(t)
                + jax.lax.broadcasted_iota(jnp.int32, xm.shape, 0))
        valid = grow < jnp.int32(n_rows)
        xm = jnp.where(valid, xm, 0.0)
        vm = jnp.where(valid[None], vm, 0.0)
        xx = jnp.concatenate([xt_ref[0], xm, xb_ref[0]], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 1)
        y = None
        for i, d in enumerate(offsets):
            q, r = divmod(d, LANES)
            a = xx[lo + q : lo + q + t]
            if r == 0:
                sh = a
            else:
                # Lane shift by r with carry from the next flat row:
                # unaligned lane concats do not lower in Mosaic, but
                # full-lane rolls + a select do.
                b = xx[lo + q + 1 : lo + q + 1 + t]
                ra = pltpu.roll(a, LANES - r, axis=1)
                rb = pltpu.roll(b, LANES - r, axis=1)
                sh = jnp.where(col < jnp.int32(LANES - r), ra, rb)
            term = vm[i] * sh
            y = term if y is None else y + term
        o_ref[:] = y

    return kernel


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_spmv_pallas(
    offsets: tuple, vals: jnp.ndarray, x: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x with A in DIA form over a flat vector.

    ``vals``: (K, N) diagonal values; ``offsets``: K static ints.
    One read of (vals, x) + one write of y — bandwidth speed-of-light for
    banded explicit matrices.
    """
    n = x.shape[0]
    k = len(offsets)
    rows = pl.cdiv(n, LANES)
    pad = rows * LANES - n
    x2 = jnp.pad(x, (0, pad)).reshape(rows, LANES)
    v3 = jnp.pad(vals, ((0, 0), (0, pad))).reshape(k, rows, LANES)

    qs = [divmod(d, LANES) for d in offsets]
    lo = max(0, max((-q for q, _ in qs), default=0))
    hi = max(0, max((q + (1 if r else 0) for q, r in qs), default=0))
    lo, hi = max(lo, 1), max(hi, 1)  # BlockSpec needs nonzero halo dims

    # Row tile: K+1 main buffers (vals + x) per program, double-buffered.
    t = max(8, min(256, (8 * 2**20) // ((k + 2) * LANES * x.dtype.itemsize)))
    t = (t // 8) * 8
    g = pl.cdiv(rows, t)

    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import _gather_rows

    x_top = _gather_rows(x2, g, t, -lo, lo)
    x_bot = _gather_rows(x2, g, t, t, hi)

    with _x64_scope(x.dtype):
        y2 = pl.pallas_call(
            _make_dia_kernel(offsets, t, lo, k, rows),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((k, t, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lo, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hi, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(v3, x2, x_top, x_bot)
    return y2.reshape(-1)[:n]
