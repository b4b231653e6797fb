"""Explicit sparse operator backend: CSR assembly (native C++) + SpMV.

The second operator form required by BASELINE.json ("explicit CSR/BSR
SpMV" alongside matrix-free): the level operator — including composite
merged-grid coupling blocks — is assembled into CSR by the native C++
engine (native/csr_assemble.cpp, the framework's graph-builder analogue of
the reference's fill* assembly, src/solver.c:185-556), then converted to a
fixed-width sliced-ELL layout for the TPU SpMV.

ELL on TPU: vals (N, K) and cols (N, K) with -1 padding; SpMV is K gathers
+ a row sum.  Gathers are not the TPU's fast path — the matrix-free
stencil kernels remain the production path — but the explicit form is the
benchmark/parity backend and handles arbitrary row patterns (composite
couplings included) uniformly.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmgtpu_native.so"


@functools.cache
def _load_native():
    """Build (make) and load the native assembly library."""
    if not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.level_rows.restype = ctypes.c_int64
    lib.level_rows.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int
    ]
    lib.assemble_level.restype = ctypes.c_int64
    lib.assemble_level.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    return lib


def assemble_level_csr(
    npts: int,
    mesh_type: int,
    gids: tuple[int, ...],
    include_diag: bool = True,
    include_couplings: bool = True,
):
    """CSR (indptr, indices, data) of the composite level operator."""
    lib = _load_native()
    gids_arr = (ctypes.c_int * len(gids))(*gids)
    rows = lib.level_rows(npts, gids_arr, len(gids))
    # Generous cap: diag 5/row + couplings bounded by composed stencils.
    per_row = 5 + 64 * max(0, len(gids) - 1) * (4 ** (max(gids) - min(gids)))
    nnz_cap = rows * min(per_row, 4096)
    indptr = np.zeros(rows + 1, dtype=np.int64)
    indices = np.zeros(nnz_cap, dtype=np.int32)
    data = np.zeros(nnz_cap, dtype=np.float64)
    nnz = lib.assemble_level(
        npts, mesh_type, gids_arr, len(gids),
        int(include_diag), int(include_couplings),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nnz_cap,
    )
    if nnz < 0:
        raise RuntimeError(f"native assembly failed (code {nnz})")
    return indptr, indices[:nnz], data[:nnz]


def csr_to_ell(indptr, indices, data, dtype=np.float64):
    """Pad CSR rows to the max row width (ELLPACK); cols padded with 0 and
    vals with 0.0 so padded slots contribute nothing.  Fully vectorized
    (one scatter over the nnz — a Python per-row loop takes minutes at
    8193^2 / 67M rows)."""
    rows = len(indptr) - 1
    indptr = np.asarray(indptr)
    widths = np.diff(indptr)
    k = int(widths.max()) if rows else 0
    cols = np.zeros((rows, k), dtype=np.int32)
    vals = np.zeros((rows, k), dtype=dtype)
    r_of = np.repeat(np.arange(rows), widths)
    pos = np.arange(len(indices)) - np.repeat(indptr[:-1], widths)
    cols[r_of, pos] = indices
    vals[r_of, pos] = data
    return jnp.asarray(vals), jnp.asarray(cols)


def ell_spmv(vals: jnp.ndarray, cols: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with ELL storage: K gathers + row-sum (jit/TPU compatible)."""
    return jnp.sum(vals * x[cols], axis=1)


class SparseLevelOp:
    """Explicit operator over a flattened level state.

    Storage selection: banded matrices (all 1-grid-per-level operators)
    use DIA + the Pallas shifted-multiply SpMV kernel on TPU
    (ops/pallas/spmv_dia.py — no gathers, HBM speed-of-light); irregular
    composite-coupling matrices keep ELL + gather.
    """

    def __init__(self, npts, mesh_type, gids, dtype=np.float64,
                 include_diag=True, include_couplings=True,
                 backend: str = "auto"):
        self.gids = tuple(gids)
        self.shapes = [
            ((npts - 1) // 2**g - 1, (npts - 1) // 2**g - 1) for g in gids
        ]
        csr = assemble_level_csr(npts, mesh_type, self.gids,
                                 include_diag, include_couplings)
        self.nnz = len(csr[1])
        self.vals, self.cols = csr_to_ell(*csr, dtype=dtype)
        self.dia = None
        self.stencil_form = None  # Stencil5 of (ny, nx) fields
        if backend in ("auto", "dia"):
            from multigrid_petsc_tpu.ops.pallas.spmv_dia import dia_from_csr

            try:
                offs, dvals = dia_from_csr(*csr)
                self.dia = (offs, jnp.asarray(dvals, dtype))
            except ValueError:
                if backend == "dia":
                    raise
        if self.dia is not None and len(self.gids) == 1:
            # Grid-patterned diagonals {0, +-1, +-nx} ARE a 2-D stencil
            # with full coefficient fields: the fast Pallas explicit path
            # (shifts, no lane rotations; see stencil_kernel.
            # apply_stencil5_field_pallas).
            from multigrid_petsc_tpu.ops.stencil import Stencil5

            ny, nx = self.shapes[0]
            offs, dvals = self.dia
            pattern = {-nx: "cs", -1: "cw", 0: "cc", 1: "ce", nx: "cn"}
            if set(offs) <= set(pattern):
                fields = {
                    name: np.zeros((ny, nx), dtype) for name in pattern.values()
                }
                for d, row in zip(offs, dvals):
                    fields[pattern[d]] = np.asarray(row).reshape(ny, nx)
                # The stencil kernel's zero-edge column shifts drop any
                # flat +-1 entry that wraps across a grid-row boundary
                # (column j=nx-1 -> next row's j=0); such entries cannot
                # arise from the 5-point Dirichlet assembly, but nothing
                # upstream enforces that — verify the wrap positions are
                # empty and keep the general DIA kernel otherwise.
                no_wrap = (
                    not fields["ce"][:, -1:].any()
                    and not fields["cw"][:, :1].any()
                )
                if no_wrap:
                    self.stencil_form = Stencil5(
                        **{k: jnp.asarray(v) for k, v in fields.items()}
                    )

    def flatten(self, state):
        return jnp.concatenate([x.ravel() for x in state])

    def unflatten(self, vec):
        out, off = [], 0
        for (ny, nx) in self.shapes:
            out.append(vec[off : off + ny * nx].reshape(ny, nx))
            off += ny * nx
        return tuple(out)

    def apply(self, state, force_dia: bool = False):
        """y = A x.  On TPU banded 32-bit operators run Pallas kernels —
        the stencil-form field kernel when the diagonals match the grid
        pattern (fast path), the general DIA kernel otherwise; elsewhere
        (f64, irregular matrices, CPU) the ELL gather path.  Mosaic
        silently demotes f64 math, so compiled kernels are gated to
        itemsize < 8 (same rule as stencil_kernel._x64_scope); f64 on TPU
        keeps XLA's exact emulated-f64 gather.  ``force_dia`` runs the
        Pallas path in interpreter mode off-TPU (kernel tests).
        """
        on_tpu = (jax.devices()[0].platform == "tpu"
                  and jnp.dtype(self.vals.dtype).itemsize < 8)
        if not (on_tpu or force_dia) or self.dia is None:
            return self.unflatten(
                ell_spmv(self.vals, self.cols, self.flatten(state))
            )
        if self.stencil_form is not None:
            from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
                apply_stencil5_field_pallas,
            )

            return (
                apply_stencil5_field_pallas(
                    self.stencil_form, state[0], interpret=not on_tpu
                ),
            )
        from multigrid_petsc_tpu.ops.pallas.spmv_dia import dia_spmv_pallas

        offs, dvals = self.dia
        return self.unflatten(
            dia_spmv_pallas(offs, dvals, self.flatten(state),
                            interpret=not on_tpu)
        )
