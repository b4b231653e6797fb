"""Per-level distributed operator set: fused Pallas kernels under shard_map.

``DistLevelOps`` is what a row-sharded level's LevelCtx delegates to: every
operator application (smooth / apply / residual / fused V-cycle visits) runs
the fused Pallas kernels on each device's local row block with ppermute halo
exchange (ops/pallas/dist_kernel.py).  This is the TPU-native form of the
reference's distributed hot path, where every MatMult is a halo exchange on
the row partition (reference: src/solver.c:1516,1535,1540; SURVEY.md C23)
— except the smoother's k sweeps + residual + transfer gap ride ONE
exchange + one fused kernel instead of k+2 separate MatMults.

State convention: sharded levels carry ONE pad row (``ny + 1`` divisible by
the device count); all arrays here are global (ny+1, nx) jax.Arrays sharded
P("y", None) over the (P, 1) row mesh (see device_mesh.row_plan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from multigrid_petsc_tpu.ops.stencil import Stencil5, Stencil9
from multigrid_petsc_tpu.ops.pallas.dist_kernel import (
    dist_coeff9_slabs,
    dist_coeff_slabs,
    dist_level_visit_local,
    halo_rows,
    pick_tile,
)


def dist_viable(ny: int, n_devices: int, max_sweeps: int,
                nx: int | None = None) -> bool:
    """Can a (ny, nx) level run the distributed Pallas path on P devices?
    Needs ny+1 divisible by P, an even per-device block, and room for the
    largest halo carry (max_sweeps + 2 rows) in a valid tile."""
    if (ny + 1) % n_devices:
        return False
    R = (ny + 1) // n_devices
    if R % 2:
        return False
    return pick_tile(R, halo_rows(max_sweeps, "rc"), nx=nx) is not None


class DistLevelOps:
    """Distributed fused-kernel operator set for one (single-grid) level."""

    def __init__(
        self,
        st: Stencil5,
        ny: int,
        nx: int,
        mesh: Mesh,
        dtype,
        steps_fn=None,  # sweeps -> tuple of (alpha, beta) smoother steps
        interpret: bool = False,
        tile_cap: int | None = None,  # force smaller row tiles (tests: the
        # overlapped two-call split engages only when R/t >= 3 blocks)
    ):
        self.st = st
        self.ny, self.nx = ny, nx
        self.mesh = mesh
        self.P = int(mesh.devices.size)
        self.R = (ny + 1) // self.P
        self.dtype = jnp.dtype(dtype)
        self.steps_fn = steps_fn
        self.interpret = interpret
        self.tile_cap = tile_cap
        self.sharding = NamedSharding(mesh, PartitionSpec("y", None))
        self._cache: dict = {}

    # -- plumbing -----------------------------------------------------------

    def _slabs(self, t: int, h: int):
        # Kept as HOST numpy: they enter each jitted solve as a baked
        # constant that shard_map splits per device (a committed device
        # array here would be hoisted to a hidden const-arg and break the
        # AOT lower/compile path solve() uses).  Tiny: coefficient
        # columns x slab (+ the (9, 1, nx) x-row profile for 9-pt).
        key = ("slabs", t, h)
        if key not in self._cache:
            from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
                _compute_dtype,
            )

            cdt = _compute_dtype(self.dtype)  # coeffs stay f32 for bf16
            if isinstance(self.st, Stencil9):
                self._cache[key] = dist_coeff9_slabs(
                    self.st, self.ny, self.nx, self.R, self.P, t, h, cdt,
                )
            else:
                self._cache[key] = (
                    dist_coeff_slabs(self.st, self.ny, self.R, self.P,
                                     t, h, cdt),
                    None,
                )
        return self._cache[key]

    def _fn(self, steps: tuple, emit: str, correct: bool):
        """shard_map-wrapped fused visit for a given (steps, emit) shape."""
        key = ("fn", steps, emit, correct)
        if key in self._cache:
            return self._cache[key]
        h = halo_rows(len(steps), emit)
        t = pick_tile(self.R, h, nx=self.nx, itemsize=self.dtype.itemsize,
                      cap=self.tile_cap if self.tile_cap else 256)
        if t is None:
            raise ValueError(
                f"level rows/device R={self.R} cannot carry halo h={h}"
            )
        slabs, crow = self._slabs(t, h)
        body = functools.partial(
            dist_level_visit_local,
            steps=steps, emit=emit, t=t, axis="y",
            interpret=self.interpret,
            # 9-pt: x-row coefficient profile + the real interior row
            # count ride as closed-over HOST-numpy constants (embedded as
            # replicated literals in the shard_map body, like the slabs).
            crow=crow,
            ny=self.ny,
        )
        row = PartitionSpec("y", None)
        in_specs = (PartitionSpec("y", None, None, None), row, row)
        if correct:
            in_specs += (row,)
        if emit in ("ur", "rc"):
            out_specs = (row, row)
        else:
            out_specs = row
        fn = shard_map(body, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        self._cache[key] = (fn, slabs)
        return self._cache[key]

    # -- level operators ----------------------------------------------------

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        fn, cs = self._fn((), "a", False)
        return fn(cs, u, u)  # b slot unused by emit="a"

    def residual(self, b: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        fn, cs = self._fn((), "r", False)
        return fn(cs, u, b)

    def smooth(self, b: jnp.ndarray, u: jnp.ndarray, sweeps: int):
        fn, cs = self._fn(self.steps_fn(sweeps), "u", False)
        return fn(cs, u, b)

    def visit_down(self, b: jnp.ndarray, u: jnp.ndarray | None, sweeps: int):
        """smooth -> restricted residual: (u', R(b - A u')).  ``u=None``
        means zero initial guess (preconditioner applications / down-leg
        below the finest)."""
        if u is None:
            u = jnp.zeros_like(b)
        fn, cs = self._fn(self.steps_fn(sweeps), "rc", False)
        return fn(cs, u, b)

    def visit_up(self, b, u, e_coarse, sweeps: int, emit_r: bool = False):
        """u += P e -> smooth [-> residual]."""
        emit = "ur" if emit_r else "u"
        fn, cs = self._fn(self.steps_fn(sweeps), emit, True)
        return fn(cs, u, b, e_coarse.astype(u.dtype))
