"""Benchmark: matrix-free 5-point stencil SpMV throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (per BASELINE.json): stencil-points/s per chip for the
matrix-free 5-point SpMV on a large grid (Pallas kernel on TPU, jnp path
elsewhere).  ``vs_baseline`` is the fraction of the measured HBM-bandwidth
roofline achieved (the reference publishes no numbers — BASELINE.md — so
the roofline is the baseline; target >= 0.8).
"""

from __future__ import annotations

import json
import time

import jax

# Persistent compile cache: first-compile over the tunneled TPU is slow
# (minutes); cache hits make repeat bench runs take seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import apply_stencil5_pallas
from multigrid_petsc_tpu.ops.stencil import apply_stencil5
from multigrid_petsc_tpu.problems import stencil_coefficients


def _timeit(fn, *args, iters: int) -> float:
    # Force a host readback: over the tunneled TPU, block_until_ready on a
    # remote buffer does not reliably synchronize.
    float(jnp.sum(fn(*args)))  # warmup (compile)
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dtype = jnp.float32
    n = 8191  # 8193^2 grid interior (BASELINE.md config 3 size, one chip)
    st = stencil_coefficients(MeshType.UNIFORM, n, n, dtype)
    u = jnp.ones((n, n), dtype)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        spmv = jax.jit(lambda x: apply_stencil5_pallas(st, x))
    else:
        spmv = jax.jit(lambda x: apply_stencil5(st, x))

    t_apply = _timeit(spmv, u, iters=20)
    points_per_s = (n * n) / t_apply

    # HBM roofline: achievable bandwidth measured with a same-size triad;
    # the stencil's minimum traffic is read u + write y = 8 B/point in f32
    # (halo rows re-read from cache/VMEM; (ny, 1) coefficients negligible).
    @jax.jit
    def triad(x):
        return x * jnp.asarray(0.999, dtype) + jnp.asarray(1e-9, dtype)

    t_triad = _timeit(triad, u, iters=20)
    bw_bytes = (n * n * 8) / t_triad  # read + write per point
    roofline_points = bw_bytes / 8.0
    frac = points_per_s / roofline_points

    print(
        json.dumps(
            {
                "metric": "spmv_stencil_points_per_s",
                "value": round(points_per_s),
                "unit": "points/s",
                "vs_baseline": round(frac, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
