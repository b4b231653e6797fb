"""Benchmark: matrix-free 5-point stencil SpMV throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (per BASELINE.json): stencil-points/s per chip for the
matrix-free 5-point SpMV on a large grid.  ``vs_baseline`` is the fraction
of the measured HBM-bandwidth roofline achieved (the reference publishes
no numbers — BASELINE.md — so the roofline is the baseline; target >= 0.8).

Runs on whatever backend jax selects (the driver provides a real TPU chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.stencil import apply_stencil5
from multigrid_petsc_tpu.problems import stencil_coefficients


def _timeit(fn, *args, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dtype = jnp.float32
    n = 8191  # 8193^2 grid interior (BASELINE.md config 3 size, one chip)
    st = stencil_coefficients(MeshType.UNIFORM, n, n, dtype)
    u = jnp.ones((n, n), dtype)
    iters = 20

    @jax.jit
    def spmv_chain(u):
        # Chained applies defeat dead-code elimination and keep the op
        # resident; scale keeps values bounded.
        def body(_, x):
            return apply_stencil5(st, x) * jnp.asarray(1e-6, dtype)
        return jax.lax.fori_loop(0, iters, body, u)

    t_apply = _timeit(spmv_chain, u, iters=iters)
    points_per_s = (n * n) / t_apply

    # HBM roofline: achievable bandwidth measured with a same-size triad;
    # the stencil's minimum traffic is read u + write y = 8 B/point in f32
    # (halo rows re-read from cache/VMEM; (ny,1) coefficients negligible).
    @jax.jit
    def triad_chain(x):
        def body(_, x):
            return x * jnp.asarray(0.999, dtype) + jnp.asarray(1e-9, dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    t_triad = _timeit(triad_chain, u, iters=iters)
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
