"""Probe: per-level attribution of the V-cycle's device time at 8193^2.

Two experiments, both loop-differenced (fori_loop at two lengths — cancels
dispatch/RTT through the tunneled backend):

  1. mg_apply at hierarchy depths 2..11: the marginal cost of each added
     level (difference between consecutive depths) shows whether the deep
     small levels are latency-bound.
  2. Standalone fused visit kernels (visit_down / visit_up) at each level
     size, so kernel time can be separated from transfer/coarse time.

Run on the real chip: python benchmarks/probe_vcycle_levels.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.vcycle import mg_apply
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193


def timed_loop(mk, x, k1, k2):
    def timed(k):
        f = mk(k)
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main() -> None:
    # --- experiment 1: depth sweep --------------------------------------
    prev = None
    for grids in range(2, 12):
        cfg = SolverConfig(npts=N, grids=grids, levels=grids,
                           cycle=CycleType.MGCG, dtype="float32")
        ctx = build_context(cfg)
        v0, v1 = cfg.v

        def mk(k, ctx=ctx, v0=v0, v1=v1):
            def run(r):
                return jax.lax.fori_loop(
                    0, k, lambda i, z: mg_apply(ctx, z, v0, v1), r
                )

            return jax.jit(run)

        dt = timed_loop(mk, ctx.b0, 2, 8)
        coarse_n = ctx.levels[-1].spec.primary.ny
        marginal = "" if prev is None else f"  (+{(dt - prev) * 1e3:6.3f} ms)"
        print(f"depth {grids:2d} (coarse {coarse_n:5d}^2): "
              f"{dt * 1e3:7.3f} ms{marginal}", flush=True)
        prev = dt

    # --- experiment 2: standalone visits per level size ------------------
    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
        fused_level_visit_pallas,
        jacobi_step_coeffs,
    )
    from multigrid_petsc_tpu.problems import stencil_coefficients
    from multigrid_petsc_tpu.mesh import MeshType

    steps = jacobi_step_coeffs(3, 0.8)
    print()
    n = N - 2
    while n >= 61:
        st = stencil_coefficients(MeshType.UNIFORM, n, n, jnp.float32)
        b = jnp.ones((n, n), jnp.float32)
        nyc = (n - 1) // 2
        ec = jnp.ones((nyc, nyc), jnp.float32)

        def mk_down(k, st=st, n=n):
            def run(b):
                def one(i, u):
                    u2, rc = fused_level_visit_pallas(st, b, u, steps,
                                                      emit="rc")
                    return u2 * 0.5 + rc.sum() * 1e-20

                return jax.lax.fori_loop(0, k, one, b)

            return jax.jit(run)

        def mk_up(k, st=st, n=n, ec=ec):
            def run(b):
                def one(i, u):
                    u2 = fused_level_visit_pallas(st, b, u, steps,
                                                  emit="u", e_coarse=ec)
                    return u2 * 0.5

                return jax.lax.fori_loop(0, k, one, b)

            return jax.jit(run)

        dt_d = timed_loop(mk_down, b, 2, 10)
        dt_u = timed_loop(mk_up, b, 2, 10)
        nb = n * n * 4
        print(f"n={n:5d}: down {dt_d*1e3:7.3f} ms ({3.75*nb/dt_d/1e9:5.0f} "
              f"GB/s eff)  up {dt_u*1e3:7.3f} ms "
              f"({3.5*nb/dt_u/1e9:5.0f} GB/s eff)", flush=True)
        n = (n - 1) // 2


if __name__ == "__main__":
    main()
