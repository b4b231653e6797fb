"""Probe: where does an mg-CG iteration's device time go at 8193^2?

Loop-differenced (fori_loop, two lengths — cancels dispatch/RTT) timings
of the three components of one mg-CG iteration:

  * precond : one full V-cycle application  M r  (all fused level visits)
  * apply   : fine-level Ap (the CG operator application)
  * cgvec   : the CG vector work (u/r updates + norm + dots + p update)

plus the composed full iteration, so component times can be checked
against the whole.  Run AFTER kernel changes to retune the traffic model
in benchmarks/baseline_configs.modeled_bytes_per_iter.
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.vcycle import mg_apply
from multigrid_petsc_tpu.ops.norms import tree_dot, tree_norm2
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193
GRIDS = 11


def timed_loop(mk, x, k1, k2):
    def timed(k):
        f = mk(k)
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main() -> None:
    cfg = SolverConfig(npts=N, grids=GRIDS, levels=GRIDS,
                       cycle=CycleType.MGCG, dtype="float32")
    ctx = build_context(cfg)
    lvl0 = ctx.levels[0]
    v0, v1 = cfg.v
    b = ctx.b0

    # precond: carry z through repeated V-cycles (normalize to avoid
    # under/overflow across iterations; one extra pass, subtracted via
    # the normalizing-only baseline below if needed — it is ~3% here).
    def mk_precond(k):
        def run(r):
            return jax.lax.fori_loop(
                0, k, lambda i, z: mg_apply(ctx, z, v0, v1), r
            )

        return jax.jit(run)

    dt_precond = timed_loop(mk_precond, b, 2, 8)

    # apply: carry p through repeated fine-level applies (with a scale to
    # keep values bounded; the scale fuses into the kernel's consumer).
    def mk_apply(k):
        def run(p):
            def one(i, p):
                ap = lvl0.apply(p)
                return tuple(0.25 * x for x in ap)

            return jax.lax.fori_loop(0, k, one, p)

        return jax.jit(run)

    dt_apply = timed_loop(mk_apply, b, 2, 12)

    # cgvec: the CG vector work with FIXED ap/z (no operator, no precond):
    # alpha = rz/<p,ap>; u += alpha p; r -= alpha ap; rn = ||r||;
    # rz' = <r,z>; beta; p = z + beta p.
    z = b

    def mk_cgvec(k):
        def run(state):
            u, r, p, rz = state

            def one(i, s):
                u, r, p, rz = s
                ap = p  # stand-in: already-materialized array
                alpha = rz / tree_dot(p, ap)
                u = tuple(uk + alpha * pk for uk, pk in zip(u, p))
                r = tuple(rk - alpha * ak for rk, ak in zip(r, ap))
                rn = tree_norm2(r)
                rz_new = tree_dot(r, z)
                beta = rz_new / rz
                p = tuple(zk + beta * pk for zk, pk in zip(z, p))
                return (u, r, p, rz_new + rn * 0)

            return jax.lax.fori_loop(0, k, one, (u, r, p, rz))

        return jax.jit(run)

    state0 = (b, b, b, jnp.float32(1.0))
    dt_cgvec = timed_loop(mk_cgvec, state0, 2, 12)

    n2b = (N - 2) * (N - 2) * 4
    print(f"precond (V-cycle) : {dt_precond*1e3:7.2f} ms "
          f"({6.5*1.36*n2b/dt_precond/1e9:6.1f} GB/s vs modeled bytes)")
    print(f"apply (Ap)        : {dt_apply*1e3:7.2f} ms "
          f"({2*n2b/dt_apply/1e9:6.1f} GB/s)")
    print(f"cgvec (updates)   : {dt_cgvec*1e3:7.2f} ms "
          f"({11*n2b/dt_cgvec/1e9:6.1f} GB/s vs 11 passes)")
    print(f"sum               : {(dt_precond+dt_apply+dt_cgvec)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
