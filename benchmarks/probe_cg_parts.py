"""Probe: fine-grained mg-CG iteration budget at 8193^2 (round 3).

Loop-differenced device timings of each piece of the FUSED CG iteration
(krylov._solve_mgcg_fused) so the remaining wall-time gap to the 0.8
roofline target can be attributed.  Carries are chosen so each loop body
is EXACTLY the probed operation (outputs feed the next iteration's
inputs through the existing donation chains — no scale/update passes
that would inflate the measurement).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_cg_parts.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.vcycle import _cycle, mg_apply, mg_apply_dot
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193
GRIDS = 11


def timed_loop(mk, x, k1, k2):
    def timed(k):
        f = jax.jit(mk(k))
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
    n = N - 2
    n2b = n * n * 4
    nyc = (n - 1) // 2

    # papply: carry (z, p) -> (ap, p') — pure kernel, donation chain
    # intact.  Values blow up (A^k); timing is unaffected.
    def mk_papply(k):
        def run(state):
            def one(i, s):
                z, p = s
                pn, ap, d = lvl0.papply(z, p, 0.4)
                return (ap, pn)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    dt = timed_loop(mk_papply, (b[0], b[0] + 1e-3), 2, 10)
    print(f"papply    : {dt*1e3:7.2f} ms ({4*n2b/dt/1e9:6.1f} GB/s vs 4 passes)")

    # cgupd: u += a p; r -= a ap; ||r|| folded into the u update scalar.
    def mk_cgupd(k):
        def run(state):
            def one(i, s):
                u, r, p, ap = s
                rn = jnp.sqrt(jnp.sum(r * r))
                u = u + 0.3 * p + 1e-30 * rn
                r = r - 0.3 * ap
                return (u, r, p, ap)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    dt = timed_loop(mk_cgupd, (b[0], b[0], b[0], b[0]), 2, 10)
    print(f"cgupd+norm: {dt*1e3:7.2f} ms ({7*n2b/dt/1e9:6.1f} GB/s vs 7 passes)")

    # vdown0: carry (r, rc) -> (u0, rc1): the zero-guess level-0 down
    # visit alone (kernel + the XLA x-restriction half).
    def mk_vdown(k):
        def run(state):
            def one(i, s):
                r, rc = s
                u0, rc1 = lvl0.visit_down((r,), None, v0)
                return (u0[0], rc1)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    rc0 = jnp.zeros((nyc, nyc), jnp.float32)
    dt = timed_loop(mk_vdown, (b[0], rc0), 2, 10)
    print(f"vdown0    : {dt*1e3:7.2f} ms ({3.5*n2b/dt/1e9:6.1f} GB/s vs 3.5 passes)")

    # vup0: carry (u, r); z (aliased into u's buffer) becomes next u.
    e_c = jnp.full((nyc, nyc), 1e-6, jnp.float32)

    def mk_vup(k):
        def run(state):
            def one(i, s):
                u, r = s
                z, d = lvl0.visit_up_dot((r,), (u,), e_c, v0)
                return (z[0], r)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    dt = timed_loop(mk_vup, (b[0], b[0]), 2, 10)
    print(f"vup0      : {dt*1e3:7.2f} ms ({4.5*n2b/dt/1e9:6.1f} GB/s vs 4.5 passes)")

    # coarse_mg: everything below level 0 (transfers + sub-cycle),
    # carried through e (the prolonged correction one gap below fine).
    def mk_coarse(k):
        def run(rc1):
            def one(i, rc1):
                bn = ctx.restrict_rc1(0, rc1)
                un = _cycle(ctx, 1, bn, None, v0, v1, False)
                e = ctx.prolong_half(0, un)  # (nyc, n)
                return e[:, :nyc]

            return jax.lax.fori_loop(0, k, one, rc1)

        return run

    dt = timed_loop(mk_coarse, jnp.ones((nyc, nyc), jnp.float32), 2, 10)
    print(f"coarse_mg : {dt*1e3:7.2f} ms (levels 1..{GRIDS-1} + transfers)")

    # full preconditioner (cross-check of vdown0 + coarse + vup0).
    def mk_pre(k):
        def run(r):
            def one(i, r):
                z, d = mg_apply_dot(ctx, (r,), v0, v1)
                return z[0]

            return jax.lax.fori_loop(0, k, one, r)

        return run

    dt = timed_loop(mk_pre, b[0], 2, 8)
    print(f"precond   : {dt*1e3:7.2f} ms (mg_apply_dot, {GRIDS} grids)")

    # depth sweep: level truncation trade-off.
    for grids in (6, 8, 11):
        cfgg = SolverConfig(npts=N, grids=grids, levels=grids,
                            cycle=CycleType.MGCG, dtype="float32")
        ctxg = build_context(cfgg)

        def mk_mg(k, _ctx=ctxg):
            def run(r):
                def one(i, r):
                    z = mg_apply(_ctx, (r,), v0, v1)
                    return z[0]

                return jax.lax.fori_loop(0, k, one, r)

            return run

        dt = timed_loop(mk_mg, ctxg.b0[0], 2, 8)
        print(f"mg_apply grids={grids:2d}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
