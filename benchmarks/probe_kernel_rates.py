"""Probe: standalone streaming rates of each hot kernel at 8191^2 f32.

Each loop carries the kernel's donated outputs straight back into its
donated inputs, so the measured time is the kernel alone in its
steady-state buffer regime (no extra passes, no backedge copies).

Questions this answers after a kernel change:
  * does the SMEM dot/norm emission cost measurable time?
  * do the visit variants reach the smooth-kernel rate (~455+ GB/s)?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_kernel_rates.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    cg_papply_pallas,
    cg_visit_down_pallas,
    fused_level_visit_pallas,
    jacobi_step_coeffs,
    smooth_sweeps_pallas,
)
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8191


def timed_loop(mk, x, k1=2, k2=10):
    def timed(k):
        f = jax.jit(mk(k))
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    return (timed(k2) - timed(k1)) / (k2 - k1)


def report(name, dt, passes):
    n2b = N * N * 4
    print(f"{name:12s}: {dt*1e3:7.2f} ms ({passes*n2b/dt/1e9:6.1f} GB/s"
          f" vs {passes} passes)")


def main() -> None:
    st = stencil_coefficients(MeshType.UNIFORM, N, N, jnp.float32)
    steps = jacobi_step_coeffs(3, 0.8)
    b = jnp.ones((N, N), jnp.float32)
    nyc = (N - 1) // 2
    e_c = jnp.full((nyc, nyc), 1e-6, jnp.float32)

    # smooth3 (reference rate): u' aliases u; carry u.
    def mk_smooth(k):
        def run(u):
            return jax.lax.fori_loop(
                0, k, lambda i, u: smooth_sweeps_pallas(st, b, u, steps), u
            )

        return run

    report("smooth3", timed_loop(mk_smooth, b + 0.1), 3)

    # visit_up (correct+smooth, no dot).
    def mk_vup(k):
        def run(u):
            def one(i, u):
                return fused_level_visit_pallas(st, b, u, steps, emit="u",
                                                e_coarse=e_c)

            return jax.lax.fori_loop(0, k, one, u)

        return run

    report("visit_up", timed_loop(mk_vup, b + 0.1), 4.25)

    # visit_up_dot (same + SMEM dot partials).
    def mk_vupd(k):
        def run(u):
            def one(i, u):
                z, d = fused_level_visit_pallas(
                    st, b, u, steps, emit="u", e_coarse=e_c, emit_dot=True)
                return z

            return jax.lax.fori_loop(0, k, one, u)

        return run

    report("visit_up_dot", timed_loop(mk_vupd, b + 0.1), 4.25)

    # zero-guess down visit (no donation possible: b stays live).
    def mk_vdown(k):
        def run(state):
            def one(i, s):
                u0, rc = fused_level_visit_pallas(st, b, None, steps,
                                                  emit="rc")
                return (u0, rc)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    rc0 = jnp.zeros((nyc, nyc), jnp.float32)
    report("vdown0", timed_loop(mk_vdown, (b + 0.1, rc0)), 3.5)

    # cg_visit_down (donates r -> r', ap -> u0).
    def mk_cgdown(k):
        def run(state):
            def one(i, s):
                r, ap = s
                u0, rc, r2, rn2 = cg_visit_down_pallas(st, r, ap, 0.3, steps)
                return (r2, u0)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    report("cg_down", timed_loop(mk_cgdown, (b + 0.1, b + 0.2)), 4.5)

    # cg_papply (donates z -> ap, p -> p').
    def mk_papply(k):
        def run(state):
            def one(i, s):
                z, p = s
                pn, ap, d = cg_papply_pallas(st, z, p, 0.4)
                return (ap, pn)

            return jax.lax.fori_loop(0, k, one, state)

        return run

    report("cg_papply", timed_loop(mk_papply, (b * 1e-3, b * 2e-3)), 4)


if __name__ == "__main__":
    main()
