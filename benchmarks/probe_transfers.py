"""Probe: the XLA transfer passes around the fused visit kernels (round 4).

probe_cg_parts attributed the cycle-time gap to the level visits
(vup0 112 GB/s, vdown0 205 GB/s vs 550-780 GB/s for the pure kernels).
The visits differ from the pure kernels only by the XLA-side transfer
passes (the correction u + prolong_bilinear(e) before the up-kernel,
restrict_x_fw after the down-kernel) — this probe times each piece and
the candidate replacements.  Findings (v5e, 8191^2 f32, k=3 sweeps):
see benchmarks/results/probe_transfers_r04.txt.

Note: conv-based transfer variants (lhs-dilated / strided conv) are NOT
here — XLA materializes a 34 GB intermediate for the dilated conv at
8191^2 (HBM OOM), so that path is ruled out outright.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_transfers.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    fused_level_visit_pallas,
    jacobi_step_coeffs,
    restrict_x_fw,
)
from multigrid_petsc_tpu.ops.transfer import prolong_bilinear
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8193
NY = N - 2


def timed_loop(mk, x, k1, k2):
    def timed(k):
        f = jax.jit(mk(k))
        jax.block_until_ready(f(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main() -> None:
    ny = nx = NY
    nyc = (ny - 1) // 2
    st = stencil_coefficients(MeshType.UNIFORM, ny, nx, jnp.float32)
    steps = jacobi_step_coeffs(3, 0.8)
    b = jnp.ones((ny, nx), jnp.float32)
    n2b = ny * nx * 4

    # e derived from the carry so XLA cannot hoist P e out of the loop
    # (contiguous slice — a 2-D strided slice here costs ~400 ms itself,
    # the pathological op restrict_fw's docstring warns about).
    def carry_e(u):
        return u[:nyc, :nyc] * 0.25

    # -- correction pass: u' = u + P e ----------------------------------
    def mk_corr(k):
        def run(u):
            return lax.fori_loop(
                0, k, lambda i, u: u + prolong_bilinear(carry_e(u)), u
            )

        return run

    dt = timed_loop(mk_corr, b, 4, 44)
    print(f"u+P e (interleave) : {dt*1e3:7.2f} ms "
          f"({2.5*n2b/dt/1e9:6.1f} GB/s vs 2.5 passes)", flush=True)

    # -- up-visit variants ----------------------------------------------
    def mk_vup_split(k):
        def run(s):
            def one(i, s):
                u, r = s
                u0 = u + prolong_bilinear(carry_e(u))
                z = fused_level_visit_pallas(st, r, u0, steps, emit="u")
                return (z, r)

            return lax.fori_loop(0, k, one, s)

        return run

    dt = timed_loop(mk_vup_split, (b, b), 2, 18)
    print(f"vup split (today)  : {dt*1e3:7.2f} ms "
          f"({5.5*n2b/dt/1e9:6.1f} GB/s vs 5.5 passes)", flush=True)

    def mk_vup_inkernel(k):
        def run(s):
            def one(i, s):
                u, r = s
                z = fused_level_visit_pallas(st, r, u, steps, emit="u",
                                             e_coarse=carry_e(u))
                return (z, r)

            return lax.fori_loop(0, k, one, s)

        return run

    dt = timed_loop(mk_vup_inkernel, (b, b), 2, 18)
    print(f"vup in-kernel e    : {dt*1e3:7.2f} ms "
          f"({4.25*n2b/dt/1e9:6.1f} GB/s vs 4.25 passes)", flush=True)

    def mk_vup_kernel_only(k):
        def run(s):
            def one(i, s):
                u, r = s
                z = fused_level_visit_pallas(st, r, u, steps, emit="u")
                return (z, r)

            return lax.fori_loop(0, k, one, s)

        return run

    dt = timed_loop(mk_vup_kernel_only, (b, b), 2, 18)
    print(f"vup kernel only    : {dt*1e3:7.2f} ms "
          f"({3.0*n2b/dt/1e9:6.1f} GB/s vs 3 passes)", flush=True)

    # emit_dot cost on top of the plain up-kernel.
    def mk_vup_dot(k):
        def run(s):
            def one(i, s):
                u, r = s
                z, d = fused_level_visit_pallas(st, r, u, steps, emit="u",
                                                emit_dot=True)
                return (z + 0.0 * d, r)

            return lax.fori_loop(0, k, one, s)

        return run

    dt = timed_loop(mk_vup_dot, (b, b), 2, 18)
    print(f"vup kernel + dot   : {dt*1e3:7.2f} ms "
          f"({3.0*n2b/dt/1e9:6.1f} GB/s vs 3 passes)", flush=True)

    # -- down-visit + x-restriction --------------------------------------
    def mk_vdown(k):
        def run(s):
            def one(i, s):
                r, rc = s
                u0, rc1 = fused_level_visit_pallas(st, r, None, steps,
                                                   emit="rc")
                return (u0, rc1)

            return lax.fori_loop(0, k, one, s)

        return run

    dt = timed_loop(mk_vdown, (b, jnp.zeros((nyc, nyc), jnp.float32)), 2, 18)
    print(f"vdown (today)      : {dt*1e3:7.2f} ms "
          f"({3.5*n2b/dt/1e9:6.1f} GB/s vs 3.5 passes)", flush=True)

    # down-visit kernel WITHOUT the x-half (consume rc_y directly).
    def mk_vdown_nox(k):
        def run(s):
            def one(i, s):
                r, ry = s
                out = fused_level_visit_pallas(st, r, None, steps, emit="ur")
                return (out[0], out[1][:nyc])

            return lax.fori_loop(0, k, one, s)

        return run

    # emit='ur' writes the FULL residual (1 extra half-pass vs 'rc'); use
    # as a proxy for the kernel-only cost of the down visit.
    dt = timed_loop(mk_vdown_nox, (b, jnp.zeros((nyc, nx), jnp.float32)),
                    2, 18)
    print(f"vdown kernel 'ur'  : {dt*1e3:7.2f} ms "
          f"({4.0*n2b/dt/1e9:6.1f} GB/s vs 4 passes)", flush=True)

    # restrict_x_fw alone on the half-height intermediate.
    ry = jnp.ones((nyc, nx), jnp.float32)

    def mk_rx(k):
        def run(x):
            def one(i, x):
                out = restrict_x_fw(x)
                return jnp.pad(out, ((0, 0), (0, nx - out.shape[1])))

            return lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_rx, ry, 4, 44)
    print(f"restrict_x (slices): {dt*1e3:7.2f} ms "
          f"({0.75*0.5*n2b/dt/1e9:6.1f} GB/s vs 0.375 passes)", flush=True)

    # y-then-x 1-D slice pass on a FULL-height array (the restrict_fw
    # composition) for comparison of slice orientations.
    def mk_ry(k):
        def run(x):
            def one(i, x):
                rows = x[0:-2:2, :] + 2.0 * x[1::2, :] + x[2::2, :]
                return jnp.pad(rows, ((0, ny - rows.shape[0]), (0, 0)))

            return lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_ry, b, 4, 44)
    print(f"restrict_y (slices): {dt*1e3:7.2f} ms "
          f"({1.5*n2b/dt/1e9:6.1f} GB/s vs 1.5 passes)", flush=True)


if __name__ == "__main__":
    main()
