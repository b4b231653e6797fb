"""Probe: tile-size sweep for the fused visit kernels (round 4).

probe_cg_ablate measured the visit kernels at time ~= DMA + VPU (no
overlap) while the lighter papply kernel reaches time ~= max(DMA, VPU).
Hypothesis: at t=160 the kernel's ~13 (t+2h, nx) temporaries plus the
double-buffered IO blocks exhaust the 100MB Mosaic VMEM budget, so the
pipeliner cannot overlap the next block's DMA with compute.  Smaller
tiles pay 2h/t halo re-reads but free VMEM for double buffering.

Times the zero-guess 'rc' down visit, cg_visit_down, and the in-kernel-
correction up visit at 8191^2 f32 for t in {64, 96, 128, 160, 224}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_tile_sweep.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas import stencil_kernel as sk
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8191
K = 3


def timed_loop(mk, state, k1=2, k2=12, reps=3):
    """Best-of-``reps`` per loop length: single measurements differ by up
    to ~50 ms of tunnel RTT jitter, which corrupts a one-shot difference
    (observed: negative per-iteration times)."""
    def timed(k):
        f = jax.jit(mk(k))
        jax.block_until_ready(f(state))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main() -> None:
    st = stencil_coefficients(MeshType.UNIFORM, N, N, jnp.float32)
    steps = sk.jacobi_step_coeffs(K, 0.8)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (N, N), jnp.float32)
    nyc = (N - 1) // 2
    e_c = jnp.full((nyc, nyc), 1e-6, jnp.float32)
    n2b = N * N * 4
    orig = sk._pick_tile

    for t_try in (64, 96, 128, 160, 224):
        sk._pick_tile = (
            lambda n_cols, dtype, bufs, cap=512, _t=t_try: _t
        )

        # zero-guess down visit (emit='rc'): carry r only; u0/rc unused
        # beyond a scalar tap so no backedge copies ride the measurement.
        def mk_down(k):
            def run(r):
                def one(i, r):
                    u0, rc1 = sk.fused_level_visit_pallas(
                        st, r, None, steps, emit="rc")
                    return r + 1e-30 * (u0[0, 0] + rc1[0, 0])

                return jax.lax.fori_loop(0, k, one, r)

            return run

        # cg down visit: carry (r, ap) -> (r', u0) through the donation.
        def mk_cgdown(k):
            def run(s):
                def one(i, s):
                    r, ap = s
                    u0, rc1, r2, rn2 = sk.cg_visit_down_pallas(
                        st, r, ap, 0.3, steps)
                    return (r2, u0)

                return jax.lax.fori_loop(0, k, one, s)

            return run

        # up visit with in-kernel correction + dot: carry (u, r); z
        # aliases u's buffer through the donation.
        def mk_up(k):
            def run(s):
                def one(i, s):
                    u, r = s
                    z, d = sk.fused_level_visit_pallas(
                        st, r, u, steps, emit="u", emit_dot=True,
                        e_coarse=e_c)
                    return (z + 1e-30 * d, r)

                return jax.lax.fori_loop(0, k, one, s)

            return run

        d1 = timed_loop(mk_down, b)
        d2 = timed_loop(mk_cgdown, (b, b + 1e-3))
        d3 = timed_loop(mk_up, (b, b))
        print(f"t={t_try:3d}: down {d1*1e3:6.2f} ms ({2.5*n2b/d1/1e9:5.1f}) "
              f"cgdown {d2*1e3:6.2f} ms ({4.5*n2b/d2/1e9:5.1f}) "
              f"up {d3*1e3:6.2f} ms ({3.25*n2b/d3/1e9:5.1f}) GB/s-vs-model",
              flush=True)

    sk._pick_tile = orig


if __name__ == "__main__":
    main()
