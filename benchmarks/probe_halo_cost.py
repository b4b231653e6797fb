"""Probe: what do the host-side halo-window gathers and transfer x-halves
cost per visit? (round 4)

The fused visit kernels receive their k-row overlap via separately
gathered (g, h, nx) halo-window arrays built from strided slices
(stencil_kernel._halo_windows / _gather_rows).  If XLA lowers each
strided slice as its own pass over the source array, ~10 slices per
input would explain the ~3 ms/visit gap that neither tile size nor the
kernel body accounts for.

Times, in carried loops at 8191^2 f32 (best-of-3 differenced):
    halo_wins  : _halo_windows(x, t, g, 5) alone (one input's gathers)
    gather_e   : the up-visit's _gather_rows pair on the half-height e_x
    restrict_x : restrict_x_fw on an (nyc, nx) intermediate
    prolong_x  : prolong_x_bilinear on an (nyc, nyc) coarse grid
    kernel_only: the zero-guess 'rc' visit with halo windows precomputed
                 OUTSIDE the loop (the kernel's true in-loop cost)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_halo_cost.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas import stencil_kernel as sk
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8191
K = 3
H = K + 2


def timed_loop(mk, state, k1=2, k2=12, reps=3):
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
    t = sk._pick_tile(N, jnp.float32, bufs=12, cap=256)
    g = pl.cdiv(N, t)
    nyc = (N - 1) // 2

    # 1. halo windows alone (must depend on the carry to avoid hoisting).
    def mk_halo(k):
        def run(x):
            def one(i, x):
                top, bot = sk._halo_windows(x, t, g, H)
                return x + 1e-30 * (top[0, 0, 0] + bot[0, 0, 0])

            return jax.lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_halo, b)
    print(f"halo_wins  : {dt*1e3:7.2f} ms  (2 carry passes incl.)",
          flush=True)

    # 2. e halos (up-visit): _gather_rows pair on the half-height e_x.
    e_x = jax.random.normal(key, (nyc, N), jnp.float32)
    th = H // 2 + 1 if H % 2 == 0 else (H + 1) // 2
    bh = H + 1 - th

    def mk_ge(k):
        def run(x):
            def one(i, x):
                etop = sk._gather_rows(x, g, t // 2, -th, th)
                ebot = sk._gather_rows(x, g, t // 2, t // 2, bh)
                return x + 1e-30 * (etop[0, 0, 0] + ebot[0, 0, 0])

            return jax.lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_ge, e_x)
    print(f"gather_e   : {dt*1e3:7.2f} ms  (1 carry pass incl.)", flush=True)

    # 3. x-halves of the transfers.
    ry = jax.random.normal(key, (nyc, N), jnp.float32)

    def mk_rx(k):
        def run(x):
            def one(i, x):
                rc = sk.restrict_x_fw(x)
                return x + 1e-30 * rc[0, 0]

            return jax.lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_rx, ry)
    print(f"restrict_x : {dt*1e3:7.2f} ms  (1 carry pass incl.)", flush=True)

    e_c = jax.random.normal(key, (nyc, nyc), jnp.float32)

    def mk_px(k):
        def run(x):
            def one(i, x):
                ex = sk.prolong_x_bilinear(x)
                return x + 1e-30 * ex[0, 0]

            return jax.lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_px, e_c)
    print(f"prolong_x  : {dt*1e3:7.2f} ms  (0.5 carry pass incl.)",
          flush=True)

    # 4. kernel only: halo windows precomputed outside the loop (loop-
    #    invariant b), carried tap forces re-execution of the kernel.
    b_top, b_bot = sk._halo_windows(b, t, g, H)
    cols = jnp.concatenate(
        [c.reshape(1, -1)
         for c in sk._coeff_cols(st, N, jnp.float32)], axis=0)
    t2 = t + 2 * H
    idx = jnp.asarray(np.clip(
        (np.arange(g) * t - H)[:, None] + np.arange(t2)[None, :], 0, N - 1))
    c_slabs = cols[:, idx].transpose(1, 0, 2)[..., None]
    nyc_ = (N - 1) // 2

    mid = pl.BlockSpec((t, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, H, N), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def raw_visit(bb, btop, bbot):
        with jax.enable_x64(False):
            return pl.pallas_call(
                sk._make_vcycle_kernel(N, N, t, K, g, H, steps, "rc",
                                       correct=False, zero_guess=True),
                grid=(g,),
                in_specs=[coeff, mid, halo, halo],
                out_specs=[mid,
                           pl.BlockSpec((t // 2, N), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((N, N), jnp.float32),
                           jax.ShapeDtypeStruct((nyc_, N), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20),
            )(c_slabs, bb, btop, bbot)

    def mk_kern(k):
        def run(x):
            def one(i, x):
                u0, rc = raw_visit(x, b_top, b_bot)
                # carry depends on the outputs so the call cannot be
                # hoisted as loop-invariant (costs 2 artifact passes,
                # same as the other loops here).
                return x + 1e-30 * (u0[0, 0] + rc[0, 0])

            return jax.lax.fori_loop(0, k, one, x)

        return run

    dt = timed_loop(mk_kern, b)
    print(f"kernel_only: {dt*1e3:7.2f} ms  (2 carry passes incl.)",
          flush=True)


if __name__ == "__main__":
    main()
