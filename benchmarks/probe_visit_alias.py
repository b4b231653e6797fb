"""Probe: real HBM rate of the fused level-visit kernels once the XLA
while-loop backedge copy is out of the measurement (and whether
input_output_aliases removes it in situ).

probe_dma.py established that the ~330 GB/s "Pallas ceiling" round 2
reported was an artifact: a pallas output that cannot alias its input
buffer forces XLA to copy the carry at the fori_loop backedge, adding
2 n^2 B per iteration.  io-aliased copies reach ~615 GB/s and in-kernel
DMA loops ~648 GB/s (vs 652 triad).

This probe times the production kernels (smooth, visit_down, visit_up)
at 8191^2 f32 three ways:
  A. round-2 style: fori_loop carry, NO aliasing  (backedge copy included)
  B. fori_loop carry WITH input_output_aliases u->u'
  C. ping-pong: two independent chains, no aliasing (no backedge copy)
and reports achieved GB/s against the kernel's modeled bytes.
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    fused_level_visit_pallas,
    jacobi_step_coeffs,
    smooth_sweeps_pallas,
)
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8191
DT = jnp.float32
B = 4
STEPS = jacobi_step_coeffs(3, 0.8)


def timed_pair(mk, x, k1, k2, bytes_per_iter):
    def timed(k):
        f = mk(k)
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    dt = (timed(k2) - timed(k1)) / (k2 - k1)
    return bytes_per_iter / dt, dt


def main() -> None:
    st = stencil_coefficients(MeshType.UNIFORM, N, N, DT)
    b = jnp.ones((N, N), DT)
    u0 = jnp.zeros((N, N), DT)
    ec = jnp.zeros(((N - 1) // 2, (N - 1) // 2), DT)

    # modeled HBM bytes per kernel call (read u+b, write u [+ extras])
    n2 = N * N * B
    cases = {
        # (fn(u) -> u', modeled bytes)
        "smooth3": (lambda u: smooth_sweeps_pallas(st, b, u, STEPS), 3 * n2),
        "visit_down": (
            lambda u: fused_level_visit_pallas(st, b, u, STEPS, emit="rc")[0],
            3.25 * n2,
        ),
        "visit_up": (
            lambda u: fused_level_visit_pallas(
                st, b, u, STEPS, emit="u", e_coarse=ec
            ),
            3.25 * n2,
        ),
    }

    for name, (fn, nbytes) in cases.items():
        # A: carry loop (includes any backedge copy)
        mk_a = lambda k: jax.jit(
            lambda u: jax.lax.fori_loop(0, k, lambda i, c: fn(c), u)
        )
        gbs_a, dt_a = timed_pair(mk_a, u0, 2, 10, nbytes)
        # C: ping-pong — two independent half-length chains
        def mk_c(k):
            def run(u):
                c1 = jax.lax.fori_loop(0, k // 2, lambda i, c: fn(c), u)
                c2 = jax.lax.fori_loop(0, k - k // 2,
                                       lambda i, c: fn(c), u + 1e-6)
                return c1 + c2

            return jax.jit(run)

        gbs_c, dt_c = timed_pair(mk_c, u0, 2, 10, nbytes)
        print(
            f"{name:11s}  carry-loop {gbs_a/1e9:6.1f} GB/s ({dt_a*1e3:6.2f} "
            f"ms)   2-chain {gbs_c/1e9:6.1f} GB/s ({dt_c*1e3:6.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
