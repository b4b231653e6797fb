"""Probe: (a) Pallas streaming regimes, (b) fused-CG body ablation (round 4).

(a) Streaming regimes.  probe_dma.py established ~330 GB/s for a Pallas
copy carried through a fori_loop backedge and ~615 GB/s with
input_output_aliases.  The bench solve is a while_loop whose INTERMEDIATE
kernel outputs are not loop carries, so what matters is the straight-line
regime: a chain of 8 dependent copies (fresh outputs, no loop) vs the
same chain with io-aliasing.  This pins down whether un-aliased visit
outputs pay the 330 GB/s rate even outside loops.

(b) Ablation.  Replicates krylov._solve_mgcg_fused's loop body exactly
(same carries, same donation chains) and times variants with parts
removed, attributing the measured ~13.5 ms/cycle:
      full      : the real body
      nocoarse  : coarse hierarchy replaced by identity (e_c = 0-gap lift
                  of rc1) — isolates levels >= 1 + transfers
      noupd     : u/alpha update dropped (isolates the XLA axpy pass)
      nopapply  : papply replaced by reusing z (isolates the CG direction
                  kernel)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_cg_ablate.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.vcycle import _cycle, mg_apply_cgdown, mg_apply_dot
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193
GRIDS = 11


def _copy_chain(n: int, depth: int, alias: bool):
    t = 256
    g = pl.cdiv(n, t)

    def kernel(u_ref, o_ref):
        o_ref[:] = u_ref[:] * jnp.asarray(1.0001, jnp.float32)

    spec = pl.BlockSpec((t, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def copy(x):
        return pl.pallas_call(
            kernel, grid=(g,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            input_output_aliases={0: 0} if alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(x)

    @jax.jit
    def chain(x):
        for _ in range(depth):
            x = copy(x)
        return x

    return chain


def timed(f, x, reps=3):
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def part_a() -> None:
    n, d1, d2 = 8192, 4, 20
    x = jnp.ones((n, n), jnp.float32)
    for alias in (False, True):
        f1 = _copy_chain(n, d1, alias)
        f2 = _copy_chain(n, d2, alias)
        dt = (timed(f2, x) - timed(f1, x)) / (d2 - d1)
        bw = n * n * 4 * 2 / dt
        print(f"straight-line copy, alias={alias}: {dt*1e3:6.2f} ms/copy "
              f"({bw/1e9:6.1f} GB/s)", flush=True)


def part_b() -> None:
    cfg = SolverConfig(npts=N, grids=GRIDS, levels=GRIDS,
                       cycle=CycleType.MGCG, dtype="float32")
    ctx = build_context(cfg)
    lvl0 = ctx.levels[0]
    v0, v1 = cfg.v
    b = ctx.b0[0]
    n = N - 2
    nyc = (n - 1) // 2

    def body(mode):
        def one(i, c):
            u, r, z, p, rz, beta = c
            if mode == "nopapply":
                p0, ap, pap = p, z, jnp.sum(z * z) + 1.0
            else:
                p0, ap, pap = lvl0.papply(z, p, beta)
            alpha = rz / pap
            if mode != "noupd":
                u = u + alpha * p0
            if mode == "nocoarse":
                k = v0
                u0, rc1, r_new, rn2 = lvl0.cg_visit_down(r, ap, alpha, k)
                e_c = rc1[:, :nyc] * 0.123
                zz, rzn = lvl0.visit_up_dot((r_new,), (u0,), e_c, k)
                z, rz_new = zz[0], rzn
            else:
                zt, rz_new, r_new, rn2 = mg_apply_cgdown(
                    ctx, r, ap, alpha, v0, v1)
                z = zt[0]
            beta = rz_new / rz
            return (u, r_new, z, p0, rz_new, beta)

        def run(state):
            return jax.lax.fori_loop(0, K[0], one, state)

        return run

    K = [0]

    def run_mode(mode, k1=2, k2=10):
        z0, rz0 = mg_apply_dot(ctx, (b,), v0, v1)
        state = (jnp.zeros_like(b), b, z0[0], jnp.zeros_like(b),
                 rz0, jnp.asarray(0.0, rz0.dtype))

        def t(k):
            K[0] = k
            f = jax.jit(body(mode))
            jax.block_until_ready(f(state))
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            return time.perf_counter() - t0

        return (t(k2) - t(k1)) / (k2 - k1)

    for mode in ("full", "nocoarse", "noupd", "nopapply"):
        dt = run_mode(mode)
        print(f"cg body {mode:9s}: {dt*1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    part_a()
    part_b()
