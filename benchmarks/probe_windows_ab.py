"""Probe: interleaved A/B of halo-window construction (round 4).

FINDING (v5e, 2026-08-21): replacing the jnp strided-gather halo windows
with a dedicated Pallas extraction pass is performance-NEUTRAL on the
full preconditioner —

    round 0: A(gather)   11.58 ms/apply   B(pallas)   12.26 ms/apply
    round 1: A(gather)   11.75 ms/apply   B(pallas)   10.70 ms/apply
    round 2: A(gather)   11.61 ms/apply   B(pallas)   12.35 ms/apply
    round 3: A(gather)   11.47 ms/apply   B(pallas)   12.29 ms/apply

so the window gathers are NOT the visit-kernel bottleneck (the kernels'
own ~additive DMA+VPU cost is — see probe_dma.py: fresh-output
auto-pipelined kernels stream at ~0.5x triad, manual in-kernel DMA at
~0.91x).  A block-reshape window construction was also tried and
measured WORSE in the full solve graph (13.5 -> 19.4 ms/cycle).  The
production kernels therefore keep the strided-gather windows.

Run-to-run drift on the tunneled chip is large (the triad reference
itself moved 648 -> 833 -> 653 GB/s across bench runs), so this probe
traces BOTH variants in one process and interleaves A/B rounds.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_windows_ab.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.pallas import stencil_kernel as sk
from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.vcycle import mg_apply_dot
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193
GRIDS = 11


def halo_windows_pallas(x, stride, g, top_rows, bot_rows,
                        interpret=False):
    """(top, bot) with _halo_windows/_gather_rows semantics, extracted by
    ONE Pallas pass: program i streams block i and stores its boundary
    rows into slot-shifted outputs (masked to zero outside [0, n))."""
    n, nx = x.shape
    gx = pl.cdiv(n, stride)
    G = max(g, gx)

    def kernel(x_ref, tails_ref, heads_ref):
        i = pl.program_id(0).astype(jnp.int32)
        blk = x_ref[:]
        tail = blk[stride - top_rows :]
        grow_t = (i * jnp.int32(stride) + jnp.int32(stride - top_rows)
                  + jax.lax.broadcasted_iota(jnp.int32, tail.shape, 0))
        tails_ref[0] = jnp.where(grow_t < jnp.int32(n), tail,
                                 jnp.zeros_like(tail))
        head = blk[:bot_rows]
        grow_h = (i * jnp.int32(stride)
                  + jax.lax.broadcasted_iota(jnp.int32, head.shape, 0))
        heads_ref[0] = jnp.where(grow_h < jnp.int32(n), head,
                                 jnp.zeros_like(head))

    with sk._x64_scope(x.dtype):
        tails, heads = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(
                (stride, nx), lambda i: (jnp.minimum(i, gx - 1), 0),
                memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, top_rows, nx), lambda i: (i + 1, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bot_rows, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G + 1, top_rows, nx), x.dtype),
                jax.ShapeDtypeStruct((G + 1, bot_rows, nx), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(x)
    return tails.at[0].set(0.0)[:g], heads.at[G].set(0.0)[1 : g + 1]


def build(variant: str):
    """Trace + compile the preconditioner loops with the chosen window
    implementation patched into the kernel module at trace time."""
    orig_hw = sk._halo_windows
    orig_gr = sk._gather_rows
    if variant == "B":
        sk._halo_windows = (
            lambda x, t, g, k: halo_windows_pallas(x, t, g, k, k))

        def gr(x, g, stride, lo, rows, _orig=orig_gr):
            # The up-visit's (e_top, e_bot) pair: route both through one
            # extraction when called for the top (lo < 0) and reuse.
            return _orig(x, g, stride, lo, rows)

        # e windows stay on _gather_rows in B too (the symmetric k-row
        # windows dominate: 2 inputs x 2 windows per visit).
    try:
        cfg = SolverConfig(npts=N, grids=GRIDS, levels=GRIDS,
                           cycle=CycleType.MGCG, dtype="float32")
        ctx = build_context(cfg)
        b = ctx.b0[0]

        def mk(k):
            def run(r):
                def one(i, r):
                    z, d = mg_apply_dot(ctx, (r,), 3, 3)
                    return z[0]

                return jax.lax.fori_loop(0, k, one, r)

            return jax.jit(run)

        f1, f2 = mk(2), mk(10)
        jax.block_until_ready(f1(b))
        jax.block_until_ready(f2(b))
        return f1, f2, b
    finally:
        sk._halo_windows = orig_hw
        sk._gather_rows = orig_gr


def measure(f1, f2, x):
    def t(f):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    return (t(f2) - t(f1)) / 8.0


def main() -> None:
    fa1, fa2, xa = build("A")
    fb1, fb2, xb = build("B")
    for r in range(4):
        da = measure(fa1, fa2, xa)
        db = measure(fb1, fb2, xb)
        print(f"round {r}: A(gather) {da*1e3:7.2f} ms/apply   "
              f"B(pallas) {db*1e3:7.2f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
