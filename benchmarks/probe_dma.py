"""Probe: is the ~330 GB/s "Pallas ceiling" real DMA bandwidth or an XLA
while-loop buffer-copy artifact?

Round 2 measured every pallas_call path at ~330 GB/s via
``fori_loop(0, k, lambda i, c: copy(c), x)`` and concluded the runtime
caps Pallas DMA at half the XLA stream rate.  Hypothesis: XLA's
while-loop buffer assignment requires the carry to live in a fixed
buffer; a custom call (pallas) cannot write in-place into its own input
buffer, so XLA inserts a full-array copy at the loop backedge.  That
copy moves 2*n^2*B extra bytes per iteration at the XLA stream rate R:
apparent rate = 2 / (2/R_pallas + 2/R_xla) — for R_pallas = R_xla = 650
GB/s this predicts exactly ~325 GB/s, i.e. the observed "ceiling".

Probes:
  A. baseline: the round-2 loop (expected ~330 if hypothesis holds)
  B. same loop with input_output_aliases={0: 0} (in-place legal for a
     pure copy): pallas may then write directly into the carry buffer —
     no backedge copy.  Predicted ~650 under the hypothesis.
  C. in-kernel k-loop: ONE pallas_call, grid (k, g), input/output in
     HBM (memory_space=ANY), manual double-buffered DMA per block.
     Measures the raw DMA engine rate with no XLA loop at all.
  D. the XLA triad for reference.
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
T = 256
G = N // T
DT = jnp.float32
B = jnp.dtype(DT).itemsize


def timed_loop(make_fn, x, k1, k2, bytes_per_iter):
    def timed(k):
        f = make_fn(k)
        float(jnp.sum(f(x)))  # compile + warm (forces completion)
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        return time.perf_counter() - t0

    dt = (timed(k2) - timed(k1)) / (k2 - k1)
    return bytes_per_iter / dt


def probe_a():
    def kernel(u_ref, o_ref):
        o_ref[:] = u_ref[:] * jnp.asarray(1.0001, DT)

    spec = pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    copy = lambda v: pl.pallas_call(
        kernel, grid=(G,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N, N), DT),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(v)
    mk = lambda k: jax.jit(
        lambda v: jax.lax.fori_loop(0, k, lambda i, c: copy(c), v))
    return timed_loop(mk, jnp.ones((N, N), DT), 2, 18, N * N * 2 * B)


def probe_b():
    def kernel(u_ref, o_ref):
        o_ref[:] = u_ref[:] * jnp.asarray(1.0001, DT)

    spec = pl.BlockSpec((T, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    copy = lambda v: pl.pallas_call(
        kernel, grid=(G,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N, N), DT),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(v)
    mk = lambda k: jax.jit(
        lambda v: jax.lax.fori_loop(0, k, lambda i, c: copy(c), v))
    return timed_loop(mk, jnp.ones((N, N), DT), 2, 18, N * N * 2 * B)


def probe_c(k_inner=8):
    """One pallas_call; grid (k, g); manual double-buffered HBM<->VMEM DMA."""

    def kernel(u_hbm, o_hbm, buf, sems):
        it = pl.program_id(0)
        i = pl.program_id(1)

        def dma_in(slot, blk):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(blk * T, T)], buf.at[slot],
                sems.at[slot, 0])

        def dma_out(slot, blk):
            return pltpu.make_async_copy(
                buf.at[slot], o_hbm.at[pl.ds(blk * T, T)],
                sems.at[slot, 1])

        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            dma_in(slot, i).start()

        @pl.when(i + 1 < G)
        def _():
            dma_in(nxt, i + 1).start()

        dma_in(slot, i).wait()
        # previous block's write-out must have finished before reusing slot
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        dma_out(slot, i).start()

        @pl.when(i == G - 1)
        def _():
            dma_out(slot, i).wait()
            dma_out(nxt, i - 1).wait()

        del it

    run = pl.pallas_call(
        kernel,
        grid=(k_inner, G),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N), DT),
        scratch_shapes=[
            pltpu.VMEM((2, T, N), DT),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )
    x = jnp.ones((N, N), DT)
    f = jax.jit(run)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
    t_k = time.perf_counter() - t0
    # difference against a 1-iteration variant to cancel fixed costs
    run1 = pl.pallas_call(
        kernel, grid=(1, G),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N), DT),
        scratch_shapes=[pltpu.VMEM((2, T, N), DT), pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
    )
    f1 = jax.jit(run1)
    float(jnp.sum(f1(x)))
    t0 = time.perf_counter()
    float(jnp.sum(f1(x)))
    t_1 = time.perf_counter() - t0
    return (k_inner - 1) * N * N * 2 * B / max(t_k - t_1, 1e-9)


def probe_d():
    x = jnp.ones((N, N), DT)

    @functools.partial(jax.jit, static_argnames=("k",))
    def triad(v, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: c * jnp.asarray(0.999, DT)
            + jnp.asarray(1e-9, DT), v)

    mk = lambda k: (lambda v: triad(v, k))
    return timed_loop(mk, x, 4, 68, N * N * 2 * B)


if __name__ == "__main__":
    print(f"D xla triad           : {probe_d()/1e9:8.1f} GB/s", flush=True)
    print(f"A pallas copy (r2 way): {probe_a()/1e9:8.1f} GB/s", flush=True)
    print(f"B + io aliasing       : {probe_b()/1e9:8.1f} GB/s", flush=True)
    print(f"C in-kernel DMA loop  : {probe_c()/1e9:8.1f} GB/s", flush=True)
