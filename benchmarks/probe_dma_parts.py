"""Probe: bisect the gap between the carry-halo visit pipeline's pure
DMA cost (345 GB/s vs actual streamed bytes) and the in-kernel copy
ceiling (probe_dma C: ~650 GB/s).  Variants of a compute-free pipeline
at the production 8191^2 tile (t=96, g=86):

  v_full   : in(halo, carry) + staging-fill + out u + out rc   (the
             dmaonly ablation of probe_mdma_vpu)
  v_norc   : drop the rc out stream
  v_nocarry: drop the VMEM carry copy (halo rows garbage)
  v_direct : out u DMA'd straight from the input buffer slice (no
             staging fill, no ubuf scratch)
  v_bare   : v_direct + no rc + no carry  (~ probe_dma C with offset
             windows and short last block)

CAVEAT (resolved): every variant here carries the 268 MB output through
a fori_loop WITHOUT donation, so XLA inserts a ~0.83 ms backedge copy
(2 passes) per iteration — the r2 artifact probe_visit_alias.py
documented.  Subtract it: v_bare's true pipeline cost is ~0.85 ms for
2 passes = ~630 GB/s, i.e. the carry-halo DMA pipeline IS at the
in-kernel copy ceiling; tile size 96-256 is immaterial.  The production
solve loop donates every fine stream, so it has no such copies.

FINDING (r5): v_full/v_norc/v_nocarry/v_direct/v_bare all ~1.7 ms
as measured -> ~0.9 ms true; staging fills, the rc stream, and the
carry copy are each < 0.1 ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_dma_parts.py
"""

from __future__ import annotations

import statistics
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.ops.pallas import mdma_kernel as mdma
from multigrid_petsc_tpu.ops.pallas.mdma_kernel import (
    H,
    _in_sched,
    _out_sched,
)

N = 8191
DT = jnp.float32
B = 4


def _sync(r):
    return float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])


def timed_loop(mk, x, k1=2, k2=77):
    f1 = jax.jit(mk(k1))
    f2 = jax.jit(mk(k2))
    _sync(f1(x))
    _sync(f2(x))

    def timed(f):
        t0 = time.perf_counter()
        _sync(f(x))
        return time.perf_counter() - t0

    pairs = []
    for _ in range(3):
        t1 = timed(f1)
        t2 = timed(f2)
        pairs.append((t2 - t1) / (k2 - k1))
    return statistics.median(pairs)


def variant(ny, nx_p, t, g, nyc, nxc_p, mode):
    t2 = t + 2 * H
    rc_on = mode in ("v_full", "v_nocarry", "v_direct")
    carry_on = mode in ("v_full", "v_norc", "v_direct")
    staging = mode in ("v_full", "v_norc", "v_nocarry")

    def kernel(b_hbm, u_hbm, rc_hbm, bbuf, ubuf, rcbuf, in_sems, out_sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        b_start, b_wait, b_carry = _in_sched(
            b_hbm, bbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        c_start, c_wait, c_drain = _out_sched(rcbuf, rc_hbm, out_sems, 1,
                                              stride=t // 2, n_dst=nyc, g=g)
        if staging:
            u_start, u_wait, u_drain = _out_sched(
                ubuf, u_hbm, out_sems, 0, stride=t, n_dst=ny, g=g)
        else:
            u_start, u_wait, u_drain = _out_sched(
                bbuf.at[:, pl.ds(H, t)], u_hbm, out_sems, 0,
                stride=t, n_dst=ny, g=g)

        @pl.when(i == 0)
        def _():
            b_start(slot, i)

        b_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            if carry_on:
                b_carry(slot, nxt)
            b_start(nxt, i + 1)

        @pl.when(i >= 2)
        def _():
            u_wait(slot, i - 2)
            if rc_on:
                c_wait(slot, i - 2)

        if staging:
            ubuf[slot] = bbuf[slot, pl.ds(H, t)]
        u_start(slot, i)
        if rc_on:
            c_start(slot, i)

        @pl.when(i == g - 1)
        def _():
            u_drain(slot)
            if rc_on:
                c_drain(slot)

    return kernel, rc_on


def main() -> None:
    ny = nx = N
    nyp, nxp = mdma.shape_pad(ny, nx)
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2
    nycp, nxcp = mdma.shape_pad(nyc, nxc)
    n2b = ny * nx * B
    b_p = jnp.ones((nyp, nxp), DT) * 1e-3
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    cases = [("v_full", 96), ("v_norc", 96), ("v_nocarry", 96),
             ("v_direct", 96), ("v_bare", 96),
             ("v_bare", 128), ("v_bare", 160), ("v_bare", 224),
             ("v_bare", 256), ("v_full", 128), ("v_full", 160),
             ("v_direct", 160), ("v_direct", 256)]
    for mode, t in cases:
        g = (ny + t - 1) // t
        last = ny - (g - 1) * t
        assert last >= 2 * H + 1, (t, last)
        t2 = t + 2 * H
        kern, rc_on = variant(ny, nxp, t, g, nyc, nxcp, mode)
        call = pl.pallas_call(
            kern, grid=(g,),
            in_specs=[any_spec],
            out_specs=[any_spec, any_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nyp, nxp), DT),
                jax.ShapeDtypeStruct((nycp, nxcp), DT),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, t2, nxp), DT),
                pltpu.VMEM((2, t, nxp), DT),
                pltpu.VMEM((2, t // 2, nxcp), DT),
                pltpu.SemaphoreType.DMA((2, 1)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20,
            ),
        )

        def mk(k, _call=call):
            def run(b):
                def one(i, b):
                    u0, rc = _call(b)
                    return u0
                return jax.lax.fori_loop(0, k, one, b)
            return run

        dt = timed_loop(mk, b_p)
        passes = 2.0 + (0.25 if rc_on else 0.0)
        print(f"{mode:9s} t={t:3d}: {dt*1e3:7.2f} ms "
              f"({passes*n2b/dt/1e9:6.1f} GB/s vs {passes:.2f} passes)",
              flush=True)


if __name__ == "__main__":
    main()
