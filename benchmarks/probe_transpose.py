"""Probe: VPU cost of the transpose-trick x-transfers inside the mdma
kernels (round 5).

After the carry-halo DMA rewrite the down visits are VPU-bound; the
suspected cost is `_restrict_x_pad` (transpose -> sublane de-interleave
-> transpose back) executed once per block.  This probe times pallas
kernels that run ONLY the candidate ops on VMEM-resident production
shapes ((t/2, nx_p) = (48, 8192) f32, grid g=86 like the 8191^2 tile):

  noop      : out = 1.0001 * in[:, :nxc_p]      (baseline: store cost)
  arith     : lane-roll form   s = in + 2 roll(in,-1) + roll(in,-2);
              out = s[:, :nxc_p]                 (no compaction)
  shuffle   : transpose + de-interleave + transpose back, no arithmetic
  full      : production _restrict_x_pad
  prolong   : production _prolong_x_pad on (t2/2+1, nxc_p) -> (t2, nx_p)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_transpose.py
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

from multigrid_petsc_tpu.ops.pallas.mdma_kernel import (
    _prolong_x_pad,
    _restrict_x_pad,
)

T2 = 112
TH = 48          # t/2 rows
NXP = 8192
NXC = 4095
NXCP = 4096
G = 86
DT = jnp.float32


def _sync(r):
    """Host readback: block_until_ready stopped blocking on the axon
    tunnel mid-session; reading one element back is the real barrier."""
    return float(jnp.ravel(r)[0])


def timed(f, x, k1=2, k2=300):
    def loop(k):
        def run(v):
            def one(i, c):
                out = f(v + 1e-9 * c[0, 0])
                return c * 0.999 + out[0, 0]
            return jax.lax.fori_loop(0, k, one, jnp.zeros((1, 1), DT))
        return run

    f1 = jax.jit(loop(k1))
    f2 = jax.jit(loop(k2))
    _sync(f1(x))
    _sync(f2(x))
    pairs = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(f1(x))
        t1 = time.perf_counter(); _sync(f2(x))
        t2 = time.perf_counter()
        pairs.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return statistics.median(pairs)


def make(mode):
    """Kernel: per grid step, read scratch slab, run op, accumulate into
    out block (forces the op; no HBM streaming in the loop)."""

    def kernel(x_ref, o_ref, slab):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            slab[...] = x_ref[...]
            o_ref[...] = jnp.zeros_like(o_ref)

        v = slab[...] * (1.0 + 1e-7 * i)  # defeat hoisting
        if mode == "noop":
            r = v[:, :NXCP]
        elif mode == "arith":
            s = (v + 2.0 * pltpu.roll(v, NXP - 1, 1)
                 + pltpu.roll(v, NXP - 2, 1))
            r = s[:, :NXCP]
        elif mode == "shuffle":
            rt = v.T
            w = rt[: 2 * (NXCP // 2)].reshape(NXCP // 2, 2, TH)
            r = jnp.concatenate([w[:, 0], w[:, 1]], axis=0).T
        elif mode == "full":
            r = _restrict_x_pad(v, NXC, NXCP)
        elif mode == "apply8":
            r = v[:, :NXCP]
            for _ in range(8):
                r = 0.99 * r + 0.01 * (pltpu.roll(r, 1, 1)
                                       + pltpu.roll(r, NXCP - 1, 1))
        o_ref[...] += r

    x = jnp.ones((TH, NXP), DT)
    return pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[pl.BlockSpec((TH, NXP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, NXCP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TH, NXCP), DT),
        scratch_shapes=[pltpu.VMEM((TH, NXP), DT)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    ), x


def make_prolong():
    rows = T2 // 2 + 1

    def kernel(x_ref, o_ref, slab):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            slab[...] = x_ref[...]
            o_ref[...] = jnp.zeros_like(o_ref)

        v = slab[...] * (1.0 + 1e-7 * i)
        r = _prolong_x_pad(v, NXC, 2 * NXC + 1, NXP)
        o_ref[...] += r[: T2 // 2 + 1]

    x = jnp.ones((rows, NXCP), DT)
    return pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[pl.BlockSpec((rows, NXCP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, NXP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, NXP), DT),
        scratch_shapes=[pltpu.VMEM((rows, NXCP), DT)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20),
    ), x


def main() -> None:
    for mode in ("noop", "apply8", "arith", "shuffle", "full"):
        call, x = make(mode)
        dt = timed(call, x)
        print(f"{mode:8s}: {dt*1e3:7.3f} ms per {G}-block pass", flush=True)
    call, x = make_prolong()
    dt = timed(call, x)
    print(f"{'prolong':8s}: {dt*1e3:7.3f} ms per {G}-block pass", flush=True)


if __name__ == "__main__":
    main()
