"""Probe: WHAT inside the mdma down-visit kernel costs the time (round 5).

probe_mdma_rates (robust differencing) measures the manual-DMA visit
kernels as ~additive DMA+VPU while papply — same DMA schedule, minimal
compute — sits at its DMA bound.  Hypothesis: the in-kernel VPU
"extras" (dynamic pltpu.roll per input stream per block, the
transpose-trick x-restriction, per-step masks) dominate, not the DMA
pipeline.  This probe times ablated variants of the zero-guess down
kernel (exact production DMA schedule):

  full     : production body (k sweeps + residual + restrict_x)
  norestrict: rc emitted as a raw slice (no transpose trick)
  nosweep  : no smoothing loop (u = dinv*b once), rest intact
  dmaonly  : compute replaced by u = b slice, rc slice (pure pipeline)

FINDING (r5, pre-carry-halo schedule): full 3.33 / noroll 3.14 /
norestrict 2.34 / nosweep 2.48 / dmaonly 1.84 ms — i.e. the pure DMA
pipeline itself ran at only 0.54x triad because the donation-safety
"wait in(i+1) before out(i)" strictly alternated input and output DMAs,
and the transpose-trick restriction costs ~1.0 ms/visit of VPU time.
The carry-halo _in_sched rewrite addresses the former.

CAVEAT: this probe's fori_loop carries u0 without donation, so every
mode pays a ~0.83 ms XLA backedge copy (probe_dma_parts.py) on top of
the kernel itself; ABSOLUTE numbers are inflated by that constant,
mode DIFFERENCES are clean.  Post-rewrite (r5, carry-halo + lane-form
restrict): full 2.99 / norestrict 2.17 / nosweep 2.12 / dmaonly 1.75,
i.e. true vdown k=3 ~ 2.2 ms and the kernel is VPU-bound.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_mdma_vpu.py
"""

from __future__ import annotations

import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas import mdma_kernel as mdma
from multigrid_petsc_tpu.ops.pallas.mdma_kernel import (
    H,
    _aligned,
    _apply5,
    _coeff_slabs,
    _in_sched,
    _inside,
    _out_sched,
    _restrict_x_pad,
)
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import jacobi_step_coeffs
from multigrid_petsc_tpu.problems import stencil_coefficients

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8191
DT = jnp.float32
B = 4


def _sync(r):
    """Force REAL device sync: block_until_ready stopped blocking on the
    axon tunnel mid-session (async readiness misreported) — a host
    readback of one element is the only reliable barrier.  Constant cost
    per call, cancelled by the loop differencing."""
    import jax as _jax
    import jax.numpy as _jnp
    leaf = _jax.tree_util.tree_leaves(r)[0]
    return float(_jnp.ravel(leaf)[0])


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


def down_variant(ny, nx, nx_p, t, g, steps, nyc, nxc, nxc_p, mode):
    t2 = t + 2 * H

    def kernel(c_ref, b_hbm, u_hbm, rc_hbm,
               bbuf, ubuf, rcbuf, in_sems, out_sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        b_start, b_wait, b_carry = _in_sched(
            b_hbm, bbuf, in_sems, 0,
            stride=t, halo=H, n_src=ny, t_len=t, g=g)
        u_start, u_wait, u_drain = _out_sched(ubuf, u_hbm, out_sems, 0,
                                              stride=t, n_dst=ny, g=g)
        c_start, c_wait, c_drain = _out_sched(rcbuf, rc_hbm, out_sems, 1,
                                              stride=t // 2, n_dst=nyc, g=g)

        @pl.when(i == 0)
        def _():
            b_start(slot, i)

        b_wait(slot, i)

        @pl.when(i + 1 < g)
        def _():
            b_carry(slot, nxt)
            b_start(nxt, i + 1)

        if mode == "dmaonly":
            u = bbuf[slot]
            rc = rcbuf[slot]  # whatever is there; pure pipeline cost
            ubuf_val = u[H:H + t]
            rc_val = rc
        else:
            b = bbuf[slot]
            inside = _inside(i, t, ny, nx, b.shape)
            b = jnp.where(inside, b, 0.0)

            dinv = 1.0 / c_ref[0, 2]
            u = jnp.zeros_like(b)
            p = jnp.zeros_like(b)
            first = True
            use_steps = steps if mode != "nosweep" else steps[:1]
            for (alpha_s, beta_s) in use_steps:
                z = dinv * b if first else dinv * (b - _apply5(c_ref, u))
                first = False
                p = beta_s * p + alpha_s * z
                u = jnp.where(inside, u + p, 0.0)

            rr = b - _apply5(c_ref, u)
            v = rr[H:H + t].reshape(t // 2, 2, rr.shape[-1])
            ev, od = v[:, 0], v[:, 1]
            ev_next = jnp.concatenate([ev[1:], rr[H + t:H + t + 1]], axis=0)
            rc_y = ev + 2.0 * od + ev_next
            if mode == "norestrict":
                rc_val = rc_y[:, :nxc_p]
            else:
                rc = _restrict_x_pad(rc_y, nxc, nxc_p)
                rc_val = jnp.where(
                    _inside(i, t // 2, nyc, nxc_p, rc.shape, halo=0),
                    rc, 0.0)
            ubuf_val = u[H:H + t]

        @pl.when(i >= 2)
        def _():
            u_wait(slot, i - 2)
            c_wait(slot, i - 2)

        ubuf[slot] = ubuf_val.astype(ubuf.dtype)
        rcbuf[slot] = rc_val.astype(rcbuf.dtype)

        u_start(slot, i)
        c_start(slot, i)

        @pl.when(i == g - 1)
        def _():
            u_drain(slot)
            c_drain(slot)

    return kernel


def main() -> None:
    ny = nx = N
    nyp, nxp = mdma.shape_pad(ny, nx)
    nyc = (ny - 1) // 2
    nxc = (nx - 1) // 2
    nycp, nxcp = mdma.shape_pad(nyc, nxc)
    st = stencil_coefficients(MeshType.UNIFORM, ny, nx, DT)
    t, g = mdma._tile_geometry(ny, nxp, B)
    steps = jacobi_step_coeffs(3, 0.8)
    n2b = ny * nx * B
    halo_f = 1.0 + 2 * H / t
    passes = halo_f + 1 + 0.25
    print(f"n={N} t={t} g={g} model passes={passes:.2f}", flush=True)

    from multigrid_petsc_tpu.ops.pallas.stencil_kernel import _compute_dtype

    c_slabs = _coeff_slabs(st, ny, t, g, _compute_dtype(DT))
    t2 = t + 2 * H
    coeff = pl.BlockSpec((1, 5, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    b_p = jnp.ones((nyp, nxp), DT) * 1e-3
    mask = (jnp.arange(nyp)[:, None] < ny) & (jnp.arange(nxp)[None, :] < nx)
    b_p = jnp.where(mask, b_p, 0.0)

    def make_call(mode):
        return pl.pallas_call(
            down_variant(ny, nx, nxp, t, g, steps, nyc, nxc, nxcp, mode),
            grid=(g,),
            in_specs=[coeff, any_spec],
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

    for mode in ("full", "norestrict", "nosweep", "dmaonly"):
        call = make_call(mode)

        def mk(k, _call=call):
            def run(b):
                def one(i, b):
                    u0, rc = _call(c_slabs, b)
                    return u0
                return jax.lax.fori_loop(0, k, one, b)
            return run

        dt = timed_loop(mk, b_p)
        print(f"{mode:10s}: {dt*1e3:7.2f} ms "
              f"({passes*n2b/dt/1e9:6.1f} GB/s vs {passes:.2f} passes)",
              flush=True)


if __name__ == "__main__":
    main()
