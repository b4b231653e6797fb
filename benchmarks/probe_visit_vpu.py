"""Probe: are the fused visit kernels VPU-bound, and what does a leaner
step body buy? (round 4)

probe_cg_parts_r04 measured the visit kernels at 230-290 GB/s while
papply streams at 616 GB/s — the visits do 4 stencil applications per
element with concat-built neighbor shifts and per-step masks, so the VPU
is the suspected limiter.  This probe times standalone kernel variants of
the ZERO-GUESS down visit (the hottest body) at 8191^2 f32:

  base   : the production step body (concat shifts, per-step where-masks,
           z = dinv * (b - A u))
  norm   : normalized coefficients (cs' = cs/cc etc. precomputed
           host-side, bd = dinv*b once in-kernel) so each step is
           z = bd - u - sum(c' * neighbor) — no dinv or cc multiplies
  roll   : norm + pltpu.roll for the sublane (south/north) neighbors
           instead of zero-pad concat copies
  nomask : roll + NO per-step where: phantom/ragged rows are kept zero by
           absorbing-identity coefficient rows (c' = 0, like the dist
           kernels) — a zero-guess u then stays exactly zero there
           through every step.

Each variant runs k=3 steps + the trailing residual apply and emits
(u, restricted residual) exactly like the production 'rc' visit.  Parity
vs the production kernel is printed next to the timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_visit_vpu.py
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    _coeff_cols,
    _halo_windows,
    _pick_tile,
    _shift_e,
    _shift_w,
    fused_level_visit_pallas,
    jacobi_step_coeffs,
    restrict_x_fw,
)
from multigrid_petsc_tpu.problems import stencil_coefficients

N = 8191
K = 3
OMEGA = 0.8


def _variant_kernel(ny, nx, t, k, g, h, steps, mode):
    t2 = t + 2 * h
    use_norm = mode == "norm"
    use_roll = mode in ("roll", "nomask")
    step_mask = mode != "nomask"

    def kernel(c_ref, b_ref, bt_ref, bb_ref, u_out, rc_out):
        i = pl.program_id(0).astype(jnp.int32)
        b = jnp.concatenate([bt_ref[0], b_ref[:], bb_ref[0]], axis=0)
        grow = (i * jnp.int32(t) - jnp.int32(h)
                + jax.lax.broadcasted_iota(jnp.int32, b.shape, 0))
        inside = (grow >= jnp.int32(0)) & (grow < jnp.int32(ny))
        # One-time mask (ragged-tail rows read junk): cheap, amortized.
        b = jnp.where(inside, b, 0.0)

        cs = c_ref[0, 0]
        cw = c_ref[0, 1]
        cc = c_ref[0, 2]   # = dinv for the norm variants
        ce = c_ref[0, 3]
        cn = c_ref[0, 4]

        if use_roll:
            def sh_s(v):
                return pltpu.roll(v, 1, 0)

            def sh_n(v):
                # negative shifts are rejected; a cyclic roll by size-1 is
                # the same rotation (wrapped rows land in discarded halo).
                return pltpu.roll(v, v.shape[0] - 1, 0)
        else:
            def sh_s(v):
                return jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]],
                                       axis=0)

            def sh_n(v):
                return jnp.concatenate([v[1:], v[:1] * 0.0], axis=0)

        if use_norm:
            ccraw = c_ref[0, 5]
            dinv = cc
            bd = b * dinv

            def z_of(u):
                return (bd - u - cs * sh_s(u) - cn * sh_n(u)
                        - cw * _shift_w(u) - ce * _shift_e(u))
        else:
            dinv = 1.0 / cc

            def apply_a(u):
                return (cc * u + cs * sh_s(u) + cn * sh_n(u)
                        + cw * _shift_w(u) + ce * _shift_e(u))

            def z_of(u):
                return dinv * (b - apply_a(u))

        p = jnp.zeros_like(b)
        u = jnp.zeros_like(b)
        first = True
        for (alpha, beta) in steps:
            if first:
                z = (bd if use_norm else dinv * b)
                first = False
            else:
                z = z_of(u)
            p = beta * p + alpha * z
            u = u + p
            if step_mask:
                u = jnp.where(inside, u, 0.0)
        if use_norm:
            r = ccraw * z_of(u)
        else:
            r = b - apply_a(u)
        r = jnp.where(inside, r, 0.0)
        u = jnp.where(inside, u, 0.0)
        u_out[:] = u[h : h + t]
        v = r[h : h + t].reshape(t // 2, 2, r.shape[-1])
        ev, od = v[:, 0], v[:, 1]
        ev_next = jnp.concatenate([ev[1:], r[h + t : h + t + 1]], axis=0)
        rc_out[:] = ev + 2.0 * od + ev_next

    return kernel


def _build_slabs(cols, ny, t, g, h, absorbing):
    """(g, C, t+2h, 1) coefficient slabs.  ``absorbing``: rows outside
    [0, ny) carry zero neighbor coefficients (dinv row -> 1) instead of
    clamped real rows."""
    C = cols.shape[0]
    t2 = t + 2 * h
    if not absorbing:
        idx = np.clip((np.arange(g) * t - h)[:, None]
                      + np.arange(t2)[None, :], 0, ny - 1)
        return jnp.asarray(np.asarray(cols)[:, idx].transpose(1, 0, 2)[..., None])
    ext = np.zeros((C, ny + 2 * h), np.float32)
    ext[2] = 1.0  # dinv/cc row: any nonzero value (rows are inert)
    ext[:, h : h + ny] = np.asarray(cols)
    base = np.arange(g) * t  # +h offset already baked into ext
    idx = base[:, None] + np.arange(t2)[None, :]
    idx = np.clip(idx, 0, ny + 2 * h - 1)  # ragged tail past ext: inert rows
    return jnp.asarray(ext[:, idx].transpose(1, 0, 2)[..., None])


@functools.partial(jax.jit, static_argnames=("mode", "steps"))
def variant_visit(c_slabs, b, steps, mode):
    ny, nx = b.shape
    k = len(steps)
    h = k + 2
    t = _pick_tile(nx, b.dtype, bufs=12, cap=256)
    g = pl.cdiv(ny, t)
    t2 = t + 2 * h
    nyc = (ny - 1) // 2
    b_top, b_bot = _halo_windows(b, t, g, h)
    C = c_slabs.shape[1]

    mid = pl.BlockSpec((t, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, h, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    coeff = pl.BlockSpec((1, C, t2, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        u, rc_y = pl.pallas_call(
            _variant_kernel(ny, nx, t, k, g, h, steps, mode),
            grid=(g,),
            in_specs=[coeff, mid, halo, halo],
            out_specs=[mid,
                       pl.BlockSpec((t // 2, nx), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((ny, nx), b.dtype),
                       jax.ShapeDtypeStruct((nyc, nx), b.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(c_slabs, b, b_top, b_bot)
    return u, restrict_x_fw(rc_y)


def timed_loop(f, b0, k1=2, k2=10):
    def mk(k):
        def run(b):
            def one(i, b):
                u, rc = f(b)
                return b + 1e-30 * u[0, 0]

            return jax.lax.fori_loop(0, k, one, b)

        return jax.jit(run)

    def timed(k):
        fn = mk(k)
        jax.block_until_ready(fn(b0))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(b0))
        return time.perf_counter() - t0

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main() -> None:
    st = stencil_coefficients(MeshType.UNIFORM, N, N, jnp.float32)
    steps = jacobi_step_coeffs(K, OMEGA)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (N, N), jnp.float32)

    cols_raw = jnp.concatenate(
        [c.reshape(1, -1) for c in _coeff_cols(st, N, jnp.float32)], axis=0)
    cc = cols_raw[2:3]
    cols_norm = jnp.concatenate(
        [cols_raw[0:1] / cc, cols_raw[1:2] / cc, 1.0 / cc,
         cols_raw[3:4] / cc, cols_raw[4:5] / cc, cc], axis=0)

    u_ref, rc_ref = fused_level_visit_pallas(st, b, None, steps, emit="rc")
    u_ref = np.asarray(u_ref)
    rc_ref = np.asarray(rc_ref)
    uscale = max(1e-30, float(np.max(np.abs(u_ref))))
    rcscale = max(1e-30, float(np.max(np.abs(rc_ref))))

    t = _pick_tile(N, jnp.float32, bufs=12, cap=256)
    g = pl.cdiv(N, t)
    h = K + 2
    n2b = N * N * 4
    for mode in ("base", "roll", "nomask"):
        cols = cols_norm if mode == "norm" else cols_raw
        c_slabs = _build_slabs(cols, N, t, g, h, absorbing=(mode == "nomask"))
        u_v, rc_v = variant_visit(c_slabs, b, steps, mode)
        du = float(np.max(np.abs(np.asarray(u_v) - u_ref))) / uscale
        drc = float(np.max(np.abs(np.asarray(rc_v) - rc_ref))) / rcscale
        dt = timed_loop(
            lambda bb, _c=c_slabs, _m=mode: variant_visit(_c, bb, steps, _m),
            b)
        print(f"{mode:7s}: {dt*1e3:7.2f} ms "
              f"({3.5*n2b/dt/1e9:6.1f} GB/s vs 3.5 passes)  "
              f"rel|du|={du:.2e} rel|drc|={drc:.2e}", flush=True)


if __name__ == "__main__":
    main()
