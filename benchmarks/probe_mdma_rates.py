"""Probe: per-kernel rates of the manual-DMA visit kernels (round 5).

VERDICT r4: the attribution proved a manual-DMA copy streams at 0.91x
triad, yet the mdma solve runs at ~324 GB/s effective — the same as the
auto-pipelined path.  This probe answers WHERE the overlap is lost:

  1. each mdma kernel timed individually (loop-differenced in ONE jitted
     fori_loop) against its exact byte model -> effective GB/s,
  2. the same kernel at sweep counts k = 1, 3, 5: if DMA and VPU overlap,
     t(k) ~= max(DMA, k*VPU) (flat until compute-bound); if additive,
     t(k) = DMA + k*VPU (linear from k=1),
  3. the auto-pipelined stencil_kernel counterparts, interleaved, as A/B,
  4. the XLA triad + manual-DMA pure-copy ceiling in the same session.

CAVEAT: the vdown rows carry a non-donated output through the timing
fori_loop and are inflated by a ~0.83 ms XLA backedge copy
(probe_dma_parts.py); cgdown/vup/papply chain through their
input_output_aliases and measure true.  Post carry-halo + lane-form
transfers (r5): papply 2.49 ms = 0.99x triad on its 6 passes; cgdown
2.37 (DMA 1.76 + exposed VPU); vup 2.36; true vdown ~ 2.2 (VPU-bound).

Usage: PYTHONPATH=/root/repo python benchmarks/probe_mdma_rates.py [n]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.mesh import MeshType
from multigrid_petsc_tpu.ops.pallas import mdma_kernel as mdma
from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    cg_papply_pallas,
    cg_visit_down_pallas,
    fused_level_visit_pallas,
    jacobi_step_coeffs,
)
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


def timed_loop(mk, x, k1, k2):
    """Median of three differenced pairs.  The original (k1=2, k2=10)
    gap put ~20 ms of device work against +-30 ms of tunnel RTT jitter
    (observed: a NEGATIVE papply time in one session); the gap must
    dominate the jitter, so k2 is stretched to >= ~75 iterations and
    the estimate is the median of three interleaved pairs (the bench.py
    methodology)."""
    import statistics

    k2 = max(k2, k1 + 75)
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


def triad_rate():
    import functools

    x = jnp.ones((N, N), DT)

    @functools.partial(jax.jit, static_argnames=("k",))
    def triad(v, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: c * jnp.asarray(0.999, DT)
            + jnp.asarray(1e-9, DT), v)

    def timed(k):
        float(jnp.sum(triad(x, k)))
        t0 = time.perf_counter()
        float(jnp.sum(triad(x, k)))
        return time.perf_counter() - t0

    dt = (timed(68) - timed(4)) / 64
    return N * N * 2 * B / dt


def main() -> None:
    ny = nx = N
    nyp, nxp = mdma.shape_pad(ny, nx)
    nyc = (ny - 1) // 2
    nycp = mdma._ceil8(nyc)
    st = stencil_coefficients(MeshType.UNIFORM, ny, nx, DT)
    t, g = mdma._tile_geometry(ny, nxp, B)
    n2b = ny * nx * B
    # Carry-halo scheme (round 5): inputs are read from HBM exactly once,
    # so the measured-basis pass counts equal the model's (no halo factor).
    halo_f = 1.0
    print(f"n={N} tile t={t} g={g} (carry-halo: no re-reads)", flush=True)

    tri = triad_rate()
    print(f"triad                : {tri/1e9:7.1f} GB/s", flush=True)

    b_p = jnp.ones((nyp, nxp), DT) * 1e-3
    # zero the pads like the real path
    mask = (jnp.arange(nyp)[:, None] < ny) & (jnp.arange(nxp)[None, :] < nx)
    b_p = jnp.where(mask, b_p, 0.0)

    results = {}

    def report(name, dt, passes):
        by = passes * n2b
        results[name] = dt
        print(f"{name:21s}: {dt*1e3:7.2f} ms "
              f"({by/dt/1e9:6.1f} GB/s vs {passes:.2f} passes)", flush=True)

    # ---- visit_down_mdma at k = 1, 3, 5 (DMA/VPU separation) ----
    for k_sw in (1, 3, 5):
        steps = jacobi_step_coeffs(k_sw, 0.8)

        def mk(k, _steps=steps):
            def run(b):
                def one(i, b):
                    u0, rc = mdma.visit_down_mdma(st, b, _steps, ny=ny, nx=nx)
                    return u0
                return jax.lax.fori_loop(0, k, one, b)
            return run

        dt = timed_loop(mk, b_p, 2, 10)
        report(f"vdown_mdma k={k_sw}", dt, halo_f + 1 + 0.25)

    # ---- auto-pipelined down visit (A/B), k = 3 ----
    b_real = jnp.ones((ny, nx), DT) * 1e-3
    steps3 = jacobi_step_coeffs(3, 0.8)

    def mk_auto(k):
        def run(b):
            def one(i, b):
                u0, rc1 = fused_level_visit_pallas(st, b, None, steps3,
                                                   emit="rc")
                return u0
            return jax.lax.fori_loop(0, k, one, b)
        return run

    dt = timed_loop(mk_auto, b_real, 2, 10)
    report("vdown_auto k=3", dt, 3.5)

    # ---- cg_visit_down_mdma ----
    def mk_cgdown(k):
        def run(s):
            def one(i, s):
                r, ap = s
                u0, rc, rn_new, nrm = mdma.cg_visit_down_mdma(
                    st, r, ap, 1e-4, steps3, ny=ny, nx=nx)
                return (rn_new, u0)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_cgdown, (b_p, b_p * 0.5), 2, 10)
    report("cgdown_mdma k=3", dt, 2 * halo_f + 1 + 0.25 + 1)

    def mk_cgdown_auto(k):
        def run(s):
            def one(i, s):
                r, ap = s
                u0, rc1, rn_new, nrm = cg_visit_down_pallas(
                    st, r, ap, 1e-4, steps3)
                return (rn_new, u0)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_cgdown_auto, (b_real, b_real * 0.5), 2, 10)
    report("cgdown_auto k=3", dt, 4.5)

    # ---- visit_up_mdma at k = 1, 3, 5 ----
    nxc = (nx - 1) // 2
    nycp2, nxcp = mdma.shape_pad(nyc, nxc)
    e_cp = jnp.where(
        (jnp.arange(nycp2)[:, None] < nyc) & (jnp.arange(nxcp)[None, :] < nxc),
        1e-6, 0.0).astype(DT)
    for k_sw in (1, 3, 5):
        steps = jacobi_step_coeffs(k_sw, 0.8)

        def mk(k, _steps=steps):
            def run(s):
                b, u = s
                def one(i, s):
                    b, u = s
                    z, d = mdma.visit_up_mdma(st, b, u, e_cp, _steps,
                                              ny=ny, nx=nx)
                    return (b, z)
                return jax.lax.fori_loop(0, k, one, s)
            return run

        dt = timed_loop(mk, (b_p, b_p * 0.5), 2, 10)
        report(f"vup_mdma k={k_sw}", dt, 2 * halo_f + 0.25 + 1)

    e_c = jnp.full((nyc, nyc), 1e-6, DT)

    def mk_up_auto(k):
        def run(s):
            b, u = s
            def one(i, s):
                b, u = s
                z, d = fused_level_visit_pallas(st, b, u, steps3, emit="u",
                                                e_coarse=e_c, emit_dot=True)
                return (b, z)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_up_auto, (b_real, b_real * 0.5), 2, 10)
    report("vup_auto k=3", dt, 4.5)

    # ---- cg_papply_u_mdma ----
    def mk_papply(k):
        def run(s):
            def one(i, s):
                z, p, u = s
                pn, ap, un, dot = mdma.cg_papply_u_mdma(
                    st, z, p, u, 1e-4, 0.4, ny=ny, nx=nx)
                return (ap, pn, un)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_papply, (b_p, b_p * 0.5, b_p * 0.1), 2, 10)
    report("papply_mdma", dt, 2 * halo_f + 1 + 3)

    def mk_papply_auto(k):
        def run(s):
            def one(i, s):
                z, p = s
                pn, ap, d = cg_papply_pallas(st, z, p, 0.4)
                return (ap, pn)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_papply_auto, (b_real, b_real * 0.5), 2, 10)
    report("papply_auto", dt, 4)

    tri2 = triad_rate()
    print(f"triad (end)          : {tri2/1e9:7.1f} GB/s", flush=True)

    # DMA/VPU decomposition from the k-sweep: if additive,
    # t(k) = DMA + k*VPU -> VPU = (t5 - t1)/4.
    for nm in ("vdown", "vup"):
        t1 = results.get(f"{nm}_mdma k=1")
        t5 = results.get(f"{nm}_mdma k=5")
        if t1 and t5:
            vpu = (t5 - t1) / 4
            print(f"{nm}: per-sweep VPU ~{vpu*1e3:5.2f} ms; "
                  f"t(1) - 1*VPU ~ DMA-ish {max(t1-vpu,0)*1e3:5.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
