"""Probe: where the mdma mg-CG iteration's NON-kernel time goes (round 5).

probe_mdma_rates measured the three fine-level manual-DMA kernels at
~6.8 ms/iter combined while the solve runs ~13.8 ms/cycle — the gap is
XLA glue (restrict_x slices, prolong_x + pad2 chains, per-level pad2)
plus the coarse hierarchy.  This probe times the REAL production
closures (krylov.mdma_plan — the same objects the solver runs) piece by
piece, loop-differenced.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_mdma_glue.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from multigrid_petsc_tpu.ops.pallas import mdma_kernel as mdma
from multigrid_petsc_tpu.solvers.context import build_context
from multigrid_petsc_tpu.solvers.krylov import mdma_plan
from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

N = 8193


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
    """Median of three differenced pairs with host-readback sync (see
    _sync) and a gap stretched to dominate tunnel RTT jitter."""
    import statistics

    k2 = max(k2, k1 + 40)
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


def main() -> None:
    cfg = SolverConfig(npts=N, grids=11, levels=11, cycle=CycleType.MGCG,
                       dtype="float32")
    ctx = build_context(cfg)
    plan = mdma_plan(ctx)
    ny, nx = plan["shape"]
    nyc = (ny - 1) // 2
    st, steps = plan["st"], plan["steps"]
    pad2, precond = plan["pad2"], plan["precond"]
    coarse_correction = plan["coarse_correction"]
    cycle = plan["cycle_mdma"]

    b_p = pad2(ctx.b0[0], ny, nx)
    nyp, nxp = b_p.shape
    nxc = (nx - 1) // 2
    rc0 = jnp.ones(mdma.shape_pad(nyc, nxc), jnp.float32) * 1e-3

    # full preconditioner (kernels + glue + coarse)
    def mk_pre(k):
        def run(s):
            def one(i, s):
                r, ap = s
                z, rz, r_new, rn2 = precond(r, ap, 1e-4)
                return (r_new, z)
            return jax.lax.fori_loop(0, k, one, s)
        return run

    dt = timed_loop(mk_pre, (b_p, b_p * 0.5), 2, 8)
    print(f"precond full      : {dt*1e3:7.2f} ms", flush=True)

    # coarse_correction alone: restrict_x + levels>=1 + prolong_x + pad2
    def mk_cc(k):
        def run(rc):
            def one(i, rc):
                e_c = coarse_correction(rc)
                return rc + 1e-20 * e_c  # same padded coarse layout
            return jax.lax.fori_loop(0, k, one, rc)
        return run

    dt = timed_loop(mk_cc, rc0, 2, 8)
    print(f"coarse_correction : {dt*1e3:7.2f} ms", flush=True)

    # level >= 1 sub-cycle alone (incl. its own pads/glue)
    b1 = jnp.ones((nyc, nyc), jnp.float32) * 1e-3

    def mk_cyc(k):
        def run(b1):
            def one(i, b1):
                u1 = cycle(1, b1)
                return b1 + 1e-20 * u1
            return jax.lax.fori_loop(0, k, one, b1)
        return run

    dt = timed_loop(mk_cyc, b1, 2, 8)
    print(f"cycle levels>=1   : {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
