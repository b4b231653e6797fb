"""Weak/strong scaling study over a device mesh.

BASELINE.md asks for nnz/s per chip and weak-scaling efficiency at
1 chip / 1 host / N hosts.  With one physical chip available, this
harness runs the REAL distributed code path (GSPMD-sharded solves with
coarse agglomeration) over however many devices the backend exposes —
virtual CPU devices for functional scaling validation, real chips when a
slice is attached.  Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --npts 513 --mode weak

Reports one JSON line per device count with points/s and efficiency
relative to the single-device run.
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def run_one(npts: int, n_dev: int, cycle: str, dtype: str, max_iter: int):
    import jax.numpy as jnp

    from multigrid_petsc_tpu.parallel.device_mesh import (
        ShardingPlan,
        make_device_mesh,
    )
    from multigrid_petsc_tpu.solvers.solve import solve
    from multigrid_petsc_tpu.utils.config import CycleType, SolverConfig

    levels = 1
    while (npts - 1) % (2**levels) == 0 and (npts - 1) // (2**levels) > 4:
        levels += 1
    cfg = SolverConfig(
        npts=npts, grids=levels, levels=levels,
        cycle=CycleType[cycle], dtype=dtype, max_iter=max_iter, rtol=1e-7,
    )
    plan = None
    if n_dev > 1:
        mesh = make_device_mesh(devices=jax.devices()[:n_dev])
        plan = ShardingPlan(mesh, min_local=16)
    res = solve(cfg, plan=plan)
    n = npts - 2
    pts = n * n * max(res.iters, 1)
    return {
        "devices": n_dev,
        "npts": npts,
        "iters": res.iters,
        "converged": res.converged,
        "wall_s": res.wall_time,
        "points_per_s": pts / res.wall_time,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=257)
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--cycle", default="MGCG")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--max-iter", type=int, default=20)
    args = ap.parse_args()

    n_all = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_all]
    base = None
    for c in counts:
        npts = args.npts
        if args.mode == "weak":
            # Scale the problem with devices: ~constant points per device.
            import math

            factor = int(round(math.sqrt(c)))
            npts = (args.npts - 1) * factor + 1
        r = run_one(npts, c, args.cycle, args.dtype, args.max_iter)
        if base is None:
            base = r
        if args.mode == "weak":
            r["efficiency"] = (
                (r["points_per_s"] / c) / base["points_per_s"]
            )
        else:
            r["efficiency"] = (
                r["points_per_s"] / (base["points_per_s"] * c)
            )
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}))


if __name__ == "__main__":
    main()
