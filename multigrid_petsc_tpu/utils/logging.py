"""Run-configuration banner and diagnostics printing.

Capability parity with the reference's PrintInfo (reference:
src/poisson.c:165-214) and the per-driver timing printout
(src/solver.c:1571-1573) and error report (src/solver.c:1332-1335).
"""

from __future__ import annotations

import jax

from multigrid_petsc_tpu.hierarchy import grid_interior
from multigrid_petsc_tpu.utils.config import SolverConfig

_MESH_NAMES = {0: "Uniform", 1: "Non-uniform (cosine)", 2: "Non-uniform (exp)"}


def total_unknowns(npts: int, total_grids: int) -> int:
    """Sum of interior unknowns over all grids (src/poisson.c:152-163)."""
    return sum(grid_interior(npts, g) ** 2 for g in range(total_grids))


def print_info(cfg: SolverConfig, res, errs) -> None:
    n0 = cfg.npts - 2
    print("=" * 65)
    print(f"Mesh size:                 {cfg.npts} x {cfg.npts}")
    print(f"Mesh type:                 {_MESH_NAMES.get(cfg.mesh, cfg.mesh)}")
    print(f"Number of grids:           {cfg.grids}")
    print(f"Number of levels:          {cfg.levels}")
    print(f"Cycle:                     {cfg.cycle.name}")
    per_level = (cfg.level_smoothers is not None or cfg.level_v is not None
                 or cfg.fine_smoother is not None
                 or cfg.levels_smoother is not None
                 or cfg.coarse_smoother is not None)
    if per_level:
        sm = ",".join(cfg.smoother_at(l, cfg.levels).value
                      for l in range(cfg.levels))
        sw = (",".join(str(cfg.sweeps_at(l, cfg.levels))
                       for l in range(cfg.levels)))
        print(f"Smoother:                  per-level [{sm}] (v = [{sw}])")
    else:
        print(f"Smoother:                  {cfg.smoother.value} (v = {cfg.v})")
    print(f"Total unknowns:            {total_unknowns(cfg.npts, cfg.grids)}"
          f" (fine grid: {n0 * n0})")
    print(f"Devices:                   {jax.device_count()} x "
          f"{jax.devices()[0].platform}")
    print("-" * 65)
    for i, e in enumerate(errs):
        print(f"error[{i}] = {e:.16e}")
    print(f"Relative residual = {res.rnorm[-1]:.16e}")
    print(f"Iterations = {res.iters} (converged: {res.converged})")
    print(f"Solver cputime:  {res.cpu_time:f}")
    print(f"Solver walltime: {res.wall_time:f}")
    print("=" * 65)
