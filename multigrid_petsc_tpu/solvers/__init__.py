from multigrid_petsc_tpu.solvers.solve import solve, SolveResult

__all__ = ["solve", "SolveResult"]
