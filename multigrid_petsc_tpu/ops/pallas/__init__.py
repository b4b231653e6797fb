from multigrid_petsc_tpu.ops.pallas.stencil_kernel import (
    apply_stencil5_pallas,
    chebyshev_sweeps_pallas,
    jacobi_sweeps_pallas,
    smooth_sweeps_pallas,
)

__all__ = [
    "apply_stencil5_pallas",
    "chebyshev_sweeps_pallas",
    "jacobi_sweeps_pallas",
    "smooth_sweeps_pallas",
]
