from multigrid_petsc_tpu.ops.stencil import (
    Stencil5,
    Stencil9,
    apply_stencil5,
    apply_stencil9,
    residual,
    jacobi_sweeps,
)
from multigrid_petsc_tpu.ops.transfer import (
    restrict_fw,
    prolong_bilinear,
    restrict_multi,
    prolong_multi,
    RESTRICT_3x3,
    PROLONG_3x3,
    composed_transfer_stencil,
)

__all__ = [
    "Stencil5",
    "Stencil9",
    "apply_stencil5",
    "apply_stencil9",
    "residual",
    "jacobi_sweeps",
    "restrict_fw",
    "prolong_bilinear",
    "restrict_multi",
    "prolong_multi",
    "RESTRICT_3x3",
    "PROLONG_3x3",
    "composed_transfer_stencil",
]
