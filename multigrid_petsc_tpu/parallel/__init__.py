from multigrid_petsc_tpu.parallel.device_mesh import (
    make_device_mesh,
    ShardingPlan,
)

__all__ = ["make_device_mesh", "ShardingPlan"]
