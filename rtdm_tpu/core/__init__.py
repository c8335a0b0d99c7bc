from rtdm_tpu.core.mesh import create_mesh, distributed_init, local_mesh
from rtdm_tpu.core.precision import Policy, DEFAULT_POLICY

__all__ = ["create_mesh", "distributed_init", "local_mesh", "Policy", "DEFAULT_POLICY"]
