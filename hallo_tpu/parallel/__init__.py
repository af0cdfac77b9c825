"""Device-mesh parallelism: mesh construction, sharding rules.

Replaces the reference's NCCL-backed HF Accelerate + DeepSpeed ZeRO-2 stack
(accelerate_config.yaml:3-16) with jax.sharding over ICI/DCN.
"""

from hallo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_config,
    replicated,
    zero_shard_tree,
)

__all__ = ["make_mesh", "mesh_from_config", "batch_sharding", "replicated", "zero_shard_tree"]
