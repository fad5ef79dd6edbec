from vqa_project_tpu.parallel import multihost
from vqa_project_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
    put_named,
)
from vqa_project_tpu.parallel.tp import (
    make_mesh_2d,
    param_spec,
    shard_state,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
    "put_named",
    "multihost",
    "make_mesh_2d",
    "param_spec",
    "shard_state",
]
