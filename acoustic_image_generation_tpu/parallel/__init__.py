from acoustic_image_generation_tpu.parallel.mesh import (
    batch_sharding,
    form_global_batch,
    fsdp_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    spatial_sharding,
    tp_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "form_global_batch",
    "fsdp_sharding",
    "replicated_sharding",
    "shard_batch",
    "spatial_sharding",
    "tp_sharding",
]
