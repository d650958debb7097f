from medical_image_segmentation_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    initialize_distributed,
)

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "initialize_distributed"]
