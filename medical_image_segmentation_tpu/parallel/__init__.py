from medical_image_segmentation_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    initialize_distributed,
)
from medical_image_segmentation_tpu.parallel.tp import byol_tp_shardings

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "initialize_distributed",
    "byol_tp_shardings",
]
