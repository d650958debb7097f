from medical_image_segmentation_tpu.ops.dice import (
    dice_loss,
    dice_coefficient,
    jaccard_index,
    post_process_masks,
)
from medical_image_segmentation_tpu.ops.byol_loss import cosine_similarity_loss
from medical_image_segmentation_tpu.ops.lars import lars
from medical_image_segmentation_tpu.ops.schedules import (
    linear_warmup_cosine_annealing,
    cosine_ema_momentum,
)

__all__ = [
    "dice_loss",
    "dice_coefficient",
    "jaccard_index",
    "post_process_masks",
    "cosine_similarity_loss",
    "lars",
    "linear_warmup_cosine_annealing",
    "cosine_ema_momentum",
]
