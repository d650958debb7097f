from medical_image_segmentation_tpu.train.byol_task import BYOLTask, BYOLState
from medical_image_segmentation_tpu.train.segmentation_task import SegmentationTask, SegState

__all__ = ["BYOLTask", "BYOLState", "SegmentationTask", "SegState"]
