from medical_image_segmentation_tpu.train.byol_task import BYOLTask, BYOLState
from medical_image_segmentation_tpu.train.segmentation_task import SegmentationTask, SegState
from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask, Seg3DState

__all__ = ["BYOLTask", "BYOLState", "SegmentationTask", "SegState",
           "Segmentation3DTask", "Seg3DState"]
