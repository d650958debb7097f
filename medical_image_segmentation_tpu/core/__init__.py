from medical_image_segmentation_tpu.core.registry import Registry
from medical_image_segmentation_tpu.core.metrics_logger import CSVMetricsLogger

__all__ = ["Registry", "CSVMetricsLogger"]
