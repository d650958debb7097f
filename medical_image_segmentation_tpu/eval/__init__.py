from medical_image_segmentation_tpu.eval.knn import knn_predict, KNNEvaluator
from medical_image_segmentation_tpu.eval.linear_probe import LinearProbe

__all__ = ["knn_predict", "KNNEvaluator", "LinearProbe"]
