from medical_image_segmentation_tpu.models.resnet import ResNet, RESNET_CONFIGS, make_resnet
from medical_image_segmentation_tpu.models.mlp import MLP
from medical_image_segmentation_tpu.models.unet import UNet
from medical_image_segmentation_tpu.models.unet3d import UNet3D
from medical_image_segmentation_tpu.models.byol import BYOLNet, Encoder

__all__ = ["ResNet", "RESNET_CONFIGS", "make_resnet", "MLP", "UNet", "UNet3D", "BYOLNet", "Encoder"]
