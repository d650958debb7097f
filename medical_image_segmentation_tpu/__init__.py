"""medical_image_segmentation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of the PyTorch/FFCV reference `EthanHaque/medical_image_segmentation`.

Layers (bottom-up):
  data/     — DICOM/NIfTI parsing, sharded ingest CLI tools, mmap sample store,
              C++ decode loader, host/device augmentation pipelines.
  ops/      — losses, metrics, LARS optimizer, LR/momentum schedules,
              Pallas + MXU augmentation kernels.
  models/   — flax ResNet encoder family (stem surgery), U-Net, MLP heads.
  parallel/ — mesh construction, sharding helpers, distributed init.
  train/    — BYOL pretrain task, segmentation task, CLI entry points.
  eval/     — KNN probe, linear probe, dice/iou evaluation.
  core/     — registry, config, RNG discipline, orbax checkpointing, metrics CSV.
"""

__version__ = "0.1.0"
