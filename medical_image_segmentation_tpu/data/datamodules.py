"""Dataset registry — named datamodules with loaders and normalization stats.

Parity with the reference registry
(`medical_image_segmentation/train/data_loaders/lightning_module.py:21-36`,
registered modules :193-809). Each datamodule carries:

- the MIS store paths (train/val) or PNG dirs (Decathlon),
- the normalization constants (bit-parity targets, BASELINE.md),
- crop size, channel count, class count,
- per-view augmentation configs for SSL.

Deviation from the reference (documented): radiology/medical datasets stay
**1-channel** end-to-end (the reference stacks gray→RGB only because
torchvision backbones demand 3 channels, `pytorch_datasets.py:140-144`;
our ResNet takes ``in_channels=1``, saving 3× input bandwidth). CIFAR /
ImageNet modules are RGB as usual.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

from medical_image_segmentation_tpu.core.registry import Registry
from medical_image_segmentation_tpu.data.loader import QUASI_RANDOM, RANDOM, SEQUENTIAL, Loader
from medical_image_segmentation_tpu.ops.augment import BYOL_VIEW1, BYOL_VIEW2, ViewConfig

DATAMODULES: Registry = Registry("datamodule")


def register_datamodule(name: str):
    return DATAMODULES.register(name)


def get_datamodule(name: str):
    return DATAMODULES.get(name)


@dataclasses.dataclass
class SSLDataModule:
    """Two-view SSL datamodule backed by MIS stores."""

    NUM_CLASSES: int = 10
    channels: int = 1
    crop_size: int = 112
    low_res: bool = False
    has_train_labels: bool = True   # False: probe CE skipped during pretrain
    #   (RADIOLOGY_1M train store is unlabeled; its NUM_CLASSES describes the
    #   NIH val set — reference lightning_module.py:193-272)
    # normalization stats on the 0-255 scale (reference stores FFCV
    # NormalizeImage(mean*255, std*255), lightning_module.py:89-91)
    train_mean: Tuple[float, ...] = (57.9764,)
    train_std: Tuple[float, ...] = (60.4759,)
    val_mean: Tuple[float, ...] = (126.57,)   # lightning_module.py:239
    val_std: Tuple[float, ...] = (63.46,)     # lightning_module.py:240
    train_store: Optional[str] = None
    val_store: Optional[str] = None
    # augmentation recipe: "ffcv" = the reference's canonical FFCV pipeline
    # (lightning_module.py:67-98, no blur/jitter); "torchvision" = the
    # BYOLRGBDataTransforms variant (:39-64, ColorJitter + GaussianBlur k=23)
    aug_recipe: str = "ffcv"
    # random CT re-windowing probability (PAPERS.md CT-augmentation recipes;
    # 0 = reference parity)
    window_prob: float = 0.0
    # full-scale sample value: 255 for uint8 stores, 65535 for 16-bit
    # (FLAG_U16) stores. Stats above must be on the SAME scale; the canonical
    # ViewConfig thresholds/ranges (defined on 0-255) are rescaled in
    # view_configs so augmentation semantics are identical at either depth.
    value_max: float = 255.0

    def view_configs(self) -> Tuple[ViewConfig, ViewConfig]:
        from medical_image_segmentation_tpu.ops.augment import BYOL_TV_VIEW1, BYOL_TV_VIEW2

        if self.aug_recipe == "torchvision":
            v1, v2 = BYOL_TV_VIEW1, BYOL_TV_VIEW2
        elif self.aug_recipe == "ffcv":
            v1, v2 = BYOL_VIEW1, BYOL_VIEW2
        else:
            raise ValueError(f"unknown aug_recipe {self.aug_recipe!r} (ffcv|torchvision)")
        size = (self.crop_size, self.crop_size)
        s = self.value_max / 255.0

        def adapt(v: ViewConfig) -> ViewConfig:
            return dataclasses.replace(
                v, out_size=size, window_prob=self.window_prob,
                value_max=self.value_max,
                solarize_threshold=v.solarize_threshold * s,
                window_level_range=tuple(x * s for x in v.window_level_range),
                window_width_range=tuple(x * s for x in v.window_width_range),
            )

        return adapt(v1), adapt(v2)

    def train_loader(self, batch_size: int, num_threads: int = 8, seed: int = 0,
                     shard: Tuple[int, int] = (0, 1), distributed: bool = False,
                     precrop: Optional[dict] = None) -> Loader:
        if not self.train_store or not os.path.exists(self.train_store):
            raise FileNotFoundError(f"train store not found: {self.train_store!r}")
        # QUASI_RANDOM when distributed else RANDOM (lightning_module.py:141-151)
        order = QUASI_RANDOM if distributed else RANDOM
        return Loader(self.train_store, batch_size, order=order,
                      num_threads=num_threads, seed=seed, shard=shard, drop_last=True,
                      precrop=precrop)

    def val_loader(self, batch_size: int, num_threads: int = 8,
                   shard: Tuple[int, int] = (0, 1)) -> Loader:
        if not self.val_store or not os.path.exists(self.val_store):
            raise FileNotFoundError(f"val store not found: {self.val_store!r}")
        return Loader(self.val_store, batch_size, order=SEQUENTIAL,
                      num_threads=num_threads, shard=shard, drop_last=False)


def _env(name: str, default: str) -> str:
    """Store locations come from env (the reference hard-codes GPFS paths,
    `lightning_module.py:199-200`; env-vars are the portable equivalent)."""
    return os.environ.get(name, default)


@register_datamodule("RADIOLOGY_1M")
class Radiology1MDataModule(SSLDataModule):
    """Curated 1M TCIA subset (reference RADIOLOGY_1M_FFCV,
    `lightning_module.py:193-272`: crop 112², train μ=57.9764 σ=60.4759,
    val = NIH chest-x-ray test beton μ=126.5758 σ=63.4649, 10 classes)."""

    def __init__(self, **kw):
        kw.setdefault("has_train_labels", False)
        kw.setdefault("train_store", _env("RADIOLOGY_1M_TRAIN_STORE", "data/stores/radiology_1M_train.mis"))
        kw.setdefault("val_store", _env("RADIOLOGY_1M_VAL_STORE", "data/stores/nih_chest_xray_test.mis"))
        super().__init__(**kw)


@register_datamodule("RADIOLOGY_1M_U16")
class Radiology1MU16DataModule(SSLDataModule):
    """16-bit (HU-native) curated TCIA subset — the depth the reference
    throws away (`create_ffcv_subset.py:36-65` squashes DICOM pixels to
    uint8 before FFCV). Backed by a FLAG_U16 MIS store
    (`ingest/create_store.py --bit_depth 16`); window/level augmentation
    operates on the full 16-bit intensity range. Default stats are the
    8-bit reference constants scaled to the 16-bit range (×65535/255);
    recompute exactly with `ingest/compute_stats.py` on the built store."""

    def __init__(self, **kw):
        kw.setdefault("has_train_labels", False)
        kw.setdefault("value_max", 65535.0)
        kw.setdefault("train_mean", (57.9764 * 257.0,))
        kw.setdefault("train_std", (60.4759 * 257.0,))
        kw.setdefault("val_mean", (126.57 * 257.0,))
        kw.setdefault("val_std", (63.46 * 257.0,))
        kw.setdefault("train_store", _env("RADIOLOGY_1M_U16_TRAIN_STORE",
                                          "data/stores/radiology_1M_u16_train.mis"))
        kw.setdefault("val_store", _env("RADIOLOGY_1M_U16_VAL_STORE",
                                        "data/stores/nih_chest_xray_u16_test.mis"))
        super().__init__(**kw)


@register_datamodule("CIFAR10")
class Cifar10DataModule(SSLDataModule):
    """CIFAR-10 (reference CIFAR10_FFCV, `lightning_module.py:305-332`)."""

    def __init__(self, **kw):
        kw.setdefault("NUM_CLASSES", 10)
        kw.setdefault("channels", 3)
        kw.setdefault("crop_size", 32)
        kw.setdefault("low_res", True)
        kw.setdefault("train_mean", (0.491 * 255, 0.482 * 255, 0.447 * 255))  # MEAN, :308
        kw.setdefault("train_std", (0.247 * 255, 0.243 * 255, 0.261 * 255))   # STD, :309
        kw.setdefault("val_mean", (0.491 * 255, 0.482 * 255, 0.447 * 255))
        kw.setdefault("val_std", (0.247 * 255, 0.243 * 255, 0.261 * 255))
        kw.setdefault("train_store", _env("CIFAR10_TRAIN_STORE", "data/stores/cifar10_train.mis"))
        kw.setdefault("val_store", _env("CIFAR10_VAL_STORE", "data/stores/cifar10_test.mis"))
        super().__init__(**kw)


@register_datamodule("CIFAR100")
class Cifar100DataModule(SSLDataModule):
    """CIFAR-100 (reference CIFAR100_FFCV, `lightning_module.py:275-302`)."""

    def __init__(self, **kw):
        kw.setdefault("NUM_CLASSES", 100)
        kw.setdefault("channels", 3)
        kw.setdefault("crop_size", 32)
        kw.setdefault("low_res", True)
        kw.setdefault("train_mean", (0.507 * 255, 0.487 * 255, 0.441 * 255))  # MEAN, :278
        kw.setdefault("train_std", (0.268 * 255, 0.257 * 255, 0.276 * 255))   # STD, :279
        kw.setdefault("val_mean", (0.507 * 255, 0.487 * 255, 0.441 * 255))
        kw.setdefault("val_std", (0.268 * 255, 0.257 * 255, 0.276 * 255))
        kw.setdefault("train_store", _env("CIFAR100_TRAIN_STORE", "data/stores/cifar100_train.mis"))
        kw.setdefault("val_store", _env("CIFAR100_VAL_STORE", "data/stores/cifar100_test.mis"))
        super().__init__(**kw)


@register_datamodule("IMAGENET")
class ImagenetDataModule(SSLDataModule):
    """ImageNet at 112² crops (reference IMAGENET_FFCV,
    `lightning_module.py:335-376`)."""

    def __init__(self, **kw):
        kw.setdefault("NUM_CLASSES", 1000)
        kw.setdefault("channels", 3)
        kw.setdefault("crop_size", 112)
        kw.setdefault("train_mean", (123.675, 116.28, 103.53))   # IMAGENET_MEAN*255
        kw.setdefault("train_std", (58.395, 57.12, 57.375))
        kw.setdefault("val_mean", (123.675, 116.28, 103.53))   # 0.485/0.456/0.406 * 255, :338
        kw.setdefault("val_std", (58.395, 57.12, 57.375))     # 0.229/0.224/0.225 * 255, :339
        kw.setdefault("train_store", _env("IMAGENET_TRAIN_STORE", "data/stores/imagenet_train.mis"))
        kw.setdefault("val_store", _env("IMAGENET_VAL_STORE", "data/stores/imagenet_val.mis"))
        super().__init__(**kw)


# ---------------------------------------------------------------------------
# Decathlon segmentation datamodules (reference lightning_module.py:580-809)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DecathlonDataModule:
    """Paired image/mask PNG-dir datamodule (reference DecathlonDataModule,
    `lightning_module.py:580-721`): Resize 224², ColorJitter(0.2,0.2) train,
    NEAREST mask resize, stats on the 0-1 scale."""

    images_dir: str = ""
    masks_dir: str = ""
    split_file: str = ""
    image_size: int = 224
    mean: Tuple[float, ...] = (0.5,)
    std: Tuple[float, ...] = (0.5,)
    store_prefix: str = ""   # set to use pre-built paired MIS stores
    #   (ingest/create_seg_store.py) — C++ decode path instead of per-epoch
    #   PNG decode

    def dataset(self, split: str):
        from medical_image_segmentation_tpu.data.decathlon import DecathlonDataset

        return DecathlonDataset(self.images_dir, self.masks_dir, self.split_file, split)

    def loader(self, split: str, batch_size: int, seed: int = 0,
               shard: Tuple[int, int] = (0, 1), num_threads: int = 4):
        if self.store_prefix:
            img_store = f"{self.store_prefix}_{split}_images.mis"
            msk_store = f"{self.store_prefix}_{split}_masks.mis"
            if os.path.exists(img_store) and os.path.exists(msk_store):
                from medical_image_segmentation_tpu.data.loader import RANDOM, SEQUENTIAL, PairedLoader

                return PairedLoader(
                    img_store, msk_store, batch_size,
                    order=RANDOM if split == "train" else SEQUENTIAL,
                    num_threads=num_threads, seed=seed,
                    drop_last=(split == "train"), shard=shard,
                )
        from medical_image_segmentation_tpu.data.decathlon import DecathlonLoader

        return DecathlonLoader(
            self.dataset(split), batch_size, image_size=self.image_size,
            shuffle=(split == "train"), seed=seed, shard=shard, num_threads=num_threads,
        )


def _dec(name, mean, std):
    @register_datamodule(name)
    @dataclasses.dataclass
    class _M(DecathlonDataModule):
        def __init__(self, **kw):
            kw.setdefault("mean", mean)
            kw.setdefault("std", std)
            super().__init__(**kw)

    _M.__name__ = name
    return _M


# stats from lightning_module.py:727-728,749-750,771-772,793-794
DecathlonHeartDataModule = _dec("DECATHLON_HEART", (0.1181,), (0.1720,))
DecathlonLiverDataModule = _dec("DECATHLON_LIVER", (0.2089,), (0.2109,))
DecathlonHippocampusDataModule = _dec("DECATHLON_HIPPOCAMPUS", (0.4982,), (0.2373,))
DecathlonLungDataModule = _dec("DECATHLON_LUNG", (0.1475,), (0.1685,))
