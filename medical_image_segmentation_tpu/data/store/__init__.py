from medical_image_segmentation_tpu.data.store.format import (
    CODEC_RAW,
    CODEC_JPEG,
    CODEC_PNG,
    CODEC_JLS,
    FLAG_U16,
    StoreHeader,
    SampleRecord,
)
from medical_image_segmentation_tpu.data.store.writer import StoreWriter, write_store_from_dataset
from medical_image_segmentation_tpu.data.store.reader import StoreReader

__all__ = [
    "CODEC_RAW",
    "CODEC_JPEG",
    "CODEC_PNG",
    "CODEC_JLS",
    "FLAG_U16",
    "StoreHeader",
    "SampleRecord",
    "StoreWriter",
    "write_store_from_dataset",
    "StoreReader",
]
