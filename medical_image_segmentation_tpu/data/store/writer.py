"""MIS store writer.

Capability parity with `ffcv.writer.DatasetWriter` as used by the reference
(`create_ffcv_subset.py:100-108`, `convert_pytorch_loader_to_ffcv_dataset.py:90-95`):
consume an indexed dataset (``__getitem__``/``__len__`` returning an image
array or (image, label)), optionally resize to ``max_resolution`` and
JPEG-compress, write in parallel, produce one self-contained file.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from medical_image_segmentation_tpu.data.store.format import (
    ALIGN,
    CODEC_JPEG,
    CODEC_RAW,
    HEADER_SIZE,
    LABEL_INT32,
    LABEL_NONE,
    RECORD_SIZE,
    SampleRecord,
    StoreHeader,
)


def _encode(img: np.ndarray, codec: int, quality: int) -> bytes:
    if codec == CODEC_RAW:
        return np.ascontiguousarray(img).tobytes()
    import cv2

    # store payloads are RGB-ordered: cv2.imencode assumes BGR input, so
    # 3-channel images are swapped before encoding (the C++ loader decodes
    # with libjpeg/libpng straight to RGB; StoreReader swaps back after
    # cv2.imdecode) — without this the two decode paths disagree
    if img.ndim == 3 and img.shape[-1] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    ext = ".jpg" if codec == CODEC_JPEG else ".png"
    params = [cv2.IMWRITE_JPEG_QUALITY, quality] if codec == CODEC_JPEG else []
    ok, buf = cv2.imencode(ext, img, params)
    if not ok:
        raise ValueError("image encode failed")
    return buf.tobytes()


def _maybe_resize(img: np.ndarray, max_resolution: Optional[int]) -> np.ndarray:
    if max_resolution is None:
        return img
    h, w = img.shape[:2]
    m = max(h, w)
    if m <= max_resolution:
        return img
    import cv2

    scale = max_resolution / m
    return cv2.resize(img, (int(round(w * scale)), int(round(h * scale))), interpolation=cv2.INTER_AREA)


class StoreWriter:
    """Streaming writer. Samples must share the channel count; per-sample
    h/w may vary (the header records the max, sizing loader buffers)."""

    def __init__(self, path: str, channels: int, with_labels: bool = False):
        self.path = path
        self.channels = channels
        self.with_labels = with_labels
        self.records = []
        self._tmp_data = open(path + ".data.tmp", "wb")
        self._data_pos = 0
        self.max_h = 0
        self.max_w = 0

    def add(self, img: np.ndarray, label: int = 0, codec: int = CODEC_RAW, quality: int = 90) -> None:
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] != self.channels:
            raise ValueError(f"expected {self.channels} channels, got {img.shape}")
        if img.dtype != np.uint8:
            raise ValueError(f"store holds uint8 images, got {img.dtype}")
        payload = _encode(img if img.shape[-1] > 1 else img[..., 0], codec, quality)
        pad = (-self._data_pos) % ALIGN
        self._tmp_data.write(b"\x00" * pad)
        self._data_pos += pad
        self.records.append(
            SampleRecord(
                offset=self._data_pos, length=len(payload),
                height=img.shape[0], width=img.shape[1], channels=self.channels,
                codec=codec, label=int(label),
            )
        )
        self._tmp_data.write(payload)
        self._data_pos += len(payload)
        self.max_h = max(self.max_h, img.shape[0])
        self.max_w = max(self.max_w, img.shape[1])

    def close(self) -> None:
        self._tmp_data.close()
        n = len(self.records)
        header = StoreHeader(
            num_samples=n, height=self.max_h, width=self.max_w, channels=self.channels,
            default_codec=self.records[0].codec if n else CODEC_RAW,
            label_dtype=LABEL_INT32 if self.with_labels else LABEL_NONE,
        )
        data_start = HEADER_SIZE + n * RECORD_SIZE
        data_start += (-data_start) % ALIGN
        with open(self.path, "wb") as f:
            f.write(header.pack())
            for r in self.records:
                r2 = SampleRecord(**{**r.__dict__, "offset": r.offset + data_start})
                f.write(r2.pack())
            f.write(b"\x00" * (data_start - HEADER_SIZE - n * RECORD_SIZE))
            with open(self.path + ".data.tmp", "rb") as src:
                while True:
                    chunk = src.read(1 << 22)
                    if not chunk:
                        break
                    f.write(chunk)
        os.remove(self.path + ".data.tmp")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_store_from_dataset(
    path: str,
    dataset,                      # __len__ + __getitem__ → img | (img, label)
    channels: int,
    max_resolution: Optional[int] = None,
    codec: int = CODEC_RAW,
    quality: int = 90,
    num_processes: int = 1,
    indices: Optional[Sequence[int]] = None,
) -> int:
    """Build a store from an indexed dataset (the `DatasetWriter.
    from_indexed_dataset` equivalent). Returns the number of samples written."""
    idxs = list(indices) if indices is not None else list(range(len(dataset)))
    with_labels = False
    with StoreWriter(path, channels=channels, with_labels=True) as w:
        for i in idxs:
            item = dataset[i]
            if isinstance(item, tuple):
                img, label = item
                with_labels = True
            else:
                img, label = item, 0
            img = _maybe_resize(np.asarray(img), max_resolution)
            w.add(img, label=label, codec=codec, quality=quality)
        w.with_labels = with_labels
    return len(idxs)
