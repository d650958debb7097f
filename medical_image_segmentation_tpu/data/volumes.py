"""Medical Decathlon volumetric dataset + loader (NIfTI, no slicing).

Beyond-reference capability: the reference converts every Decathlon task to
2D PNG slices because its input path is 2D-only
(`slice_medical_decathlon_scans.py:55-83`). This module feeds whole volumes
to the 3D path (`models/unet3d.py`, `train/seg3d_task.py`):

- pairing/ids identical to the slicer (`ingest/slice_decathlon.py`):
  imagesTr/labelsTr matched by basename, split filtering by the same
  ``<task>_<id>`` uid the 2D split files use (so one split JSON drives both
  the 2D and 3D paths);
- per-volume min-max normalization to 0..1 (the slicer's image treatment),
  mask binarized ``!= 0``;
- volumes center-padded/cropped on host to a fixed ``target_shape``
  (static shapes for XLA); the device-side random crop/flips happen in
  ``ops/augment3d.py::segmentation_augment_3d``.

Volumes are returned (D, H, W, 1) float32 with the NIfTI's last axis as D
(the slicer's default slicing axis), so a (512, 512, 90) CT becomes
(90, 512, 512, 1) before padding.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from medical_image_segmentation_tpu.data.ingest.slice_decathlon import pair_scans_and_masks
from medical_image_segmentation_tpu.data.nifti import read_nifti


def center_fit(vol: np.ndarray, target: Tuple[int, int, int]) -> np.ndarray:
    """Center-crop-or-pad (D, H, W[, C]) to ``target`` spatial dims."""
    out = vol
    for ax, t in enumerate(target):
        n = out.shape[ax]
        if n > t:
            lo = (n - t) // 2
            out = np.take(out, range(lo, lo + t), axis=ax)
        elif n < t:
            before = (t - n) // 2
            pad = [(0, 0)] * out.ndim
            pad[ax] = (before, t - n - before)
            out = np.pad(out, pad)
    return out


class DecathlonVolumeDataset:
    """Paired (volume, mask) dataset over a Decathlon task directory."""

    def __init__(
        self,
        images_dir: str,
        masks_dir: str,
        target_shape: Tuple[int, int, int] = (64, 64, 64),
        split_file: Optional[str] = None,
        split: str = "train",
        cache: bool = False,
    ):
        pairs = pair_scans_and_masks(images_dir, masks_dir)
        if split_file:
            # the 2D split JSONs key volumes by the filename stem (the same
            # uid `extract_id` recovers from slice PNGs), so one split file
            # drives both the sliced and the volumetric paths
            with open(split_file) as f:
                ids = set(json.load(f)[split])
            pairs = [
                (i, m) for i, m in pairs
                if os.path.basename(i).split(".nii")[0] in ids
            ]
        if not pairs:
            raise ValueError(f"no volume pairs under {images_dir} / {masks_dir} (split={split})")
        self.pairs: List[Tuple[str, str]] = pairs
        self.target_shape = tuple(target_shape)
        # decoded-volume RAM cache: NIfTI gunzip+parse on every epoch
        # dominates wall-clock on few-core hosts (device step ≪ host decode);
        # fixed target_shape makes the footprint len(ds)·∏target·8 bytes —
        # the caller opts in when that fits. raw() (full-res eval) stays
        # uncached: native-resolution volumes are unbounded and read rarely.
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.pairs)

    def raw(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """(volume, mask) at native resolution, normalized/binarized but not
        padded — for full-res sliding-window eval."""
        img_path, msk_path = self.pairs[i]
        vol = read_nifti(img_path).get_fdata()
        seg = read_nifti(msk_path).get_fdata()
        if vol.ndim == 4:  # multi-modal: first channel, like the 2D slicer
            vol = vol[..., 0]
        if vol.shape != seg.shape:
            raise ValueError(f"shape mismatch {vol.shape} vs {seg.shape} for {img_path}")
        # NIfTI (X, Y, Z) → (D=Z, H=X, W=Y): depth first, matching the
        # slicer's axis=-1 slicing order
        vol = np.moveaxis(vol, -1, 0)
        seg = np.moveaxis(seg, -1, 0)
        lo, hi = float(vol.min()), float(vol.max())
        scale = 1.0 / (hi - lo) if hi > lo else 0.0
        img = ((vol - lo) * scale).astype(np.float32)
        msk = (seg != 0).astype(np.float32)
        return img[..., None], msk[..., None]

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        img, msk = self.raw(i)
        img = center_fit(img, self.target_shape)
        msk = center_fit(msk, self.target_shape)
        if self._cache is not None:
            self._cache[i] = (img, msk)
        return img, msk


class UnlabeledVolumeDataset:
    """Images-only volume dataset (volumetric BYOL pretraining): every
    .nii/.nii.gz under ``images_dir``, min-max normalized to 0..1 and
    center-fitted to ``target_shape``. Items are 1-tuples so
    ``VolumeLoader`` yields ``(batch,)``."""

    def __init__(self, images_dir: str, target_shape: Tuple[int, int, int] = (64, 96, 96),
                 cache: bool = False):
        names = sorted(
            f for f in os.listdir(images_dir)
            if (f.endswith(".nii") or f.endswith(".nii.gz")) and not f.startswith(".")
        )
        if not names:
            raise ValueError(f"no NIfTI volumes under {images_dir}")
        self.paths = [os.path.join(images_dir, n) for n in names]
        self.target_shape = tuple(target_shape)
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int):
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        vol = read_nifti(self.paths[i]).get_fdata()
        if vol.ndim == 4:
            vol = vol[..., 0]
        vol = np.moveaxis(vol, -1, 0)
        lo, hi = float(vol.min()), float(vol.max())
        scale = 1.0 / (hi - lo) if hi > lo else 0.0
        img = ((vol - lo) * scale).astype(np.float32)
        item = (center_fit(img, self.target_shape)[..., None],)
        if self._cache is not None:
            self._cache[i] = item
        return item


class VolumeLoader:
    """Batched loader with epoch shuffling and multi-host sharding."""

    def __init__(
        self,
        dataset: DecathlonVolumeDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_hosts: int = 1,
        host_id: int = 0,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # equalized host shards (pad by wraparound so every host steps in
        # lockstep — same contract as data/loader.py)
        per = -(-len(idx) // self.num_hosts)
        idx = np.resize(idx, per * self.num_hosts)
        return idx[self.host_id::self.num_hosts]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        for chunk in self.iter_index_batches():
            cols = zip(*(self.ds[int(i)] for i in chunk))
            yield tuple(np.stack(c) for c in cols)  # (imgs, masks) or (imgs,)

    def iter_index_batches(self) -> Iterator[np.ndarray]:
        """Same shuffle/shard/drop-last contract as ``__iter__`` (including
        the epoch bump, so resume and data order stay bit-identical), but
        yields the int32 INDEX batches instead of materialized volumes — the
        feed for device-resident corpus caches (``--device_cache``), where
        batches are gathered on-device and only indices cross the wire."""
        idx = self._indices()
        self.epoch += 1
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for s in range(0, end, self.batch_size):
            yield idx[s:s + self.batch_size].astype(np.int32)
