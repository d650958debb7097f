"""Synthetic medical-imaging dataset generator (for validation without PHI).

Produces a Decathlon-style task directory (NIfTI volumes + masks) of noisy
scans containing low-contrast elliptical "lesions", plus (optionally) a
larger unlabeled slice store for SSL pretraining. Used by the convergence
and label-efficiency validation runs recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def make_volume(rng, hw: int, depth: int, contrast: float, noise: float):
    vol = rng.normal(100.0, noise, size=(hw, hw, depth)).astype(np.float32)
    seg = np.zeros((hw, hw, depth), np.uint8)
    yy, xx = np.mgrid[:hw, :hw]
    for d in range(depth):
        cy, cx = rng.integers(hw // 5, hw - hw // 5, 2)
        ry, rx = rng.integers(hw // 12, hw // 5, 2)
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        u = (yy - cy) * ca + (xx - cx) * sa
        v = -(yy - cy) * sa + (xx - cx) * ca
        lesion = (u / ry) ** 2 + (v / rx) ** 2 <= 1.0
        vol[:, :, d] += lesion * contrast
        seg[:, :, d] = lesion
    return vol, seg


def make_volume_3d(rng, hw: int, depth: int, contrast: float, noise: float,
                   n_lesions: int = 2):
    """Contiguous 3D ellipsoid lesions (for the volumetric path: a 3D net
    can exploit cross-slice continuity that per-slice lesions lack)."""
    vol = rng.normal(100.0, noise, size=(hw, hw, depth)).astype(np.float32)
    seg = np.zeros((hw, hw, depth), np.uint8)
    yy, xx, zz = np.mgrid[:hw, :hw, :depth]
    for _ in range(n_lesions):
        cy, cx = rng.integers(hw // 5, hw - hw // 5, 2)
        cz = rng.integers(depth // 4, depth - depth // 4)
        ry, rx = rng.integers(hw // 12, hw // 5, 2)
        rz = rng.integers(max(2, depth // 6), max(3, depth // 3))
        lesion = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 + ((zz - cz) / rz) ** 2 <= 1.0
        vol += lesion * contrast
        seg |= lesion.astype(np.uint8)
    return vol, seg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--n_volumes", type=int, default=16)
    ap.add_argument("--hw", type=int, default=96)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--contrast", type=float, default=30.0, help="lesion intensity over background")
    ap.add_argument("--noise", type=float, default=20.0)
    ap.add_argument("--unlabeled_volumes", type=int, default=0,
                    help="extra volumes written only as slices for SSL pretraining")
    ap.add_argument("--lesion3d", action="store_true",
                    help="contiguous 3D ellipsoid lesions (volumetric-path validation); "
                         "unlabeled volumes are then written as NIfTI for train_ssl3d")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from medical_image_segmentation_tpu.data.nifti import write_nifti

    rng = np.random.default_rng(args.seed)
    img_dir = os.path.join(args.output_dir, "imagesTr")
    lbl_dir = os.path.join(args.output_dir, "labelsTr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    gen = make_volume_3d if args.lesion3d else make_volume
    for i in range(args.n_volumes):
        vol, seg = gen(rng, args.hw, args.depth, args.contrast, args.noise)
        write_nifti(os.path.join(img_dir, f"la_{i:03d}.nii.gz"), vol)
        write_nifti(os.path.join(lbl_dir, f"la_{i:03d}.nii.gz"), seg)
    print(f"{args.n_volumes} labeled volumes → {args.output_dir}", file=sys.stderr)

    if args.unlabeled_volumes and args.lesion3d:
        u_dir = os.path.join(args.output_dir, "unlabeledTr")
        os.makedirs(u_dir, exist_ok=True)
        for i in range(args.unlabeled_volumes):
            vol, _ = gen(rng, args.hw, args.depth, args.contrast, args.noise)
            write_nifti(os.path.join(u_dir, f"u_{i:04d}.nii.gz"), vol)
        print(f"{args.unlabeled_volumes} unlabeled volumes → {u_dir}", file=sys.stderr)
    elif args.unlabeled_volumes:
        import cv2

        u_dir = os.path.join(args.output_dir, "unlabeled_slices")
        os.makedirs(u_dir, exist_ok=True)
        for i in range(args.unlabeled_volumes):
            vol, _ = gen(rng, args.hw, args.depth, args.contrast, args.noise)
            lo, hi = vol.min(), vol.max()
            for d in range(args.depth):
                sl = ((vol[:, :, d] - lo) / (hi - lo) * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(u_dir, f"u_{i:04d}_{d}.png"), sl)
        print(f"{args.unlabeled_volumes * args.depth} unlabeled slices → {u_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
