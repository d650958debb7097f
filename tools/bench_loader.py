"""Host-loader throughput benchmark (BASELINE target: "loader GB/s").

Measures the C++ MIS-store decode path in isolation: mmap + JPEG/PNG/raw
decode into batch buffers, per thread count, reporting images/s and GB/s of
decoded pixels. The `/dev/null`-style analogue of the reference's write
benchmark (`create_subset.py:232-234`) for the read side.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default=None, help="existing store (default: synthesize one)")
    ap.add_argument("--n_images", type=int, default=2048)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--codec", default="jpeg", choices=["jpeg", "png", "raw", "jls"])
    ap.add_argument("--bit_depth", type=int, default=8, choices=(8, 16),
                    help="16 = FLAG_U16 store (HU-native; codecs raw/png/jls)")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--views", type=int, default=0,
                    help=">0: fetch_views mode — sample V RandomResizedCrop "
                         "windows per image (BYOL scale 0.08-1.0) and measure "
                         "the crop-at-decode path (windowed JPEG; row-limited "
                         "JLS) instead of full-frame decode")
    ap.add_argument("--crop_size", type=int, default=112,
                    help="view size for --views mode")
    args = ap.parse_args()

    from medical_image_segmentation_tpu.data.store import (
        CODEC_JLS, CODEC_JPEG, CODEC_PNG, CODEC_RAW, StoreWriter)
    from medical_image_segmentation_tpu.data.store.native import NativeStore

    store_path = args.store
    tmp = None
    if store_path is None:
        codec = {"jpeg": CODEC_JPEG, "png": CODEC_PNG, "raw": CODEC_RAW,
                 "jls": CODEC_JLS}[args.codec]
        tmp = tempfile.mkdtemp()
        store_path = os.path.join(tmp, "bench.mis")
        rng = np.random.default_rng(0)
        dtype = np.uint16 if args.bit_depth == 16 else np.uint8
        hi = 65536 if args.bit_depth == 16 else 256
        # CT-like content (smooth + noise) rather than pure noise: entropy
        # codecs (JLS) are content-sensitive and medical frames are smooth
        y, x = np.mgrid[0 : args.image_size, 0 : args.image_size]
        base = 0.3 + 0.25 * np.sin(y / 30.0) * np.cos(x / 25.0)
        with StoreWriter(store_path, channels=1, dtype=dtype) as w:
            for _ in range(args.n_images):
                img = np.clip(base + rng.normal(0, 0.01, base.shape), 0, 1)
                w.add((img * (hi - 1)).astype(dtype)[..., None], codec=codec)
        print(f"synthetic {args.codec} store: {os.path.getsize(store_path)/1e6:.1f} MB", file=sys.stderr)

    ns = NativeStore(store_path)
    n = ns.num_samples
    h, w, c = ns.shape
    bytes_per_img = h * w * c * ns.dtype.itemsize

    def rrc_params(rng, b):
        """BYOL RandomResizedCrop windows (ops/augment.py::sample_rrc_window
        distribution: area U(0.08,1)·HW, log-ratio U(3/4,4/3)) as the
        (B, V, 5) float32 (y0, x0, ch, cw, flip) array fetch_views takes."""
        area = h * w * rng.uniform(0.08, 1.0, (b, args.views))
        aspect = np.exp(rng.uniform(np.log(0.75), np.log(4 / 3), (b, args.views)))
        cw_ = np.clip(np.sqrt(area * aspect), 1.0, w)
        ch_ = np.clip(np.sqrt(area / aspect), 1.0, h)
        y0 = rng.uniform(0, 1, ch_.shape) * (h - ch_)
        x0 = rng.uniform(0, 1, cw_.shape) * (w - cw_)
        flip = (rng.uniform(0, 1, cw_.shape) < 0.5).astype(np.float32)
        return np.stack([y0, x0, ch_, cw_, flip], axis=-1).astype(np.float32)

    results = {}
    for t in args.threads:
        idxs = np.random.default_rng(1).permutation(n).astype(np.int64)
        prng = np.random.default_rng(2)
        t0 = time.perf_counter()
        for s in range(0, n - args.batch_size + 1, args.batch_size):
            batch = idxs[s : s + args.batch_size]
            if args.views:
                ns.fetch_views(batch, rrc_params(prng, len(batch)),
                               out_hw=(args.crop_size, args.crop_size),
                               num_threads=t)
            else:
                ns.fetch(batch, num_threads=t)
        dt = time.perf_counter() - t0
        done = (n // args.batch_size) * args.batch_size
        ips = done / dt
        gbps = ips * bytes_per_img / 1e9
        results[t] = (ips, gbps)
        print(f"threads={t}: {ips:.0f} img/s, {gbps:.3f} GB/s decoded"
              + (f" ({args.views} RRC views/img)" if args.views else ""),
              file=sys.stderr)

    best = max(results.values())
    print(json.dumps({
        "metric": "loader_decoded_gbytes_per_sec",
        "value": round(best[1], 3),
        "unit": "GB/s",
        "images_per_sec": round(best[0], 1),
        "codec": args.codec,
        "bit_depth": 16 if ns.dtype == np.uint16 else 8,
        "host_cpus": os.cpu_count(),
        "views": args.views,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
