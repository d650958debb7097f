"""End-to-end benchmark: on-device two-view augmentation + BYOL train step.

Workload = the reference's canonical SSL pretrain config
(`scripts/train/train_ssl_pl_test`: BYOL resnet18, 112^2 crops) fed from
256^2 stored uint8 grayscale images (BASELINE.json north-star shape).

Prints ONE JSON line:
  {"metric": "aug_train_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N / 5000.0}
(baseline = the 5k img/s/chip north-star target from BASELINE.json; the
reference itself publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--crop_size", type=int, default=112)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()

    from medical_image_segmentation_tpu.ops.augment import BYOL_VIEW1, BYOL_VIEW2
    from medical_image_segmentation_tpu.ops.pallas_augment import pallas_two_view_augment
    from medical_image_segmentation_tpu.train import BYOLTask

    n_chips = len(jax.devices())
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if args.batch_size % n_chips:
        raise SystemExit(f"--batch_size {args.batch_size} must divide {n_chips} devices")
    if args.warmup < 1 or args.steps < 1:
        raise SystemExit("--warmup and --steps must be >= 1")

    task = BYOLTask(
        arch=args.arch, in_channels=1, hidden_dim=4096, proj_dim=256,
        num_classes=10, total_steps=100_000,
        learning_rate=1.0, warmup_epochs=10, max_epochs=200,
    )
    from medical_image_segmentation_tpu.parallel import make_mesh, replicated, shard_batch

    mesh = make_mesh()
    state = task.init(jax.random.key(0), (2, args.crop_size, args.crop_size, 1))
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.default_rng(0)
    raw = shard_batch(
        mesh,
        rng.integers(0, 256, size=(args.batch_size, args.image_size, args.image_size, 1)).astype(np.uint8),
    )
    import dataclasses
    cfg1 = dataclasses.replace(BYOL_VIEW1, out_size=(args.crop_size, args.crop_size))
    cfg2 = dataclasses.replace(BYOL_VIEW2, out_size=(args.crop_size, args.crop_size))

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=0)
    def step(state, raw, key):
        v1, v2 = pallas_two_view_augment(key, raw, cfg1, cfg2)
        return task.train_step(state, v1, v2)

    key = jax.random.key(1)
    for i in range(args.warmup):
        state, metrics = step(state, raw, jax.random.fold_in(key, i))
    # NOTE: on the axon remote-TPU platform jax.block_until_ready returns
    # before execution finishes; a host value transfer is the only reliable
    # fence, so we fetch the loss scalar to close each timing section.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, raw, jax.random.fold_in(key, 100 + i))
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch_size * args.steps / dt
    per_chip = imgs_per_sec / n_chips
    print(
        f"loss={final_loss:.4f} total={imgs_per_sec:.0f} img/s "
        f"({dt/args.steps*1e3:.1f} ms/step)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "aug_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
