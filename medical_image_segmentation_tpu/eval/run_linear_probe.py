"""Post-hoc linear-probe evaluation of an SSL checkpoint.

The working version of the reference's `SSLLinearEval` callback intent
(`medical_image_segmentation/train/callback/linear_eval.py` — bit-rotted
and unwired there, SURVEY §"known bugs"): load a BYOL checkpoint, freeze
the encoder, train a Flatten→Dropout→Linear head with Adam(1e-4) on
backbone features, report train/val accuracy.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description="Linear probe on frozen SSL features")
    ap.add_argument("--checkpoint", required=True, help="orbax BYOL checkpoint dir")
    ap.add_argument("--dataset", default="RADIOLOGY_1M")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--hidden_dim", type=int, default=4096)
    ap.add_argument("--projection_dim", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--limit_batches", type=int, default=0)
    args = ap.parse_args(argv)

    from medical_image_segmentation_tpu.core.checkpoint import restore_checkpoint
    from medical_image_segmentation_tpu.data.datamodules import get_datamodule
    from medical_image_segmentation_tpu.eval.linear_probe import LinearProbe
    from medical_image_segmentation_tpu.models.resnet import RESNET_CONFIGS
    from medical_image_segmentation_tpu.train.byol_task import BYOLTask
    from medical_image_segmentation_tpu.train.train_ssl import _val_preprocess

    dm = get_datamodule(args.dataset)()
    if not getattr(dm, "has_train_labels", True):
        raise SystemExit(
            f"dataset {args.dataset} has an unlabeled train store — a linear probe "
            f"fit on constant labels would report a meaningless accuracy. Use a "
            f"labeled dataset (CIFAR10/CIFAR100/IMAGENET) or the KNN probe on a labeled val set."
        )
    task = BYOLTask(
        arch=args.arch, in_channels=dm.channels, low_res=dm.low_res,
        hidden_dim=args.hidden_dim, proj_dim=args.projection_dim, num_classes=dm.NUM_CLASSES,
    )
    state = task.init(jax.random.key(0), (2, dm.crop_size, dm.crop_size, dm.channels))
    state = restore_checkpoint(args.checkpoint, state)

    feat_dim = 512 * RESNET_CONFIGS[args.arch][2]
    probe = LinearProbe(feat_dim, dm.NUM_CLASSES, dropout=args.dropout, lr=args.lr)
    pstate = probe.init(jax.random.key(1))

    def embed(imgs):
        return task.embed_step(state, _val_preprocess(jnp.asarray(imgs), dm))

    for epoch in range(args.epochs):
        loader = dm.train_loader(args.batch_size, seed=epoch)
        m = {}
        for i, (imgs, labels) in enumerate(loader):
            if args.limit_batches and i >= args.limit_batches:
                break
            pstate, m = probe.train_step(pstate, embed(imgs), jnp.asarray(labels))
        if m:
            print(f"epoch {epoch}: online_train_acc={float(m['online_train_acc']):.4f}", file=sys.stderr)

    val_loader = dm.val_loader(args.batch_size)
    accs, losses, n = [], [], 0
    for i, (imgs, labels) in enumerate(val_loader):
        if args.limit_batches and i >= args.limit_batches:
            break
        m = probe.eval_step(pstate, embed(imgs), jnp.asarray(labels))
        accs.append(float(m["online_val_acc"]))
        losses.append(float(m["online_val_loss"]))
    if accs:
        print(f"online_val_acc={np.mean(accs):.4f} online_val_loss={np.mean(losses):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
