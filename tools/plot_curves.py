"""Render training-curve PNGs from metrics.csv logs.

The artifact parity of the reference's `data/visualizations/*.png`
(val_top1_over_step, contrastive_loss_over_step, momentum_over_step, …):
one PNG per requested metric, from any of our CSVMetricsLogger outputs.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from medical_image_segmentation_tpu.utils.plot_metrics import load_metric


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_glob", default="logs/lightning_logs/version_*/metrics.csv")
    ap.add_argument("--metrics", nargs="+", default=["loss", "val/acc@1"])
    ap.add_argument("--output_dir", default="data/visualizations")
    ap.add_argument("--tag", default="", help="suffix for filenames (e.g. a date)")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    paths = sorted(glob.glob(args.log_glob))
    if not paths:
        print(f"no metrics files match {args.log_glob}", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)
    written = []
    for metric in args.metrics:
        xs, ys = load_metric(paths, metric)
        if not xs:
            print(f"metric {metric!r} not found", file=sys.stderr)
            continue
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(xs, ys, linewidth=1.2)
        ax.set_xlabel("step")
        ax.set_ylabel(metric)
        ax.set_title(f"{metric} over step")
        ax.grid(alpha=0.3)
        safe = metric.replace("/", "_").replace("@", "")
        suffix = f"_{args.tag}" if args.tag else ""
        out = os.path.join(args.output_dir, f"{safe}_over_step{suffix}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(out)
        print(out)
    return 0 if written else 1


if __name__ == "__main__":
    raise SystemExit(main())
