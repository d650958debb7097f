"""Render the 3D SSL transfer-study grid as a PNG artifact.

Reads ``ssl3d_study.json`` (written by `tools/ssl3d_transfer_study.py`) and
draws scratch-vs-SSL test Dice per label fraction — mean bars over seeds
with per-seed markers — into ``data/visualizations/`` (the repo's pattern
for long-horizon artifacts, mirroring the reference's
``data/visualizations/*.png`` training-curve PNGs).

Colors: Okabe–Ito blue/orange — the standard colorblind-safe pair; identity
is also carried by the legend and per-bar value labels, never color alone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", required=True, help="path to ssl3d_study.json")
    ap.add_argument("--output", default="data/visualizations/ssl3d_transfer_grid.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    report = json.load(open(args.report))
    rows = [r for r in report.get("grid", []) if "test/dice" in r]
    if not rows:
        print("no grid rows with test/dice in report", file=sys.stderr)
        return 1

    by = defaultdict(list)  # (fraction, init) -> [dice per seed]
    for r in rows:
        by[(int(r["label_fraction"]), r["init"])].append(float(r["test/dice"]))
    fracs = sorted({k[0] for k in by})

    colors = {"scratch": "#0072B2", "ssl": "#E69F00"}  # Okabe–Ito blue / orange
    width = 0.38
    fig, ax = plt.subplots(figsize=(7, 4.2))
    for i, init in enumerate(("scratch", "ssl")):
        xs = [j + (i - 0.5) * width for j in range(len(fracs))]
        means = [sum(by[(f, init)]) / len(by[(f, init)]) for f in fracs]
        ax.bar(xs, means, width * 0.94, color=colors[init],
               label={"scratch": "scratch init", "ssl": "SSL init"}[init])
        for x, m, f in zip(xs, means, fracs):
            ax.text(x, m + 0.012, f"{m:.3f}", ha="center", va="bottom",
                    fontsize=8, color="#333333")
            for d in by[(f, init)]:  # per-seed markers over the mean bar
                ax.plot([x], [d], marker="o", ms=4, mfc="white",
                        mec="#333333", mew=0.8, ls="none")
    ax.set_xticks(range(len(fracs)))
    ax.set_xticklabels([f"{f}%" for f in fracs])
    ax.set_xlabel("label fraction")
    ax.set_ylabel("test Dice")
    ax.set_ylim(0, 1.0)
    cfg = report.get("config", {})
    ax.set_title(
        f"3D BYOL transfer: {cfg.get('unlabeled', '?')} unlabeled vols, "
        f"features {'-'.join(str(f) for f in cfg.get('features', []))}, "
        f"{cfg.get('final_epochs', '?')}-epoch pretrain", fontsize=10)
    ax.legend(frameon=False, fontsize=9)
    ax.grid(axis="y", alpha=0.3)
    ax.spines[["top", "right"]].set_visible(False)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.output, dpi=160)
    print(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
