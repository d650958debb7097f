"""3D U-Net (seg3d) MFU decomposition study.

`bench.py --task seg3d` (UNet3D(32,64,128,256), stored (64,96,96) volumes,
random (32,64,64) crops — `train_segmentation3d.py` defaults) measures ~20%
MFU on the chip; this script explains it the way `bench_resnet50_study.py`
and the stem-tail study did for the 2D nets. Measures, on the real TPU:

  1. the full seg3d train step (aug3d + fwd/bwd + LARS) over a batch sweep,
     with and without --remat,
  2. isolated full fwd and fwd+bwd of UNet3D at the crop shape,
  3. per-stage ConvBlock3D timings at the exact encoder/decoder shapes
     (the enc0 block runs at 1->32 channels over 32x64x64 voxels: a
     K=27 contraction — far below MXU tile size — at the largest spatial
     extent, the 3D analogue of the 2D stem problem),
  4. GroupNorm-vs-BatchNorm block variants and the f32 1^3 head + Dice tail.

Timing fences with a host scalar fetch (axon block_until_ready caveat,
see bench.py).

Usage: python tools/bench_unet3d_study.py [--quick] [--crop 32 64 64]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf).astype(jnp.float32)[:1]))


def timeit(fn, *args, steps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps * 1000.0


def step_flops(fn, *args) -> float:
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


PEAK_TF = 197.0  # v5e bf16 peak


def report(name, ms, flops):
    tf = flops / (ms / 1000.0) / 1e12 if ms else 0.0
    print(f"{name:62s} {ms:8.2f} ms  {flops/1e9:9.1f} GF  "
          f"{tf:6.1f} TF/s ({100*tf/PEAK_TF:4.1f}%)")
    return {"name": name, "ms": ms, "gflops": flops / 1e9, "tflops_s": tf,
            "pct_peak": 100 * tf / PEAK_TF}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--crop", type=int, nargs=3, default=(32, 64, 64), metavar=("D", "H", "W"))
    ap.add_argument("--volume", type=int, nargs=3, default=(64, 96, 96), metavar=("D", "H", "W"))
    ap.add_argument("--batches", type=int, nargs="+", default=(16, 32, 64))
    ap.add_argument("--skip_full", action="store_true")
    ap.add_argument("--skip_blocks", action="store_true",
                    help="skip sections 2-3 (fwd/bwd + per-stage blocks); "
                         "with --skip_full leaves only norm variants + tails")
    args = ap.parse_args()
    steps = 5 if args.quick else 10
    crop = tuple(args.crop)
    vol = tuple(args.volume)

    from medical_image_segmentation_tpu.models.unet3d import ConvBlock3D, UNet3D
    from medical_image_segmentation_tpu.ops.augment3d import segmentation_augment_3d
    from medical_image_segmentation_tpu.ops.dice import dice_loss
    from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask

    rows = []
    rng = np.random.default_rng(0)

    # ---- 1. full train step sweep (matches bench.py --task seg3d) ----------
    if not args.skip_full:
        for remat in (False, True):
            task = Segmentation3DTask(learning_rate=1.0, warmup_epochs=10,
                                      max_epochs=50, steps_per_epoch=100, remat=remat)
            state = task.init(jax.random.key(0), (1, *crop, 1))
            for batch in args.batches:
                vols = jnp.asarray(rng.random((batch, *vol, 1)), jnp.float32)
                msks = jnp.asarray((rng.random((batch, *vol, 1)) < 0.2), jnp.float32)
                key = jax.random.key(1)

                @jax.jit
                def step(st, v, m, k):
                    x, y = segmentation_augment_3d(k, v, m, out_size=crop,
                                                   train=True, dtype=jnp.bfloat16)
                    return task.train_step(st, x, y)

                st = state
                try:
                    for _ in range(2):
                        st, met = step(st, vols, msks, key)
                    fence(met["train/loss"])
                    t0 = time.perf_counter()
                    for _ in range(steps):
                        st, met = step(st, vols, msks, key)
                    fence(met["train/loss"])
                except Exception as e:  # OOM at large batches is a datapoint
                    print(f"train step b{batch}{' remat' if remat else '':6s}: {type(e).__name__}")
                    continue
                ms = (time.perf_counter() - t0) / steps * 1000.0
                fl = step_flops(lambda a, b, c, d: step(a, b, c, d), state, vols, msks, key)
                r = report(f"train step b{batch}{' +remat' if remat else ''} "
                           f"(aug3d+fwd/bwd+LARS)", ms, fl)
                r["vol_per_s"] = batch / (ms / 1000.0)
                print(f"{'':62s} -> {r['vol_per_s']:.0f} vol/s")
                rows.append(r)

    # ---- 2. isolated fwd / fwd+bwd at the crop shape ------------------------
    batch = args.batches[-1]
    y = jnp.asarray((rng.random((batch, *crop, 1)) < 0.2), jnp.bfloat16)
    if not args.skip_blocks:
        model = UNet3D()
        x = jnp.asarray(rng.standard_normal((batch, *crop, 1)), jnp.bfloat16)
        variables = model.init(jax.random.key(0), jnp.zeros((1, *crop, 1), jnp.float32), train=True)

        def full_fwd(v, xx):
            return model.apply(v, xx, train=False)

        rows.append(report(f"UNet3D fwd b{batch} (eval mode)",
                           timeit(jax.jit(full_fwd), variables, x, steps=steps),
                           step_flops(full_fwd, variables, x)))

        def loss_fn(p, xx, yy):
            logits = model.apply({"params": p}, xx, train=True)
            return dice_loss(logits, yy)

        g = jax.jit(jax.grad(loss_fn))
        rows.append(report(f"UNet3D fwd+bwd b{batch} (dice grad)",
                           timeit(g, variables["params"], x, y, steps=steps),
                           step_flops(lambda p, a, b: jax.grad(loss_fn)(p, a, b),
                                      variables["params"], x, y)))

        # ---- 3. per-stage ConvBlock3D at the exact shapes -------------------
        # encoder: (cin -> f) at shrinking extents; decoder: (f + skip -> f)
        d, h, w = crop
        feats = (32, 64, 128, 256)
        stages = []
        cin = 1
        ext = (d, h, w)
        for i, f in enumerate(feats):
            stages.append((f"enc{i} {ext[0]}x{ext[1]}x{ext[2]} {cin}->{f}", ext, cin, f))
            cin = f
            if i < len(feats) - 1:
                ext = tuple(e // 2 for e in ext)
        for i, f in enumerate(reversed(feats[:-1])):
            ext = tuple(e * 2 for e in ext)
            cin_dec = (feats[-1] if i == 0 else list(reversed(feats[:-1]))[i - 1]) + f
            stages.append((f"dec{i} {ext[0]}x{ext[1]}x{ext[2]} {cin_dec}->{f}", ext, cin_dec, f))

        for name, ext, ci, f in stages:
            xb = jnp.asarray(rng.standard_normal((batch, *ext, ci)), jnp.bfloat16)
            blk = ConvBlock3D(filters=f)
            v = blk.init(jax.random.key(0), xb, train=False)

            def blk_fwd(vv, a):
                return blk.apply(vv, a, train=False)

            rows.append(report(f"block {name}", timeit(jax.jit(blk_fwd), v, xb, steps=steps),
                               step_flops(blk_fwd, v, xb)))

    # ---- 4. norm variants + head/tail ---------------------------------------
    xb = jnp.asarray(rng.standard_normal((batch, *crop, 32)), jnp.bfloat16)
    for norm in ("group", "batch"):
        blk = ConvBlock3D(filters=32, norm=norm)
        v = blk.init(jax.random.key(0), xb, train=False)

        def blk_fwd(vv, a):
            return blk.apply(vv, a, train=False, mutable=["batch_stats"] if norm == "batch" else False)

        rows.append(report(f"block 32->32 @crop norm={norm}",
                           timeit(jax.jit(blk_fwd), v, xb, steps=steps),
                           step_flops(blk_fwd, v, xb)))

    logits = jnp.asarray(rng.standard_normal((batch, *crop, 1)), jnp.float32)

    def tail(lg, yy):
        return dice_loss(lg, yy)

    rows.append(report("dice loss tail", timeit(jax.jit(tail), logits, y, steps=steps),
                       step_flops(tail, logits, y)))

    def aug(k, v, m):
        return segmentation_augment_3d(k, v, m, out_size=crop, train=True, dtype=jnp.bfloat16)

    vols = jnp.asarray(rng.random((batch, *vol, 1)), jnp.float32)
    msks = jnp.asarray((rng.random((batch, *vol, 1)) < 0.2), jnp.float32)
    rows.append(report("aug3d (crop+flip+jitter)",
                       timeit(jax.jit(aug), jax.random.key(1), vols, msks, steps=steps),
                       step_flops(aug, jax.random.key(1), vols, msks)))

    print("\nJSON:", json.dumps(rows))


if __name__ == "__main__":
    main()
