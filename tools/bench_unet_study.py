"""U-Net segmentation MFU decomposition study.

The seg train step (U-Net(resnet18), 224², batch 128 — the reference's
canonical config, reference train_segmentation.py:22,35) got a throughput
number in round 3; this script explains it the way the resnet50/stem studies
did for the SSL config. Measures, on the real TPU chip:

  1. the full seg train step (aug + fwd/bwd + LARS) at batch 128/256,
  2. isolated full fwd and fwd+bwd of the U-Net,
  3. encoder-only vs decoder-only forward at the exact skip shapes,
  4. per-decoder-stage timings (the 5 upsample blocks run at 14²..224² with
     channels 256..16 — arithmetic intensity collapses as resolution grows),
  5. the Dice-loss + sigmoid tail and the 3×3 head conv.

Timing uses a host scalar fetch as the fence (jax.block_until_ready returns
early on the axon remote platform — see bench.py).

Usage: python tools/bench_unet_study.py [--quick] [--image_size 224] [--batch 128]
"""

from __future__ import annotations

import argparse
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
    print(f"{name:58s} {ms:8.2f} ms  {flops/1e9:9.1f} GF  "
          f"{tf:6.1f} TF/s ({100*tf/PEAK_TF:4.1f}%)")
    return {"name": name, "ms": ms, "gflops": flops / 1e9, "tflops_s": tf,
            "pct_peak": 100 * tf / PEAK_TF}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timing steps")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()
    steps = 5 if args.quick else 10
    s = args.image_size

    from medical_image_segmentation_tpu.ops.augment import segmentation_augment
    from medical_image_segmentation_tpu.ops.dice import dice_loss
    from medical_image_segmentation_tpu.train.segmentation_task import SegmentationTask

    rows = []
    rng = np.random.default_rng(0)
    task = SegmentationTask(
        arch="resnet18", n_classes=1, in_channels=1, learning_rate=1.0,
        warmup_epochs=10, max_epochs=50, steps_per_epoch=100,
    )
    state = task.init(jax.random.key(0), (2, s, s, 1))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- 1. full train step (matches bench.py --task seg) ------------------
    if not args.skip_full:
        for batch in (args.batch, 2 * args.batch):
            imgs = jnp.asarray(rng.integers(0, 256, size=(batch, s, s, 1)), jnp.uint8)
            msks = jnp.asarray((rng.random((batch, s, s, 1)) < 0.2), jnp.uint8)
            key = jax.random.key(1)

            @jax.jit
            def step(st, im, mk, k):
                x, y = segmentation_augment(k, im, mk, out_size=(s, s),
                                            mean=(0.2089,), std=(0.2109,),
                                            train=True, dtype=jnp.bfloat16)
                return task.train_step(st, x, y)

            st = state
            ms = None
            for _ in range(2):
                st, m = step(st, imgs, msks, key)
            fence(m["train/loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                st, m = step(st, imgs, msks, key)
            fence(m["train/loss"])
            ms = (time.perf_counter() - t0) / steps * 1000.0
            fl = step_flops(lambda a, b, c, d: step(a, b, c, d), state, imgs, msks, key)
            r = report(f"train step b{batch} (aug+fwd/bwd+LARS)", ms, fl)
            r["img_per_s"] = batch / (ms / 1000.0)
            print(f"{'':58s} -> {r['img_per_s']:.0f} img/s")
            rows.append(r)

    # ---- 2/3. isolated forward / fwd+bwd, encoder vs decoder ---------------
    batch = args.batch
    x = jnp.asarray(rng.standard_normal((batch, s, s, 1)), jnp.bfloat16)
    y = jnp.asarray((rng.random((batch, s, s, 1)) < 0.2), jnp.bfloat16)

    def full_fwd(v, xx):
        return task.model.apply(v, xx, train=False)

    rows.append(report("U-Net fwd (eval mode)", timeit(jax.jit(full_fwd), variables, x, steps=steps),
                       step_flops(full_fwd, variables, x)))

    def loss_fn(p, xx, yy):
        logits, _ = task.model.apply(
            {"params": p, "batch_stats": state.batch_stats}, xx, train=True,
            mutable=["batch_stats"])
        return dice_loss(logits, yy)

    g = jax.jit(jax.grad(loss_fn))
    rows.append(report("U-Net fwd+bwd (dice grad)", timeit(g, state.params, x, y, steps=steps),
                       step_flops(lambda p, a, b: jax.grad(loss_fn)(p, a, b), state.params, x, y)))

    # encoder-only forward: build the same backbone UNet instantiates
    # (models/unet.py:81-92) and reuse the trained encoder subtree
    from medical_image_segmentation_tpu.models.resnet import RESNET_CONFIGS, ResNet

    block_cls, stages, expansion = RESNET_CONFIGS["resnet18"]
    enc = ResNet(block_cls=block_cls, stage_sizes=stages, expansion=expansion,
                 in_channels=1, low_res=False, dtype=jnp.bfloat16)
    enc_vars = {"params": state.params["encoder"],
                "batch_stats": state.batch_stats["encoder"]}

    def enc_fwd(v, xx):
        return enc.apply(v, xx, train=False, return_pyramid=True)

    rows.append(report("encoder fwd (pyramid)", timeit(jax.jit(enc_fwd), enc_vars, x, steps=steps),
                       step_flops(enc_fwd, enc_vars, x)))
    feats = jax.jit(enc_fwd)(enc_vars, x)
    print(f"skip shapes: {[tuple(f.shape) for f in feats]}")

    # ---- 4. per-decoder-stage costs at the exact shapes ---------------------
    # decoder stages: nearest-up 2x -> concat skip -> 2x (conv3x3+BN+ReLU)
    from medical_image_segmentation_tpu.models.unet import DecoderBlock

    # shapes for resnet18 @ s=224: bottleneck 512@7², skips 256@14², 128@28²,
    # 64@56², 64@112², input-level None@224²
    chans = [(512, 256, 256), (256, 128, 128), (128, 64, 64),
             (64, 64, 32), (32, 0, 16)]
    res = s // 32
    for i, (cin, cskip, cout) in enumerate(chans):
        xb = jnp.asarray(rng.standard_normal((batch, res, res, cin)), jnp.bfloat16)
        skip = (jnp.asarray(rng.standard_normal((batch, res * 2, res * 2, cskip)), jnp.bfloat16)
                if cskip else None)
        blk = DecoderBlock(filters=cout)
        v = blk.init(jax.random.key(i), xb, skip, train=False)

        def blk_fwd(vv, a, b):
            return blk.apply(vv, a, b, train=False)

        ms = timeit(jax.jit(blk_fwd), v, xb, skip, steps=steps)
        fl = step_flops(blk_fwd, v, xb, skip)
        rows.append(report(
            f"decoder stage {i} ({res}²x{cin} -> {2*res}²x{cout}"
            f"{' +skip' if cskip else ''})", ms, fl))
        res *= 2

    # ---- 5. head + dice tail ------------------------------------------------
    logits = jnp.asarray(rng.standard_normal((batch, s, s, 1)), jnp.float32)

    def tail(lg, yy):
        return dice_loss(lg, yy)

    rows.append(report("dice loss tail (sigmoid+reductions)",
                       timeit(jax.jit(tail), logits, y, steps=steps),
                       step_flops(tail, logits, y)))

    print("\nJSON:", end=" ")
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
