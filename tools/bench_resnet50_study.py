"""ResNet-50 MFU decomposition study (VERDICT r2 next #3).

Measures, on the real TPU chip:
  1. the full BYOL train step at batch 512 / 1024 (+remat),
  2. isolated fwd and fwd+bwd of the online encoder,
  3. a per-stage forward/backward decomposition (stem, stage1..4),
  4. the achieved TF/s of the exact matmul shapes the bottleneck 1x1 convs
     lower to, vs the same shapes padded to the 128-lane/sublane MXU tile —
     isolating how much of the MFU gap is the C=64 channel geometry vs
     anything this repo controls.

Timing uses a host scalar fetch as the fence (jax.block_until_ready returns
early on the axon remote platform — see bench.py:179-181).

Usage: python tools/bench_resnet50_study.py [--quick]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

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
    print(f"{name:55s} {ms:8.2f} ms  {flops/1e9:9.1f} GF  "
          f"{tf:6.1f} TF/s ({100*tf/PEAK_TF:4.1f}%)")
    return {"name": name, "ms": ms, "gflops": flops / 1e9, "tflops_s": tf,
            "pct_peak": 100 * tf / PEAK_TF}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timing steps")
    ap.add_argument("--skip_full", action="store_true", help="skip full train-step timings")
    args = ap.parse_args()
    steps = 5 if args.quick else 10

    from medical_image_segmentation_tpu.train import BYOLTask

    rows = []

    # ---- 1. full train step ----------------------------------------------
    if not args.skip_full:
        for batch, remat in ((512, False), (1024, True)):
            task = BYOLTask(arch="resnet50", in_channels=1, learning_rate=1.0,
                            warmup_epochs=0, max_epochs=100, total_steps=1000,
                            steps_per_epoch=10, remat=remat)
            state = task.init(jax.random.key(0), (batch, 112, 112, 1))
            v = jnp.asarray(np.random.default_rng(0).normal(size=(batch, 112, 112, 1)),
                            jnp.bfloat16)

            @partial(jax.jit, donate_argnums=0)
            def step(state, v1, v2):
                return task.train_step(state, v1, v2, None)

            # keep state donation sane: loop manually
            for _ in range(2):
                state, m = step(state, v, v)
            fence(m)
            t0 = time.perf_counter()
            n = steps
            for _ in range(n):
                state, m = step(state, v, v)
            fence(m)
            ms = (time.perf_counter() - t0) / n * 1000.0
            fl = 0.0
            try:
                an = step.lower(state, v, v).compile().cost_analysis()
                if isinstance(an, list):
                    an = an[0]
                fl = float(an.get("flops", 0.0))
            except Exception:
                pass
            rows.append(report(
                f"train step b{batch}{'+remat' if remat else ''} (2x{batch} views)", ms, fl))
            del state, step, task

    # ---- 2/3. encoder fwd / fwd+bwd and per-stage decomposition ----------
    from medical_image_segmentation_tpu.models.resnet import make_resnet

    model = make_resnet("resnet50", in_channels=1)
    views = 2048
    x = jnp.asarray(np.random.default_rng(1).normal(size=(views, 112, 112, 1)), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x[:2], train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd(params, batch_stats, x):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats}, x,
                             train=True, mutable=["batch_stats"])
        return out

    @jax.jit
    def fwd_bwd(params, batch_stats, x):
        def loss_fn(p):
            out, _ = model.apply({"params": p, "batch_stats": batch_stats}, x,
                                 train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss_fn)(params)

    rows.append(report(f"resnet50 fwd ({views} views)", timeit(fwd, params, batch_stats, x, steps=steps),
                       step_flops(lambda p, b, xx: fwd(p, b, xx), params, batch_stats, x)))
    rows.append(report(f"resnet50 fwd+bwd ({views} views)",
                       timeit(fwd_bwd, params, batch_stats, x, steps=steps),
                       step_flops(lambda p, b, xx: fwd_bwd(p, b, xx), params, batch_stats, x)))

    # per-stage decomposition: standalone stage modules with the exact
    # resnet50 block geometry, timed fwd and fwd+bwd on activations of the
    # shapes the full net produces at 112^2 input (56 after stem conv,
    # 28/28/14/7 entering stages 1-4).
    import flax.linen as nn

    from medical_image_segmentation_tpu.models.resnet import Bottleneck

    class Stage(nn.Module):
        filters: int
        n_blocks: int
        strides: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.n_blocks):
                x = Bottleneck(
                    filters=self.filters,
                    strides=self.strides if i == 0 else 1,
                    conv=partial(nn.Conv, use_bias=False, dtype=jnp.bfloat16,
                                 param_dtype=jnp.float32),
                    norm=partial(nn.BatchNorm, use_running_average=False,
                                 momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16,
                                 param_dtype=jnp.float32),
                )(x)
            return x

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    segs = [
        ("stem 112->28", Stem(), (views, 112, 112, 1)),
        ("stage1 3xBneck(64) @28", Stage(64, 3, 1), (views, 28, 28, 64)),
        ("stage2 4xBneck(128) @28->14", Stage(128, 4, 2), (views, 28, 28, 256)),
        ("stage3 6xBneck(256) @14->7", Stage(256, 6, 2), (views, 14, 14, 512)),
        ("stage4 3xBneck(512) @7->4", Stage(512, 3, 2), (views, 7, 7, 1024)),
    ]
    for name, mod, shape in segs:
        xx = jnp.asarray(np.random.default_rng(4).normal(size=shape), jnp.bfloat16)
        vs = mod.init(jax.random.key(0), xx[:2])
        p, bs = vs["params"], vs.get("batch_stats", {})

        @jax.jit
        def seg_fwd(p, bs, xx, mod=mod):
            out, _ = mod.apply({"params": p, "batch_stats": bs}, xx,
                               mutable=["batch_stats"])
            return out

        @jax.jit
        def seg_fwd_bwd(p, bs, xx, mod=mod):
            def loss_fn(pp):
                out, _ = mod.apply({"params": pp, "batch_stats": bs}, xx,
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(loss_fn)(p)

        rows.append(report(f"{name} fwd", timeit(seg_fwd, p, bs, xx, steps=steps),
                           step_flops(lambda a, b, c, f=seg_fwd: f(a, b, c), p, bs, xx)))
        rows.append(report(f"{name} fwd+bwd", timeit(seg_fwd_bwd, p, bs, xx, steps=steps),
                           step_flops(lambda a, b, c, f=seg_fwd_bwd: f(a, b, c), p, bs, xx)))
        del xx, p, bs

    # ---- 4. 1x1-conv matmul geometry -------------------------------------
    # Bottleneck 1x1 convs at 112^2 input lower to (M, K) @ (K, N):
    shapes = [
        ("stage1 reduce 256->64 @28^2", views * 28 * 28, 256, 64),
        ("stage1 expand 64->256 @28^2", views * 28 * 28, 64, 256),
        ("stage2 reduce 512->128 @14^2", views * 14 * 14, 512, 128),
        ("stage2 expand 128->512 @14^2", views * 14 * 14, 128, 512),
        ("stage3 reduce 1024->256 @7^2", views * 7 * 7, 1024, 256),
        ("stage4 reduce 2048->512 @4^2", views * 4 * 4, 2048, 512),
        ("pad-to-128: 256->128 @28^2", views * 28 * 28, 256, 128),
        ("pad-to-128: 128->128 @28^2", views * 28 * 28, 128, 128),
    ]
    for name, m, k, n in shapes:
        a = jnp.asarray(np.random.default_rng(2).normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(np.random.default_rng(3).normal(size=(k, n)), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        ms = timeit(mm, a, b, steps=steps)
        rows.append(report(f"matmul {name} ({m}x{k}x{n})", ms, 2.0 * m * k * n))
        del a, b

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
