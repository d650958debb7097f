"""End-to-end benchmark: on-device two-view augmentation + BYOL train step.

Workload = the reference's canonical SSL pretrain config
(`scripts/train/train_ssl_pl_test`: BYOL resnet18, 112^2 crops) fed from
256^2 stored uint8 grayscale images (BASELINE.json north-star shape).

Two modes:
- default: device-resident batch (isolates aug+train — the device ceiling);
- ``--store PATH`` (or ``--store auto`` to synthesize one): feeds a real MIS
  store through the C++ decode loader + prefetch thread + ``device_put``
  double-buffering — the full input pipeline in the loop (the reference's
  FFCV os_cache path, `lightning_module.py:141-151`).

Prints ONE JSON line:
  {"metric": "aug_train_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N / 5000.0, "mfu": ...}
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

# bf16 peak FLOP/s per chip by device kind (public TPU specs)
_PEAK_FLOPS = {
    "tpu v4": 275e12,
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v5": 459e12,
    "tpu v5p": 459e12,
    "tpu v6 lite": 918e12,
    "tpu v6e": 918e12,
}


def _peak_flops_per_chip() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in sorted(_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if k in kind:
            return v
    return None


def _step_flops(jitted, *args) -> float | None:
    """FLOPs of one compiled step from XLA's cost analysis (fwd+bwd+update)."""
    f, _ = _step_cost(jitted, *args)
    return f


def _step_cost(jitted, *args):
    """(flops, memory_report) of one compiled step — one AOT lower+compile
    feeds both XLA's cost analysis and its static memory plan (core/hbm.py).
    Call AFTER timing: AOT-compiling a jit wrapper perturbs its subsequent
    dispatch on the axon remote platform (see the note in main())."""
    from medical_image_segmentation_tpu.core.hbm import device_hbm_capacity, memory_analysis_of

    try:
        compiled = jitted.lower(*args).compile()
    except Exception:
        return None, None
    flops = None
    try:
        an = compiled.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        f = float(an.get("flops", 0.0))
        flops = f if f > 0 else None
    except Exception:
        pass
    mem = memory_analysis_of(compiled)
    if mem is not None:
        cap = device_hbm_capacity()
        mem["capacity"] = cap
        mem["oversubscribed"] = bool(cap is not None and mem["projected_peak"] > cap)
    return flops, mem


def _hbm_json_fields(mem) -> dict:
    """JSON-line fields for the projected-HBM report (None-safe)."""
    if not mem:
        return {}
    out = {"projected_hbm_gb": round(mem["projected_peak"] / 1024**3, 3)}
    if mem.get("capacity"):
        out["hbm_capacity_gb"] = round(mem["capacity"] / 1024**3, 3)
        out["hbm_oversubscribed"] = mem["oversubscribed"]
    return out


def _hbm_check_exit(step, args_tuple, task: str, extra: dict | None = None) -> int:
    """--hbm_check: AOT-compile the step, print the projected-HBM diagnosis,
    emit one JSON line, and exit WITHOUT running it — predicts the seg3d
    HBM cliff (284 -> 34.9 vol/s between batch 96 and 112, BASELINE.md)
    in one compile instead of a silently slow run."""
    from medical_image_segmentation_tpu.core.hbm import format_hbm_report

    flops, mem = _step_cost(step, *args_tuple)
    if mem is None:
        print("hbm_check: backend exposes no memory analysis", file=sys.stderr)
        return 4
    print(format_hbm_report(mem, label=f"{task} step"), file=sys.stderr)
    if mem.get("oversubscribed"):
        print(f"WARNING: {task} step projected to OVERSUBSCRIBE HBM — expect "
              "a ~8x slowdown (measured: seg3d b112 vs b96); lower "
              "--batch_size, use --remat, or shard wider", file=sys.stderr)
    out = {"metric": f"{task}_projected_hbm_gb",
           "value": round(mem["projected_peak"] / 1024**3, 3),
           "unit": "GiB", "vs_baseline": None, "task": task,
           "hbm_check": True, **_hbm_json_fields(mem)}
    if flops:
        out["step_gflops"] = round(flops / 1e9, 1)
    if extra:
        out.update(extra)
    print(json.dumps(out))
    return 2 if mem.get("oversubscribed") else 0


def _dispersion_fields(probe_lat, loop_ms_mean: float, label: str) -> dict:
    """Contention tripwire (VERDICT r4 weak #1): per-step latency percentiles
    from a short FENCED probe run after the throughput loop, compared against
    the loop's unfenced mean. A contended chip (another process holding the
    TPU — the r04 regression: 100.9 ms/step vs r03's stable 77.6) shows up as
    p99/p50 dispersion inside the probe and/or a loop mean far above the
    probe's p50. Prints a LOUD warning so a dirty capture can't pass silently;
    the fields land in the JSON line either way."""
    lat = np.asarray(probe_lat, dtype=np.float64) * 1e3  # ms
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    fields = {"step_ms_p50": round(p50, 2), "step_ms_p99": round(p99, 2),
              "step_ms_loop_mean": round(loop_ms_mean, 2)}
    contended = []
    if p50 > 0 and p99 / p50 > 1.4:
        contended.append(f"probe p99/p50 = {p99 / p50:.2f} (> 1.4)")
    # the fenced probe pays one host round-trip per step, so its p50 sits
    # slightly ABOVE the pipelined loop mean on a quiet chip; the loop mean
    # exceeding the fenced p50 by >20% means something else ran DURING the loop
    if p50 > 0 and loop_ms_mean > 1.2 * p50:
        contended.append(
            f"loop mean {loop_ms_mean:.1f} ms vs fenced p50 {p50:.1f} ms")
    if contended:
        fields["contention_suspected"] = True
        print(f"WARNING: {label} step-latency dispersion suggests a CONTENDED "
              f"chip ({'; '.join(contended)}) — another process may hold the "
              "TPU; this measurement is NOT a clean capture", file=sys.stderr)
    return fields


def _make_auto_store(path: str, n: int, size: int, codec_name: str) -> None:
    from medical_image_segmentation_tpu.data.store import CODEC_JPEG, CODEC_RAW, StoreWriter

    codec = CODEC_JPEG if codec_name == "jpeg" else CODEC_RAW
    rng = np.random.default_rng(0)
    with StoreWriter(path, channels=1) as w:
        for _ in range(n):
            w.add(rng.integers(0, 256, size=(size, size, 1)).astype(np.uint8), codec=codec)


def _seg_bench(args):
    """U-Net segmentation train-step throughput (the reference's canonical
    seg config: U-Net(resnet18), 224², batch 512 over 4 GPUs → 128/chip,
    `train_segmentation.py:22,35`). Device-resident uint8 batch + the same
    device-side paired augmentation the trainer runs."""
    import jax
    import jax.numpy as jnp

    from medical_image_segmentation_tpu.ops.augment import segmentation_augment
    from medical_image_segmentation_tpu.parallel import make_mesh, replicated, shard_batch
    from medical_image_segmentation_tpu.train.segmentation_task import SegmentationTask

    if args.store is not None or args.precrop:
        raise SystemExit("--task seg benchmarks device-resident batches "
                         "(paired stores are exercised by the trainer tests)")
    n_chips = len(jax.devices())
    if args.batch_size % n_chips:
        raise SystemExit(f"--batch_size {args.batch_size} must divide {n_chips} devices")
    size = (args.image_size, args.image_size)
    task = SegmentationTask(
        arch=args.arch, n_classes=1, in_channels=1, learning_rate=1.0,
        warmup_epochs=10, max_epochs=50, steps_per_epoch=100, remat=args.remat,
    )
    mesh = make_mesh()
    state = task.init(jax.random.key(0), (2, args.image_size, args.image_size, 1))
    state = jax.device_put(state, replicated(mesh))

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=0)
    def step(state, imgs, msks, key):
        x, y = segmentation_augment(key, imgs, msks, out_size=size,
                                    mean=(0.2089,), std=(0.2109,), train=True,
                                    dtype=jnp.bfloat16)
        return task.train_step(state, x, y)

    rng = np.random.default_rng(0)
    imgs = shard_batch(mesh, rng.integers(
        0, 256, size=(args.batch_size, args.image_size, args.image_size, 1)).astype(np.uint8))
    msks = shard_batch(mesh, (rng.random(
        (args.batch_size, args.image_size, args.image_size, 1)) < 0.2).astype(np.uint8))
    key = jax.random.key(1)
    if args.hbm_check:
        return _hbm_check_exit(step, (state, imgs, msks, key), "seg",
                               {"batch_size": args.batch_size,
                                "image_size": args.image_size})
    for i in range(args.warmup):
        state, metrics = step(state, imgs, msks, jax.random.fold_in(key, i))
    float(metrics["train/loss"])  # host fence (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, imgs, msks, jax.random.fold_in(key, 100 + i))
    final_loss = float(metrics["train/loss"])
    dt = time.perf_counter() - t0
    imgs_per_sec = args.batch_size * args.steps / dt
    per_chip = imgs_per_sec / n_chips
    probe_lat = []
    for i in range(min(args.steps, 12)):
        t0 = time.perf_counter()
        state, metrics = step(state, imgs, msks, jax.random.fold_in(key, 500 + i))
        float(metrics["train/loss"])
        probe_lat.append(time.perf_counter() - t0)
    disp = _dispersion_fields(probe_lat, dt / args.steps * 1e3, "seg")
    flops, mem = _step_cost(step, state, imgs, msks, key)
    peak = _peak_flops_per_chip()
    mfu = round(flops * args.steps / dt / (peak * n_chips), 4) if flops and peak else None
    print(f"[seg] loss={final_loss:.4f} total={imgs_per_sec:.0f} img/s "
          f"({dt/args.steps*1e3:.1f} ms/step)", file=sys.stderr)
    print(json.dumps({
        "metric": "seg_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 3),
        "task": "seg", "mfu": mfu,
        "image_size": args.image_size,
        **disp,
        **_hbm_json_fields(mem),
    }))
    return 0


def _seg3d_bench(args):
    """3D U-Net volumetric train-step throughput (`train_segmentation3d.py`
    defaults: stored (64,96,96) volumes → random (32,64,64) crops). The
    reference has no 3D path; vs_baseline counts each volume as crop-depth
    equivalent 2D slices against the 5k img/s/chip north star."""
    import jax
    import jax.numpy as jnp

    from medical_image_segmentation_tpu.ops.augment3d import segmentation_augment_3d
    from medical_image_segmentation_tpu.parallel import make_mesh, replicated, shard_batch
    from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask

    if args.store is not None or args.precrop:
        raise SystemExit("--task seg3d benchmarks device-resident batches")
    n_chips = len(jax.devices())
    if args.batch_size % n_chips:
        raise SystemExit(f"--batch_size {args.batch_size} must divide {n_chips} devices")
    vol = tuple(args.volume_size)
    crop = tuple(args.crop3d)
    task = Segmentation3DTask(
        features=tuple(args.features3d),
        learning_rate=1.0, warmup_epochs=10, max_epochs=50, steps_per_epoch=100,
        remat=args.remat,
    )
    mesh = make_mesh()
    state = task.init(jax.random.key(0), (1, *crop, 1))
    state = jax.device_put(state, replicated(mesh))

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=0)
    def step(state, vols, msks, key):
        x, y = segmentation_augment_3d(key, vols, msks, out_size=crop, train=True,
                                       dtype=jnp.bfloat16)
        return task.train_step(state, x, y)

    rng = np.random.default_rng(0)
    vols = shard_batch(mesh, rng.random((args.batch_size, *vol, 1)).astype(np.float32))
    msks = shard_batch(mesh, (rng.random((args.batch_size, *vol, 1)) < 0.2).astype(np.float32))
    key = jax.random.key(1)
    if args.hbm_check:
        return _hbm_check_exit(step, (state, vols, msks, key), "seg3d",
                               {"batch_size": args.batch_size,
                                "features": list(args.features3d)})
    for i in range(args.warmup):
        state, metrics = step(state, vols, msks, jax.random.fold_in(key, i))
    float(metrics["train/loss"])  # host fence (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, vols, msks, jax.random.fold_in(key, 100 + i))
    final_loss = float(metrics["train/loss"])
    dt = time.perf_counter() - t0
    vols_per_sec = args.batch_size * args.steps / dt
    per_chip = vols_per_sec / n_chips
    probe_lat = []
    for i in range(min(args.steps, 12)):
        t0 = time.perf_counter()
        state, metrics = step(state, vols, msks, jax.random.fold_in(key, 500 + i))
        float(metrics["train/loss"])
        probe_lat.append(time.perf_counter() - t0)
    disp = _dispersion_fields(probe_lat, dt / args.steps * 1e3, "seg3d")
    flops, mem = _step_cost(step, state, vols, msks, key)
    peak = _peak_flops_per_chip()
    mfu = round(flops * args.steps / dt / (peak * n_chips), 4) if flops and peak else None
    print(f"[seg3d] loss={final_loss:.4f} total={vols_per_sec:.1f} vol/s "
          f"({dt/args.steps*1e3:.1f} ms/step, crop {crop})", file=sys.stderr)
    if mem and mem.get("oversubscribed"):
        print("WARNING: this config's projected HBM exceeds device capacity — "
              "the measured rate sits past the spill cliff (BASELINE.md seg3d "
              "table); use --hbm_check to predict this without running",
              file=sys.stderr)
    print(json.dumps({
        "metric": "seg3d_train_volumes_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(per_chip * crop[0] / 5000.0, 3),
        "task": "seg3d", "mfu": mfu, "features": list(args.features3d),
        **disp,
        **_hbm_json_fields(mem),
    }))
    return 0


def _predict_bench(args):
    """Serving-path inference throughput: the SAME function `train/predict.py`
    jits and `mis-export` serializes (`serve.make_predict_fn`: uint8 in →
    normalize → U-Net eval forward → sigmoid-threshold mask out), batched,
    bf16. Reports img/s/chip plus per-batch latency percentiles — the
    deployment-relevant numbers the reference cannot produce (its only
    predict path is trainer.predict grid dumps, train_segmentation.py:82-93).
    The per-batch fence fetches ONE element (device compute is timed; the
    full-mask D2H copy is a host/NIC property, not an inference cost — over
    the axon tunnel it would dominate by 10×)."""
    import jax
    import jax.numpy as jnp

    from medical_image_segmentation_tpu.parallel import make_mesh, replicated, shard_batch
    from medical_image_segmentation_tpu.serve import make_predict_fn
    from medical_image_segmentation_tpu.train.segmentation_task import SegmentationTask

    if args.store is not None or args.precrop:
        raise SystemExit("--task predict benchmarks device-resident batches")
    n_chips = len(jax.devices())
    if args.batch_size % n_chips:
        raise SystemExit(f"--batch_size {args.batch_size} must divide {n_chips} devices")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    task = SegmentationTask(
        arch=args.arch, n_classes=1, in_channels=1, learning_rate=1.0,
        warmup_epochs=0, max_epochs=1, steps_per_epoch=1, dtype=dtype,
    )
    mesh = make_mesh()
    state = task.init(jax.random.key(0), (2, args.image_size, args.image_size, 1))
    state = jax.device_put(state, replicated(mesh))
    predict = jax.jit(make_predict_fn(
        task, {"params": state.params, "batch_stats": state.batch_stats},
        0.2089, 0.2109, fp32=args.fp32))  # liver registry stats

    def fence(m):  # one-element fetch (axon: block_until_ready lies)
        return int(jnp.ravel(m)[0])

    rng = np.random.default_rng(0)
    imgs = shard_batch(mesh, rng.integers(
        0, 256, size=(args.batch_size, args.image_size, args.image_size, 1)).astype(np.uint8))
    if args.hbm_check:
        return _hbm_check_exit(predict, (imgs,), "predict",
                               {"batch_size": args.batch_size,
                                "image_size": args.image_size})
    masks = predict(imgs)  # compile
    for _ in range(args.warmup):
        masks = predict(imgs)
    fence(masks)
    lat = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        fence(predict(imgs))  # fence every batch: true latency
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    dt = float(lat.sum())
    per_chip = args.batch_size * args.steps / dt / n_chips
    out_extra = {}
    if args.exported:
        # Also time the AOT serving-artifact path (`mis-export` → `.misx`):
        # the same weights exported at this batch bucket, the bucket function
        # called directly (what `ServingPredictor.__call__` dispatches to;
        # its numpy D2H copy is excluded for the same tunnel reason as the
        # jit path's one-element fence above). Exported artifacts are lowered
        # without shardings — single-chip by design (serve.py docstring).
        from medical_image_segmentation_tpu.serve import export_predictor

        ex_b = args.batch_size // n_chips if n_chips > 1 else args.batch_size
        exported = export_predictor(
            task, state, args.image_size, 0.2089, 0.2109,
            batch_sizes=(ex_b,), fp32=args.fp32)[ex_b]
        ex_imgs = jnp.asarray(rng.integers(
            0, 256, size=(ex_b, args.image_size, args.image_size, 1)).astype(np.uint8))
        ex_call = exported.call
        fence(ex_call(ex_imgs))  # compile (XLA consumes embedded StableHLO)
        for _ in range(args.warmup):
            ex_call(ex_imgs)
        fence(ex_call(ex_imgs))
        ex_lat = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            fence(ex_call(ex_imgs))
            ex_lat.append(time.perf_counter() - t0)
        ex_lat = np.array(ex_lat)
        out_extra = {
            "exported_images_per_sec_per_chip": round(ex_b * args.steps / float(ex_lat.sum()), 1),
            "exported_batch": ex_b,
            "exported_latency_ms_p50": round(float(np.percentile(ex_lat, 50)) * 1e3, 2),
            "exported_latency_ms_p99": round(float(np.percentile(ex_lat, 99)) * 1e3, 2),
        }
        print(f"[predict --exported] {out_extra['exported_images_per_sec_per_chip']:.0f} img/s "
              f"(batch {ex_b}, p50 {out_extra['exported_latency_ms_p50']:.1f} ms, "
              f"p99 {out_extra['exported_latency_ms_p99']:.1f} ms)", file=sys.stderr)
    flops = _step_flops(predict, imgs)
    peak = _peak_flops_per_chip()
    mfu = round(flops * args.steps / dt / (peak * n_chips), 4) if flops and peak else None
    print(f"[predict] total={per_chip*n_chips:.0f} img/s "
          f"(batch {args.batch_size} @ {args.image_size}², "
          f"p50 {np.percentile(lat,50)*1e3:.1f} ms, p99 {np.percentile(lat,99)*1e3:.1f} ms)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "predict_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 3),
        "task": "predict", "mfu": mfu,
        "image_size": args.image_size, "fp32": args.fp32,
        "batch_latency_ms_p50": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "batch_latency_ms_p99": round(float(np.percentile(lat, 99)) * 1e3, 2),
        **out_extra,
    }))
    return 0


def _predict3d_bench(args):
    """Volumetric serving-path throughput: whole-volume masks via overlapped
    sliding-window blending (`eval/sliding_window.py::sliding_window_predict_3d`
    — the function `mis-predict3d` deploys). Times END-TO-END per-volume
    latency: window extraction + batched 3D U-Net forwards + Hann scatter-
    blend, all on device; reports vol/s, slice-equivalent img/s, and p50/p99
    per-volume latency. The reference has no 3D path at all."""
    import jax
    import jax.numpy as jnp

    from medical_image_segmentation_tpu.eval.sliding_window import (
        make_fused_predictor_3d,
        sliding_window_predict_3d,
    )
    from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask

    if args.store is not None or args.precrop:
        raise SystemExit("--task predict3d benchmarks device-resident volumes")
    if args.hbm_check:
        raise SystemExit("--hbm_check is for train steps (seg/seg3d) and "
                         "predict; sliding-window inference is many small "
                         "programs, not one")
    vol = tuple(args.volume_size)
    window = tuple(args.crop3d)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    task = Segmentation3DTask(features=tuple(args.features3d),
                              learning_rate=1.0, warmup_epochs=0, max_epochs=1,
                              steps_per_epoch=1, dtype=dtype)
    state = task.init(jax.random.key(0), (1, *window, 1))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def window_fn(windows):
        return task.model.apply(variables, windows, train=False)

    rng = np.random.default_rng(0)
    volume = jnp.asarray(rng.random((*vol, 1)).astype(np.float32))

    if args.sw_loop:
        def run():
            return sliding_window_predict_3d(
                window_fn, volume, window=window, batch_windows=args.batch_size)
    else:
        # serving default: ONE jitted program per volume (extract + forward +
        # blend fused into a lax.scan; coords device-resident at build time)
        run_fused = make_fused_predictor_3d(
            window_fn, volume.shape, window=window, batch_windows=args.batch_size)

        def run():
            return run_fused(volume)

    def fence(m):
        return float(jnp.ravel(m)[0])

    fence(run())  # compile (extract + forward + blend programs)
    for _ in range(args.warmup):
        run()
    fence(run())
    lat = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        fence(run())
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    dt = float(lat.sum())
    vols_per_sec = args.steps / dt
    flops = _step_flops(window_fn, jnp.zeros((args.batch_size, *window, 1), jnp.float32))
    # windows per volume (right-aligned half-overlap tiling, padded to batch)
    import math
    n_win = 1
    for full, w in zip(vol, window):
        s = max(1, w // 2)
        n_win *= 1 if full <= w else len(range(0, full - w + 1, s)) + (
            0 if (full - w) % s == 0 else 1)
    n_batches = math.ceil(n_win / args.batch_size)
    peak = _peak_flops_per_chip()
    mfu = (round(flops * n_batches * args.steps / dt / peak, 4)
           if flops and peak else None)
    print(f"[predict3d] {vols_per_sec:.2f} vol/s (volume {vol}, window {window}, "
          f"{n_win} windows/{n_batches} batches, p50 {np.percentile(lat,50)*1e3:.0f} ms, "
          f"p99 {np.percentile(lat,99)*1e3:.0f} ms)", file=sys.stderr)
    print(json.dumps({
        "metric": "predict3d_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 2),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vols_per_sec * vol[0] / 5000.0, 4),
        "task": "predict3d", "mfu": mfu,
        "sw_mode": "loop" if args.sw_loop else "fused",
        "volume": list(vol), "window": list(window),
        "windows_per_volume": n_win,
        "volume_latency_ms_p50": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "volume_latency_ms_p99": round(float(np.percentile(lat, 99)) * 1e3, 2),
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=None,
                    help="default: 1024 (byol), 128 (seg), 4 (seg3d), "
                         "256 (predict), 8 windows (predict3d)")
    ap.add_argument("--image_size", type=int, default=None,
                    help="default: 256 stored (byol), 224 (seg/predict — the "
                         "reference's canonical seg resolution, "
                         "train_segmentation.py:35)")
    ap.add_argument("--crop_size", type=int, default=112)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--fp32", action="store_true",
                    help="predict: f32 activations instead of bf16")
    ap.add_argument("--store", default=None,
                    help="feed from a real MIS store through the C++ loader "
                         "('auto' synthesizes one); default: device-resident batch")
    ap.add_argument("--store_codec", default="jpeg", choices=["jpeg", "raw"],
                    help="codec for --store auto")
    ap.add_argument("--store_images", type=int, default=4096, help="size of --store auto")
    ap.add_argument("--num_threads", type=int, default=0,
                    help="loader decode threads (0 = host cpu count)")
    ap.add_argument("--precrop", action="store_true",
                    help="with --store: host-side RandomResizedCrop in the C++ "
                         "workers (ships 2x crop^2 views instead of full images "
                         "— ~2.6x fewer H2D bytes at 256->112; the elementwise "
                         "augment tail still runs on device)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint residual blocks (fit bigger archs/batches)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the timed steps to DIR")
    ap.add_argument("--task", default="byol",
                    choices=["byol", "seg", "seg3d", "predict", "predict3d"],
                    help="seg: U-Net(arch) segmentation train step with "
                         "device-side paired augmentation (canonical config "
                         "= the defaults: batch 128 @ 224²); "
                         "seg3d: volumetric 3D U-Net train step (--volume_size/"
                         "--crop3d, e.g. --task seg3d --batch_size 4); "
                         "predict: serving-path U-Net inference (img/s/chip + "
                         "per-batch latency percentiles; --exported also times "
                         "the .misx artifact path); "
                         "predict3d: whole-volume sliding-window serving "
                         "(vol/s + per-volume latency); "
                         "device-resident batches only")
    ap.add_argument("--sw_loop", action="store_true",
                    help="predict3d: use the multi-program loop variant of "
                         "sliding-window inference instead of the fused "
                         "one-dispatch program (A/B lever for the serving row)")
    ap.add_argument("--exported", action="store_true",
                    help="predict: additionally export a .misx-equivalent "
                         "artifact (jax.export) and time its bucket function")
    ap.add_argument("--hbm_check", action="store_true",
                    help="seg/seg3d/predict: AOT-compile the step, print "
                         "projected peak HBM vs device capacity, and exit "
                         "WITHOUT running (exit 2 if oversubscribed) — "
                         "predicts the seg3d spill cliff in one compile")
    ap.add_argument("--volume_size", type=int, nargs=3, default=(64, 96, 96),
                    metavar=("D", "H", "W"), help="seg3d: stored volume shape")
    ap.add_argument("--crop3d", type=int, nargs=3, default=(32, 64, 64),
                    metavar=("D", "H", "W"), help="seg3d: random train crop")
    ap.add_argument("--features3d", type=int, nargs="+", default=(32, 64, 128, 256),
                    help="seg3d: UNet3D stage widths (matches "
                         "train_segmentation3d --features); wider stages map "
                         "better onto the 128-lane MXU — see the geometry "
                         "study in BASELINE.md")
    args = ap.parse_args()
    if args.batch_size is None:
        args.batch_size = {"byol": 1024, "seg": 128, "seg3d": 4,
                           "predict": 256, "predict3d": 8}[args.task]
    if args.image_size is None:
        # byol stores 256² (north-star shape); seg/predict run the reference's
        # canonical 224² (train_segmentation.py:35) — the round-3 "30%
        # regression" was this bench defaulting to 256² for seg (a (256/224)²
        # = 1.31x FLOP mismatch), not a code regression; see BASELINE.md
        args.image_size = {"byol": 256, "seg": 224, "seg3d": 256,
                           "predict": 224, "predict3d": 256}[args.task]

    # Fail FAST if the remote-TPU tunnel is down: the axon plugin's first
    # jax.devices() call otherwise blocks indefinitely (shared guard with
    # __graft_entry__).
    from medical_image_segmentation_tpu.core.device_probe import probe_device_count

    n_dev, probe_err = probe_device_count(timeout_s=120.0)
    if not n_dev:
        print(f"bench: {probe_err} (TPU tunnel down?) — aborting", file=sys.stderr)
        return 3

    if args.task == "seg":
        return _seg_bench(args)
    if args.task == "seg3d":
        return _seg3d_bench(args)
    if args.task == "predict":
        return _predict_bench(args)
    if args.task == "predict3d":
        return _predict3d_bench(args)
    if args.hbm_check:
        raise SystemExit("--hbm_check supports tasks seg/seg3d/predict")

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
        remat=args.remat,
    )
    from medical_image_segmentation_tpu.parallel import make_mesh, replicated, shard_batch

    mesh = make_mesh()
    state = task.init(jax.random.key(0), (2, args.crop_size, args.crop_size, 1))
    state = jax.device_put(state, replicated(mesh))

    import dataclasses
    cfg1 = dataclasses.replace(BYOL_VIEW1, out_size=(args.crop_size, args.crop_size))
    cfg2 = dataclasses.replace(BYOL_VIEW2, out_size=(args.crop_size, args.crop_size))

    from functools import partial as _partial

    if args.precrop:
        if args.store is None:
            raise SystemExit("--precrop requires --store")
        from medical_image_segmentation_tpu.ops.augment import two_view_tail_augment

        @_partial(jax.jit, donate_argnums=0)
        def step(state, views, key):
            # views: (2B, crop, crop, 1) uint8, crop/resize/flip already done
            # by the C++ loader (mis_fetch_views); only the elementwise tail
            # (solarize/windowing/normalize) runs here
            v1, v2 = two_view_tail_augment(key, views, cfg1, cfg2)
            return task.train_step(state, v1, v2)
    else:
        @_partial(jax.jit, donate_argnums=0)
        def step(state, raw, key):
            v1, v2 = pallas_two_view_augment(key, raw, cfg1, cfg2)
            return task.train_step(state, v1, v2)

    rng = np.random.default_rng(0)
    # probe drives warmup (device mode) and the post-timing cost analysis —
    # it must match the shape step() actually compiles for: full images in
    # the device-augment path, 2x pre-cropped views in the precrop path
    probe_shape = (
        (2 * args.batch_size, args.crop_size, args.crop_size, 1)
        if args.precrop
        else (args.batch_size, args.image_size, args.image_size, 1)
    )
    probe = shard_batch(
        mesh, rng.integers(0, 256, size=probe_shape).astype(np.uint8))
    key = jax.random.key(1)

    mode = "device" if args.store is None else "store"
    loader = None
    tmpdir = None
    if mode == "store":
        import os
        import tempfile

        store_path = args.store
        if store_path == "auto":
            tmpdir = tempfile.mkdtemp()
            store_path = os.path.join(tmpdir, "bench.mis")
            _make_auto_store(store_path, args.store_images, args.image_size, args.store_codec)
            print(f"synthetic {args.store_codec} store: "
                  f"{os.path.getsize(store_path)/1e6:.1f} MB, {args.store_images} images",
                  file=sys.stderr)
        from medical_image_segmentation_tpu.data.loader import (
            RANDOM, Loader, device_put_sharded_batches,
        )

        loader = Loader(
            store_path, args.batch_size, order=RANDOM,
            num_threads=args.num_threads or (os.cpu_count() or 4),
            out_hw=(args.image_size, args.image_size),
            precrop={"out_hw": (args.crop_size, args.crop_size)} if args.precrop else None,
        )
        if loader.channels != 1:
            raise SystemExit("bench expects a grayscale (1-channel) store")

        def batches():
            while True:  # loop epochs; each gets a fresh permutation
                yield from device_put_sharded_batches(loader, mesh)

        feed = batches()

        def next_batch():
            imgs, _ = next(feed)
            return imgs
    else:
        def next_batch():
            return probe

    for i in range(args.warmup):
        state, metrics = step(state, next_batch(), jax.random.fold_in(key, i))
    # NOTE: on the axon remote-TPU platform jax.block_until_ready returns
    # before execution finishes; a host value transfer is the only reliable
    # fence, so we fetch the loss scalar to close each timing section.
    float(metrics["loss"])

    from medical_image_segmentation_tpu.core.profiling import trace_if

    with trace_if(args.profile or "", enabled=bool(args.profile)):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, next_batch(), jax.random.fold_in(key, 100 + i))
        final_loss = float(metrics["loss"])
        dt = time.perf_counter() - t0

    imgs_per_sec = args.batch_size * args.steps / dt
    per_chip = imgs_per_sec / n_chips
    # fenced per-step dispersion probe (contention tripwire) — after the
    # throughput loop, before the dispatch-perturbing AOT cost analysis
    probe_lat = []
    for i in range(min(args.steps, 12)):
        t0 = time.perf_counter()
        state, metrics = step(state, next_batch(), jax.random.fold_in(key, 500 + i))
        float(metrics["loss"])
        probe_lat.append(time.perf_counter() - t0)
    disp = _dispersion_fields(probe_lat, dt / args.steps * 1e3, "byol")
    # cost analysis AFTER timing: the AOT lower().compile() disturbs the
    # subsequent jit dispatch path on the axon remote platform (measured
    # 78 ms/step → 1.7 s/step when done up front)
    flops = _step_flops(step, state, probe, key)
    peak = _peak_flops_per_chip()
    mfu = None
    if flops and peak:
        mfu = round(flops * args.steps / dt / (peak * n_chips), 4)
    print(
        f"[{mode}] loss={final_loss:.4f} total={imgs_per_sec:.0f} img/s "
        f"({dt/args.steps*1e3:.1f} ms/step)"
        + (f" step_flops={flops/1e9:.1f} GF mfu={mfu:.1%}" if mfu is not None else ""),
        file=sys.stderr,
    )
    out = {
        "metric": "aug_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 3),
        "mode": mode,
        "mfu": mfu,
        **disp,
    }
    if mode == "store":
        # bytes the loader actually ships per image: 2 crop² views in
        # precrop mode (windowed decode reads even less), full frames else
        shipped = (2 * args.crop_size * args.crop_size if args.precrop
                   else args.image_size * args.image_size)
        out["loader_gbytes_per_sec"] = round(imgs_per_sec * shipped / 1e9, 3)
        # machine-checkable bottleneck attribution (VERDICT r2 weak #1):
        # the per-stage split must be in the JSON line, not just stderr
        out["num_decode_threads"] = args.num_threads or (os.cpu_count() or 4)
        out["precrop"] = args.precrop
        out["h2d_bytes_per_batch"] = (
            2 * args.batch_size * args.crop_size * args.crop_size
            if args.precrop
            else args.batch_size * args.image_size * args.image_size)
        if loader is not None and loader.timers is not None:
            for stage, (tot, n) in loader.timers.snapshot().items():
                out[f"{stage}_ms_per_batch"] = round(tot / max(n, 1) * 1e3, 2)
                out[f"{stage}_batches_timed"] = n
            print(loader.timers.report(), file=sys.stderr)
    print(json.dumps(out))
    if loader is not None:
        loader.close()
    if tmpdir is not None:
        import shutil

        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
