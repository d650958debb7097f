"""Pallas TPU kernel: fully-fused two-view SSL augmentation.

The XLA version (`ops/augment.py`) lowers to batched matmuls plus an
elementwise tail, but materializes the interpolation matrices R_y/R_x and
the row-resampled intermediate in HBM between fusions. This kernel fuses
the whole per-sample pipeline in VMEM:

    uint8 img (C, H, W) ──► build R_y (oh,H), R_x' (ow,W) from crop params
                        ──► MXU per channel: tmp = R_y @ img_c; v_c = tmp @ R_x'ᵀ
                        ──► grayscale mix → CT window → solarize → normalize
                        ──► bf16 out (C, oh, ow)

per grid step (one sample, both views), so HBM traffic is exactly
one uint8 image read + two bf16 view writes.

Crop/flip/solarize/grayscale/window parameters are sampled in plain JAX
(tiny) and passed as a per-sample SMEM vector; the horizontal flip is
folded into R_x by mirroring the source coordinate (branch-free). Covers
the FFCV-parity pipeline (RRC + flip + [grayscale] + [CT window] +
solarize + normalize — reference `lightning_module.py:77-95`) for both
grayscale medical images and 3-channel RGB (CIFAR/IMAGENET datamodules).
Blur/ColorJitter (the torchvision recipe) go through the XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medical_image_segmentation_tpu.ops.augment import ViewConfig, sample_rrc_window

# per-view params packed as
# [y0, x0, ch, cw, flip, solarize, threshold, gray, win, level, width] → 11 floats
_PARAMS_PER_VIEW = 11
_N_PARAMS = 24  # padded (2 views × 11 used)

# ITU-R BT.601 luma weights — same constants as the XLA path
# (ops/augment.py:237) and torchvision's RandomGrayscale.
_LUMA = (0.299, 0.587, 0.114)


def _interp_rows(start, size, in_dim: int, out_dim: int, flip, mirror: bool):
    """(out_dim, in_dim) bilinear weights built from iota comparisons.
    ``mirror`` folds a horizontal flip: out coord i samples the window
    right-to-left when flip is set."""
    # Mosaic iota must be integer-typed; cast to f32 afterwards
    i = jax.lax.broadcasted_iota(jnp.int32, (out_dim, in_dim), 0).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (out_dim, in_dim), 1).astype(jnp.float32)
    scale = size / out_dim
    pos = i + 0.5
    if mirror:
        pos = jnp.where(flip > 0.5, out_dim - pos, pos)
    src = jnp.clip(start + pos * scale - 0.5, 0.0, in_dim - 1)
    lo = jnp.floor(src)
    fr = src - lo
    return ((k == lo) * (1.0 - fr) + (k == lo + 1.0) * fr)


def _augment_kernel(params_ref, img_ref, v1_ref, v2_ref, *, channels, in_h, in_w,
                    out_h, out_w, mean, std, vmax):
    # Mosaic has no direct uint8→f32 cast; hop through int32
    for view, out_ref in ((0, v1_ref), (1, v2_ref)):
        base = view * _PARAMS_PER_VIEW
        y0 = params_ref[0, 0, base + 0]
        x0 = params_ref[0, 0, base + 1]
        ch = params_ref[0, 0, base + 2]
        cw = params_ref[0, 0, base + 3]
        flip = params_ref[0, 0, base + 4]
        sol = params_ref[0, 0, base + 5]
        thresh = params_ref[0, 0, base + 6]
        gray = params_ref[0, 0, base + 7]
        win = params_ref[0, 0, base + 8]
        level = params_ref[0, 0, base + 9]
        width = params_ref[0, 0, base + 10]

        r_y = _interp_rows(y0, ch, in_h, out_h, flip, mirror=False)
        r_x = _interp_rows(x0, cw, in_w, out_w, flip, mirror=True)

        outs = []
        for c in range(channels):
            img_c = img_ref[0, c].astype(jnp.int32).astype(jnp.float32)  # (H, W)
            tmp = jnp.dot(r_y, img_c, preferred_element_type=jnp.float32)   # (oh, W) MXU
            outs.append(jnp.dot(tmp, r_x.T, preferred_element_type=jnp.float32))

        if channels == 3:
            # RandomGrayscale: mix to BT.601 luma where the coin is set
            # (XLA path ops/augment.py:235-238)
            luma = (_LUMA[0] * outs[0] + _LUMA[1] * outs[1] + _LUMA[2] * outs[2])
            outs = [jnp.where(gray > 0.5, luma, o) for o in outs]

        # window lo and inverse width are per-sample scalars; hoist out of
        # the channel loop (division is VPU-expensive)
        wlo = level - width * 0.5
        wscale = vmax / width
        for c in range(channels):
            out = outs[c]
            # random CT window (XLA path ops/augment.py:240-249)
            rewin = jnp.clip((out - wlo) * wscale, 0.0, vmax)
            out = jnp.where(win > 0.5, rewin, out)
            out = jnp.where((sol > 0.5) & (out >= thresh), vmax - out, out)
            out_ref[0, c] = ((out - mean[c]) / std[c]).astype(out_ref.dtype)


def sample_view_params(rng: jax.Array, batch: int, in_h: int, in_w: int,
                       cfg1: ViewConfig, cfg2: ViewConfig) -> jax.Array:
    """(B, 24) float32 per-sample parameter block for the kernel."""
    cols = []
    for cfg, key in zip((cfg1, cfg2), jax.random.split(rng)):
        kw, kf, ks, kg, kwo, kwl, kww = jax.random.split(key, 7)
        y0, x0, h, w = sample_rrc_window(kw, batch, in_h, in_w, cfg.crop_scale, cfg.crop_ratio)
        flip = (jax.random.uniform(kf, (batch,)) < cfg.hflip_prob).astype(jnp.float32)
        sol = (jax.random.uniform(ks, (batch,)) < cfg.solarize_prob).astype(jnp.float32)
        thr = jnp.full((batch,), cfg.solarize_threshold, jnp.float32)
        gray = (jax.random.uniform(kg, (batch,)) < cfg.grayscale_prob).astype(jnp.float32)
        win = (jax.random.uniform(kwo, (batch,)) < cfg.window_prob).astype(jnp.float32)
        level = jax.random.uniform(kwl, (batch,), minval=cfg.window_level_range[0],
                                   maxval=cfg.window_level_range[1])
        width = jax.random.uniform(kww, (batch,), minval=cfg.window_width_range[0],
                                   maxval=cfg.window_width_range[1])
        cols += [y0, x0, h, w, flip, sol, thr, gray, win, level, width]
    params = jnp.stack(cols, axis=1).astype(jnp.float32)  # (B, 22)
    pad = _N_PARAMS - params.shape[1]
    return jnp.pad(params, ((0, 0), (0, pad)))


# ViewConfig fields the kernel implements (crop/flip/grayscale/window/
# solarize/normalize) or that carry parameters for them. Every OTHER field
# must be at its inert value or the config MUST take the XLA path — a
# silent drop of an enabled augmentation is a correctness bug, not a
# fallback.
_IMPLEMENTED_FIELDS = {
    "out_size", "crop_scale", "crop_ratio", "hflip_prob",
    "solarize_prob", "solarize_threshold",
    "grayscale_prob",      # BT.601 mix on RGB; identity on 1-channel
    "window_prob", "window_level_range", "window_width_range",
    "value_max",           # baked into the kernel's window/solarize scale
}
_PARAM_ONLY_FIELDS = {"blur_kernel"}
_MUST_BE_ZERO = {"blur_prob", "jitter_prob", "brightness", "contrast",
                 "saturation"}


def pallas_supported(cfg: ViewConfig, channels: int = 1) -> bool:
    """True iff the fused kernel implements EVERY enabled augmentation in
    ``cfg``. Fails safe: a ViewConfig field this gate does not know about
    (added later, not implemented in the kernel) returns False."""
    if channels not in (1, 3):
        return False
    import dataclasses as _dc

    for f in _dc.fields(cfg):
        if f.name in _IMPLEMENTED_FIELDS or f.name in _PARAM_ONLY_FIELDS:
            continue
        if f.name in _MUST_BE_ZERO:
            if getattr(cfg, f.name) != 0.0:
                return False
        else:
            return False  # unknown field — refuse rather than silently drop
    return True


@partial(jax.jit, static_argnames=("cfg1", "cfg2", "mean", "std", "dtype", "interpret"))
def pallas_two_view_augment(
    rng: jax.Array,
    images: jax.Array,            # (B, H, W, C) with C in {1, 3}, or (B, H, W) uint8
    cfg1: ViewConfig,
    cfg2: ViewConfig,
    mean: Tuple[float, ...] = (57.9764,),
    std: Tuple[float, ...] = (60.4759,),
    dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Drop-in replacement for `two_view_augment` on supported configs."""
    if images.ndim == 3:
        images = images[..., None]
    b, in_h, in_w, channels = images.shape
    if channels not in (1, 3):
        raise ValueError(f"pallas augment kernel supports 1 or 3 channels, got {channels}")
    for cfg in (cfg1, cfg2):
        if not pallas_supported(cfg, channels=channels):
            raise ValueError(
                f"view config enables augmentations the fused kernel does not "
                f"implement ({cfg}); route through ops.augment.two_view_augment"
            )
    if len(mean) != channels or len(std) != channels:
        raise ValueError(f"mean/std must have {channels} entries")
    oh1, ow1 = cfg1.out_size
    oh2, ow2 = cfg2.out_size
    if (oh1, ow1) != (oh2, ow2):
        raise ValueError("both views must share out_size in the fused kernel")
    if cfg1.value_max != cfg2.value_max:
        raise ValueError("both views must share value_max in the fused kernel")
    # NHWC → NCHW so each channel plane is a contiguous (H, W) matmul
    # operand; one cheap uint8 transpose vs per-lane strided loads inside
    # the kernel.
    images = jnp.moveaxis(images, -1, 1)  # (B, C, H, W)
    params = sample_view_params(rng, b, in_h, in_w, cfg1, cfg2)[:, None, :]  # (B,1,24) for SMEM blocking

    kernel = partial(
        _augment_kernel,
        channels=channels, in_h=in_h, in_w=in_w, out_h=oh1, out_w=ow1,
        mean=tuple(float(m) for m in mean), std=tuple(float(s) for s in std),
        vmax=float(cfg1.value_max),
    )
    v1, v2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, _N_PARAMS), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, channels, in_h, in_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, channels, oh1, ow1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels, oh1, ow1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, channels, oh1, ow1), dtype),
            jax.ShapeDtypeStruct((b, channels, oh1, ow1), dtype),
        ),
        interpret=interpret,
    )(params, images)
    return jnp.moveaxis(v1, 1, -1), jnp.moveaxis(v2, 1, -1)
