"""Learning-rate and EMA-momentum schedules.

``linear_warmup_cosine_annealing`` reproduces the closed form of the
reference `LinearWarmupCosineAnnealingLR._get_closed_form_lr`
(`medical_image_segmentation/train/scheduler/cosine_annealing.py:119-136`):

- epoch < warmup_epochs:
    lr = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / max(warmup_epochs - 1, 1)
- else:
    lr = eta_min + 0.5 * (base_lr - eta_min) *
         (1 + cos(pi * (epoch - warmup_epochs) / (max_epochs - warmup_epochs)))

The schedule is expressed per-step: callers pass ``steps_per_epoch`` and the
schedule converts the optax step count to a (fractional) epoch, which is the
behavior the reference gets when stepping the scheduler every epoch with
interval="step" semantics delegated to Lightning (the reference steps per
epoch; we keep an ``interval`` switch for both).

``cosine_ema_momentum`` reproduces the BYOL momentum schedule
(`byol_pytorch.py:258-263`):
    tau = 1 - (1 - base_momentum) * (cos(pi * step / total_steps) + 1) / 2
which anneals tau from ``base_momentum`` to ``final_momentum``=1.0.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def linear_warmup_cosine_annealing(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
    steps_per_epoch: int = 1,
    interval: str = "epoch",
) -> optax.Schedule:
    """Closed-form linear-warmup + cosine-annealing schedule.

    With ``interval="epoch"`` the lr changes once per epoch (floor of the
    fractional epoch), matching the reference's per-epoch `scheduler.step()`;
    with ``interval="step"`` the epoch is fractional for smooth per-step
    annealing.
    """

    def schedule(count):
        epoch = count / steps_per_epoch
        if interval == "epoch":
            epoch = jnp.floor(epoch)
        warm_denom = max(warmup_epochs - 1, 1)
        warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / warm_denom
        denom = max(max_epochs - warmup_epochs, 1)
        cos = jnp.cos(jnp.pi * (epoch - warmup_epochs) / denom)
        ann = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + cos)
        return jnp.where(epoch < warmup_epochs, warm, ann).astype(jnp.float32)

    return schedule


def cosine_ema_momentum(base_momentum: float, final_momentum: float = 1.0):
    """BYOL EMA momentum schedule: cosine anneal tau from base to final."""

    def schedule(step, total_steps):
        frac = jnp.cos(jnp.pi * step / jnp.maximum(total_steps, 1))
        tau = final_momentum - (final_momentum - base_momentum) * (frac + 1.0) / 2.0
        return tau.astype(jnp.float32)

    return schedule
