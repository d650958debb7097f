"""LARS optimizer as an optax gradient transformation.

Math matches the reference `LARS(torch.optim.Optimizer)`
(`medical_image_segmentation/train/optimizer/lars.py:128-161`):

per parameter ``p`` with gradient ``g``:

1. If the parameter's weight_decay is nonzero (i.e. it is in the "decay"
   group), compute the layerwise trust ratio
   ``tr = trust_coeff * ||p|| / (||g|| + wd * ||p|| + eps)`` — falling back
   to 1.0 where either norm is zero — then ``g ← (g + wd·p) · tr``.
   Parameters in the no-decay group (biases, BatchNorm scales/offsets;
   reference `byol_pytorch.py:140-157`) skip BOTH decay and adaptation.
2. Momentum: ``buf ← m·buf + g``; Nesterov uses ``g + m·buf``, otherwise
   ``buf``.
3. Update: ``p ← p - lr · g``.

The decay/adaptation grouping is expressed with a pytree mask
(``make_lars_mask`` marks every leaf of rank ≥ 2 — weight matrices and conv
kernels — as adapted; rank ≤ 1 leaves, i.e. biases and norm parameters, are
excluded, exactly the reference's `exclude_bias_and_norm` grouping).

All per-leaf norms are computed in float32; the transform is jit-safe and
works under pjit with replicated optimizer state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    momentum: optax.Updates


def _trust_ratio(p: jax.Array, g: jax.Array, weight_decay: float, trust_coeff: float, eps: float) -> jax.Array:
    p32 = p.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    p_norm = jnp.linalg.norm(p32.reshape(-1))
    g_norm = jnp.linalg.norm(g32.reshape(-1))
    tr = trust_coeff * p_norm / (g_norm + weight_decay * p_norm + eps)
    ok = jnp.logical_and(p_norm > 0.0, g_norm > 0.0)
    return jnp.where(ok, tr, 1.0)


def scale_by_lars(
    weight_decay: float = 1e-6,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
    eps: float = 1e-8,
    nesterov: bool = False,
    mask: Optional[Union[optax.Params, Callable]] = None,
) -> optax.GradientTransformation:
    """LARS update (without the learning-rate scaling step).

    ``mask``: pytree of bools (or callable params -> pytree) marking leaves
    that receive weight decay AND layerwise adaptation. ``None`` adapts all.
    """

    def init_fn(params):
        return LarsState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scale_by_lars requires params")
        mask_tree = mask(params) if callable(mask) else mask
        if mask_tree is None:
            mask_tree = jax.tree.map(lambda _: True, params)

        def leaf(g, p, buf, adapted):
            g = g.astype(jnp.float32)
            if adapted and weight_decay != 0.0:
                tr = _trust_ratio(p, g, weight_decay, trust_coefficient, eps)
                g = (g + weight_decay * p.astype(jnp.float32)) * tr
            new_buf = momentum * buf.astype(jnp.float32) + g
            out = g + momentum * new_buf if nesterov else new_buf
            return out.astype(p.dtype), new_buf.astype(buf.dtype)

        flat = jax.tree.map(leaf, updates, params, state.momentum, mask_tree)
        new_updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_momentum = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return new_updates, LarsState(momentum=new_momentum)

    return optax.GradientTransformation(init_fn, update_fn)


def lars(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 1e-6,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
    eps: float = 1e-8,
    nesterov: bool = False,
    mask: Optional[Union[optax.Params, Callable]] = None,
) -> optax.GradientTransformation:
    """Full LARS: scale_by_lars followed by (scheduled) learning-rate scaling."""
    return optax.chain(
        scale_by_lars(
            weight_decay=weight_decay,
            momentum=momentum,
            trust_coefficient=trust_coefficient,
            eps=eps,
            nesterov=nesterov,
            mask=mask,
        ),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_lars_mask(params) -> optax.Params:
    """True for leaves with rank ≥ 2 (weights/kernels); False for biases and
    norm parameters — the reference's `exclude_bias_and_norm` grouping
    (`byol_pytorch.py:140-157`)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)
