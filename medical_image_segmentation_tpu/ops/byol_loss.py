"""BYOL regression loss.

Matches the reference `cosine_similarity_loss`
(`medical_image_segmentation/train/model/byol_pytorch.py:181-198`):
``loss = 2 - 2 * cos(pred, target)`` averaged over the batch, where the
momentum-branch targets are stop-gradiented. The symmetric two-view pairing
(online view1 ↔ momentum view2 and vice versa) is handled by the caller,
which concatenates both views along the batch and reverses the view order
for the momentum branch (reference `byol_pytorch.py:207-217`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_normalize(x: jax.Array, eps: float) -> jax.Array:
    """L2-normalize with finite gradients everywhere.

    ``x / max(||x||, eps)`` is NaN-gradient at x == 0 (d||x||/dx = x/||x||
    even though max() selects eps — 0·NaN = NaN); rsqrt(Σx² + eps²) is
    smooth at the origin and indistinguishable elsewhere."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)


def cosine_similarity_loss(preds: jax.Array, targets: jax.Array, eps: float = 1e-8) -> jax.Array:
    """2 - 2·cosine_similarity, averaged over leading dims.

    ``targets`` is stop-gradiented here so callers cannot accidentally
    backprop through the momentum encoder.
    """
    preds = preds.astype(jnp.float32)
    targets = jax.lax.stop_gradient(targets.astype(jnp.float32))
    pn = _safe_normalize(preds, eps)
    tn = _safe_normalize(targets, eps)
    cos = jnp.sum(pn * tn, axis=-1)
    return jnp.mean(2.0 - 2.0 * cos)
