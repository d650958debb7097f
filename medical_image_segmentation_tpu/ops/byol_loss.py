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


def cosine_similarity_loss(preds: jax.Array, targets: jax.Array, eps: float = 1e-8) -> jax.Array:
    """2 - 2·cosine_similarity, averaged over leading dims.

    ``targets`` is stop-gradiented here so callers cannot accidentally
    backprop through the momentum encoder.
    """
    preds = preds.astype(jnp.float32)
    targets = jax.lax.stop_gradient(targets.astype(jnp.float32))
    pn = preds / jnp.maximum(jnp.linalg.norm(preds, axis=-1, keepdims=True), eps)
    tn = targets / jnp.maximum(jnp.linalg.norm(targets, axis=-1, keepdims=True), eps)
    cos = jnp.sum(pn * tn, axis=-1)
    return jnp.mean(2.0 - 2.0 * cos)
