"""Weighted-KNN online evaluation.

Parity with the reference `KNNOnlineEvaluator`
(`medical_image_segmentation/train/callback/knn.py:11-144`), which the
reference left bit-rotted/unwired (it calls a `forward(return_embedding=…)`
the model doesn't accept — SURVEY §"known bugs"); here it is a working
evaluator:

- feature bank built from L2-normalized backbone features over the train
  loader (`knn.py:91-106`);
- in the reference the bank is NCCL-all_gathered across ranks
  (`knn.py:114-117,143-144`); here each host contributes its shard and the
  bank lives sharded on the mesh — the similarity matmul against it is a
  sharded contraction XLA resolves with ICI collectives;
- prediction: cosine similarity → top-k (k=200) → temperature-weighted
  soft vote (T=0.07) (`knn.py:38-70`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@partial(jax.jit, static_argnames=("num_classes", "k"))
def knn_predict(
    features: jax.Array,      # (B, D) query features (unnormalized ok)
    bank: jax.Array,          # (N, D) L2-normalized feature bank
    bank_labels: jax.Array,   # (N,) int labels
    num_classes: int,
    k: int = 200,
    temperature: float = 0.07,
) -> jax.Array:
    """Soft-voting weighted KNN class scores (B, num_classes)."""
    features = _l2_normalize(features.astype(jnp.float32))
    sim = features @ bank.T.astype(jnp.float32)            # (B, N) — MXU
    k = min(k, bank.shape[0])
    sim_k, idx_k = jax.lax.top_k(sim, k)                    # (B, k)
    weights = jnp.exp(sim_k / temperature)
    labels_k = bank_labels[idx_k]                           # (B, k)
    one_hot = jax.nn.one_hot(labels_k, num_classes, dtype=jnp.float32)
    return jnp.einsum("bk,bkc->bc", weights, one_hot)


class KNNEvaluator:
    """Builds a feature bank with an ``embed_fn`` and scores a val loader."""

    def __init__(self, num_classes: int, k: int = 200, temperature: float = 0.07):
        self.num_classes = num_classes
        self.k = k
        self.temperature = temperature

    def evaluate(
        self,
        embed_fn: Callable[[jax.Array], jax.Array],
        train_batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        val_batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    ) -> float:
        """Batches may be host numpy arrays (single-process) or GLOBAL jax
        arrays already placed on the mesh (multi-host — feed the loaders
        through ``device_put_sharded_batches``). With global inputs the bank
        is a device-sharded global array, the similarity matmul against it is
        a sharded contraction XLA resolves with ICI collectives (the
        reference's NCCL all_gather of the bank, `knn.py:114-117`, happens
        inside XLA instead of on the host), and the accuracy reduction yields
        a replicated scalar every host can read."""
        feats, labels = [], []
        for x, y in train_batches:
            feats.append(_l2_normalize(embed_fn(jnp.asarray(x)).astype(jnp.float32)))
            labels.append(jnp.asarray(y))
        bank = jnp.concatenate(feats)
        bank_labels = jnp.concatenate(labels)

        correct = total = 0
        for x, y in val_batches:
            scores = knn_predict(
                embed_fn(jnp.asarray(x)), bank, bank_labels, self.num_classes,
                k=self.k, temperature=self.temperature,
            )
            correct += int(jnp.sum(jnp.argmax(scores, -1) == jnp.asarray(y)))
            total += int(np.shape(y)[0])
        return correct / max(total, 1)
