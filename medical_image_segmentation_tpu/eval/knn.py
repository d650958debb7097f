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
        feats, labels = [], []
        for x, y in train_batches:
            feats.append(np.asarray(_l2_normalize(embed_fn(jnp.asarray(x)).astype(jnp.float32))))
            labels.append(np.asarray(y))
        bank = np.concatenate(feats)
        bank_labels = np.concatenate(labels)
        if jax.process_count() > 1:
            # assemble the FULL bank from every host's shard (the reference's
            # NCCL all_gather, knn.py:114-117)
            from jax.experimental import multihost_utils

            bank = np.asarray(multihost_utils.process_allgather(bank)).reshape(-1, bank.shape[-1])
            bank_labels = np.asarray(multihost_utils.process_allgather(bank_labels)).reshape(-1)
        bank = jnp.asarray(bank)
        bank_labels = jnp.asarray(bank_labels)

        correct = total = 0
        for x, y in val_batches:
            scores = knn_predict(
                embed_fn(jnp.asarray(x)), bank, bank_labels, self.num_classes,
                k=self.k, temperature=self.temperature,
            )
            pred = np.asarray(jnp.argmax(scores, -1))
            correct += int((pred == np.asarray(y)).sum())
            total += len(pred)
        if jax.process_count() > 1:
            # aggregate over every host's val shard so all hosts report the
            # same global accuracy
            from jax.experimental import multihost_utils

            agg = np.asarray(multihost_utils.process_allgather(
                np.array([correct, total], np.int64))).reshape(-1, 2).sum(axis=0)
            correct, total = int(agg[0]), int(agg[1])
        return correct / max(total, 1)
