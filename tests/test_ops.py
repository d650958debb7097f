"""Numerical parity tests for losses, metrics, LARS, and schedules.

Expected values are computed by independent NumPy reimplementations of the
reference semantics (SURVEY.md §2.1: `segmentation.py:12-43`,
`lars.py:128-161`, `cosine_annealing.py:119-136`, `byol_pytorch.py:181-198`,
`byol_pytorch.py:258-263`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_tpu.ops import (
    cosine_similarity_loss,
    dice_coefficient,
    dice_loss,
    jaccard_index,
    linear_warmup_cosine_annealing,
    cosine_ema_momentum,
    post_process_masks,
)
from medical_image_segmentation_tpu.ops.lars import lars, make_lars_mask


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestDice:
    def test_dice_loss_matches_numpy(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        targets = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
        p = _sigmoid(logits).reshape(-1)
        t = targets.reshape(-1)
        expected = 1.0 - (2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0)
        got = dice_loss(jnp.asarray(logits), jnp.asarray(targets))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_perfect_prediction_low_loss(self):
        targets = jnp.ones((1, 16, 16, 1))
        logits = jnp.full((1, 16, 16, 1), 20.0)  # sigmoid ~ 1
        assert float(dice_loss(logits, targets)) < 1e-4

    def test_post_process_threshold(self):
        logits = jnp.array([-1.0, 0.0, 1.0])
        np.testing.assert_array_equal(post_process_masks(logits), [0.0, 0.0, 1.0])

    def test_metrics_flatten_whole_batch(self):
        pred = jnp.array([[1.0, 0.0], [1.0, 1.0]])
        tgt = jnp.array([[1.0, 1.0], [0.0, 1.0]])
        inter, psum, tsum = 2.0, 3.0, 3.0
        np.testing.assert_allclose(
            dice_coefficient(pred, tgt), (2 * inter + 1) / (psum + tsum + 1), rtol=1e-6
        )
        union = psum + tsum - inter
        np.testing.assert_allclose(jaccard_index(pred, tgt), (inter + 1e-6) / (union + 1e-6), rtol=1e-6)


class TestBYOLLoss:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(4, 16)).astype(np.float32)
        b = rng.normal(size=(4, 16)).astype(np.float32)
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        expected = np.mean(2 - 2 * np.sum(an * bn, axis=1))
        got = cosine_similarity_loss(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_identical_vectors_zero_loss(self):
        a = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32))
        assert float(cosine_similarity_loss(a, a)) < 1e-5

    def test_no_grad_through_target(self):
        a = jnp.ones((2, 4))
        g = jax.grad(lambda t: cosine_similarity_loss(a, t))(jnp.ones((2, 4)) * 2)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestLARS:
    def _numpy_lars_step(self, p, g, buf, lr, wd, mom, tc, eps, adapted):
        """Independent reimplementation of reference lars.py:128-161."""
        g = g.copy()
        if adapted and wd != 0:
            p_norm = np.linalg.norm(p)
            g_norm = np.linalg.norm(g)
            tr = tc * p_norm / (g_norm + wd * p_norm + eps) if (p_norm > 0 and g_norm > 0) else 1.0
            g = (g + wd * p) * tr
        buf = mom * buf + g
        return p - lr * buf, buf

    def test_adapted_leaf_matches_reference_math(self):
        rng = np.random.default_rng(3)
        p = rng.normal(size=(8, 4)).astype(np.float32)
        g = rng.normal(size=(8, 4)).astype(np.float32)
        lr, wd, mom, tc, eps = 0.5, 1e-4, 0.9, 0.001, 1e-8

        opt = lars(lr, weight_decay=wd, momentum=mom, trust_coefficient=tc, eps=eps, mask=make_lars_mask)
        params = {"w": jnp.asarray(p)}
        state = opt.init(params)
        # two steps, to exercise the momentum buffer
        buf = np.zeros_like(p)
        pp = p.copy()
        grads = {"w": jnp.asarray(g)}
        for _ in range(2):
            updates, state = opt.update(grads, state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            pp, buf = self._numpy_lars_step(pp, g, buf, lr, wd, mom, tc, eps, adapted=True)
        np.testing.assert_allclose(np.asarray(params["w"]), pp, rtol=1e-5, atol=1e-6)

    def test_bias_leaf_skips_decay_and_adaptation(self):
        rng = np.random.default_rng(4)
        p = rng.normal(size=(8,)).astype(np.float32)  # rank-1 → excluded
        g = rng.normal(size=(8,)).astype(np.float32)
        lr, wd, mom = 0.5, 1e-2, 0.9
        opt = lars(lr, weight_decay=wd, momentum=mom, mask=make_lars_mask)
        params = {"b": jnp.asarray(p)}
        state = opt.init(params)
        updates, _ = opt.update({"b": jnp.asarray(g)}, state, params)
        # plain SGD+momentum step: update = -lr * g on first step
        np.testing.assert_allclose(np.asarray(updates["b"]), -lr * g, rtol=1e-6)

    def test_zero_param_norm_trust_ratio_one(self):
        params = {"w": jnp.zeros((4, 4))}
        opt = lars(1.0, weight_decay=1e-4, momentum=0.0, mask=make_lars_mask)
        state = opt.init(params)
        g = jnp.ones((4, 4))
        updates, _ = opt.update({"w": g}, state, params)
        np.testing.assert_allclose(np.asarray(updates["w"]), -np.ones((4, 4)), rtol=1e-6)


class TestSchedules:
    def test_closed_form_warmup_cosine(self):
        base_lr, wu, total, wu_start, eta_min = 1.0, 10, 100, 1e-3, 1e-6
        sched = linear_warmup_cosine_annealing(base_lr, wu, total, wu_start, eta_min)
        # reference closed form, cosine_annealing.py:119-136
        for epoch in [0, 1, 5, 9, 10, 50, 99, 100]:
            if epoch < wu:
                expected = wu_start + epoch * (base_lr - wu_start) / (wu - 1)
            else:
                expected = eta_min + 0.5 * (base_lr - eta_min) * (
                    1 + math.cos(math.pi * (epoch - wu) / (total - wu))
                )
            np.testing.assert_allclose(float(sched(epoch)), expected, rtol=1e-4, atol=1e-7, err_msg=f"epoch={epoch}")

    def test_per_step_epoch_floor(self):
        sched = linear_warmup_cosine_annealing(1.0, 2, 10, steps_per_epoch=4, interval="epoch")
        assert float(sched(0)) == float(sched(3))  # same epoch
        assert float(sched(0)) != float(sched(4))

    def test_ema_momentum_endpoints(self):
        sched = cosine_ema_momentum(0.99, 1.0)
        np.testing.assert_allclose(float(sched(0, 1000)), 0.99, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000, 1000)), 1.0, rtol=1e-6)
        mid = float(sched(500, 1000))
        assert 0.99 < mid < 1.0


class TestBYOLLossGradSafety:
    def test_finite_grads_at_zero_predictions(self):
        """Zero-init predictor bias ⇒ first-step preds can be exactly 0; the
        loss gradient must stay finite (regression test for a NaN found by
        the checkpoint roundtrip test)."""
        from medical_image_segmentation_tpu.ops import cosine_similarity_loss

        zeros = jnp.zeros((4, 8))
        tgt = jnp.zeros((4, 8))
        g = jax.grad(lambda p: cosine_similarity_loss(p, tgt))(zeros)
        assert np.isfinite(np.asarray(g)).all()
        g2 = jax.grad(lambda p: cosine_similarity_loss(p, jnp.ones((4, 8))))(zeros)
        assert np.isfinite(np.asarray(g2)).all()
