"""Sliding-window full-res inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_tpu.eval.sliding_window import (
    _blend_weights,
    _window_starts,
    sliding_window_predict,
)


class TestWindows:
    def test_starts_cover_and_right_align(self):
        s = _window_starts(100, 32, 16)
        assert s[0] == 0 and s[-1] == 68
        assert all(b - a <= 16 for a, b in zip(s, s[1:]))

    def test_small_image_single_window(self):
        np.testing.assert_array_equal(_window_starts(16, 32, 16), [0])

    def test_blend_positive_and_symmetric(self):
        w = _blend_weights(32)
        assert (w > 0).all()
        np.testing.assert_allclose(w, w[::-1], rtol=1e-6)


class TestSlidingWindow:
    def test_identity_model_reconstructs_image(self):
        """With a model that echoes its input, blending must reproduce the
        image exactly (weights cancel)."""
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(70, 90, 1)).astype(np.float32))

        def echo(windows):
            return windows

        out = sliding_window_predict(echo, img, window=32, stride=16, batch_windows=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)

    def test_pads_small_images(self):
        img = jnp.ones((20, 24, 1))
        out = sliding_window_predict(lambda w: w * 2.0, img, window=32)
        assert out.shape == (20, 24, 1)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-4)

    def test_mesh_sharded_matches_single_device(self):
        """mesh= shards each window batch over the data axis (the U-Net
        forward runs on all chips); the blended logits must match the
        unsharded path bit-for-fp-bit."""
        from medical_image_segmentation_tpu.eval.sliding_window import make_unet_window_fn
        from medical_image_segmentation_tpu.parallel import make_mesh
        from medical_image_segmentation_tpu.train import SegmentationTask

        task = SegmentationTask(arch="resnet18", dtype=jnp.float32)
        state = task.init(jax.random.key(0), (2, 32, 32, 1))
        fn = make_unet_window_fn(task, state)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(size=(64, 96, 1)).astype(np.float32))
        ref = sliding_window_predict(fn, img, window=32, batch_windows=8)
        mesh = make_mesh()
        assert int(np.prod(list(mesh.shape.values()))) == 8  # conftest CPU mesh
        # batch_windows=6 must be rounded up to the mesh size (8)
        out = sliding_window_predict(fn, img, window=32, batch_windows=6, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_unet_full_res(self):
        """Window-trained U-Net evaluated on a larger slice."""
        from medical_image_segmentation_tpu.eval.sliding_window import make_unet_window_fn
        from medical_image_segmentation_tpu.train import SegmentationTask

        task = SegmentationTask(arch="resnet18", dtype=jnp.float32)
        state = task.init(jax.random.key(0), (2, 32, 32, 1))
        fn = make_unet_window_fn(task, state)
        img = jnp.zeros((48, 80, 1))
        logits = sliding_window_predict(fn, img, window=32, batch_windows=4)
        assert logits.shape == (48, 80, 1)
        assert np.isfinite(np.asarray(logits)).all()


class TestFusedPredictor:
    """One-dispatch fused sliding-window (serving path) must match the
    loop variant exactly — including tail-batch masking and small-input
    padding."""

    def test_3d_parity_with_loop_variant(self):
        from medical_image_segmentation_tpu.eval.sliding_window import (
            make_fused_predictor_3d,
            sliding_window_predict_3d,
        )

        def fn(w):
            return jnp.stack([w[..., 0] * 2.0 + 1.0, -w[..., 0]], axis=-1)

        rng = np.random.default_rng(3)
        vol = jnp.asarray(rng.normal(size=(20, 30, 26, 1)).astype(np.float32))
        ref = sliding_window_predict_3d(fn, vol, window=(8, 16, 16),
                                        stride=(4, 8, 8), batch_windows=3,
                                        num_classes=2)
        fused = make_fused_predictor_3d(fn, vol.shape, window=(8, 16, 16),
                                        stride=(4, 8, 8), batch_windows=3,
                                        num_classes=2)
        out = fused(vol)
        assert out.shape == ref.shape == (20, 30, 26, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_3d_tail_batch_masking(self):
        """Window count NOT divisible by batch_windows: padded duplicate
        coords must contribute nothing (identity model reconstructs)."""
        from medical_image_segmentation_tpu.eval.sliding_window import make_fused_predictor_3d

        rng = np.random.default_rng(4)
        vol = jnp.asarray(rng.normal(size=(12, 24, 24, 1)).astype(np.float32))
        # 2x3x3 = 18 windows, batch 4 -> pad 2
        fused = make_fused_predictor_3d(lambda w: w, vol.shape, window=(8, 16, 16),
                                        batch_windows=4)
        np.testing.assert_allclose(np.asarray(fused(vol)), np.asarray(vol),
                                   rtol=1e-5, atol=1e-6)

    def test_3d_pads_small_volumes(self):
        from medical_image_segmentation_tpu.eval.sliding_window import make_fused_predictor_3d

        vol = jnp.ones((4, 10, 10, 1), jnp.float32)
        fused = make_fused_predictor_3d(lambda w: w * 2.0, vol.shape, window=(8, 16, 16))
        out = fused(vol)
        assert out.shape == (4, 10, 10, 1)
        np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)

    def test_3d_unet_matches_loop(self):
        from medical_image_segmentation_tpu.eval.sliding_window import (
            make_fused_predictor_3d,
            sliding_window_predict_3d,
        )
        from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask

        task = Segmentation3DTask(features=(4, 8), dtype=jnp.float32)
        state = task.init(jax.random.key(0), (1, 8, 16, 16, 1))

        @jax.jit
        def window_fn(w):
            return task.model.apply({"params": state.params}, w, train=False)

        rng = np.random.default_rng(5)
        big = jnp.asarray(rng.random((12, 24, 24, 1)).astype(np.float32))
        ref = sliding_window_predict_3d(window_fn, big, window=(8, 16, 16),
                                        batch_windows=2)
        fused = make_fused_predictor_3d(window_fn, big.shape, window=(8, 16, 16),
                                        batch_windows=2)
        np.testing.assert_allclose(np.asarray(fused(big)), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_parity_with_loop_variant(self):
        from medical_image_segmentation_tpu.eval.sliding_window import (
            make_fused_predictor_2d,
            sliding_window_predict,
        )

        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.normal(size=(70, 90, 1)).astype(np.float32))
        ref = sliding_window_predict(lambda w: w * 3.0, img, window=32,
                                     stride=16, batch_windows=4)
        fused = make_fused_predictor_2d(lambda w: w * 3.0, img.shape, window=32,
                                        stride=16, batch_windows=4)
        np.testing.assert_allclose(np.asarray(fused(img)), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestDiceCE:
    @pytest.mark.slow
    def test_dice_ce_loss_larger_than_dice(self):
        from medical_image_segmentation_tpu.train import SegmentationTask

        kw = dict(arch="resnet18", dtype=jnp.float32, learning_rate=0.1,
                  warmup_epochs=0, max_epochs=10, min_lr=0.0)
        t1 = SegmentationTask(loss="dice", **kw)
        t2 = SegmentationTask(loss="dice_ce", **kw)
        s1 = t1.init(jax.random.key(0), (2, 32, 32, 1))
        s2 = t2.init(jax.random.key(0), (2, 32, 32, 1))
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
        masks = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
        _, m1 = t1.train_step(s1, images, masks)
        _, m2 = t2.train_step(s2, images, masks)
        assert float(m2["train/loss"]) > float(m1["train/loss"])


class TestSlidingWindow3D:
    def test_identity_model_reconstructs_volume(self):
        from medical_image_segmentation_tpu.eval.sliding_window import sliding_window_predict_3d

        rng = np.random.default_rng(1)
        vol = jnp.asarray(rng.normal(size=(20, 30, 26, 1)).astype(np.float32))

        out = sliding_window_predict_3d(lambda w: w, vol, window=(8, 16, 16),
                                        stride=(4, 8, 8), batch_windows=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-5, atol=1e-6)

    def test_pads_small_volumes(self):
        from medical_image_segmentation_tpu.eval.sliding_window import sliding_window_predict_3d

        vol = jnp.ones((4, 10, 10, 1), jnp.float32)
        out = sliding_window_predict_3d(lambda w: w * 2.0, vol, window=(8, 16, 16))
        assert out.shape == (4, 10, 10, 1)
        np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)

    def test_unet3d_full_res_matches_crop_training_shape(self):
        """Crop-trained UNet3D evaluated on a larger volume: finite logits at
        the native shape, and the single-window case equals a direct apply."""
        from medical_image_segmentation_tpu.eval.sliding_window import sliding_window_predict_3d
        from medical_image_segmentation_tpu.train.seg3d_task import Segmentation3DTask

        task = Segmentation3DTask(features=(4, 8), dtype=jnp.float32)
        state = task.init(jax.random.key(0), (1, 8, 16, 16, 1))

        @jax.jit
        def window_fn(w):
            return task.model.apply({"params": state.params}, w, train=False)

        rng = np.random.default_rng(2)
        big = jnp.asarray(rng.random((12, 24, 24, 1)).astype(np.float32))
        out = sliding_window_predict_3d(window_fn, big, window=(8, 16, 16), batch_windows=2)
        assert out.shape == (12, 24, 24, 1)
        assert np.isfinite(np.asarray(out)).all()

        exact = jnp.asarray(rng.random((8, 16, 16, 1)).astype(np.float32))
        direct = window_fn(exact[None])[0]
        blended = sliding_window_predict_3d(window_fn, exact, window=(8, 16, 16))
        np.testing.assert_allclose(np.asarray(blended), np.asarray(direct), rtol=1e-5, atol=1e-5)
