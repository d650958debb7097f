"""Host-side RandomResizedCrop pre-crop path (data/host_precrop.py +
csrc/mis_loader.cpp::mis_fetch_views + ops.augment.two_view_tail_augment).

Parity chain pinned here:
  C++ crop_resize_bilinear  ==  numpy oracle  ≈  device resampler
(the first two share float32 bilinear math exactly up to rounding ties; the
device path builds f32 interpolation matrices, so agreement is within 1 LSB
of the uint8 quantization).
"""

import numpy as np
import pytest

from medical_image_segmentation_tpu.data.host_precrop import (
    crop_resize_bilinear_np,
    fetch_views_fallback,
    make_view_params,
    sample_rrc_windows_np,
)
from medical_image_segmentation_tpu.data.store import CODEC_PNG, CODEC_RAW, StoreWriter


def _write_store(path, n=8, h=40, w=36, c=1, codec=CODEC_RAW, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, size=(n, h, w, c)).astype(np.uint8)
    with StoreWriter(str(path), channels=c) as wtr:
        for i in range(n):
            wtr.add(imgs[i], label=i, codec=codec)
    return imgs


def _native_or_skip():
    from medical_image_segmentation_tpu.data.store.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")


class TestWindowSampling:
    def test_windows_in_bounds(self):
        rng = np.random.default_rng(0)
        p = sample_rrc_windows_np(rng, 512, 64, 48)
        y0, x0, h, w, flip = p.T
        assert (h >= 1).all() and (h <= 64).all()
        assert (w >= 1).all() and (w <= 48).all()
        assert (y0 >= 0).all() and (y0 + h <= 64 + 1e-3).all()
        assert (x0 >= 0).all() and (x0 + w <= 48 + 1e-3).all()
        assert set(np.unique(flip)) <= {0.0, 1.0}

    def test_params_deterministic_per_batch_key(self):
        a = make_view_params(7, 3, 11, 16, 64, 64)
        b = make_view_params(7, 3, 11, 16, 64, 64)
        c = make_view_params(7, 3, 12, 16, 64, 64)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.shape == (16, 2, 5)

    def test_params_distinct_per_host_shard(self):
        """Each host must draw its own window stream: the shards hold
        different slices of the global batch, so identical per-slot windows
        across hosts would cut augmentation diversity by the host count
        (regression: the shard id was not folded into the seed)."""
        a = make_view_params(7, 3, 11, 16, 64, 64, shard=0)
        b = make_view_params(7, 3, 11, 16, 64, 64, shard=1)
        assert not np.array_equal(a, b)

    def test_loader_folds_shard_into_windows(self, tmp_path):
        """Two loaders over the same store that differ only in host shard
        must decode different views for their (distinct) samples."""
        import numpy as np

        from medical_image_segmentation_tpu.data.loader import SEQUENTIAL, Loader
        from medical_image_segmentation_tpu.data.store import StoreWriter

        rng = np.random.default_rng(0)
        p = str(tmp_path / "t.mis")
        img = rng.integers(0, 256, size=(64, 64, 1)).astype(np.uint8)
        with StoreWriter(p, channels=1) as w:
            for _ in range(4):
                w.add(img)  # identical images: only the windows can differ
        pc = dict(out_hw=(16, 16), n_views=2)
        kw = dict(batch_size=2, order=SEQUENTIAL, prefetch=0, seed=5, precrop=pc)
        a = next(iter(Loader(p, shard=(0, 2), **kw)))[0]
        b = next(iter(Loader(p, shard=(1, 2), **kw)))[0]
        assert not np.array_equal(a, b), "hosts decoded identical windows"

    def test_distribution_matches_device_sampler(self):
        """Same (scale, ratio) semantics as ops.augment.sample_rrc_window:
        compare area and aspect distributions (moments) between host and
        device samplers."""
        import jax

        from medical_image_segmentation_tpu.ops.augment import sample_rrc_window

        n, in_h, in_w = 4096, 64, 64
        y0, x0, h, w = sample_rrc_window(jax.random.key(0), n, in_h, in_w)
        dev_area = np.asarray(h * w) / (in_h * in_w)
        p = sample_rrc_windows_np(np.random.default_rng(0), n, in_h, in_w)
        host_area = p[:, 2] * p[:, 3] / (in_h * in_w)
        assert abs(dev_area.mean() - host_area.mean()) < 0.02
        assert abs(np.median(dev_area) - np.median(host_area)) < 0.03


class TestCppOracleParity:
    @pytest.mark.parametrize("c", [1, 3])
    def test_fetch_views_matches_numpy_oracle(self, tmp_path, c):
        _native_or_skip()
        from medical_image_segmentation_tpu.data.store.native import NativeStore

        p = tmp_path / "s.mis"
        imgs = _write_store(p, n=6, h=40, w=36, c=c)
        ns = NativeStore(str(p))
        idxs = np.array([0, 3, 5, 2], np.int64)
        params = make_view_params(0, 0, 0, len(idxs), 40, 36, n_views=2)
        got, labels = ns.fetch_views(idxs, params, (16, 12), num_threads=3)
        assert got.shape == (8, 16, 12, c)
        np.testing.assert_array_equal(labels, idxs.astype(np.int32))
        for i, idx in enumerate(idxs):
            for v in range(2):
                y0, x0, ch, cw, flip = params[i, v]
                want = crop_resize_bilinear_np(
                    imgs[idx], float(y0), float(x0), float(ch), float(cw),
                    bool(flip), 16, 12)
                # sample-major layout: view v of sample i at row i*V + v
                diff = np.abs(got[i * 2 + v].astype(int) - want.astype(int))
                # identical math; <=1 tolerates float rounding ties at .5
                assert diff.max() <= 1, f"sample {idx} view {v}: max diff {diff.max()}"
        ns.close()

    def test_fetch_views_png_codec(self, tmp_path):
        _native_or_skip()
        from medical_image_segmentation_tpu.data.store.native import NativeStore

        p = tmp_path / "s.mis"
        imgs = _write_store(p, n=4, h=32, w=32, codec=CODEC_PNG)
        ns = NativeStore(str(p))
        params = make_view_params(1, 0, 0, 4, 32, 32)
        got, _ = ns.fetch_views(np.arange(4, dtype=np.int64), params, (16, 16))
        want, _ = fetch_views_fallback(
            _PyReader(imgs), np.arange(4), params, (16, 16))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        ns.close()

    @pytest.mark.parametrize("c", [1, 3])
    def test_windowed_jpeg_decode_matches_full_decode(self, tmp_path, c):
        """JPEG records take the partial-decode path (jpeg_crop_scanline +
        jpeg_skip_scanlines on the windows' union bbox). Pin it against the
        full libjpeg decode (NativeStore.fetch at native size) + the numpy
        crop oracle: grayscale must match exactly (no chroma upsampling);
        RGB 4:2:0 may differ by 1 LSB at the iMCU skip boundary."""
        _native_or_skip()
        from medical_image_segmentation_tpu.data.store import CODEC_JPEG
        from medical_image_segmentation_tpu.data.store.native import NativeStore

        rng = np.random.default_rng(7)
        h, w, n = 48, 56, 5
        # smooth gradients: JPEG-friendly so full-decode output is stable
        yy, xx = np.mgrid[0:h, 0:w]
        imgs = np.stack([
            np.clip(127 + 60 * np.sin(xx / 7 + i) + 50 * np.cos(yy / 9 - i)
                    + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
            for i in range(n)
        ])[..., None]
        imgs = np.repeat(imgs, c, axis=-1)
        p = tmp_path / "s.mis"
        with StoreWriter(str(p), channels=c) as wtr:
            for i in range(n):
                wtr.add(imgs[i], label=i, codec=CODEC_JPEG, quality=95)
        ns = NativeStore(str(p))
        idxs = np.arange(n, dtype=np.int64)
        full, _ = ns.fetch(idxs, out_hw=(h, w))  # full libjpeg decode, no resize
        params = make_view_params(11, 0, 0, n, h, w, n_views=2)
        got, _ = ns.fetch_views(idxs, params, (20, 20), num_threads=2)
        ns.close()
        worst = 0
        for i in range(n):
            for v in range(2):
                y0, x0, ch, cw, flip = params[i, v]
                want = crop_resize_bilinear_np(
                    full[i], float(y0), float(x0), float(ch), float(cw),
                    bool(flip), 20, 20)
                worst = max(worst, int(np.abs(
                    got[i * 2 + v].astype(int) - want.astype(int)).max()))
        assert worst <= (0 if c == 1 else 1), f"windowed JPEG decode drifted: {worst}"

    def test_degenerate_windows_clamped(self, tmp_path):
        _native_or_skip()
        from medical_image_segmentation_tpu.data.store.native import NativeStore

        p = tmp_path / "s.mis"
        _write_store(p, n=2, h=20, w=20)
        ns = NativeStore(str(p))
        # windows out of range / below 1px must clamp, not crash or fault
        params = np.array(
            [[[-5.0, -5.0, 0.25, 0.25, 0.0], [10.0, 10.0, 99.0, 99.0, 1.0]],
             [[19.5, 19.5, 4.0, 4.0, 0.0], [0.0, 0.0, 20.0, 20.0, 0.0]]],
            np.float32)
        got, _ = ns.fetch_views(np.array([0, 1], np.int64), params, (8, 8))
        assert got.shape == (4, 8, 8, 1)
        ns.close()


class _PyReader:
    """Minimal StoreReader stand-in over an in-memory image array."""

    def __init__(self, imgs):
        self._imgs = imgs

        class H:
            channels = imgs.shape[-1]
            sample_dtype = imgs.dtype

        self.header = H()

    def __getitem__(self, i):
        return self._imgs[i], np.int32(i)


class TestDeviceParity:
    def test_cpp_matches_device_resampler(self, tmp_path):
        """The load-bearing equivalence: for identical windows, the C++
        pre-crop equals the on-device matmul resampler (ops.augment) after
        uint8 rounding — so host-precrop and device-crop training pipelines
        see the same images."""
        _native_or_skip()
        import jax.numpy as jnp

        from medical_image_segmentation_tpu.data.store.native import NativeStore
        from medical_image_segmentation_tpu.ops.augment import (
            _flip_cols, _resize_matrix, apply_resample,
        )

        p = tmp_path / "s.mis"
        imgs = _write_store(p, n=4, h=48, w=48)
        ns = NativeStore(str(p))
        idxs = np.arange(4, dtype=np.int64)
        params = make_view_params(3, 1, 2, 4, 48, 48, n_views=1)
        got, _ = ns.fetch_views(idxs, params, (24, 24))
        ns.close()

        y0, x0, ch, cw, flip = (jnp.asarray(params[:, 0, k]) for k in range(5))
        r_y = _resize_matrix(y0, ch, 48, 24, jnp.float32)
        r_x = _flip_cols(_resize_matrix(x0, cw, 48, 24, jnp.float32), flip > 0)
        dev = apply_resample(jnp.asarray(imgs, jnp.float32), r_y, r_x)
        dev_u8 = np.asarray(jnp.clip(dev + 0.5, 0, 255)).astype(np.uint8)
        diff = np.abs(got.astype(int) - dev_u8.astype(int))
        assert diff.max() <= 1, f"max diff {diff.max()}"


class TestLoaderPrecrop:
    def test_loader_precrop_shapes_and_determinism(self, tmp_path):
        from medical_image_segmentation_tpu.data.loader import RANDOM, Loader

        p = tmp_path / "s.mis"
        _write_store(p, n=24, h=32, w=32)
        mk = lambda: Loader(  # noqa: E731
            str(p), 8, order=RANDOM, seed=5, prefetch=0,
            precrop={"out_hw": (16, 16)})
        l1, l2 = mk(), mk()
        b1 = [b for b in l1]
        b2 = [b for b in l2]
        assert len(b1) == 3
        for (v1, lab1), (v2, lab2) in zip(b1, b2):
            assert v1.shape == (16, 16, 16, 1) and lab1.shape == (8,)
            np.testing.assert_array_equal(v1, v2)  # same seed+epoch → same stream
            np.testing.assert_array_equal(lab1, lab2)
        # next epoch must differ (fresh permutation + fresh windows)
        b1e2 = next(iter(l1))
        assert not np.array_equal(b1e2[0], b1[0][0])
        l1.close()
        l2.close()

    def test_loader_precrop_python_fallback_matches_native(self, tmp_path):
        from medical_image_segmentation_tpu.data.loader import SEQUENTIAL, Loader
        from medical_image_segmentation_tpu.data.store.native import get_lib

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        p = tmp_path / "s.mis"
        _write_store(p, n=8, h=32, w=32)
        kw = dict(order=SEQUENTIAL, seed=2, prefetch=0, precrop={"out_hw": (16, 16)})
        ln = Loader(str(p), 4, use_native=True, **kw)
        lp = Loader(str(p), 4, use_native=False, **kw)
        for (vn, ln_), (vp, lp_) in zip(ln, lp):
            assert np.abs(vn.astype(int) - vp.astype(int)).max() <= 1
            np.testing.assert_array_equal(ln_, lp_)
        ln.close()
        lp.close()


class TestTailAugment:
    def test_tail_matches_full_path_on_identity_crop(self):
        """With an identity window (full image, no flip) and f32 matrices the
        full device path reduces to resample(identity)+tail; pin the tail-only
        path against it so the elementwise ops can never drift apart."""
        import jax
        import jax.numpy as jnp

        from medical_image_segmentation_tpu.ops.augment import (
            ViewConfig, _elementwise_tail, augment_view_tail,
        )

        rng = jax.random.key(42)
        views = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, size=(8, 16, 16, 1)), jnp.uint8)
        cfg = ViewConfig(out_size=(16, 16), solarize_prob=0.5, window_prob=0.5)
        got = augment_view_tail(rng, views, cfg, (57.98,), (60.48,), jnp.float32)
        keys = jax.random.split(rng, 4)
        want = _elementwise_tail(
            keys, views.astype(jnp.float32), cfg, (57.98,), (60.48,), jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)

    def test_two_view_tail_augment_shapes_and_independence(self):
        import jax
        import jax.numpy as jnp

        from medical_image_segmentation_tpu.ops.augment import (
            BYOL_VIEW1, BYOL_VIEW2, two_view_tail_augment,
        )

        views = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, size=(12, 16, 16, 1)), jnp.uint8)
        v1, v2 = two_view_tail_augment(
            jax.random.key(0), views, BYOL_VIEW1, BYOL_VIEW2,
            mean=(57.98,), std=(60.48,), dtype=jnp.float32)
        assert v1.shape == (6, 16, 16, 1) and v2.shape == (6, 16, 16, 1)
        # views share no pixels (different crops upstream) and normalize is
        # applied: outputs are roughly standardized
        a = np.asarray(v1)
        assert abs(a.mean()) < 2.0 and 0.2 < a.std() < 5.0

    def test_sample_major_layout_is_shard_safe(self):
        """The layout invariant behind fetch_views' row order (i*V + v):

        1. concatenating per-host sample-major shards yields a global array
           whose (2i, 2i+1) rows are still the two views of one sample
           (view-major would interleave hosts' pairs wrongly);
        2. running the tail on the batch-sharded global array over the
           8-device mesh equals the unsharded result — the (B, 2) reshape
           split must stay shard-local, not resample across devices."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from medical_image_segmentation_tpu.ops.augment import (
            BYOL_VIEW1, BYOL_VIEW2, two_view_tail_augment,
        )

        rng = np.random.default_rng(3)
        # two "hosts", 8 samples each, V=2, sample-major local arrays
        host_local = [rng.integers(0, 256, size=(16, 8, 8, 1)).astype(np.uint8)
                      for _ in range(2)]
        global_views = np.concatenate(host_local, axis=0)  # (32, 8, 8, 1)
        for h in range(2):
            for i in range(8):
                np.testing.assert_array_equal(
                    global_views[h * 16 + 2 * i], host_local[h][2 * i])
                np.testing.assert_array_equal(
                    global_views[h * 16 + 2 * i + 1], host_local[h][2 * i + 1])

        key = jax.random.key(7)
        args = dict(mean=(57.98,), std=(60.48,), dtype=jnp.float32)
        ref1, ref2 = two_view_tail_augment(
            key, jnp.asarray(global_views), BYOL_VIEW1, BYOL_VIEW2, **args)

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sharded = jax.device_put(
            jnp.asarray(global_views), NamedSharding(mesh, P("data")))
        got1, got2 = two_view_tail_augment(
            key, sharded, BYOL_VIEW1, BYOL_VIEW2, **args)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), atol=0)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=0)

    def test_blur_config_rejected(self):
        import jax
        import jax.numpy as jnp

        from medical_image_segmentation_tpu.ops.augment import (
            ViewConfig, augment_view_tail, precrop_supported,
        )

        cfg = ViewConfig(blur_prob=1.0)
        assert not precrop_supported(cfg)
        with pytest.raises(ValueError):
            augment_view_tail(
                jax.random.key(0), jnp.zeros((2, 8, 8, 1), jnp.uint8), cfg,
                (0.0,), (1.0,))
