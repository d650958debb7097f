"""Model shape/structure tests (fp32 on CPU for numerical checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_segmentation_tpu.models import BYOLNet, Encoder, UNet, make_resnet


def _n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class TestResNet:
    def test_resnet18_param_count_matches_torchvision(self):
        # torchvision resnet18 has 11,689,512 params incl. the 1000-way fc
        # (512*1000+1000 = 513,000); our backbone omits the fc.
        model = make_resnet("resnet18", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        assert _n_params(variables["params"]) == 11_689_512 - 513_000

    def test_resnet50_param_count_matches_torchvision(self):
        model = make_resnet("resnet50", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        # torchvision resnet50: 25,557,032 incl. fc (2048*1000+1000)
        assert _n_params(variables["params"]) == 25_557_032 - 2_049_000

    def test_pooled_output_dim(self):
        model = make_resnet("resnet18", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)))
        out, _ = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=True, mutable=["batch_stats"])
        assert out.shape == (2, 512)

    def test_pyramid_strides(self):
        model = make_resnet("resnet18", dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        pyr, _ = model.apply(variables, x, train=True, return_pyramid=True, mutable=["batch_stats"])
        assert [f.shape[1] for f in pyr] == [32, 16, 8, 4, 2]
        assert [f.shape[-1] for f in pyr] == [64, 64, 128, 256, 512]

    def test_low_res_stem_preserves_resolution(self):
        model = make_resnet("resnet18", low_res=True, dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)
        pyr, _ = model.apply(variables, x, train=True, return_pyramid=True, mutable=["batch_stats"])
        assert [f.shape[1] for f in pyr] == [32, 32, 16, 8, 4]
        # CIFAR stem: 3x3 conv (byol_pytorch.py:58-69)
        assert variables["params"]["conv1"]["kernel"].shape == (3, 3, 3, 64)

    def test_grayscale_stem(self):
        model = make_resnet("resnet18", in_channels=1, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 1))
        variables = model.init(jax.random.key(0), x)
        # 1-channel 7x7 stride-2 stem (byol_pytorch.py:71-82)
        assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 1, 64)


class TestUNet:
    def test_output_shape_and_dtype(self):
        model = UNet(arch="resnet18", n_classes=1, in_channels=1, dtype=jnp.float32)
        x = jnp.zeros((2, 64, 64, 1))
        variables = model.init(jax.random.key(0), x)
        logits, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 64, 64, 1)
        assert logits.dtype == jnp.float32

    def test_eval_mode_uses_running_stats(self):
        model = UNet(arch="resnet18", n_classes=1, in_channels=1, dtype=jnp.float32)
        x = jnp.ones((1, 32, 32, 1))
        variables = model.init(jax.random.key(0), x)
        out1 = model.apply(variables, x, train=False)
        out2 = model.apply(variables, x * 2, train=False)
        assert out1.shape == out2.shape


class TestBYOLNet:
    def test_forward_shapes(self):
        model = BYOLNet(
            arch="resnet18", in_channels=3, low_res=True, hidden_dim=512, proj_dim=64,
            num_classes=10, dtype=jnp.float32,
        )
        x = jnp.zeros((4, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)
        (p, z, feats, logits), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
        assert p.shape == (4, 64) and z.shape == (4, 64)
        assert feats.shape == (4, 512) and logits.shape == (4, 10)

    def test_embed_matches_encoder_subtree(self):
        """Standalone Encoder applied with the BYOLNet 'encoder' subtree must
        reproduce BYOLNet.embed — required for the momentum branch."""
        model = BYOLNet(arch="resnet18", low_res=True, hidden_dim=256, proj_dim=32, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.key(0), x)
        emb = model.apply(variables, x, train=False, method=BYOLNet.embed)

        enc = Encoder(arch="resnet18", low_res=True, hidden_dim=256, proj_dim=32, dtype=jnp.float32)
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        emb2 = enc.apply(enc_vars, x, train=False, return_embedding=True)
        np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), rtol=1e-5, atol=1e-5)


class TestExtendedArchs:
    def test_resnext50_param_count_matches_torchvision(self):
        model = make_resnet("resnext50_32x4d", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        # torchvision resnext50_32x4d: 25,028,904 incl. 2,049,000-param fc
        assert _n_params(variables["params"]) == 25_028_904 - 2_049_000

    def test_wide_resnet50_param_count_matches_torchvision(self):
        model = make_resnet("wide_resnet50_2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        # torchvision wide_resnet50_2: 68,883,240 incl. fc
        assert _n_params(variables["params"]) == 68_883_240 - 2_049_000

    def test_unknown_arch_lists_options(self):
        import pytest

        with pytest.raises(ValueError, match="resnext50_32x4d"):
            make_resnet("resnet9000")


class TestUNetInputValidation:
    def test_clear_error_on_bad_size(self):
        import pytest

        model = UNet(arch="resnet18", dtype=jnp.float32)
        with pytest.raises(ValueError, match="divisible by 32"):
            model.init(jax.random.key(0), jnp.zeros((1, 50, 50, 1)))


class TestRemat:
    """remat=True must be a pure memory/compute trade: identical param tree
    and identical numbers (the checkpointed blocks recompute, not change)."""

    def test_resnet_remat_tree_and_values(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from medical_image_segmentation_tpu.models.resnet import make_resnet

        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 1)), jnp.float32)
        m1 = make_resnet("resnet18", in_channels=1, dtype=jnp.float32)
        m2 = make_resnet("resnet18", in_channels=1, dtype=jnp.float32, remat=True)
        v1 = m1.init(jax.random.key(0), x, train=False)
        v2 = m2.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
        o1 = m1.apply(v1, x, train=False)
        o2 = m2.apply(v1, x, train=False)  # same variables through the remat model
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)

        def loss(m, v):
            return jnp.sum(m.apply(v, x, train=False))

        g1 = jax.grad(lambda v: loss(m1, v))(v1)
        g2 = jax.grad(lambda v: loss(m2, v))(v1)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_byol_task_remat_smoke(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from medical_image_segmentation_tpu.train import BYOLTask

        task = BYOLTask(arch="resnet18", in_channels=1, hidden_dim=32, proj_dim=8,
                        num_classes=4, total_steps=10, dtype=jnp.float32, remat=True)
        state = task.init(jax.random.key(0), (2, 32, 32, 1))
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(4, 32, 32, 1)), jnp.float32)
        state, m = task.train_step(state, v, v)
        assert np.isfinite(float(m["loss"]))
