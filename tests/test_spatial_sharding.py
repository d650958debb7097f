"""Spatial (H-dim) sharding of segmentation inputs over a ("data","space")
mesh — XLA must insert conv halo exchanges and reproduce the unsharded
numbers exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_tpu.parallel import make_mesh, replicated
from medical_image_segmentation_tpu.parallel.mesh import spatial_sharding
from medical_image_segmentation_tpu.train import SegmentationTask

pytestmark = pytest.mark.slow  # GSPMD halo-exchange equivalence: compile-heavy on a 1-core host


def test_spatially_sharded_step_matches_unsharded():
    assert len(jax.devices()) == 8
    mesh = make_mesh(axis_names=("data", "space"), axis_sizes=(4, 2))
    task = SegmentationTask(arch="resnet18", dtype=jnp.float32, learning_rate=0.1,
                            warmup_epochs=0, max_epochs=10, min_lr=0.0)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 64, 64, 1)).astype(np.float32)
    masks = (rng.random((4, 64, 64, 1)) > 0.5).astype(np.float32)

    s1 = task.init(jax.random.key(0), (4, 64, 64, 1))
    _, m1 = task.train_step(s1, jnp.asarray(images), jnp.asarray(masks))

    s2 = task.init(jax.random.key(0), (4, 64, 64, 1))
    s2 = jax.device_put(s2, replicated(mesh))
    imgs_sh = jax.device_put(jnp.asarray(images), spatial_sharding(mesh))
    msks_sh = jax.device_put(jnp.asarray(masks), spatial_sharding(mesh))
    _, m2 = task.train_step(s2, imgs_sh, msks_sh)

    np.testing.assert_allclose(float(m1["train/loss"]), float(m2["train/loss"]), rtol=1e-4)


def test_eval_512_spatially_sharded_compiles():
    """Full-res 512² eval sharded over H — the memory-relief configuration."""
    mesh = make_mesh(axis_names=("data", "space"), axis_sizes=(2, 4))
    task = SegmentationTask(arch="resnet18", dtype=jnp.float32)
    state = task.init(jax.random.key(0), (2, 512, 512, 1))
    state = jax.device_put(state, replicated(mesh))
    images = jax.device_put(jnp.zeros((2, 512, 512, 1)), spatial_sharding(mesh))
    masks = jax.device_put(jnp.zeros((2, 512, 512, 1)), spatial_sharding(mesh))
    m = task.eval_step(state, images, masks)
    assert np.isfinite(float(m["loss"]))
