"""Tensor parallelism for the BYOL MLP heads over a ("data","model") mesh.

The sharding annotations in parallel/tp.py must (a) hit the right leaves
(column-parallel Dense_0, sharded hidden BatchNorm, row-parallel Dense_1),
and (b) reproduce the replicated numbers — GSPMD inserts the Megatron
all-reduce, it must not change the math. The reference has no TP at all
(DDP-only, `train_ssl.py:77-89`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from medical_image_segmentation_tpu.parallel import (
    byol_tp_shardings, data_sharding, make_mesh, replicated,
)
from medical_image_segmentation_tpu.train import BYOLTask

pytestmark = pytest.mark.slow  # GSPMD equivalence: compile-heavy on a 1-core host


def _make_task():
    return BYOLTask(arch="resnet18", in_channels=1, hidden_dim=64, proj_dim=16,
                    num_classes=4, total_steps=10, learning_rate=0.1,
                    warmup_epochs=0, max_epochs=1, dtype=jnp.float32)


def test_tp_spec_assignment():
    mesh = make_mesh(axis_names=("data", "model"), axis_sizes=(4, 2))
    task = _make_task()
    state = task.init(jax.random.key(0), (2, 32, 32, 1))
    sh = byol_tp_shardings(mesh, state, hidden_dim=64)

    proj = state.params["encoder"]["projector"]
    proj_sh = sh.params["encoder"]["projector"]
    assert proj["Dense_0"]["kernel"].shape == (512, 64)
    assert proj_sh["Dense_0"]["kernel"].spec == P(None, "model")
    assert proj_sh["Dense_0"]["bias"].spec == P("model")
    assert proj_sh["Dense_1"]["kernel"].spec == P("model", None)
    assert proj_sh["Dense_1"]["bias"].spec == P()
    assert sh.params["predictor"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert sh.batch_stats["encoder"]["projector"]["BatchNorm_0"]["mean"].spec == P("model")
    # target encoder's projector is sharded identically
    assert sh.target_params["projector"]["Dense_0"]["kernel"].spec == P(None, "model")
    # backbone stays replicated
    assert sh.params["encoder"]["ResNet_0"]["conv1"]["kernel"].spec == P()
    # optimizer state mirrors the param shardings (LARS trace)
    specs = {s.spec for s in jax.tree.leaves(sh.opt_state)}
    assert P(None, "model") in specs and P("model", None) in specs

    with pytest.raises(ValueError):
        byol_tp_shardings(mesh, state, hidden_dim=63)


def test_tp_step_matches_replicated():
    assert len(jax.devices()) == 8
    task = _make_task()
    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.normal(size=(8, 32, 32, 1)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(8, 32, 32, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(8,)), jnp.int32)

    s1 = task.init(jax.random.key(0), (2, 32, 32, 1))
    s1, m1 = task.train_step(s1, v1, v2, labels)

    mesh = make_mesh(axis_names=("data", "model"), axis_sizes=(4, 2))
    s2 = task.init(jax.random.key(0), (2, 32, 32, 1))
    s2 = jax.device_put(s2, byol_tp_shardings(mesh, s2, hidden_dim=64))
    ds = data_sharding(mesh, 4)
    s2, m2 = task.train_step(
        s2, jax.device_put(v1, ds), jax.device_put(v2, ds),
        jax.device_put(labels, data_sharding(mesh, 1)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # a second step exercises the sharded optimizer/EMA update chain
    s2, m2b = task.train_step(
        s2, jax.device_put(v2, ds), jax.device_put(v1, ds),
        jax.device_put(labels, data_sharding(mesh, 1)))
    s1, m1b = task.train_step(s1, v2, v1, labels)
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]), rtol=1e-5)
    # the updated projector kernel is still sharded over the model axis
    k = s2.params["encoder"]["projector"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
