"""CLI argument-surface negative-path tests."""

import pytest


def test_unknown_dataset_lists_options():
    from medical_image_segmentation_tpu.data.datamodules import get_datamodule

    with pytest.raises(KeyError, match="RADIOLOGY_1M"):
        get_datamodule("NOT_A_DATASET")


def test_seg_task_rejects_unknown_loss():
    import jax.numpy as jnp

    from medical_image_segmentation_tpu.train import SegmentationTask

    with pytest.raises(ValueError, match="dice_ce"):
        SegmentationTask(loss="focal", dtype=jnp.float32)


def test_loader_unknown_order():
    from medical_image_segmentation_tpu.data.loader import make_order

    with pytest.raises(ValueError, match="unknown order"):
        make_order(10, "chaotic", 0, 0)


def test_registry_duplicate_rejected():
    from medical_image_segmentation_tpu.core.registry import Registry

    r = Registry("thing")
    r.register("a")(object)
    with pytest.raises(KeyError, match="already registered"):
        r.register("a")(object)
