"""Tests for auxiliary tools: viz grids, terminal plotting, store viewer,
dataset adapters, profiling timers."""

import csv
import os

import numpy as np

from medical_image_segmentation_tpu.core.profiling import StageTimers
from medical_image_segmentation_tpu.data.datasets import ChestXRayDataset, Radiology1MDataset
from medical_image_segmentation_tpu.data.ingest.show_store import main as show_store_main
from medical_image_segmentation_tpu.data.store import CODEC_RAW, StoreWriter
from medical_image_segmentation_tpu.utils.plot_metrics import ascii_plot, load_metric
from medical_image_segmentation_tpu.utils.viz import (
    print_batch_stats,
    save_combined_image_grid,
    save_image_grid,
)


class TestViz:
    def test_save_image_grid(self, tmp_path):
        import cv2

        batch = np.random.default_rng(0).integers(0, 255, size=(9, 16, 16, 1)).astype(np.uint8)
        p = str(tmp_path / "grid.png")
        save_image_grid(batch, p, nrow=3)
        img = cv2.imread(p)
        assert img is not None and img.shape[0] > 16 * 2

    def test_combined_grid_overlays(self, tmp_path):
        import cv2

        imgs = np.zeros((1, 16, 16, 1), np.float32)
        pred = np.zeros((1, 16, 16, 1), np.float32)
        true = np.zeros((1, 16, 16, 1), np.float32)
        pred[0, 2:6, 2:6] = 1  # → red
        true[0, 10:14, 10:14] = 1  # → blue
        p = str(tmp_path / "c.png")
        save_combined_image_grid(imgs, pred, true, p, nrow=1)
        img = cv2.imread(p)  # BGR
        assert img[2 + 2, 2 + 2, 2] > 100 and img[2 + 2, 2 + 2, 0] < 50  # red at pred
        assert img[2 + 10, 2 + 10, 0] > 100 and img[2 + 10, 2 + 10, 2] < 50  # blue at truth

    def test_print_batch_stats_runs(self, capsys):
        import sys

        print_batch_stats("x", np.ones((2, 3)), file=sys.stdout)
        assert "shape=(2, 3)" in capsys.readouterr().out


class TestPlotMetrics:
    def test_load_and_plot(self, tmp_path):
        p = str(tmp_path / "metrics.csv")
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["loss", "step"])
            w.writeheader()
            for i in range(20):
                w.writerow({"loss": 1.0 / (i + 1), "step": i})
        xs, ys = load_metric([p], "loss")
        assert len(xs) == 20 and ys[0] == 1.0
        chart = ascii_plot(xs, ys, title="loss")
        assert "loss" in chart and "*" in chart


class TestShowStore:
    def test_grid_from_store(self, tmp_path):
        store = str(tmp_path / "s.mis")
        rng = np.random.default_rng(1)
        with StoreWriter(store, channels=1) as w:
            for _ in range(4):
                w.add(rng.integers(0, 255, size=(16, 16, 1)).astype(np.uint8), codec=CODEC_RAW)
        out = str(tmp_path / "g.png")
        assert show_store_main(["--store", store, "--num_images", "4", "--output", out]) == 0
        assert os.path.exists(out)


class TestDatasets:
    def test_radiology_dataset_uint16_conversion(self, tmp_path):
        import cv2

        d = tmp_path / "imgs" / "0"
        d.mkdir(parents=True)
        img16 = (np.ones((8, 8), np.uint16) * 51400)  # 51400/256 = 200.78 → 200
        cv2.imwrite(str(d / "a.png"), img16)
        ds = Radiology1MDataset(str(tmp_path / "imgs"))
        out = ds[0]
        assert out.shape == (8, 8, 1) and out.dtype == np.uint8
        assert int(out[0, 0, 0]) == 51400 // 256

    def test_chest_xray_csv(self, tmp_path):
        import cv2

        for name in ("a.png", "b.png"):
            cv2.imwrite(str(tmp_path / name), np.zeros((8, 8), np.uint8))
        csv_path = str(tmp_path / "m.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["Image Index", "Finding Labels"])
            w.writeheader()
            w.writerow({"Image Index": "a.png", "Finding Labels": "Atelectasis|Effusion"})
            w.writerow({"Image Index": "b.png", "Finding Labels": "No Finding"})
        ds = ChestXRayDataset(str(tmp_path), csv_path)
        assert ds.num_classes == 2
        img, label = ds[0]
        assert img.shape == (8, 8, 1)
        assert label == ds.label_index["Atelectasis"]


class TestProfiling:
    def test_stage_timers(self):
        t = StageTimers()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()


class TestMetricsLogger:
    def test_append_mode_and_header_rewrite(self, tmp_path):
        import csv as _csv

        from medical_image_segmentation_tpu.core.metrics_logger import CSVMetricsLogger

        lg = CSVMetricsLogger(str(tmp_path), version=0)
        for i in range(5):
            lg.log({"loss": 1.0 / (i + 1)}, step=i, epoch=0)
        lg.log({"loss": 0.1, "val/acc@1": 0.5}, step=5, epoch=1)  # new key → rewrite
        lg.log({"val/acc@1": 0.6}, step=6, epoch=1)               # append again
        rows = list(_csv.DictReader(open(lg.path)))
        assert len(rows) == 7
        assert rows[0]["loss"] == "1.0" and rows[0]["val/acc@1"] == ""
        assert rows[6]["val/acc@1"] == "0.6"
