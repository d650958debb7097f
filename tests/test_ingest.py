"""Ingest-stage tests: multiprocess harness, subset builder, slicer,
splits, streaming stats — exercising the reference semantics end-to-end on
synthetic DICOM/NIfTI data."""

import json
import os

import cv2
import numpy as np
import pytest

from medical_image_segmentation_tpu.data.dicom import write_dicom
from medical_image_segmentation_tpu.data.nifti import write_nifti
from medical_image_segmentation_tpu.data.ingest import utils
from medical_image_segmentation_tpu.data.ingest.compute_stats import (
    StreamingMoments,
    compute_mean_and_std,
)
from medical_image_segmentation_tpu.data.ingest.create_splits import (
    create_split,
    create_split_by_percent,
    extract_id,
    write_splits,
)
from medical_image_segmentation_tpu.data.ingest.create_subset import (
    get_dicom_image_dimensions,
    get_dicom_image_hashes,
    order_candidates,
    pick_possible_images,
    write_subset,
)
from medical_image_segmentation_tpu.data.ingest.slice_decathlon import (
    pair_scans_and_masks,
    slice_dataset,
)


def _ok(path):
    return {"path": path}


def _boom(path):
    if path.endswith("3"):
        raise RuntimeError("boom")
    return {}


class TestProcessFiles:
    def test_single_process(self):
        paths = [f"f{i}" for i in range(10)]
        out = utils.process_files(paths, _ok, 1, quiet=True)
        assert set(out) == set(paths)

    def test_multi_process(self):
        paths = [f"f{i}" for i in range(20)]
        out = utils.process_files(paths, _ok, 2, quiet=True)
        assert set(out) == set(paths)
        assert out["f7"] == {"path": "f7"}

    def test_invalid_process_count_raises(self):
        with pytest.raises(ValueError):
            utils.process_files(["a"], _ok, 0)

    def test_worker_error_propagates(self):
        with pytest.raises(RuntimeError):
            utils.process_files([f"f{i}" for i in range(8)], _boom, 2, quiet=True)

    def test_get_file_paths_filters(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "a.dcm").write_bytes(b"")
        (tmp_path / "sub" / "b.DCM").write_bytes(b"")
        (tmp_path / "c.txt").write_bytes(b"")
        got = utils.get_file_paths([str(tmp_path)], [".dcm"])
        assert len(got) == 2


def _make_dicom_tree(tmp_path, n=8, size=300, dataset="pancreasct"):
    """Synthetic med_datasets/<dataset>/*.dcm tree; returns paths."""
    d = tmp_path / "med_datasets" / dataset
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(hash(dataset) % 2**31)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 4096, size=(size, size)).astype(np.uint16)
        p = str(d / f"img{i}.dcm")
        write_dicom(p, arr)
        paths.append(p)
    return paths


class TestSubsetPipeline:
    def test_scans_and_write_subset_end_to_end(self, tmp_path):
        paths = _make_dicom_tree(tmp_path, n=6, size=300)
        # one image too small, one too large → filtered out
        small = str(tmp_path / "med_datasets" / "pancreasct" / "small.dcm")
        write_dicom(small, np.zeros((100, 100), np.uint16))
        big = str(tmp_path / "med_datasets" / "pancreasct" / "big.dcm")
        write_dicom(big, np.zeros((900, 900), np.uint16))
        # a duplicate of paths[0] → deduped
        import shutil

        dup = str(tmp_path / "med_datasets" / "pancreasct" / "dup.dcm")
        shutil.copy(paths[0], dup)

        all_paths = paths + [small, big, dup]
        dims = get_dicom_image_dimensions(all_paths, 1)
        hashes = get_dicom_image_hashes(all_paths, 1)
        assert len(dims) == 9 and len(hashes) == 9

        cands = pick_possible_images(dims, hashes)
        assert small not in cands and big not in cands
        assert sum(1 for c in cands if c in (paths[0], dup)) == 1  # deduped

        out_dir = str(tmp_path / "subset")
        mapping = write_subset(dims, hashes, out_dir, size=4, num_subfolders=3, seed=2)
        assert len(mapping) == 4
        for orig, new in mapping.items():
            img = cv2.imread(new, cv2.IMREAD_UNCHANGED)
            assert img is not None and img.dtype == np.uint16
            assert img.min() == 0 and img.max() == 65535  # min-max → full range
            # hash-named file inside a bucket subfolder
            assert os.path.basename(new).endswith(".png")
            assert os.path.basename(os.path.dirname(new)) in {"0", "1", "2"}

    def test_retry_tops_up_after_failures(self, tmp_path):
        paths = _make_dicom_tree(tmp_path, n=6, size=280)
        # corrupt two files AFTER scanning so the writer fails on them
        dims = get_dicom_image_dimensions(paths, 1)
        hashes = get_dicom_image_hashes(paths, 1)
        for p in paths[:2]:
            open(p, "wb").write(b"garbage")
        out_dir = str(tmp_path / "subset")
        mapping = write_subset(dims, hashes, out_dir, size=4, num_subfolders=2, seed=0)
        assert len(mapping) == 4  # topped up from the remaining 4 good files
        assert all(p not in mapping for p in paths[:2])

    def test_write_to_null_benchmark_mode(self, tmp_path):
        paths = _make_dicom_tree(tmp_path, n=3, size=260)
        dims = get_dicom_image_dimensions(paths, 1)
        hashes = get_dicom_image_hashes(paths, 1)
        mapping = write_subset(dims, hashes, str(tmp_path / "x"), size=3, write_to_null=True)
        assert len(mapping) == 3
        assert not (tmp_path / "x").exists()  # nothing written to disk

    def test_deprioritized_datasets_go_last(self, tmp_path):
        a = _make_dicom_tree(tmp_path, n=4, size=260, dataset="pancreasct")
        b = _make_dicom_tree(tmp_path, n=4, size=260, dataset="dukebreastcancer")
        ordered = order_candidates(a + b, seed=1)
        names = ["duke" in p for p in ordered]
        assert names == [False] * 4 + [True] * 4


class TestSlicer:
    def _make_volumes(self, tmp_path, n=2):
        img_dir = tmp_path / "imagesTr"
        lbl_dir = tmp_path / "labelsTr"
        img_dir.mkdir()
        lbl_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            vol = rng.normal(100, 50, size=(16, 16, 5)).astype(np.float32)
            seg = (rng.random((16, 16, 5)) > 0.8).astype(np.uint8)
            write_nifti(str(img_dir / f"la_{i:03d}.nii.gz"), vol)
            write_nifti(str(lbl_dir / f"la_{i:03d}.nii.gz"), seg)
        return str(img_dir), str(lbl_dir)

    def test_pairing_and_slicing(self, tmp_path):
        img_dir, lbl_dir = self._make_volumes(tmp_path)
        pairs = pair_scans_and_masks(img_dir, lbl_dir)
        assert len(pairs) == 2
        io_dir = str(tmp_path / "imgs")
        mo_dir = str(tmp_path / "msks")
        statuses = slice_dataset(img_dir, lbl_dir, io_dir, mo_dir, num_processes=1)
        assert all("slices" in s for s in statuses.values())
        imgs = sorted(os.listdir(io_dir))
        msks = sorted(os.listdir(mo_dir))
        assert len(imgs) == 10 and imgs == msks  # 2 volumes × 5 slices, paired names
        m = cv2.imread(os.path.join(mo_dir, msks[0]), cv2.IMREAD_UNCHANGED)
        assert set(np.unique(m)) <= {0, 255}  # binarized (slice != 0) * 255
        im = cv2.imread(os.path.join(io_dir, imgs[0]), cv2.IMREAD_UNCHANGED)
        assert im.dtype == np.uint8


class TestSplits:
    def test_extract_id_strips_slice_index(self):
        assert extract_id("la_003_42.png") == "la_003"
        assert extract_id("liver_117_0.png") == "liver_117"

    def test_extract_id_nifti_volume_is_own_id(self):
        # volumetric path: la_003.nii.gz keys the same volume as la_003_*.png
        assert extract_id("la_003.nii.gz") == "la_003"
        assert extract_id("la_003.nii") == "la_003"

    def test_write_splits_from_nifti_dir(self, tmp_path):
        img_dir = tmp_path / "imagesTr"
        img_dir.mkdir()
        for v in range(10):
            (img_dir / f"la_{v:03d}.nii.gz").write_bytes(b"")
        out = write_splits(str(img_dir), str(tmp_path / "splits"), seed=0)
        sp = json.load(open(out[-2]))  # split_100_percent_train.json
        assert len(sp["train"]) + len(sp["val"]) + len(sp["test"]) == 10
        assert all(i.startswith("la_") and ".nii" not in i for i in sp["train"])

    def test_split_fractions_and_disjoint(self):
        ids = [f"v_{i:03d}" for i in range(100)]
        sp = create_split(ids, seed=0)
        assert len(sp["train"]) == 70 and len(sp["val"]) == 20 and len(sp["test"]) == 10
        assert not (set(sp["train"]) & set(sp["val"]) & set(sp["test"]))
        assert set(sp["train"]) | set(sp["val"]) | set(sp["test"]) == set(ids)

    def test_percent_subsets_nested(self):
        ids = [f"v_{i:03d}" for i in range(100)]
        sp = create_split(ids, seed=0)
        subs = {p: set(create_split_by_percent(sp, p, seed=0)["train"]) for p in (10, 25, 50, 100)}
        assert subs[10] <= subs[25] <= subs[50] <= subs[100]
        assert len(subs[10]) == 7 and len(subs[100]) == 70
        for p in (10, 25, 50):
            assert create_split_by_percent(sp, p, seed=0)["val"] == sp["val"]

    def test_write_splits_files(self, tmp_path):
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for v in range(10):
            for s in range(3):
                (img_dir / f"la_{v:03d}_{s}.png").write_bytes(b"")
        out = write_splits(str(img_dir), str(tmp_path / "splits"), seed=0)
        assert len(out) == 5
        sp = json.load(open(os.path.join(str(tmp_path / "splits"), "split_100_percent_train.json")))
        # split ids are volumes, not slices
        assert all("_" in i and not i.endswith(".png") for i in sp["train"])
        assert len(sp["train"]) + len(sp["val"]) + len(sp["test"]) == 10


class TestStats:
    def test_matches_direct_computation(self):
        rng = np.random.default_rng(1)
        batches = [rng.random((4, 8, 8, 3)) * 255 for _ in range(5)]
        mean, std = compute_mean_and_std(batches, channels=3)
        full = np.concatenate([b.reshape(-1, 3) for b in batches])
        np.testing.assert_allclose(mean, full.mean(axis=0), rtol=1e-12)
        np.testing.assert_allclose(std, full.std(axis=0), rtol=1e-10)

    def test_float64_accumulation_large_values(self):
        """float32 accumulation would lose mass here; float64 must not."""
        acc = StreamingMoments(1)
        big = np.full((1000, 100, 1), 60000.0)
        for _ in range(20):
            acc.update(big)
        mean, std = acc.finalize()
        np.testing.assert_allclose(mean, 60000.0, rtol=1e-12)
        np.testing.assert_allclose(std, 0.0, atol=1e-6)

    def test_grayscale_3d_batches(self):
        batches = [np.ones((2, 4, 4)) * 10, np.ones((2, 4, 4)) * 20]
        mean, std = compute_mean_and_std(batches, channels=1)
        np.testing.assert_allclose(mean, [15.0])
        np.testing.assert_allclose(std, [5.0])


class TestProcessFilesStress:
    def test_10k_files_multiprocess(self):
        """10k-file stress with 2 workers (reference test_utils.py:41-48)."""
        paths = [f"f{i}" for i in range(10_000)]
        out = utils.process_files(paths, _ok, 2, quiet=True)
        assert len(out) == 10_000
        assert out["f9999"] == {"path": "f9999"}


class TestTciaManifest:
    def test_parse(self, tmp_path):
        from medical_image_segmentation_tpu.data.ingest.tcia import parse_manifest

        p = tmp_path / "x.tcia"
        p.write_text(
            "downloadServerUrl=https://example/servlet\n"
            "databasketId=manifest-x.tcia\n"
            "manifestVersion=3.0\n"
            "ListOfSeriesToDownload=\n"
            "1.3.6.1.4.1.14519.5.2.1.1\n"
            "1.3.6.1.4.1.14519.5.2.1.2\n"
        )
        m = parse_manifest(str(p))
        assert m.version == "3.0"
        assert m.server_url.endswith("servlet")
        assert m.series_uids == ["1.3.6.1.4.1.14519.5.2.1.1", "1.3.6.1.4.1.14519.5.2.1.2"]

    def test_download_offline_returns_error_status(self, tmp_path):
        from medical_image_segmentation_tpu.data.ingest.tcia import download_series

        st = download_series("1.2.3", str(tmp_path / "out"), timeout=1.0)
        assert "error" in st  # zero-egress box: must fail gracefully, not raise
