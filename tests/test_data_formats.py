"""Round-trip and spec tests for the DICOM/NIfTI parsers."""

import gzip
import io
import struct

import numpy as np
import pytest

from medical_image_segmentation_tpu.data.dicom import (
    EXPLICIT_VR_LE,
    IMPLICIT_VR_LE,
    UnsupportedTransferSyntax,
    read_dicom,
    write_dicom,
)
from medical_image_segmentation_tpu.data.nifti import read_nifti, write_nifti


class TestDicom:
    @pytest.mark.parametrize("explicit", [True, False])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16])
    def test_roundtrip(self, tmp_path, explicit, dtype):
        rng = np.random.default_rng(0)
        if dtype == np.int16:
            arr = rng.integers(-1000, 3000, size=(32, 40)).astype(dtype)
        else:
            arr = rng.integers(0, np.iinfo(dtype).max, size=(32, 40)).astype(dtype)
        p = str(tmp_path / "t.dcm")
        write_dicom(p, arr, explicit=explicit)
        d = read_dicom(p)
        assert d.rows == 32 and d.columns == 40
        np.testing.assert_array_equal(d.pixel_array, arr)

    def test_multiframe(self, tmp_path):
        arr = np.arange(3 * 8 * 8, dtype=np.uint16).reshape(3, 8, 8)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, arr)
        d = read_dicom(p)
        assert d.pixel_array.shape == (3, 8, 8)
        np.testing.assert_array_equal(d.pixel_array, arr)

    def test_header_only_fast_path(self, tmp_path):
        arr = np.zeros((64, 48), np.uint16)
        p = str(tmp_path / "h.dcm")
        write_dicom(p, arr)
        d = read_dicom(p, stop_before_pixels=True)
        assert (d.rows, d.columns) == (64, 48)
        assert d.pixel_bytes is None
        with pytest.raises(Exception):
            _ = d.pixel_array

    def test_undefined_length_sequence_skipped(self, tmp_path):
        """An undefined-length SQ before the kept elements must be walked over."""
        arr = np.ones((8, 8), np.uint16) * 7
        # item with 4 bytes content, then sequence delimiter
        item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x00" * 4
        seq_payload = item + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        # explicit SQ with undefined length
        sq = struct.pack("<HH2sHI", 0x0008, 0x1140, b"SQ", 0, 0xFFFFFFFF) + seq_payload
        p = str(tmp_path / "sq.dcm")
        write_dicom(p, arr)
        raw = open(p, "rb").read()
        # splice the SQ right after "DICM"+meta: find first dataset element (0008,0018)
        idx = raw.find(struct.pack("<HH", 0x0008, 0x0018))
        patched = raw[:idx] + sq + raw[idx:]
        p2 = str(tmp_path / "sq2.dcm")
        open(p2, "wb").write(patched)
        d = read_dicom(p2)
        np.testing.assert_array_equal(d.pixel_array, arr)

    def test_compressed_transfer_syntax_rejected(self, tmp_path):
        arr = np.zeros((8, 8), np.uint8)
        p = str(tmp_path / "c.dcm")
        write_dicom(p, arr, transfer_syntax="1.2.840.10008.1.2.4.70")  # JPEG lossless
        with pytest.raises(UnsupportedTransferSyntax):
            read_dicom(p)

    def test_sha256_stability_across_encodings(self, tmp_path):
        """Hash of pixel_array must not depend on explicit/implicit encoding
        (the dedupe correctness requirement, reference create_subset.py:466-537)."""
        import hashlib

        arr = np.random.default_rng(1).integers(0, 4096, size=(16, 16)).astype(np.uint16)
        pa = str(tmp_path / "a.dcm")
        pb = str(tmp_path / "b.dcm")
        write_dicom(pa, arr, explicit=True)
        write_dicom(pb, arr, explicit=False)
        ha = hashlib.sha256(read_dicom(pa).pixel_array.tobytes()).hexdigest()
        hb = hashlib.sha256(read_dicom(pb).pixel_array.tobytes()).hexdigest()
        assert ha == hb


class TestNifti:
    @pytest.mark.parametrize("gz", [False, True])
    @pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
    def test_roundtrip(self, tmp_path, gz, dtype):
        rng = np.random.default_rng(2)
        vol = rng.normal(0, 100, size=(12, 10, 8)).astype(dtype)
        p = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
        write_nifti(p, vol)
        n = read_nifti(p)
        assert n.shape == (12, 10, 8)
        np.testing.assert_array_equal(n.data, vol)

    def test_fortran_order_axis_semantics(self, tmp_path):
        """x must be the fastest-varying axis on disk (NIfTI spec)."""
        vol = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4, order="F")
        p = str(tmp_path / "f.nii")
        write_nifti(p, vol)
        raw = open(p, "rb").read()
        stored = np.frombuffer(raw, np.int16, count=24, offset=352)
        np.testing.assert_array_equal(stored, np.arange(24, dtype=np.int16))
        np.testing.assert_array_equal(read_nifti(p).data, vol)

    def test_scl_slope_inter(self, tmp_path):
        vol = np.array([[[0, 1], [2, 3]]], np.int16)
        p = str(tmp_path / "s.nii")
        write_nifti(p, vol, scl_slope=2.0, scl_inter=-1.0)
        f = read_nifti(p).get_fdata()
        np.testing.assert_allclose(f, vol.astype(np.float64) * 2.0 - 1.0)
        assert f.dtype == np.float64

    def test_4d_volume(self, tmp_path):
        vol = np.zeros((4, 5, 6, 2), np.float32)
        p = str(tmp_path / "v4.nii")
        write_nifti(p, vol)
        assert read_nifti(p).shape == (4, 5, 6, 2)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.nii")
        open(p, "wb").write(b"\x00" * 400)
        with pytest.raises(ValueError):
            read_nifti(p)


class TestDicomRobustness:
    """The subset scan walks ~1M untrusted files; the parser must fail with
    DicomError/ValueError (caught per-file by the ingest harness), never
    hang or crash the process."""

    def _parse(self, raw):
        import io

        from medical_image_segmentation_tpu.data.dicom import read_dicom

        return read_dicom(io.BytesIO(raw))

    def test_truncated_everywhere(self, tmp_path):
        arr = np.arange(64, dtype=np.uint16).reshape(8, 8)
        p = str(tmp_path / "t.dcm")
        write_dicom(p, arr)
        raw = open(p, "rb").read()
        for cut in [0, 10, 131, 133, 140, len(raw) // 2, len(raw) - 3]:
            try:
                self._parse(raw[:cut])
            except Exception as e:
                assert isinstance(e, (ValueError, EOFError, struct.error)), f"cut={cut}: {type(e)}"

    def test_random_garbage(self):
        rng = np.random.default_rng(0)
        for n in [0, 1, 132, 500, 5000]:
            raw = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            try:
                d = self._parse(raw)
                _ = d.elements  # parsed as bare dataset — fine if no crash
            except Exception as e:
                assert isinstance(e, (ValueError, struct.error)), f"n={n}: {type(e)}"

    def test_bitflipped_valid_file(self, tmp_path):
        arr = np.arange(256, dtype=np.uint16).reshape(16, 16)
        p = str(tmp_path / "b.dcm")
        write_dicom(p, arr)
        raw = bytearray(open(p, "rb").read())
        rng = np.random.default_rng(1)
        for _ in range(200):
            mutated = bytearray(raw)
            i = rng.integers(132, len(raw))
            mutated[i] ^= 1 << rng.integers(0, 8)
            try:
                self._parse(bytes(mutated))
            except Exception as e:
                assert isinstance(e, (ValueError, struct.error, MemoryError)), type(e)

    def test_huge_declared_length_truncates_cleanly(self, tmp_path):
        """An element declaring a 4GB length must raise, not allocate."""
        import struct as st

        meta = b"\x00" * 128 + b"DICM"
        ts = b"1.2.840.10008.1.2.1\x00"
        # UI is a short-form VR: 2-byte length, no reserved bytes
        meta += st.pack("<HH2sH", 2, 0x10, b"UI", len(ts)) + ts
        body = st.pack("<HH2sHI", 0x7FE0, 0x0010, b"OW", 0, 0xFFFFFFF0) + b"\x00" * 10
        try:
            self._parse(meta + body)
            assert False, "expected failure"
        except Exception as e:
            assert isinstance(e, (ValueError, struct.error, MemoryError))


import struct  # noqa: E402  (used by robustness tests)
