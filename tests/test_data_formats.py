"""Round-trip and spec tests for the DICOM/NIfTI parsers."""

import gzip
import io
import struct

import numpy as np
import pytest

from medical_image_segmentation_tpu.data.dicom import (
    EXPLICIT_VR_LE,
    IMPLICIT_VR_LE,
    JPEG_BASELINE,
    JPEG_LOSSLESS,
    JPEG_LOSSLESS_SV1,
    RLE_LOSSLESS,
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

    def test_unsupported_codec_rejected_at_decode_only(self, tmp_path):
        """A still-unsupported codec (J2K) must parse (header scan works) and
        raise only when pixels are requested — the per-file error-status
        contract of the ingest tools (reference create_subset.py:197-241)."""
        arr = np.random.default_rng(0).integers(0, 255, size=(8, 8)).astype(np.uint8)
        p = str(tmp_path / "c.dcm")
        write_dicom(p, arr, transfer_syntax=JPEG_LOSSLESS)
        raw = open(p, "rb").read()
        # patch the transfer-syntax UID to JPEG2000 (same 22-char length)
        patched = raw.replace(JPEG_LOSSLESS.encode(), b"1.2.840.10008.1.2.4.91")
        p2 = str(tmp_path / "j2k.dcm")
        open(p2, "wb").write(patched)
        d = read_dicom(p2, stop_before_pixels=True)
        assert (d.rows, d.columns) == (8, 8)  # header scan fine
        d = read_dicom(io.BytesIO(patched))   # no source_path → no pydicom fallback
        with pytest.raises(UnsupportedTransferSyntax):
            _ = d.pixel_array


class TestCompressedDicom:
    """Encapsulated pixel data (PS3.5 §A.4) + RLE / JPEG-lossless /
    JPEG-baseline codecs — the capability the reference gets from
    pydicom+GDCM/pylibjpeg (docker/Dockerfile:34-35)."""

    @pytest.mark.parametrize("ts", [RLE_LOSSLESS, JPEG_LOSSLESS, JPEG_LOSSLESS_SV1])
    @pytest.mark.parametrize("dtype,bits", [(np.uint8, 8), (np.uint16, 16)])
    def test_lossless_roundtrip(self, tmp_path, ts, dtype, bits):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, np.iinfo(dtype).max, size=(33, 41)).astype(dtype)
        p = str(tmp_path / "c.dcm")
        write_dicom(p, arr, transfer_syntax=ts)
        d = read_dicom(p)
        assert d.pixel_fragments is not None
        np.testing.assert_array_equal(d.pixel_array.astype(np.uint32),
                                      arr.astype(np.uint32))

    def test_multiframe_rle_with_offset_table(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 65535, size=(4, 16, 20)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, arr, transfer_syntax=RLE_LOSSLESS)
        d = read_dicom(p)
        assert d.basic_offset_table is not None and len(d.basic_offset_table) == 4
        np.testing.assert_array_equal(d.pixel_array, arr)

    def test_jpeg_baseline_lossy_close(self, tmp_path):
        base = np.full((32, 32), 120, np.uint8)
        p = str(tmp_path / "jb.dcm")
        write_dicom(p, base, transfer_syntax=JPEG_BASELINE)
        arr = read_dicom(p).pixel_array
        assert arr.shape == (32, 32)
        assert np.abs(arr.astype(int) - base.astype(int)).max() <= 3

    def test_header_scan_on_compressed(self, tmp_path):
        arr = np.zeros((64, 48), np.uint16)
        p = str(tmp_path / "h.dcm")
        write_dicom(p, arr, transfer_syntax=JPEG_LOSSLESS_SV1)
        d = read_dicom(p, stop_before_pixels=True)
        assert (d.rows, d.columns) == (64, 48)

    def test_rle_signed_pixels(self, tmp_path):
        """CT slices are int16 with negative HU values; pixel_representation
        must be honored after RLE decode."""
        rng = np.random.default_rng(2)
        arr = rng.integers(-1024, 3000, size=(20, 20)).astype(np.int16)
        p = str(tmp_path / "s.dcm")
        write_dicom(p, arr, transfer_syntax=RLE_LOSSLESS)
        got = read_dicom(p).pixel_array
        assert got.dtype == np.int16
        np.testing.assert_array_equal(got, arr)

    def test_native_matches_python_decoder(self):
        """The C++ jls_decode must agree with the pure-Python reference
        implementation bit-for-bit (csrc/dicom_codecs.cpp)."""
        from medical_image_segmentation_tpu.data.dicom_codecs import (
            jpeg_lossless_decode_py,
            jpeg_lossless_encode,
        )
        from medical_image_segmentation_tpu.data.store.native import get_lib

        if get_lib() is None:
            pytest.skip("no native toolchain")
        import ctypes

        lib = get_lib()
        rng = np.random.default_rng(3)
        for pred in (1, 2, 4, 5, 6, 7):
            img = rng.integers(0, 4096, size=(27, 35)).astype(np.uint16)
            enc = jpeg_lossless_encode(img, precision=12, predictor=pred)
            r, c, n = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
            assert lib.jls_probe(enc, len(enc), ctypes.byref(r), ctypes.byref(c),
                                 ctypes.byref(n)) == 0
            assert (r.value, c.value, n.value) == (27, 35, 1)
            out = np.empty(27 * 35, np.uint16)
            assert lib.jls_decode(
                enc, len(enc),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size) == 0
            np.testing.assert_array_equal(out.reshape(27, 35), img)
            np.testing.assert_array_equal(jpeg_lossless_decode_py(enc), img)

    def test_rle_fuzz_garbage_rejected(self):
        from medical_image_segmentation_tpu.data.dicom_codecs import CodecError, rle_decode

        rng = np.random.default_rng(4)
        for _ in range(20):
            blob = rng.bytes(rng.integers(0, 200))
            with pytest.raises((CodecError, Exception)):
                rle_decode(blob, 16, 16, 16)

    def test_ingest_compressed_dicoms(self, tmp_path):
        """dicom_hashes / write_subset must consume compressed DICOMs — the
        reference ingests them via pylibjpeg (create_subset.py:197,506)."""
        from medical_image_segmentation_tpu.data.ingest.create_subset import (
            get_dicom_image_dimensions,
            get_dicom_image_hashes,
        )

        rng = np.random.default_rng(5)
        paths = []
        for i, ts in enumerate([RLE_LOSSLESS, JPEG_LOSSLESS_SV1, EXPLICIT_VR_LE]):
            arr = rng.integers(0, 4096, size=(300, 300)).astype(np.uint16)
            p = str(tmp_path / f"{i}.dcm")
            write_dicom(p, arr, transfer_syntax=ts, sop_instance_uid=f"1.2.3.{i}")
            paths.append(p)
        dims = get_dicom_image_dimensions(paths, num_processes=1)
        assert all(dims[p] == [300, 300] or tuple(dims[p]) == (300, 300) for p in paths)
        hashes = get_dicom_image_hashes(paths, num_processes=1)
        assert len(hashes) == 3 and len(set(hashes.values())) == 3

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


class TestCodecHardening:
    """Corrupt/malicious JPEG-lossless streams must error cleanly in BOTH
    decoders (csrc/dicom_codecs.cpp parse() bounds checks and the Python
    reference) — never read out of bounds."""

    def _valid_stream(self):
        from medical_image_segmentation_tpu.data.dicom_codecs import jpeg_lossless_encode

        rng = np.random.default_rng(7)
        img = rng.integers(0, 4096, size=(9, 11)).astype(np.uint16)
        return jpeg_lossless_encode(img, precision=12, predictor=1)

    def _native_rejects(self, blob):
        from medical_image_segmentation_tpu.data.store.native import get_lib

        lib = get_lib()
        if lib is None:
            return  # no toolchain — Python-side assertion still ran
        import ctypes

        out = np.empty(9 * 11, np.uint16)
        rc = lib.jls_decode(bytes(blob), len(blob),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size)
        assert rc != 0, "native decoder accepted a corrupt stream"

    def test_sos_table_id_out_of_range(self):
        from medical_image_segmentation_tpu.data.dicom_codecs import (
            CodecError, jpeg_lossless_decode_py)

        bad = bytearray(self._valid_stream())
        i = bytes(bad).find(b"\xff\xda")
        bad[i + 6] = 0x40  # Td=4: only 4 table slots exist
        with pytest.raises(CodecError):
            jpeg_lossless_decode_py(bytes(bad))
        self._native_rejects(bad)

    def test_dht_symbol_count_overflow(self):
        import struct

        from medical_image_segmentation_tpu.data.dicom_codecs import (
            CodecError, jpeg_lossless_decode_py)

        # hand-built stream whose DHT declares 300 symbols (>256) with a
        # segment long enough to pass the plain length check
        counts = [255, 45] + [0] * 14
        dht = bytes([0x00]) + bytes(counts) + bytes(300)
        sof = struct.pack(">BHHB", 12, 9, 11, 1) + bytes([1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 1, 0, 0])
        blob = (b"\xff\xd8"
                + b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
                + b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
                + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                + b"\x00" * 64 + b"\xff\xd9")
        with pytest.raises(CodecError):
            jpeg_lossless_decode_py(blob)
        self._native_rejects(bytearray(blob))

    def test_encoder_reserves_all_ones_codeword(self):
        """T.81: no codeword may be all 1-bits — the canonical table in every
        encoded stream must be an INCOMPLETE prefix set (Kraft sum < 1)."""
        from fractions import Fraction

        from medical_image_segmentation_tpu.data.dicom_codecs import jpeg_lossless_encode

        rng = np.random.default_rng(8)
        for shape, lo, hi in (((9, 11), 0, 4096), ((16, 16), 0, 2), ((5, 5), 0, 65535)):
            img = rng.integers(lo, hi, size=shape).astype(np.uint16)
            enc = jpeg_lossless_encode(img, precision=16, predictor=1)
            i = enc.find(b"\xff\xc4")
            counts = list(enc[i + 5 : i + 5 + 16])
            kraft = sum(Fraction(c, 2 ** (l + 1)) for l, c in enumerate(counts))
            assert kraft < 1, f"complete prefix set (counts={counts})"
