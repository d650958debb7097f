"""ctypes binding + on-demand build of the C++ MIS loader.

The shared object is compiled once per machine from ``csrc/mis_loader.cpp``
(g++, links libjpeg-turbo/libpng/zlib) into a cache directory; callers fall
back to the pure-Python ``StoreReader`` when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
_SRCS = [
    os.path.join(_REPO_ROOT, "csrc", "mis_loader.cpp"),
    os.path.join(_REPO_ROOT, "csrc", "dicom_codecs.cpp"),
    os.path.join(_REPO_ROOT, "csrc", "jpegls_codec.cpp"),
    os.path.join(_REPO_ROOT, "csrc", "j2k_codec.cpp"),
]


def _cache_dir() -> str:
    d = os.environ.get("MIS_NATIVE_CACHE", os.path.join(_REPO_ROOT, "build", "native"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    h = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libmisloader-{digest}.so")
    if os.path.exists(out):
        return out
    tmp = f"{out}.{os.getpid()}.tmp"  # pid-unique: concurrent builders must
    # not interleave writes into one -o target before the atomic publish
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *_SRCS, "-ljpeg", "-lpng", "-lz", "-pthread", "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        stderr = getattr(e, "stderr", b"") or b""
        print(f"mis_loader native build failed: {e}\n{stderr.decode()[:2000]}", file=sys.stderr)
        return None
    os.replace(tmp, out)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native loader; None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so = _build()
        if so is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(so)
        lib.mis_open.restype = ctypes.c_void_p
        lib.mis_open.argtypes = [ctypes.c_char_p]
        lib.mis_close.argtypes = [ctypes.c_void_p]
        lib.mis_num_samples.restype = ctypes.c_int64
        lib.mis_num_samples.argtypes = [ctypes.c_void_p]
        lib.mis_shape.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.mis_fetch.restype = ctypes.c_int
        lib.mis_fetch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.mis_fetch_views.restype = ctypes.c_int
        lib.mis_fetch_views.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        # uint16-store variants (header FLAG_U16): same contracts, u16 buffers
        lib.mis_sample_u16.restype = ctypes.c_int
        lib.mis_sample_u16.argtypes = [ctypes.c_void_p]
        lib.mis_fetch_u16.restype = ctypes.c_int
        lib.mis_fetch_u16.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.mis_fetch_views_u16.restype = ctypes.c_int
        lib.mis_fetch_views_u16.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        # compressed-DICOM codecs (csrc/dicom_codecs.cpp)
        lib.jls_probe.restype = ctypes.c_int
        lib.jls_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jls_decode.restype = ctypes.c_int
        lib.jls_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
        ]
        # JPEG-LS T.87 codec (csrc/jpegls_codec.cpp)
        lib.jpegls_probe.restype = ctypes.c_int
        lib.jpegls_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpegls_decode.restype = ctypes.c_int
        lib.jpegls_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
        ]
        # row-limited decode (crop-at-decode for JLS; bit-identical prefix)
        lib.jpegls_decode_rows.restype = ctypes.c_int
        lib.jpegls_decode_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int,
        ]
        lib.jpegls_encode.restype = ctypes.c_int
        lib.jpegls_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        # JPEG 2000 T.800 codec (csrc/j2k_codec.cpp)
        lib.j2k_probe.restype = ctypes.c_int
        lib.j2k_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.j2k_decode.restype = ctypes.c_int
        lib.j2k_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


class NativeStore:
    """Thin RAII wrapper over the C++ store handle."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._handle = lib.mis_open(path.encode())
        if not self._handle:
            raise IOError(f"mis_open failed for {path}")
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        lib.mis_shape(self._handle, ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
        self.shape = (h.value, w.value, c.value)
        self.num_samples = int(lib.mis_num_samples(self._handle))
        self.dtype = np.dtype(np.uint16 if lib.mis_sample_u16(self._handle) else np.uint8)

    def fetch(
        self,
        indices: np.ndarray,
        out: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        out_hw: Optional[tuple] = None,
        num_threads: int = 4,
    ):
        """Decode ``indices`` into (B, H, W, C) samples (store dtype: uint8,
        or uint16 for FLAG_U16 stores) + (B,) int32 labels."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        oh, ow = out_hw or self.shape[:2]
        oc = self.shape[2]
        if out is None:
            out = np.empty((n, oh, ow, oc), self.dtype)
        if labels is None:
            labels = np.empty((n,), np.int32)
        if self.dtype == np.uint16:
            fn = self._lib.mis_fetch_u16
            out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        else:
            fn = self._lib.mis_fetch
            out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rc = fn(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out_ptr,
            oh, ow, oc,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads,
        )
        if rc != 0:
            raise IOError(f"mis_fetch error {rc}")
        return out, labels

    def fetch_views(
        self,
        indices: np.ndarray,
        params: np.ndarray,
        out_hw: tuple,
        out: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        num_threads: int = 4,
    ):
        """Host-side RandomResizedCrop fast path: decode each sample once and
        emit V bilinear crop-resized views, SAMPLE-major.

        ``params`` is float32 (B, V, 5) = (y0, x0, crop_h, crop_w, flip) per
        view in source-pixel coordinates (same convention as
        ``ops.augment._resize_matrix``). Returns ((B*V, vh, vw, C) uint8,
        (B,) int32) — SAMPLE-major: view v of sample i lives at row
        ``i*V + v``, so per-host shards concatenate into a correct global
        batch and the on-device (B, V, ...) reshape/split is shard-local
        (see the layout note in csrc/mis_loader.cpp::mis_fetch_views).
        """
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        params = np.ascontiguousarray(params, np.float32)
        if params.shape[0] != n or params.shape[-1] != 5:
            raise ValueError(f"params must be (B, V, 5); got {params.shape}")
        views = int(params.shape[1]) if params.ndim == 3 else 1
        vh, vw = out_hw
        oc = self.shape[2]
        if out is None:
            out = np.empty((n * views, vh, vw, oc), self.dtype)
        if labels is None:
            labels = np.empty((n,), np.int32)
        if self.dtype == np.uint16:
            fn = self._lib.mis_fetch_views_u16
            out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        else:
            fn = self._lib.mis_fetch_views
            out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rc = fn(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), views,
            out_ptr,
            vh, vw, oc,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads,
        )
        if rc != 0:
            raise IOError(f"mis_fetch_views error {rc}")
        return out, labels

    def close(self):
        if self._handle:
            self._lib.mis_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
