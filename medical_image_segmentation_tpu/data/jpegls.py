"""JPEG-LS (ITU-T T.87 / ISO 14495-1, LOCO-I) codec — pure Python oracle.

From-scratch implementation of the DICOM JPEG-LS transfer syntaxes
(1.2.840.10008.1.2.4.80 lossless, .81 near-lossless), which the reference
decodes through pylibjpeg/GDCM plugins (`/root/reference/docker/Dockerfile:34-35`,
consumed via `pydicom.dcmread(...).pixel_array` at
`medical_image_segmentation/analyze_data/create_subset.py:197,506`).

This module is the bit-exact *reference decoder/encoder* (the test oracle,
like `dicom_codecs.jpeg_lossless_decode_py` is for T.81 process 14); the
C++ fast path lives in `csrc/jpegls_codec.cpp` and is parity-tested against
this and against libcharls in tests/test_data_formats.py.

Scope: single-component scans and multi-component ILV=0 (one scan per
component) — the DICOM medical-imaging cases. Interleaved color (ILV=1/2)
and restart markers raise CodecError (never silently mis-decode).

Section references below are to ITU-T Rec. T.87 (06/98).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from medical_image_segmentation_tpu.data.dicom_codecs import CodecError

# T.87 A.2.1 — run-length code order table
_J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
     4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_MIN_C, _MAX_C = -128, 127


class _Params:
    """Coding parameters derived from precision/NEAR (+ optional LSE)."""

    def __init__(self, precision: int, near: int,
                 maxval: Optional[int] = None,
                 t1: int = 0, t2: int = 0, t3: int = 0, reset: int = 0):
        self.maxval = maxval if maxval else (1 << precision) - 1
        if not (0 <= near <= min(255, self.maxval // 2)):
            raise CodecError(f"NEAR {near} out of range for MAXVAL {self.maxval}")
        self.near = near
        # A.2.1: RANGE, bpp, qbpp, LIMIT
        self.range = (self.maxval + 2 * near) // (2 * near + 1) + 1
        self.bpp = max(2, (self.maxval).bit_length())
        self.qbpp = (self.range - 1).bit_length()
        self.limit = 2 * (self.bpp + max(8, self.bpp))
        self.reset = reset or 64
        if t1 and t2 and t3:
            self.t1, self.t2, self.t3 = t1, t2, t3
        else:
            self.t1, self.t2, self.t3 = _default_thresholds(self.maxval, near)
        if not (near + 1 <= self.t1 <= self.t2 <= self.t3 <= self.maxval):
            raise CodecError(f"invalid thresholds T1={self.t1} T2={self.t2} T3={self.t3}")


def _default_thresholds(maxval: int, near: int) -> Tuple[int, int, int]:
    """T.87 A.1 default threshold computation (BASIC_T = 3, 7, 21)."""

    def clamp(i: int, j: int) -> int:
        return j if (i > maxval or i < j) else i

    if maxval >= 128:
        factor = (min(maxval, 4095) + 128) // 256
        t1 = clamp(factor * (3 - 2) + 2 + 3 * near, near + 1)
        t2 = clamp(factor * (7 - 3) + 3 + 5 * near, t1)
        t3 = clamp(factor * (21 - 4) + 4 + 7 * near, t2)
    else:
        factor = 256 // (maxval + 1)
        t1 = clamp(max(2, 3 // factor + 3 * near), near + 1)
        t2 = clamp(max(3, 7 // factor + 5 * near), t1)
        t3 = clamp(max(4, 21 // factor + 7 * near), t2)
    return t1, t2, t3


class _BitReader:
    """MSB-first bit reader with JPEG-LS marker-avoidance unstuffing: after
    an 0xFF byte only 7 bits of the next byte are data (its MSB is a stuffed
    0); 0xFF followed by a byte >= 0x80 is a marker → end of scan data."""

    __slots__ = ("data", "pos", "acc", "nbits", "prev_ff", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.n = len(data)
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def _fill(self) -> None:
        if self.pos >= self.n:
            # past end: feed 0 bits; sample-count terminates the scan and
            # the caller validates afterwards
            self.acc = (self.acc << 8)
            self.nbits += 8
            self.prev_ff = False
            return
        b = self.data[self.pos]
        if self.prev_ff:
            if b >= 0x80:  # a marker — scan data ended; feed zeros
                self.acc <<= 8
                self.nbits += 8
                return
            # stuffed byte: MSB is a guaranteed-0 filler, 7 data bits
            self.pos += 1
            self.acc = (self.acc << 7) | (b & 0x7F)
            self.nbits += 7
            self.prev_ff = False
            return
        self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        self.prev_ff = b == 0xFF

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_unary(self, cap: int) -> int:
        """Count 0-bits until the terminating 1 (consumed); cap guards
        against corrupt streams."""
        n = 0
        while self.read_bit() == 0:
            n += 1
            if n > cap:
                raise CodecError("runaway unary code (corrupt JPEG-LS stream)")
        return n

    def byte_align_pos(self) -> int:
        """Byte offset just past the last consumed data byte."""
        # self.pos already points past consumed bytes; unread buffered bits
        # belong to those bytes, so pos is the conservative resume point
        return self.pos


class _BitWriter:
    """MSB-first writer with the T.87 stuffing rule: after emitting an 0xFF
    byte the next byte carries only 7 data bits (MSB forced 0)."""

    __slots__ = ("out", "cur", "free", "cap")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.free = 8
        self.cap = 8  # 7 when the current byte follows an 0xFF (MSB is a stuffed 0)

    def write_bit(self, bit: int) -> None:
        self.free -= 1
        self.cur |= (bit & 1) << self.free
        if self.free == 0:
            self.out.append(self.cur)
            self.cap = self.free = 7 if self.cur == 0xFF else 8
            self.cur = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def flush(self) -> bytes:
        if self.free < self.cap:
            self.out.append(self.cur)  # pad with 0 bits
            self.cur = 0
        elif self.cap == 7:
            # a dangling 0xFF needs its stuffed-0 byte so it can't pair
            # with the following marker byte
            self.out.append(0)
        self.free = self.cap = 8
        return bytes(self.out)


def _golomb_decode(br: _BitReader, k: int, limit: int, qbpp: int) -> int:
    """A.5.3 limited-length Golomb decode of a mapped error value."""
    high = br.read_unary(limit + 1)
    if high < limit - (qbpp + 1):
        return (high << k) | br.read(k) if k else high
    if high != limit - (qbpp + 1):
        raise CodecError("invalid Golomb escape length")
    return br.read(qbpp) + 1


def _golomb_encode(bw: _BitWriter, value: int, k: int, limit: int, qbpp: int) -> None:
    high = value >> k
    if high < limit - (qbpp + 1):
        bw.write(1, high + 1)  # `high` zeros then a 1
        if k:
            bw.write(value & ((1 << k) - 1), k)
    else:
        bw.write(1, limit - qbpp)  # limit-qbpp-1 zeros then a 1
        bw.write((value - 1) & ((1 << qbpp) - 1), qbpp)


def _quantize_gradient(d: int, t1: int, t2: int, t3: int, near: int) -> int:
    """A.3.3 gradient quantization to the 9 regions."""
    if d <= -t3:
        return -4
    if d <= -t2:
        return -3
    if d <= -t1:
        return -2
    if d < -near:
        return -1
    if d <= near:
        return 0
    if d < t1:
        return 1
    if d < t2:
        return 2
    if d < t3:
        return 3
    return 4


class _Contexts:
    """Regular-mode contexts A/B/C/N (365 entries; index |q|, 1..364 used)
    and the two run-interruption contexts (A.2.1 init, A.6/A.7 updates)."""

    def __init__(self, p: _Params):
        init_a = max(2, (p.range + 32) // 64)
        self.A = [init_a] * 365
        self.B = [0] * 365
        self.C = [0] * 365
        self.N = [1] * 365
        # run interruption: index by RItype (0 or 1)
        self.Ar = [init_a, init_a]
        self.Nr = [1, 1]
        self.Nn = [0, 0]
        self.p = p

    def k_regular(self, q: int) -> int:
        k = 0
        while (self.N[q] << k) < self.A[q]:
            k += 1
            if k > 32:
                raise CodecError("Golomb k overflow (corrupt stream)")
        return k

    def update_regular(self, q: int, errval: int) -> None:
        """A.6.2 variables update + A.6.3 bias computation (N already
        incremented before the bias step, matching the spec order)."""
        p = self.p
        self.B[q] += errval * (2 * p.near + 1)
        self.A[q] += abs(errval)
        if self.N[q] == p.reset:
            self.A[q] >>= 1
            self.B[q] >>= 1  # Python's >> on negatives rounds to -inf (C arithmetic shift)
            self.N[q] >>= 1
        self.N[q] += 1
        if self.B[q] <= -self.N[q]:
            self.B[q] = max(self.B[q] + self.N[q], 1 - self.N[q])
            if self.C[q] > _MIN_C:
                self.C[q] -= 1
        elif self.B[q] > 0:
            self.B[q] = min(self.B[q] - self.N[q], 0)
            if self.C[q] < _MAX_C:
                self.C[q] += 1

    def k_run(self, ritype: int) -> int:
        temp = self.Ar[ritype] + ((self.Nr[ritype] >> 1) if ritype else 0)
        k = 0
        while (self.Nr[ritype] << k) < temp:
            k += 1
            if k > 32:
                raise CodecError("run Golomb k overflow")
        return k

    def update_run(self, ritype: int, errval: int, emapped: int) -> None:
        if errval < 0:
            self.Nn[ritype] += 1
        self.Ar[ritype] += (emapped + 1 - ritype) >> 1
        if self.Nr[ritype] == self.p.reset:
            self.Ar[ritype] >>= 1
            self.Nr[ritype] >>= 1
            self.Nn[ritype] >>= 1
        self.Nr[ritype] += 1


def _med(a: int, b: int, c: int) -> int:
    """A.4.1 median edge detector prediction."""
    if c >= max(a, b):
        return min(a, b)
    if c <= min(a, b):
        return max(a, b)
    return a + b - c


def _clamp(v: int, maxval: int) -> int:
    return 0 if v < 0 else (maxval if v > maxval else v)


def _fix_reconstructed(v: int, p: _Params) -> int:
    """A.4.2 / A.8.3 reconstruction wrap + clamp."""
    m = p.range * (2 * p.near + 1)
    if v < -p.near:
        v += m
    elif v > p.maxval + p.near:
        v -= m
    return _clamp(v, p.maxval)


def _mod_range(errval: int, rng: int) -> int:
    """A.4.5 modulo reduction into [-range/2, ceil(range/2)-1]."""
    if errval < 0:
        errval += rng
    if errval >= (rng + 1) // 2:
        errval -= rng
    return errval


def _decode_scan(br: _BitReader, rows: int, cols: int, p: _Params) -> np.ndarray:
    """Decode one component scan (A.3–A.8) → (rows, cols) int array."""
    ctx = _Contexts(p)
    out = np.zeros((rows, cols), np.int32)
    prev = [0] * cols
    prev2 = [0] * cols  # line before prev (for Rc at x=0)
    run_index = 0
    near, maxval, rng = p.near, p.maxval, p.range

    for y in range(rows):
        cur = [0] * cols
        x = 0
        while x < cols:
            # neighbors (8.4 edge rules)
            b = prev[x]
            d = prev[x + 1] if x + 1 < cols else b
            if x > 0:
                a = cur[x - 1]
                c = prev[x - 1]
            else:
                a = b  # Ra(0) = Rb
                c = prev2[0] if y >= 1 else 0  # Rc(0) = Rb of the line above
            d1, d2, d3 = d - b, b - c, c - a
            if abs(d1) <= near and abs(d2) <= near and abs(d3) <= near:
                # ---- run mode (A.7) ----
                remaining = cols - x
                index = 0
                while br.read_bit():
                    count = min(1 << _J[run_index], remaining - index)
                    index += count
                    if count == (1 << _J[run_index]) and run_index < 31:
                        run_index += 1
                    if index == remaining:
                        break
                if index != remaining:
                    if _J[run_index] > 0:
                        index += br.read(_J[run_index])
                    if index >= remaining:
                        raise CodecError("run length exceeds line")
                for i in range(index):
                    cur[x + i] = a
                x += index
                if index == remaining:
                    continue  # run hit end of line: no interruption sample
                # run interruption sample (A.7.2)
                rb = prev[x]
                ra = a  # == RUNval
                ritype = 1 if abs(ra - rb) <= near else 0
                k = ctx.k_run(ritype)
                emapped = _golomb_decode(br, k, p.limit - _J[run_index] - 1, p.qbpp)
                temp = emapped + ritype
                mp = temp & 1
                errabs = (temp + mp) >> 1
                if ((k != 0 or 2 * ctx.Nn[ritype] >= ctx.Nr[ritype])
                        and mp) or (not (k != 0 or 2 * ctx.Nn[ritype] >= ctx.Nr[ritype]) and not mp):
                    errval = -errabs
                else:
                    errval = errabs
                ctx.update_run(ritype, errval, emapped)
                if ritype:
                    rx = _fix_reconstructed(ra + errval * (2 * near + 1), p)
                else:
                    s = 1 if rb > ra else -1
                    rx = _fix_reconstructed(rb + s * errval * (2 * near + 1), p)
                cur[x] = rx
                x += 1
                if run_index > 0:
                    run_index -= 1
                continue
            # ---- regular mode (A.4–A.6) ----
            q1 = _quantize_gradient(d1, p.t1, p.t2, p.t3, near)
            q2 = _quantize_gradient(d2, p.t1, p.t2, p.t3, near)
            q3 = _quantize_gradient(d3, p.t1, p.t2, p.t3, near)
            q = 81 * q1 + 9 * q2 + q3
            sign = -1 if q < 0 else 1
            q = abs(q)
            px = _clamp(_med(a, b, c) + sign * ctx.C[q], maxval)
            k = ctx.k_regular(q)
            merr = _golomb_decode(br, k, p.limit, p.qbpp)
            # A.5.2 inverse error mapping
            errval = -(merr + 1) // 2 if (merr & 1) else merr // 2
            if k == 0 and near == 0 and 2 * ctx.B[q] <= -ctx.N[q]:
                errval = -errval - 1
            if abs(errval) > rng:
                raise CodecError("decoded error out of range (corrupt stream)")
            ctx.update_regular(q, errval)
            errval *= sign
            cur[x] = _fix_reconstructed(px + errval * (2 * near + 1), p)
            x += 1
        out[y, :] = cur
        prev2 = prev
        prev = cur
    return out


def _encode_scan(bw: _BitWriter, img: np.ndarray, p: _Params) -> None:
    """Encode one component scan — exact mirror of ``_decode_scan``."""
    rows, cols = img.shape
    ctx = _Contexts(p)
    src = img.astype(np.int64).tolist()
    prev = [0] * cols
    prev2 = [0] * cols
    run_index = 0
    near, maxval, rng = p.near, p.maxval, p.range

    for y in range(rows):
        line = src[y]
        cur = [0] * cols
        x = 0
        while x < cols:
            b = prev[x]
            d = prev[x + 1] if x + 1 < cols else b
            if x > 0:
                a = cur[x - 1]
                c = prev[x - 1]
            else:
                a = b
                c = prev2[0] if y >= 1 else 0
            d1, d2, d3 = d - b, b - c, c - a
            if abs(d1) <= near and abs(d2) <= near and abs(d3) <= near:
                # ---- run mode ----
                runval = a
                start = x
                while x < cols and abs(line[x] - runval) <= near:
                    cur[x] = runval
                    x += 1
                run_length = x - start
                eol = x == cols
                while run_length >= (1 << _J[run_index]):
                    bw.write_bit(1)
                    run_length -= 1 << _J[run_index]
                    if run_index < 31:
                        run_index += 1
                if eol:
                    if run_length > 0:
                        bw.write_bit(1)
                    continue
                bw.write_bit(0)
                if _J[run_index] > 0:
                    bw.write(run_length, _J[run_index])
                # run interruption sample
                ix = line[x]
                rb = prev[x]
                ra = runval
                ritype = 1 if abs(ra - rb) <= near else 0
                if ritype:
                    errval = ix - ra
                    s = 1
                else:
                    s = 1 if rb > ra else -1
                    errval = (ix - rb) * s
                if near > 0:
                    if errval > 0:
                        errval = (near + errval) // (2 * near + 1)
                    else:
                        errval = -((near - errval) // (2 * near + 1))
                if ritype:
                    rx = _fix_reconstructed(ra + errval * (2 * near + 1), p)
                else:
                    rx = _fix_reconstructed(rb + s * errval * (2 * near + 1), p)
                errval = _mod_range(errval, rng)
                k = ctx.k_run(ritype)
                if k == 0 and errval > 0 and 2 * ctx.Nn[ritype] < ctx.Nr[ritype]:
                    mp = 1
                elif errval < 0 and (2 * ctx.Nn[ritype] >= ctx.Nr[ritype] or k != 0):
                    mp = 1
                else:
                    mp = 0
                emapped = 2 * abs(errval) - ritype - mp
                if emapped < 0:
                    raise CodecError("internal: negative mapped run error")
                _golomb_encode(bw, emapped, k, p.limit - _J[run_index] - 1, p.qbpp)
                ctx.update_run(ritype, errval, emapped)
                cur[x] = rx
                x += 1
                if run_index > 0:
                    run_index -= 1
                continue
            # ---- regular mode ----
            q1 = _quantize_gradient(d1, p.t1, p.t2, p.t3, near)
            q2 = _quantize_gradient(d2, p.t1, p.t2, p.t3, near)
            q3 = _quantize_gradient(d3, p.t1, p.t2, p.t3, near)
            q = 81 * q1 + 9 * q2 + q3
            sign = -1 if q < 0 else 1
            q = abs(q)
            px = _clamp(_med(a, b, c) + sign * ctx.C[q], maxval)
            ix = line[x]
            errval = (ix - px) * sign
            if near > 0:
                if errval > 0:
                    errval = (near + errval) // (2 * near + 1)
                else:
                    errval = -((near - errval) // (2 * near + 1))
            cur[x] = _fix_reconstructed(px + sign * errval * (2 * near + 1), p)
            errval = _mod_range(errval, rng)
            k = ctx.k_regular(q)
            if k == 0 and near == 0 and 2 * ctx.B[q] <= -ctx.N[q]:
                merr = 2 * errval + 1 if errval >= 0 else -2 * (errval + 1)
            else:
                merr = 2 * errval if errval >= 0 else -2 * errval - 1
            _golomb_encode(bw, merr, k, p.limit, p.qbpp)
            ctx.update_regular(q, errval)
            x += 1
        prev2 = prev
        prev = cur


# ---------------------------------------------------------------------------
# marker-segment layer
# ---------------------------------------------------------------------------

_SOI, _EOI = 0xD8, 0xD9
_SOF55, _LSE, _SOS, _DRI = 0xF7, 0xF8, 0xDA, 0xDD


def _parse_header(data: bytes):
    """Parse markers up to (and including) the first SOS. Returns
    (precision, rows, cols, ncomp, lse_params, sos_info, entropy_start)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != _SOI:
        raise CodecError("not a JPEG-LS stream (missing SOI)")
    i = 2
    precision = rows = cols = ncomp = 0
    lse = {}
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise CodecError(f"expected marker at {i}")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        i += 2
        if marker in (_SOI, _EOI):
            raise CodecError("unexpected SOI/EOI before SOS")
        seglen = int.from_bytes(data[i : i + 2], "big")
        if seglen < 2 or i + seglen > len(data):
            raise CodecError(f"truncated marker segment at {i}")
        seg = data[i + 2 : i + seglen]
        if marker == _SOF55:
            if len(seg) < 6:
                raise CodecError("short SOF55 segment")
            precision = seg[0]
            rows = int.from_bytes(seg[1:3], "big")
            cols = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if not (2 <= precision <= 16):
                raise CodecError(f"unsupported precision {precision}")
            if rows == 0 or cols == 0:
                raise CodecError("DNL (deferred dimensions) not supported")
        elif marker == _LSE:
            if len(seg) < 1 or (seg[0] == 1 and len(seg) < 11):
                raise CodecError("short LSE segment")
            if seg[0] == 1:
                lse = {
                    "maxval": int.from_bytes(seg[1:3], "big"),
                    "t1": int.from_bytes(seg[3:5], "big"),
                    "t2": int.from_bytes(seg[5:7], "big"),
                    "t3": int.from_bytes(seg[7:9], "big"),
                    "reset": int.from_bytes(seg[9:11], "big"),
                }
            # ID 2/3 (mapping tables) alter sample semantics we don't model
            elif seg[0] in (2, 3):
                raise CodecError("JPEG-LS mapping tables not supported")
        elif marker == _DRI:
            if int.from_bytes(seg[:2], "big"):
                raise CodecError("JPEG-LS restart intervals not supported")
        elif marker == _SOS:
            if len(seg) < 1 or len(seg) < 3 + 2 * seg[0]:
                raise CodecError("short SOS segment")
            ns = seg[0]
            comps = [(seg[1 + 2 * c], seg[2 + 2 * c]) for c in range(ns)]
            near = seg[1 + 2 * ns]
            ilv = seg[2 + 2 * ns]
            if precision == 0:
                raise CodecError("SOS before SOF55")
            return precision, rows, cols, ncomp, lse, (ns, comps, near, ilv), i + seglen
        i += seglen
    raise CodecError("missing SOF55/SOS")


def jpeg_ls_decode_py(data: bytes) -> np.ndarray:
    """Decode a JPEG-LS stream → (rows, cols) or (rows, cols, ncomp) array
    (uint8 when precision <= 8 else uint16). Pure-Python reference."""
    precision, rows, cols, ncomp, lse, sos, pos = _parse_header(data)
    planes: List[np.ndarray] = []
    while True:
        ns, comps, near, ilv = sos
        if ns != 1 or (ncomp > 1 and ilv != 0):
            raise CodecError("interleaved JPEG-LS (ILV 1/2) not supported")
        p = _Params(precision, near, **lse) if lse else _Params(precision, near)
        br = _BitReader(data, pos)
        planes.append(_decode_scan(br, rows, cols, p))
        if len(planes) == ncomp:
            break
        # find the next SOS after this scan's entropy data
        j = br.byte_align_pos()
        nxt = None
        while j + 1 < len(data):
            if data[j] == 0xFF and data[j + 1] == _SOS:
                nxt = j
                break
            j += 1
        if nxt is None:
            raise CodecError(f"missing scan {len(planes)+1}/{ncomp}")
        seglen = int.from_bytes(data[nxt + 2 : nxt + 4], "big")
        seg = data[nxt + 4 : nxt + 2 + seglen]
        if len(seg) < 1 or len(seg) < 3 + 2 * seg[0]:
            raise CodecError("short continuation SOS segment")
        ns2 = seg[0]
        sos = (ns2, [(seg[1 + 2 * c], seg[2 + 2 * c]) for c in range(ns2)],
               seg[1 + 2 * ns2], seg[2 + 2 * ns2])
        pos = nxt + 2 + seglen
    dtype = np.uint8 if precision <= 8 else np.uint16
    if ncomp == 1:
        return planes[0].astype(dtype)
    return np.stack(planes, axis=-1).astype(dtype)


def jpeg_ls_encode_py(arr: np.ndarray, near: int = 0,
                      precision: Optional[int] = None) -> bytes:
    """Encode (rows, cols) or (rows, cols, ncomp) uint8/uint16 → JPEG-LS
    bytes (ILV=0, default thresholds). Pure-Python reference; the C++ fast
    path (csrc/jpegls_codec.cpp::jpegls_encode) emits bit-identical streams
    (tested) and is what `jpeg_ls_encode` dispatches to."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3:
        raise CodecError(f"expected 2D/3D array, got shape {arr.shape}")
    rows, cols, ncomp = arr.shape
    if rows >= 1 << 16 or cols >= 1 << 16:
        raise CodecError("image too large for SOF55 dimensions")
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else max(2, int(arr.max()).bit_length())
    if not (2 <= precision <= 16):
        raise CodecError(f"unsupported precision {precision}")
    if int(arr.max(initial=0)) > (1 << precision) - 1:
        raise CodecError("sample exceeds precision")
    p = _Params(precision, near)
    out = bytearray([0xFF, _SOI])
    # SOF55
    sof = bytearray([precision])
    sof += rows.to_bytes(2, "big") + cols.to_bytes(2, "big")
    sof.append(ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += bytes([0xFF, _SOF55]) + (len(sof) + 2).to_bytes(2, "big") + sof
    for c in range(ncomp):
        sos = bytes([1, c + 1, 0, near, 0, 0])
        out += bytes([0xFF, _SOS]) + (len(sos) + 2).to_bytes(2, "big") + sos
        bw = _BitWriter()
        _encode_scan(bw, arr[:, :, c], p)
        out += bw.flush()
    out += bytes([0xFF, _EOI])
    return bytes(out)


def jpeg_ls_encode(arr: np.ndarray, near: int = 0,
                   precision: Optional[int] = None) -> bytes:
    """JPEG-LS encode: C++ fast path (csrc/jpegls_codec.cpp, ~95× the Python
    encoder on CT-like 16-bit frames — the FLAG_U16 store-build hot path),
    else the pure-Python reference. Both emit BIT-IDENTICAL streams
    (pinned in tests/test_data_formats.py)."""
    from medical_image_segmentation_tpu.data.store.native import get_lib

    lib = get_lib()
    if lib is not None and hasattr(lib, "jpegls_encode"):
        import ctypes

        a = np.asarray(arr)
        a3 = a[..., None] if a.ndim == 2 else a
        if a3.ndim == 3 and a3.dtype in (np.dtype(np.uint8), np.dtype(np.uint16)):
            rows, cols, ncomp = a3.shape
            prec = precision
            if prec is None:
                prec = 8 if a3.dtype == np.uint8 else max(2, int(a3.max(initial=0)).bit_length())
            a16 = np.ascontiguousarray(a3, np.uint16)
            # worst case ≈ limit bits/sample ×8/7 stuffing; 10×+1KiB is ample
            cap = a16.size * 10 + 1024
            out = np.empty(cap, np.uint8)
            size = ctypes.c_int64()
            rc = lib.jpegls_encode(
                a16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                rows, cols, ncomp, int(prec), int(near),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                ctypes.byref(size),
            )
            if rc == 0:
                return out[: size.value].tobytes()
            # rc != 0 → fall through for a precise CodecError
    return jpeg_ls_encode_py(arr, near=near, precision=precision)


def jpeg_ls_probe(data: bytes) -> Tuple[int, int, int, int, int]:
    """Header-only parse → (rows, cols, ncomp, precision, near)."""
    precision, rows, cols, ncomp, _lse, sos, _pos = _parse_header(data)
    return rows, cols, ncomp, precision, sos[2]


def jpeg_ls_decode(data: bytes) -> np.ndarray:
    """JPEG-LS decode: C++ fast path (csrc/jpegls_codec.cpp) when the
    toolchain is available, else the pure-Python reference implementation
    above (same spec; parity-tested in tests/test_data_formats.py)."""
    from medical_image_segmentation_tpu.data.store.native import get_lib

    lib = get_lib()
    if lib is not None and hasattr(lib, "jpegls_decode"):
        import ctypes

        rows = ctypes.c_int()
        cols = ctypes.c_int()
        ncomp = ctypes.c_int()
        prec = ctypes.c_int()
        rc = lib.jpegls_probe(data, len(data), ctypes.byref(rows), ctypes.byref(cols),
                              ctypes.byref(ncomp), ctypes.byref(prec))
        if rc == 0:
            out = np.empty(rows.value * cols.value * ncomp.value, np.uint16)
            rc = lib.jpegls_decode(
                data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size,
            )
            if rc == 0:
                out = out.reshape(rows.value, cols.value, ncomp.value)
                if prec.value <= 8:
                    out = out.astype(np.uint8)
                return out[..., 0] if ncomp.value == 1 else out
        # rc != 0 → fall through to the Python decoder for a precise error
    return jpeg_ls_decode_py(data)
