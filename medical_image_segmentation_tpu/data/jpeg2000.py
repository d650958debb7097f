"""JPEG 2000 Part-1 (ITU-T T.800 / ISO 15444-1) decoder — pure Python oracle.

From-scratch implementation of the DICOM JPEG 2000 transfer syntaxes
(1.2.840.10008.1.2.4.90 lossless-only, .91 any), which the reference decodes
through pylibjpeg-openjpeg/GDCM plugins (`/root/reference/docker/Dockerfile:34-35`,
consumed via `pydicom.dcmread(...).pixel_array` at
`medical_image_segmentation/analyze_data/create_subset.py:197,506`).

This module is the *reference decoder* (the test oracle, like
`dicom_codecs.jpeg_lossless_decode_py` for T.81 and `jpegls.jpeg_ls_decode_py`
for T.87); the C++ fast path lives in `csrc/j2k_codec.cpp` and is
parity-tested against this and against OpenJPEG (via PIL) in
tests/test_data_formats.py.

Scope — the DICOM medical-imaging envelope:
  * raw codestreams and JP2-wrapped streams
  * 5/3 reversible (lossless) and 9/7 irreversible wavelets, all
    decomposition counts, multiple quality layers (incl. truncated blocks)
  * all five progression orders (LRCP/RLCP/RPCL/PCRL/CPRL)
  * tiles, multiple tile-parts, custom precincts, SOP/EPH markers
  * 1..4 components with RCT/ICT multi-component transform, 1-16 bit,
    signed or unsigned samples
Out of scope (raise CodecError, never silently mis-decode): component
subsampling (XRsiz/YRsiz > 1 — not used by DICOM single-frame encoders),
non-zero code-block style flags (bypass/reset/termall/causal/pterm/segsym),
ROI shifts (RGN), progression-order changes (POC), and packed packet
headers (PPM/PPT).

Section references below are to ITU-T Rec. T.800 (08/2002).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from medical_image_segmentation_tpu.data.dicom_codecs import CodecError

# ---------------------------------------------------------------------------
# markers
_SOC, _SOT, _SOD, _EOC = 0xFF4F, 0xFF90, 0xFF93, 0xFFD9
_SIZ, _COD, _COC, _QCD, _QCC = 0xFF51, 0xFF52, 0xFF53, 0xFF5C, 0xFF5D
_RGN, _POC, _PPM, _PPT = 0xFF5E, 0xFF5F, 0xFF60, 0xFF61
_TLM, _PLM, _PLT, _CRG, _COM = 0xFF55, 0xFF57, 0xFF58, 0xFF63, 0xFF64
_SOP, _EPH = 0xFF91, 0xFF92


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# header structures


class _Siz:
    def __init__(self, seg: bytes):
        if len(seg) < 36:
            raise CodecError("short SIZ")
        self.xsiz = int.from_bytes(seg[2:6], "big")
        self.ysiz = int.from_bytes(seg[6:10], "big")
        self.xosiz = int.from_bytes(seg[10:14], "big")
        self.yosiz = int.from_bytes(seg[14:18], "big")
        self.xtsiz = int.from_bytes(seg[18:22], "big")
        self.ytsiz = int.from_bytes(seg[22:26], "big")
        self.xtosiz = int.from_bytes(seg[26:30], "big")
        self.ytosiz = int.from_bytes(seg[30:34], "big")
        self.ncomp = int.from_bytes(seg[34:36], "big")
        if not (1 <= self.ncomp <= 4):
            raise CodecError(f"unsupported component count {self.ncomp}")
        if len(seg) < 36 + 3 * self.ncomp:
            raise CodecError("short SIZ component table")
        self.prec: List[int] = []
        self.signed: List[bool] = []
        for c in range(self.ncomp):
            ssiz = seg[36 + 3 * c]
            xr, yr = seg[37 + 3 * c], seg[38 + 3 * c]
            if xr != 1 or yr != 1:
                raise CodecError("component subsampling not supported")
            self.prec.append((ssiz & 0x7F) + 1)
            self.signed.append(bool(ssiz & 0x80))
            if not (1 <= self.prec[-1] <= 16):
                raise CodecError(f"unsupported precision {self.prec[-1]}")
        if self.xsiz <= self.xosiz or self.ysiz <= self.yosiz:
            raise CodecError("empty image region")
        if self.xtsiz == 0 or self.ytsiz == 0:
            raise CodecError("zero tile size")
        if self.xsiz > 1 << 24 or self.ysiz > 1 << 24:
            raise CodecError("image too large")
        self.ntx = _ceil_div(self.xsiz - self.xtosiz, self.xtsiz)
        self.nty = _ceil_div(self.ysiz - self.ytosiz, self.ytsiz)


class _Cod:
    """COD/COC coding-style parameters (A.6.1/A.6.2)."""

    def __init__(self, scod: int, body: bytes, has_sg: bool,
                 sg: Optional[Tuple[int, int, int]] = None):
        self.has_precincts = bool(scod & 1)
        self.sop = bool(scod & 2)
        self.eph = bool(scod & 4)
        if has_sg:
            self.progression, self.layers, self.mct = sg  # type: ignore[misc]
        i = 0
        self.levels = body[i]; i += 1
        if self.levels > 32:
            raise CodecError(f"too many decomposition levels {self.levels}")
        self.xcb = body[i] + 2; i += 1
        self.ycb = body[i] + 2; i += 1
        if self.xcb > 10 or self.ycb > 10 or self.xcb + self.ycb > 12:
            raise CodecError("invalid code-block size")
        self.cbstyle = body[i]; i += 1
        if self.cbstyle != 0:
            raise CodecError(
                f"code-block style 0x{self.cbstyle:02x} (bypass/reset/termall/"
                "causal/pterm/segsym) not supported")
        self.transform = body[i]; i += 1  # 0 = 9/7 irreversible, 1 = 5/3 reversible
        if self.transform not in (0, 1):
            raise CodecError(f"unknown wavelet transform {self.transform}")
        if self.has_precincts:
            if len(body) < i + self.levels + 1:
                raise CodecError("short precinct size list")
            self.ppx = [body[i + r] & 0x0F for r in range(self.levels + 1)]
            self.ppy = [(body[i + r] >> 4) & 0x0F for r in range(self.levels + 1)]
            if any(p == 0 for p in self.ppx[1:]) or any(p == 0 for p in self.ppy[1:]):
                raise CodecError("precinct exponent 0 only valid at resolution 0")
        else:
            self.ppx = [15] * (self.levels + 1)
            self.ppy = [15] * (self.levels + 1)

    def clone_with_sg(self, other: "_Cod") -> "_Cod":
        """COC carries no SGcod — inherit progression/layers/mct.

        Scoc carries only the precinct flag (T.800 A.6.2); SOP/EPH are
        tile-level properties of the main COD's Scod and apply to every
        component's packets, so inherit them too.
        """
        self.progression = other.progression
        self.layers = other.layers
        self.mct = other.mct
        self.sop = other.sop
        self.eph = other.eph
        return self


def _parse_cod(seg: bytes) -> _Cod:
    if len(seg) < 10:
        raise CodecError("short COD")
    scod = seg[0]
    prog, layers, mct = seg[1], int.from_bytes(seg[2:4], "big"), seg[4]
    if prog > 4:
        raise CodecError(f"unknown progression order {prog}")
    if layers == 0:
        raise CodecError("zero quality layers")
    if mct not in (0, 1):
        raise CodecError(f"unknown MCT {mct}")
    return _Cod(scod, seg[5:], True, (prog, layers, mct))


class _Qcd:
    """QCD/QCC quantization parameters (A.6.4/A.6.5)."""

    def __init__(self, seg: bytes):
        if len(seg) < 1:
            raise CodecError("short QCD")
        sqcd = seg[0]
        self.style = sqcd & 0x1F
        self.guard = sqcd >> 5
        body = seg[1:]
        if self.style == 0:  # no quantization (reversible): 8-bit exponents
            self.exps = [b >> 3 for b in body]
            self.mants = [0] * len(body)
        elif self.style == 1:  # scalar derived: single 16-bit value
            if len(body) < 2:
                raise CodecError("short QCD (derived)")
            v = int.from_bytes(body[0:2], "big")
            self.exps = [v >> 11]
            self.mants = [v & 0x7FF]
        elif self.style == 2:  # scalar expounded: 16-bit per subband
            if len(body) % 2:
                raise CodecError("odd QCD (expounded) length")
            vals = [int.from_bytes(body[i : i + 2], "big") for i in range(0, len(body), 2)]
            self.exps = [v >> 11 for v in vals]
            self.mants = [v & 0x7FF for v in vals]
        else:
            raise CodecError(f"unknown quantization style {self.style}")

    def band_params(self, levels: int, band_index: int, nb: int) -> Tuple[int, int]:
        """(exponent, mantissa) for global band index (0=LL, then per level
        HL,LH,HH ascending resolution). ``nb`` = decomposition level of the
        band, for the derived-style exponent adjustment (E.1.1)."""
        if self.style == 1:
            # derived: eps_b = eps_0 - NL + nb
            return self.exps[0] - levels + nb, self.mants[0]
        if band_index >= len(self.exps):
            raise CodecError("QCD has too few subband entries")
        return self.exps[band_index], self.mants[band_index]


# ---------------------------------------------------------------------------
# tag trees (B.10.2)


class _TTNode:
    __slots__ = ("parent", "value", "low", "known")

    def __init__(self, parent):
        self.parent = parent
        self.value = 0     # lower bound / final value once known
        self.low = 0       # decoder's proven lower bound
        self.known = False


class TagTree:
    """B.10.2 tag-tree decoder, per-node formulation."""

    def __init__(self, w: int, h: int):
        self.w, self.h = w, h
        sizes = []
        lw, lh = max(w, 1), max(h, 1)
        while True:
            sizes.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = _ceil_div(lw, 2), _ceil_div(lh, 2)
        self.nodes: List[List[_TTNode]] = []
        for li in range(len(sizes) - 1, -1, -1):
            lw, lh = sizes[li]
            level = []
            for yy in range(lh):
                for xx in range(lw):
                    if li == len(sizes) - 1:
                        parent = None
                    else:
                        pw = sizes[li + 1][0]
                        parent = self.nodes[-1][(yy // 2) * pw + (xx // 2)]
                    level.append(_TTNode(parent))
            self.nodes.append(level)
        self.leaf_level = len(self.nodes) - 1
        self.leaf_w = sizes[0][0]

    def decode(self, br: "_PacketBitReader", x: int, y: int, threshold: int) -> bool:
        """True iff leaf value < threshold (decoding as many bits as needed)."""
        node = self.nodes[self.leaf_level][y * self.leaf_w + x]
        stack = []
        n = node
        while n is not None:
            stack.append(n)
            n = n.parent
        low = 0
        for n in reversed(stack):
            if n.low < low:
                n.low = low
            while not n.known and n.low < threshold:
                if br.read_bit():
                    n.value = n.low
                    n.known = True
                else:
                    n.low += 1
            low = n.value if n.known else n.low
        return node.known and node.value < threshold


# ---------------------------------------------------------------------------
# packet-header bit reader (B.10.1: bit stuffing after 0xFF)


class _PacketBitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.byte = 0
        self.nbits = 0
        self.last_ff = False

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise CodecError("packet header overrun")
            b = self.data[self.pos]
            self.pos += 1
            if self.last_ff:
                if b & 0x80:
                    raise CodecError("invalid stuffing after 0xFF in packet header")
                self.byte = b
                self.nbits = 7
            else:
                self.byte = b
                self.nbits = 8
            self.last_ff = b == 0xFF
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> int:
        """End of packet header: skip to byte boundary (consuming the stuffed
        0x00 after a trailing 0xFF, B.10.1) and return the byte position."""
        self.nbits = 0
        if self.last_ff:
            if self.pos < len(self.data):
                if self.data[self.pos] & 0x80:
                    raise CodecError("invalid stuffing at packet header end")
                self.pos += 1
        self.last_ff = False
        return self.pos


# ---------------------------------------------------------------------------
# MQ arithmetic decoder (ISO 15444-1 Annex C)

# (Qe, NMPS, NLPS, SWITCH)
_MQ_TABLE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class _MQDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = (self._b(0) << 16)
        self.bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _b(self, i: int) -> int:
        return self.data[i] if i < len(self.data) else 0xFF

    def bytein(self):
        if self._b(self.bp) == 0xFF:
            if self._b(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._b(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._b(self.bp) << 8
            self.ct = 8

    def decode(self, cx: List[int]) -> int:
        """Decode one decision with context state cx = [index, mps]."""
        icx, mps = cx
        qe = _MQ_TABLE[icx][0]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange or MPS exchange
            if self.a < qe:
                d = mps
                cx[0] = _MQ_TABLE[icx][1]
            else:
                d = 1 - mps
                if _MQ_TABLE[icx][3]:
                    cx[1] = 1 - mps
                cx[0] = _MQ_TABLE[icx][2]
            self.a = qe
            # renorm
            while True:
                if self.ct == 0:
                    self.bytein()
                self.a <<= 1
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
        self.c -= qe << 16
        if self.a & 0x8000:
            return mps
        if self.a < qe:
            d = 1 - mps
            if _MQ_TABLE[icx][3]:
                cx[1] = 1 - mps
            cx[0] = _MQ_TABLE[icx][2]
        else:
            d = mps
            cx[0] = _MQ_TABLE[icx][1]
        while True:
            if self.ct == 0:
                self.bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# ---------------------------------------------------------------------------
# EBCOT Tier-1 code-block decoder (Annex D)

# zero-coding context tables (Table D.1), indexed [sumH][sumV][sumD] per band
# family. Band families: 0 = LL/LH (and for our purposes LL behaves like LH),
# 1 = HL (transpose of LH), 2 = HH.


def _build_zc_lut() -> np.ndarray:
    lut = np.zeros((3, 3, 3, 5), np.int8)  # [family][h][v][d] -> context 0..8
    for h in range(3):
        for v in range(3):
            for d in range(5):
                # LL & LH (vertical high-pass: horizontal neighbors dominant)
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                else:
                    if v == 2:
                        c = 4
                    elif v == 1:
                        c = 3
                    elif d >= 2:
                        c = 2
                    else:
                        c = d  # 0 or 1
                lut[0, h, v, min(d, 4)] = c
                # HL: swap roles of h and v
                if v == 2:
                    c = 8
                elif v == 1:
                    c = 7 if h >= 1 else (6 if d >= 1 else 5)
                else:
                    if h == 2:
                        c = 4
                    elif h == 1:
                        c = 3
                    elif d >= 2:
                        c = 2
                    else:
                        c = d
                lut[1, h, v, min(d, 4)] = c
                # HH: diagonal dominant
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else hv
                lut[2, h, v, min(d, 4)] = c
    return lut


_ZC_LUT = _build_zc_lut()

# sign-coding (Table D.3): inputs H, V in {-1, 0, 1} (net sign contribution)
# -> (context 9..13, xorbit)


def _sc_lut() -> Dict[Tuple[int, int], Tuple[int, int]]:
    tbl = {}
    for hc in (-1, 0, 1):
        for vc in (-1, 0, 1):
            if hc == 1:
                if vc == 1:
                    cx, xor = 13, 0
                elif vc == 0:
                    cx, xor = 12, 0
                else:
                    cx, xor = 11, 0
            elif hc == 0:
                if vc == 1:
                    cx, xor = 10, 0
                elif vc == 0:
                    cx, xor = 9, 0
                else:
                    cx, xor = 10, 1
            else:
                if vc == 1:
                    cx, xor = 11, 1
                elif vc == 0:
                    cx, xor = 12, 1
                else:
                    cx, xor = 13, 1
            tbl[(hc, vc)] = (cx, xor)
    return tbl


_SC_LUT = _sc_lut()

_CTX_UNI = 18   # UNIFORM
_CTX_RL = 17    # run-length
# magnitude refinement contexts 14..16

_N_CTX = 19


class _T1Decoder:
    """Decode one code-block's coding passes into signed magnitudes."""

    def __init__(self, w: int, h: int, band_family: int):
        self.w, self.h = w, h
        self.family = band_family
        self.sig = np.zeros((h + 2, w + 2), np.uint8)     # significance (padded)
        self.sgn = np.zeros((h + 2, w + 2), np.int8)      # sign: +1/-1
        self.refined = np.zeros((h, w), np.uint8)         # has had a refinement pass
        self.visited = np.zeros((h, w), np.uint8)
        self.mag = np.zeros((h, w), np.int64)
        # bit-plane of the last decoded bit per coefficient — the decoder
        # reconstructs at the midpoint of the remaining uncertainty interval
        # (2·mag + 2^last, halved by the caller), matching OpenJPEG/T.800 E.1.
        self.last = np.zeros((h, w), np.int16)
        self.ctx = [[_MQ_TABLE_INIT[i][0], _MQ_TABLE_INIT[i][1]] for i in range(_N_CTX)]

    def _neighborhood(self, x: int, y: int) -> Tuple[int, int, int]:
        s = self.sig
        yy, xx = y + 1, x + 1
        h = int(s[yy, xx - 1]) + int(s[yy, xx + 1])
        v = int(s[yy - 1, xx]) + int(s[yy + 1, xx])
        d = (int(s[yy - 1, xx - 1]) + int(s[yy - 1, xx + 1])
             + int(s[yy + 1, xx - 1]) + int(s[yy + 1, xx + 1]))
        return h, v, d

    def _zc_ctx(self, x: int, y: int) -> int:
        h, v, d = self._neighborhood(x, y)
        return int(_ZC_LUT[self.family, min(h, 2), min(v, 2), min(d, 4)])

    def _sign_ctx(self, x: int, y: int) -> Tuple[int, int]:
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1
        hc = min(1, max(-1, int(s[yy, xx - 1]) * int(g[yy, xx - 1])
                        + int(s[yy, xx + 1]) * int(g[yy, xx + 1])))
        vc = min(1, max(-1, int(s[yy - 1, xx]) * int(g[yy - 1, xx])
                        + int(s[yy + 1, xx]) * int(g[yy + 1, xx])))
        return _SC_LUT[(hc, vc)]

    def _mr_ctx(self, x: int, y: int) -> int:
        if self.refined[y, x]:
            return 16
        h, v, d = self._neighborhood(x, y)
        return 15 if (h + v + d) > 0 else 14

    def _become_significant(self, mq: _MQDecoder, x: int, y: int, plane: int):
        cx, xor = self._sign_ctx(x, y)
        bit = mq.decode(self.ctx[cx])
        sign = -1 if (bit ^ xor) else 1
        self.sig[y + 1, x + 1] = 1
        self.sgn[y + 1, x + 1] = sign
        self.mag[y, x] = 1 << plane
        self.last[y, x] = plane

    def sig_pass(self, mq: _MQDecoder, plane: int):
        """Significance propagation (D.3.1)."""
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    if self.sig[y + 1, x + 1]:
                        continue
                    h, v, d = self._neighborhood(x, y)
                    if h + v + d == 0:
                        continue
                    self.visited[y, x] = 1
                    if mq.decode(self.ctx[self._zc_ctx(x, y)]):
                        self._become_significant(mq, x, y, plane)

    def mag_pass(self, mq: _MQDecoder, plane: int):
        """Magnitude refinement (D.3.3)."""
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    if not self.sig[y + 1, x + 1] or self.visited[y, x]:
                        continue
                    bit = mq.decode(self.ctx[self._mr_ctx(x, y)])
                    self.refined[y, x] = 1
                    self.last[y, x] = plane
                    if bit:
                        self.mag[y, x] |= 1 << plane

    def cleanup_pass(self, mq: _MQDecoder, plane: int):
        """Cleanup with run-length mode (D.3.4)."""
        for y0 in range(0, self.h, 4):
            x = 0
            while x < self.w:
                y = y0
                # run-length mode: full stripe column, all insignificant,
                # no significant neighbors
                full = y0 + 4 <= self.h
                if full:
                    rl = True
                    for yy in range(y0, y0 + 4):
                        if self.visited[yy, x] or self.sig[yy + 1, x + 1]:
                            rl = False
                            break
                        h, v, d = self._neighborhood(x, yy)
                        if h + v + d:
                            rl = False
                            break
                else:
                    rl = False
                if rl:
                    if not mq.decode(self.ctx[_CTX_RL]):
                        self.visited[y0 : y0 + 4, x] = 0
                        x += 1
                        continue
                    r = (mq.decode(self.ctx[_CTX_UNI]) << 1) | mq.decode(self.ctx[_CTX_UNI])
                    y = y0 + r
                    # the first significant coefficient: sign only
                    self._become_significant(mq, x, y, plane)
                    y += 1
                for yy in range(y, min(y0 + 4, self.h)):
                    if self.visited[yy, x] or self.sig[yy + 1, x + 1]:
                        continue
                    if mq.decode(self.ctx[self._zc_ctx(x, yy)]):
                        self._become_significant(mq, x, yy, plane)
                x += 1
        self.visited[:] = 0


# initial context states (Table D.7): all (0,0) except ZC ctx 0 -> state 4,
# run-length -> 3, uniform -> 46
_MQ_TABLE_INIT = [[0, 0] for _ in range(_N_CTX)]
_MQ_TABLE_INIT[0] = [4, 0]
_MQ_TABLE_INIT[_CTX_RL] = [3, 0]
_MQ_TABLE_INIT[_CTX_UNI] = [46, 0]


def _decode_codeblock(data: bytes, w: int, h: int, family: int,
                      zero_planes: int, npasses: int, mb: int) -> Tuple[np.ndarray, np.ndarray]:
    """Run ``npasses`` coding passes; returns (magnitude2, sign) arrays.

    The first pass is the cleanup pass of bit-plane mb-1-zero_planes; then
    (sig, mag, cleanup) triplets on descending planes (D.2).

    ``magnitude2`` is DOUBLED and carries the midpoint of the remaining
    uncertainty interval: 2·mag + 2^lastplane for significant coefficients
    (OpenJPEG's convention — reversible paths integer-halve it, irreversible
    paths multiply by Δ/2), so truncated-layer streams reconstruct
    bit-identically to the reference decoders."""
    t1 = _T1Decoder(w, h, family)
    mq = _MQDecoder(data)
    plane = mb - 1 - zero_planes
    if plane < 0:
        if npasses > 0:
            raise CodecError("zero bit-planes exceed Mb")
        return t1.mag, np.ones((h, w), np.int8)
    k = 0
    # first plane: cleanup only
    t1.cleanup_pass(mq, plane)
    k += 1
    plane -= 1
    while k < npasses:
        if plane < 0:
            raise CodecError("more passes than bit-planes")
        t1.sig_pass(mq, plane)
        k += 1
        if k >= npasses:
            break
        t1.mag_pass(mq, plane)
        k += 1
        if k >= npasses:
            break
        t1.cleanup_pass(mq, plane)
        k += 1
        plane -= 1
    sign = np.where(np.asarray(t1.sgn[1:-1, 1:-1]) < 0, -1, 1).astype(np.int8)
    sig = np.asarray(t1.sig[1:-1, 1:-1]) != 0
    mag2 = 2 * t1.mag + np.where(sig, np.int64(1) << t1.last.astype(np.int64), 0)
    return mag2, sign


# ---------------------------------------------------------------------------
# geometry: resolutions, bands, precincts, code-blocks


class _CodeBlock:
    __slots__ = ("x0", "y0", "x1", "y1", "included", "zero_planes", "npasses",
                 "lblock", "data", "mag", "sign")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.included = False
        self.zero_planes = 0
        self.npasses = 0
        self.lblock = 3
        self.data = bytearray()
        self.mag = None
        self.sign = None


class _Band:
    def __init__(self, btype: str, x0, y0, x1, y1, exp, mant, nb):
        self.btype = btype  # 'LL','HL','LH','HH'
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.exp, self.mant, self.nb = exp, mant, nb
        self.cblocks: List[List[_CodeBlock]] = []  # per precinct
        self.incl_trees: List[TagTree] = []
        self.zb_trees: List[TagTree] = []
        self.cb_grid: List[Tuple[int, int]] = []   # (ncols, nrows) per precinct

    @property
    def family(self) -> int:
        return {"LL": 0, "LH": 0, "HL": 1, "HH": 2}[self.btype]


class _Resolution:
    def __init__(self, r, x0, y0, x1, y1, ppx, ppy):
        self.r = r
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.ppx, self.ppy = ppx, ppy
        if x1 > x0 and y1 > y0:
            self.npw = _ceil_div(x1, 1 << ppx) - (x0 >> ppx)
            self.nph = _ceil_div(y1, 1 << ppy) - (y0 >> ppy)
        else:
            self.npw = self.nph = 0
        self.bands: List[_Band] = []


class _TileComp:
    def __init__(self, siz: _Siz, cod: _Cod, qcd: _Qcd, tx0, ty0, tx1, ty1):
        self.cod = cod
        self.x0, self.y0, self.x1, self.y1 = tx0, ty0, tx1, ty1
        self.resolutions: List[_Resolution] = []
        nl = cod.levels
        band_idx = 0
        for r in range(nl + 1):
            sh = nl - r
            rx0, ry0 = _ceil_div(tx0, 1 << sh), _ceil_div(ty0, 1 << sh)
            rx1, ry1 = _ceil_div(tx1, 1 << sh), _ceil_div(ty1, 1 << sh)
            res = _Resolution(r, rx0, ry0, rx1, ry1, cod.ppx[r], cod.ppy[r])
            if r == 0:
                exp, mant = qcd.band_params(nl, 0, nl)
                res.bands.append(_Band("LL", rx0, ry0, rx1, ry1, exp, mant, nl))
                band_idx = 1
            else:
                nb = nl - r + 1
                for btype, xob, yob in (("HL", 1, 0), ("LH", 0, 1), ("HH", 1, 1)):
                    bx0 = _ceil_div(tx0 - (1 << (nb - 1)) * xob, 1 << nb)
                    bx1 = _ceil_div(tx1 - (1 << (nb - 1)) * xob, 1 << nb)
                    by0 = _ceil_div(ty0 - (1 << (nb - 1)) * yob, 1 << nb)
                    by1 = _ceil_div(ty1 - (1 << (nb - 1)) * yob, 1 << nb)
                    exp, mant = qcd.band_params(nl, band_idx, nb)
                    band_idx += 1
                    res.bands.append(_Band(btype, bx0, by0, bx1, by1, exp, mant, nb))
            self._build_precincts(res, cod)
            self.resolutions.append(res)

    def _build_precincts(self, res: _Resolution, cod: _Cod):
        """Split each band into per-precinct code-block lists (B.7)."""
        r = res.r
        # code-block size within a precinct (B.7)
        if r == 0:
            xcb = min(cod.xcb, res.ppx)
            ycb = min(cod.ycb, res.ppy)
            shift = 0
        else:
            xcb = min(cod.xcb, res.ppx - 1)
            ycb = min(cod.ycb, res.ppy - 1)
            shift = 1
        for band in res.bands:
            for pj in range(res.nph):
                for pi in range(res.npw):
                    # precinct rect in resolution coords
                    px0 = max(res.x0, ((res.x0 >> res.ppx) + pi) << res.ppx)
                    py0 = max(res.y0, ((res.y0 >> res.ppy) + pj) << res.ppy)
                    px1 = min(res.x1, ((res.x0 >> res.ppx) + pi + 1) << res.ppx)
                    py1 = min(res.y1, ((res.y0 >> res.ppy) + pj + 1) << res.ppy)
                    # map to band coords (for r>0 halve; xob/yob offsets fall
                    # out because precinct corners are multiples of 2^ppx)
                    if shift:
                        bx0, by0 = _ceil_div(px0, 2), _ceil_div(py0, 2)
                        bx1, by1 = _ceil_div(px1, 2), _ceil_div(py1, 2)
                    else:
                        bx0, by0, bx1, by1 = px0, py0, px1, py1
                    bx0, by0 = max(bx0, band.x0), max(by0, band.y0)
                    bx1, by1 = min(bx1, band.x1), min(by1, band.y1)
                    blocks = []
                    if bx1 > bx0 and by1 > by0:
                        cx0 = (bx0 >> xcb) << xcb
                        cy0 = (by0 >> ycb) << ycb
                        ncols = _ceil_div(bx1 - cx0, 1 << xcb)
                        nrows = _ceil_div(by1 - cy0, 1 << ycb)
                        for cy in range(nrows):
                            for cx in range(ncols):
                                x0 = max(cx0 + (cx << xcb), bx0)
                                y0 = max(cy0 + (cy << ycb), by0)
                                x1 = min(cx0 + ((cx + 1) << xcb), bx1)
                                y1 = min(cy0 + ((cy + 1) << ycb), by1)
                                blocks.append(_CodeBlock(x0, y0, x1, y1))
                    else:
                        ncols = nrows = 0
                    band.cblocks.append(blocks)
                    band.cb_grid.append((ncols, nrows))
                    band.incl_trees.append(TagTree(ncols, nrows))
                    band.zb_trees.append(TagTree(ncols, nrows))


# ---------------------------------------------------------------------------
# packet decoding


def _read_packet(data: bytes, pos: int, tc: _TileComp, res: _Resolution,
                 precinct: int, layer: int, cod: _Cod) -> int:
    """Decode one packet (header + body) at ``pos``; returns new pos."""
    if cod.sop:
        # optional SOP marker segment (6 bytes)
        if pos + 2 <= len(data) and data[pos] == 0xFF and data[pos + 1] == 0x91:
            pos += 6
    br = _PacketBitReader(data, pos)
    if not br.read_bit():  # zero-length packet
        pos = br.align()
        if cod.eph:
            if pos + 2 <= len(data) and data[pos] == 0xFF and data[pos + 1] == 0x92:
                pos += 2
        return pos
    contributions = []  # (cblock, band, new_passes, seglen)
    for band in res.bands:
        blocks = band.cblocks[precinct]
        if not blocks:
            continue
        ncols, nrows = band.cb_grid[precinct]
        incl_t = band.incl_trees[precinct]
        zb_t = band.zb_trees[precinct]
        for bi, cb in enumerate(blocks):
            cx, cy = bi % ncols, bi // ncols
            if not cb.included:
                inc = incl_t.decode(br, cx, cy, layer + 1)
            else:
                inc = bool(br.read_bit())
            if not inc:
                continue
            if not cb.included:
                # first inclusion: zero bit-planes via tag tree
                zb = 0
                while not zb_t.decode(br, cx, cy, zb + 1):
                    zb += 1
                cb.zero_planes = zb
                cb.included = True
                cb.lblock = 3
            # number of new passes (B.10.6)
            if not br.read_bit():
                newp = 1
            elif not br.read_bit():
                newp = 2
            else:
                v = br.read(2)
                if v < 3:
                    newp = 3 + v
                else:
                    v = br.read(5)
                    if v < 31:
                        newp = 6 + v
                    else:
                        newp = 37 + br.read(7)
            # Lblock update (B.10.7.1)
            while br.read_bit():
                cb.lblock += 1
            nbits = cb.lblock + int(math.floor(math.log2(newp)))
            seglen = br.read(nbits)
            contributions.append((cb, newp, seglen))
            cb.npasses += newp
    pos = br.align()
    if cod.eph:
        if pos + 2 <= len(data) and data[pos] == 0xFF and data[pos + 1] == 0x92:
            pos += 2
        else:
            raise CodecError("missing EPH marker")
    for cb, newp, seglen in contributions:
        if pos + seglen > len(data):
            raise CodecError("packet body overrun")
        cb.data += data[pos : pos + seglen]
        pos += seglen
    return pos


def _packet_order(tile_comps: List[_TileComp], cod: _Cod):
    """Yield (comp, res, precinct, layer) in the codestream's progression
    order (B.12). All components share layers/progression (COD/COC divergence
    in *progression* is not representable in Part 1)."""
    prog = cod.progression
    layers = cod.layers
    max_res = max(len(tc.resolutions) for tc in tile_comps)
    ncomp = len(tile_comps)

    if prog == 0:  # LRCP
        for l in range(layers):
            for r in range(max_res):
                for c in range(ncomp):
                    tc = tile_comps[c]
                    if r >= len(tc.resolutions):
                        continue
                    res = tc.resolutions[r]
                    for p in range(res.npw * res.nph):
                        yield c, r, p, l
    elif prog == 1:  # RLCP
        for r in range(max_res):
            for l in range(layers):
                for c in range(ncomp):
                    tc = tile_comps[c]
                    if r >= len(tc.resolutions):
                        continue
                    res = tc.resolutions[r]
                    for p in range(res.npw * res.nph):
                        yield c, r, p, l
    else:
        # positional orders need the precinct projection to tile coords
        def precinct_positions():
            """(y, x, c, r, p) tuples for every precinct."""
            out = []
            for c, tc in enumerate(tile_comps):
                nl = tc.cod.levels
                for r, res in enumerate(tc.resolutions):
                    if res.npw == 0 or res.nph == 0:
                        continue
                    sh = nl - r
                    for pj in range(res.nph):
                        for pi in range(res.npw):
                            p = pj * res.npw + pi
                            # top-left of precinct in tile coords
                            px = max(res.x0, ((res.x0 >> res.ppx) + pi) << res.ppx)
                            py = max(res.y0, ((res.y0 >> res.ppy) + pj) << res.ppy)
                            out.append((py << sh, px << sh, c, r, p))
            return out

        pos_list = precinct_positions()
        if prog == 2:  # RPCL
            keys = sorted(pos_list, key=lambda t: (t[3], t[0], t[1], t[2]))
            for _, _, c, r, p in keys:
                for l in range(layers):
                    yield c, r, p, l
            return
        elif prog == 3:  # PCRL
            keys = sorted(pos_list, key=lambda t: (t[0], t[1], t[2], t[3]))
        else:  # CPRL
            keys = sorted(pos_list, key=lambda t: (t[2], t[0], t[1], t[3]))
        for y, x, c, r, p in keys:
            for l in range(layers):
                yield c, r, p, l


# ---------------------------------------------------------------------------
# inverse wavelet (Annex F)


def _idwt_53_1d(low: np.ndarray, high: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """F.3.8: inverse 5/3 along axis 0 for a signal spanning [i0, i1)."""
    n = i1 - i0
    if n == 1:
        # length-1 special case (F.3.8.2): even origin is the low sample
        # passed through unchanged; odd origin is a lone high sample that the
        # forward transform doubled.
        if i0 % 2 == 0:
            return low.astype(np.int64).copy()
        return high.astype(np.int64) >> 1
    # interleave into extended array indexed i0-2 .. i1+1
    y = np.zeros((n + 4,) + low.shape[1:], np.int64)

    def put(idx, val):
        y[idx - (i0 - 2)] = val

    def get(idx):
        return y[idx - (i0 - 2)]

    # place subband samples: even positions <- low, odd <- high
    ev = [i for i in range(i0, i1) if i % 2 == 0]
    od = [i for i in range(i0, i1) if i % 2 == 1]
    for k, i in enumerate(ev):
        put(i, low[k])
    for k, i in enumerate(od):
        put(i, high[k])
    # symmetric extension (F.3.7): period 2*(n-1) mirror about ends
    def ext(i):
        if n == 1:
            return i0
        per = 2 * (n - 1)
        j = (i - i0) % per
        if j < 0:
            j += per
        if j >= n:
            j = per - j
        return i0 + j

    for i in (i0 - 2, i0 - 1, i1, i1 + 1):
        put(i, get(ext(i)))
    # lifting: even then odd (F.3.8.2.1/2.2)
    out = np.zeros((n,) + low.shape[1:], np.int64)
    for i in range(i0, i1):
        if i % 2 == 0:
            v = get(i) - ((get(i - 1) + get(i + 1) + 2) >> 2)
            out[i - i0] = v
            put(i, v)
    # refresh extension after even update
    for i in (i0 - 2, i0 - 1, i1, i1 + 1):
        put(i, get(ext(i)))
    for i in range(i0, i1):
        if i % 2 == 1:
            out[i - i0] = get(i) + ((get(i - 1) + get(i + 1)) >> 1)
            put(i, out[i - i0])
    return out


# 9/7 lifting constants (Table F.4)
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _idwt_97_1d(low: np.ndarray, high: np.ndarray, i0: int, i1: int) -> np.ndarray:
    n = i1 - i0
    if n == 1:
        # length-1 special case (F.4.8.2): sample passes through with no
        # lifting and no K scaling.
        src = low if i0 % 2 == 0 else high
        return src.astype(np.float64).copy()
    y = np.zeros((n + 8,) + low.shape[1:], np.float64)
    off = i0 - 4

    ev = [i for i in range(i0, i1) if i % 2 == 0]
    od = [i for i in range(i0, i1) if i % 2 == 1]
    for k, i in enumerate(ev):
        y[i - off] = low[k] * _K97
    for k, i in enumerate(od):
        y[i - off] = high[k] / _K97

    def ext(i):
        if n == 1:
            return i0
        per = 2 * (n - 1)
        j = (i - i0) % per
        if j < 0:
            j += per
        if j >= n:
            j = per - j
        return i0 + j

    def refresh():
        for i in list(range(i0 - 4, i0)) + list(range(i1, i1 + 4)):
            y[i - off] = y[ext(i) - off]

    refresh()
    # four lifting steps (F.4.8.2). Each step preserves the whole-sample
    # symmetry of the extended signal (mirror maps even↔even, odd↔odd), so the
    # extension is re-mirrored between steps — later steps read boundary
    # neighbours produced by earlier ones.
    for i in range(i0, i1):
        if i % 2 == 0:
            y[i - off] = y[i - off] - _D97 * (y[i - 1 - off] + y[i + 1 - off])
    refresh()
    for i in range(i0, i1):
        if i % 2 == 1:
            y[i - off] = y[i - off] - _G97 * (y[i - 1 - off] + y[i + 1 - off])
    refresh()
    for i in range(i0, i1):
        if i % 2 == 0:
            y[i - off] = y[i - off] - _B97 * (y[i - 1 - off] + y[i + 1 - off])
    refresh()
    for i in range(i0, i1):
        if i % 2 == 1:
            y[i - off] = y[i - off] - _A97 * (y[i - 1 - off] + y[i + 1 - off])
    return y[i0 - off : i1 - off]


def _inverse_dwt(tc: _TileComp, bands_data: List[List[np.ndarray]],
                 reversible: bool) -> np.ndarray:
    """2D inverse DWT (F.3/F.4): iteratively reconstruct from LL upward."""
    ll = bands_data[0][0]
    for r in range(1, len(tc.resolutions)):
        res = tc.resolutions[r]
        hl, lh, hh = bands_data[r]
        x0, y0, x1, y1 = res.x0, res.y0, res.x1, res.y1
        w, h = x1 - x0, y1 - y0
        if w <= 0 or h <= 0:
            continue
        bandHL = res.bands[0]
        # horizontal: rows of (LL|HL) and (LH|HH) — low = LL/LH, high = HL/HH
        # 1D along x for each of the two vertical groups, then along y.
        # subband x-ranges: LL/LH span [u0, u1) with u0=ceil(x0/2), HL/HH span
        # [v0, v1) with v0=floor(x0/2)... use band rects directly.
        dtype = np.int64 if reversible else np.float64
        top = np.zeros((ll.shape[0], w), dtype)     # rows from LL+HL
        bot = np.zeros((lh.shape[0], w), dtype)     # rows from LH+HH
        idwt1 = _idwt_53_1d if reversible else _idwt_97_1d
        # horizontal pass: for each row, interleave LL(even cols)/HL(odd)
        if ll.shape[0]:
            top = idwt1(ll.T.astype(dtype), hl.T.astype(dtype), x0, x1).T
        if lh.shape[0]:
            bot = idwt1(lh.T.astype(dtype), hh.T.astype(dtype), x0, x1).T
        # vertical pass: interleave top(even rows)/bot(odd rows)
        ll = idwt1(top.astype(dtype), bot.astype(dtype), y0, y1)
    return ll


# ---------------------------------------------------------------------------
# top-level decode


def _extract_codestream(data: bytes) -> bytes:
    """Accept raw codestreams or JP2 boxes (I.5): find the jp2c box."""
    if data[:2] == b"\xff\x4f":
        return data
    if data[:8] == b"\x00\x00\x00\x0cjP  ":
        i = 0
        while i + 8 <= len(data):
            blen = int.from_bytes(data[i : i + 4], "big")
            btype = data[i + 4 : i + 8]
            hdr = 8
            if blen == 1:
                blen = int.from_bytes(data[i + 8 : i + 16], "big")
                hdr = 16
            elif blen == 0:
                blen = len(data) - i
            if btype == b"jp2c":
                return data[i + hdr : i + blen]
            if blen < hdr:
                raise CodecError("bad JP2 box length")
            i += blen
        raise CodecError("JP2 container without jp2c box")
    raise CodecError("not a JPEG 2000 stream")


class _Tile:
    def __init__(self):
        self.data = bytearray()
        self.cod_override: Optional[_Cod] = None
        self.qcd_override: Optional[_Qcd] = None
        self.coc_over: Dict[int, _Cod] = {}
        self.qcc_over: Dict[int, _Qcd] = {}


def _parse_main_header(cs: bytes):
    if cs[:2] != b"\xff\x4f":
        raise CodecError("missing SOC")
    i = 2
    siz = cod = qcd = None
    coc: Dict[int, _Cod] = {}
    qcc: Dict[int, _Qcd] = {}
    while i + 4 <= len(cs):
        marker = int.from_bytes(cs[i : i + 2], "big")
        if marker == _SOT:
            break
        if marker < 0xFF30:
            raise CodecError(f"bad marker 0x{marker:04x} at {i}")
        seglen = int.from_bytes(cs[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > len(cs):
            raise CodecError("truncated marker segment")
        seg = cs[i + 4 : i + 2 + seglen]
        if marker == _SIZ:
            siz = _Siz(seg)
        elif marker == _COD:
            cod = _parse_cod(seg)
        elif marker == _COC:
            if siz is None:
                raise CodecError("COC before SIZ")
            ci = seg[0] if siz.ncomp < 257 else int.from_bytes(seg[0:2], "big")
            off = 1 if siz.ncomp < 257 else 2
            coc[ci] = _Cod(seg[off], seg[off + 1 :], False)
        elif marker == _QCD:
            qcd = _Qcd(seg)
        elif marker == _QCC:
            if siz is None:
                raise CodecError("QCC before SIZ")
            ci = seg[0] if siz.ncomp < 257 else int.from_bytes(seg[0:2], "big")
            off = 1 if siz.ncomp < 257 else 2
            qcc[ci] = _Qcd(seg[off:])
        elif marker in (_RGN, _POC, _PPM, _PPT):
            raise CodecError(f"marker 0x{marker:04x} (RGN/POC/PPM/PPT) not supported")
        elif marker in (_TLM, _PLM, _PLT, _CRG, _COM):
            pass  # informational
        i += 2 + seglen
    if siz is None or cod is None or qcd is None:
        raise CodecError("missing SIZ/COD/QCD")
    return siz, cod, coc, qcd, qcc, i


def _parse_tiles(cs: bytes, start: int, siz: _Siz) -> Dict[int, _Tile]:
    tiles: Dict[int, _Tile] = {}
    i = start
    while i + 2 <= len(cs):
        marker = int.from_bytes(cs[i : i + 2], "big")
        if marker == _EOC:
            return tiles
        if marker != _SOT:
            raise CodecError(f"expected SOT/EOC at {i}, got 0x{marker:04x}")
        if i + 12 > len(cs):
            raise CodecError("truncated SOT")
        isot = int.from_bytes(cs[i + 4 : i + 6], "big")
        psot = int.from_bytes(cs[i + 6 : i + 10], "big")
        if isot >= siz.ntx * siz.nty:
            raise CodecError(f"tile index {isot} out of range")
        tp_end = i + psot if psot else len(cs) - 2
        if tp_end > len(cs):
            raise CodecError("tile-part overruns stream")
        tile = tiles.setdefault(isot, _Tile())
        # tile-part header: optional COD/COC/QCD/QCC then SOD
        j = i + 12
        while j + 4 <= len(cs):
            m2 = int.from_bytes(cs[j : j + 2], "big")
            if m2 == _SOD:
                j += 2
                break
            l2 = int.from_bytes(cs[j + 2 : j + 4], "big")
            if l2 < 2 or j + 2 + l2 > len(cs):
                raise CodecError("truncated tile-part header segment")
            seg = cs[j + 4 : j + 2 + l2]
            if m2 == _COD:
                tile.cod_override = _parse_cod(seg)
            elif m2 == _QCD:
                tile.qcd_override = _Qcd(seg)
            elif m2 == _COC:
                ci = seg[0]
                tile.coc_over[ci] = _Cod(seg[1], seg[2:], False)
            elif m2 == _QCC:
                ci = seg[0]
                tile.qcc_over[ci] = _Qcd(seg[1:])
            elif m2 in (_RGN, _POC, _PPT):
                raise CodecError(f"marker 0x{m2:04x} not supported in tile header")
            j += 2 + l2
        else:
            raise CodecError("tile-part without SOD")
        tile.data += cs[j:tp_end]
        i = tp_end
    raise CodecError("missing EOC")


def j2k_decode_py(data: bytes) -> np.ndarray:
    """Decode a JPEG 2000 codestream (or JP2 file) → (rows, cols) or
    (rows, cols, ncomp) array, uint8/uint16/int16 by precision+sign."""
    cs = _extract_codestream(bytes(data))
    siz, g_cod, g_coc, g_qcd, g_qcc, pos = _parse_main_header(cs)
    tiles = _parse_tiles(cs, pos, siz)

    img_w = siz.xsiz - siz.xosiz
    img_h = siz.ysiz - siz.yosiz
    out = np.zeros((img_h, img_w, siz.ncomp), np.float64)

    for tidx in range(siz.ntx * siz.nty):
        if tidx not in tiles:
            continue  # absent tile: stays zero (after DC shift below)
        tile = tiles[tidx]
        p, q = tidx % siz.ntx, tidx // siz.ntx
        tx0 = max(siz.xtosiz + p * siz.xtsiz, siz.xosiz)
        tx1 = min(siz.xtosiz + (p + 1) * siz.xtsiz, siz.xsiz)
        ty0 = max(siz.ytosiz + q * siz.ytsiz, siz.yosiz)
        ty1 = min(siz.ytosiz + (q + 1) * siz.ytsiz, siz.ysiz)

        base_cod = tile.cod_override or g_cod
        base_qcd = tile.qcd_override or g_qcd
        tcs: List[_TileComp] = []
        for c in range(siz.ncomp):
            cod_c = tile.coc_over.get(c) or g_coc.get(c)
            cod_c = cod_c.clone_with_sg(base_cod) if cod_c is not None else base_cod
            qcd_c = tile.qcc_over.get(c) or g_qcc.get(c) or base_qcd
            tcs.append(_TileComp(siz, cod_c, qcd_c, tx0, ty0, tx1, ty1))

        # read packets in progression order
        data_t = bytes(tile.data)
        dpos = 0
        for c, r, pidx, layer in _packet_order(tcs, base_cod):
            tc = tcs[c]
            res = tc.resolutions[r]
            if pidx >= res.npw * res.nph:
                continue
            if dpos >= len(data_t):
                break  # truncated stream: decode what we have
            dpos = _read_packet(data_t, dpos, tc, res, pidx, layer, tc.cod)

        # decode code-blocks, dequantize, inverse DWT
        comps = []
        for c, tc in enumerate(tcs):
            reversible = tc.cod.transform == 1
            guard = (tile.qcc_over.get(c) or g_qcc.get(c) or base_qcd).guard
            bands_data: List[List[np.ndarray]] = []
            for r, res in enumerate(tc.resolutions):
                rb: List[np.ndarray] = []
                for band in res.bands:
                    bw, bh = band.x1 - band.x0, band.y1 - band.y0
                    arr = (np.zeros((max(bh, 0), max(bw, 0)), np.int64)
                           if reversible else
                           np.zeros((max(bh, 0), max(bw, 0)), np.float64))
                    # Mb: number of magnitude bit-planes (E.1)
                    rbit = siz.prec[c] + (1 if band.btype in ("HL", "LH") else
                                          2 if band.btype == "HH" else 0)
                    mb = band.exp + guard - 1
                    for pidx2, blocks in enumerate(band.cblocks):
                        for cb in blocks:
                            if not cb.included or cb.npasses == 0:
                                continue
                            w, h = cb.x1 - cb.x0, cb.y1 - cb.y0
                            mag2, sign = _decode_codeblock(
                                bytes(cb.data), w, h, band.family,
                                cb.zero_planes, cb.npasses, mb)
                            if reversible:
                                # integer-halve the doubled midpoint value,
                                # truncating toward zero (OpenJPEG data/2)
                                arr[cb.y0 - band.y0 : cb.y1 - band.y0,
                                    cb.x0 - band.x0 : cb.x1 - band.x0] = \
                                    ((mag2 >> 1) * sign).astype(np.int64)
                            else:
                                # E.1.1: Δ = 2^(Rb - eps) * (1 + mant/2^11)
                                delta = (2.0 ** (rbit - band.exp)
                                         * (1.0 + band.mant / 2048.0))
                                arr[cb.y0 - band.y0 : cb.y1 - band.y0,
                                    cb.x0 - band.x0 : cb.x1 - band.x0] = \
                                    mag2.astype(np.float64) * sign * (delta * 0.5)
                    rb.append(arr)
                bands_data.append(rb)
            comps.append(_inverse_dwt(tc, bands_data, reversible))

        # inverse MCT (G.2/G.3)
        if base_cod.mct and siz.ncomp >= 3:
            c0, c1, c2 = comps[0], comps[1], comps[2]
            if base_cod.transform == 1:  # RCT
                g = c0 - ((c1 + c2) // 4)
                r_ = c2 + g
                b_ = c1 + g
                comps[0], comps[1], comps[2] = r_, g, b_
            else:  # ICT
                r_ = c0 + 1.402 * c2
                g = c0 - 0.344136 * c1 - 0.714136 * c2
                b_ = c0 + 1.772 * c1
                comps[0], comps[1], comps[2] = r_, g, b_

        for c in range(siz.ncomp):
            arr = np.asarray(comps[c], np.float64)
            if not siz.signed[c]:
                arr = arr + (1 << (siz.prec[c] - 1))  # DC level shift (G.1)
            out[ty0 - siz.yosiz : ty1 - siz.yosiz,
                tx0 - siz.xosiz : tx1 - siz.xosiz, c] = arr

    # clamp + dtype
    res_comps = []
    for c in range(siz.ncomp):
        a = np.rint(out[:, :, c])
        if siz.signed[c]:
            lo, hi = -(1 << (siz.prec[c] - 1)), (1 << (siz.prec[c] - 1)) - 1
            dt = np.int16 if siz.prec[c] <= 16 else np.int32
        else:
            lo, hi = 0, (1 << siz.prec[c]) - 1
            dt = np.uint8 if siz.prec[c] <= 8 else np.uint16
        res_comps.append(np.clip(a, lo, hi).astype(dt))
    if siz.ncomp == 1:
        return res_comps[0]
    if len({a.dtype for a in res_comps}) > 1:
        res_comps = [a.astype(np.int32) for a in res_comps]
    return np.stack(res_comps, axis=-1)


def _find_siz(data: bytes) -> _Siz:
    """Walk the main header to the SIZ segment (shared by probe/decode)."""
    cs = _extract_codestream(bytes(data))
    if cs[:2] != b"\xff\x4f":
        raise CodecError("missing SOC")
    i = 2
    while i + 4 <= len(cs):
        marker = int.from_bytes(cs[i : i + 2], "big")
        seglen = int.from_bytes(cs[i + 2 : i + 4], "big")
        if marker == _SIZ:
            return _Siz(cs[i + 4 : i + 2 + seglen])
        if marker == _SOT:
            break
        i += 2 + seglen
    raise CodecError("missing SIZ")


def j2k_probe(data: bytes) -> Tuple[int, int, int, int, bool]:
    """Header-only parse → (rows, cols, ncomp, precision, signed)."""
    siz = _find_siz(data)
    return (siz.ysiz - siz.yosiz, siz.xsiz - siz.xosiz, siz.ncomp,
            siz.prec[0], siz.signed[0])


def j2k_decode(data: bytes) -> np.ndarray:
    """JPEG 2000 decode: C++ fast path (csrc/j2k_codec.cpp) when the
    toolchain is available, else the pure-Python reference above (same spec;
    parity-tested in tests/test_data_formats.py)."""
    from medical_image_segmentation_tpu.data.store.native import get_lib

    lib = get_lib()
    if lib is not None and hasattr(lib, "j2k_decode"):
        import ctypes

        # The wrapper casts ALL components to one dtype derived from
        # component 0, which is only correct when precision/sign are uniform
        # across components. Heterogeneous streams (legal per T.800, rare in
        # practice) take the Python oracle, which keeps per-component dtypes
        # and promotes mixed stacks to int32.
        try:
            siz = _find_siz(bytes(data))
        except CodecError:
            siz = None
        if siz is not None and (len(set(siz.prec)) > 1 or len(set(siz.signed)) > 1):
            return j2k_decode_py(data)

        rows = ctypes.c_int()
        cols = ctypes.c_int()
        ncomp = ctypes.c_int()
        prec = ctypes.c_int()
        signed_ = ctypes.c_int()
        rc = lib.j2k_probe(data, len(data), ctypes.byref(rows), ctypes.byref(cols),
                           ctypes.byref(ncomp), ctypes.byref(prec), ctypes.byref(signed_))
        if rc == 0:
            out = np.empty(rows.value * cols.value * ncomp.value, np.int32)
            rc = lib.j2k_decode(
                data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out.size,
            )
            if rc == 0:
                out = out.reshape(rows.value, cols.value, ncomp.value)
                if signed_.value:
                    out = out.astype(np.int16)
                elif prec.value <= 8:
                    out = out.astype(np.uint8)
                else:
                    out = out.astype(np.uint16)
                return out[..., 0] if ncomp.value == 1 else out
        # rc != 0 → fall through to the Python decoder for a precise error
    return j2k_decode_py(data)
