"""Dependency-free baseline JPEG codec (grayscale AND interleaved color).

The multimodal surface treats JPEG as a first-class image format
(reference parity: Assignment-python.py:710-716 consumes Spark's ``image``
source, whose real-world corpus is mostly JPEG), but this container ships
neither PIL nor ffmpeg. Instead of leaving the JPEG hook forever untested,
this module implements the baseline sequential DCT process from the public
JPEG specification (ITU-T T.81 / ISO 10918-1) for 8-bit precision:

* :func:`decode_jpeg` — a REAL decoder: marker parse (SOI/DQT/SOF0/
  DHT/SOS/EOI, unknown segments skipped, standalone TEM/RSTn handled),
  canonical Huffman tables built from the file's own DHT, entropy decode
  with 0xFF00 un-stuffing, EXTEND sign recovery (T.81 F.2.2.1),
  dequantize, de-zigzag, orthonormal 2-D IDCT, level shift + clamp.
  Single-component images decode to an (h, w) gray array; three-component
  interleaved scans (the real-corpus case: 4:4:4 / 4:2:2 / 4:2:0 YCbCr)
  decode the MCU stream per T.81 A.2.3, replicate the chroma planes up to
  full resolution, and convert YCbCr→RGB per JFIF (half-up rounding) into
  an (h, w, 3) array. Restart intervals (DRI + modulo-8 RSTn cycling with
  byte alignment and DC-predictor reset, T.81 E.2.4) are decoded, with
  the marker sequence enforced. It decodes conformant baseline files, not
  just this module's own output.
* :func:`encode_jpeg_gray` / :func:`encode_jpeg_color` — the fixture
  generators: block DCT, Annex-K quantization (K.1 luminance, K.2
  chrominance), box-averaged chroma subsampling, zigzag run-length +
  magnitude coding, and a fixed-length canonical Huffman table (all DC
  categories at 4 bits, all 162 run/size symbols at 8 bits — valid JPEG,
  since the tables ride the file's DHT segment and the all-ones code
  stays unused as T.81 requires).

Progressive scans, 12-bit precision, 16-bit quant tables, and
non-interleaved color scans still route through the guarded PIL hook
(:func:`multimodal.decode_image_pil`); this decoder raises
``NotImplementedError`` for them rather than guessing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order (T.81 figure 5), generated: diagonal s = i + j walks
# i-ascending when s is odd, i-descending when s is even
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(0, _s + 1) if _s % 2 == 1 else range(_s, -1, -1)
    for _i in _rng:
        _j = _s - _i
        if _i < 8 and _j < 8:
            _ZIGZAG.append((_i, _j))

# Annex K.2 chrominance quantization table (quality ~50), natural order
_QTABLE_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.1 luminance quantization table (quality ~50), natural order
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis: A[u, x] = c(u) cos((2x+1)u pi / 16)."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()

# encoder Huffman tables: fixed-length canonical codes (see module doc).
# DC: categories 0..11 at 4 bits; AC: EOB, ZRL and every (run, size) with
# run 0..15, size 1..10 at 8 bits (162 symbols < 255, all-ones unused).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical procedure."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def restart_marker(self, m: int) -> None:
        """Byte-align and emit RSTm (T.81 E.1.4) — marker bytes are
        literal, so they bypass the 0xFF stuffing path."""
        self.flush()
        self.out.append(0xFF)
        self.out.append(0xD0 + (m & 7))


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v) if v > 0 else (s, v + (1 << s) - 1)


def _encode_block(
    wtr: _BitWriter, block: np.ndarray, qtable: np.ndarray, prev_dc: int
) -> int:
    """DCT + quantize + entropy-code one 8x8 sample block; returns its DC
    value (the next block's predictor)."""
    coef = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = np.round(coef / qtable).astype(np.int64)
    zz = [int(q[i, j]) for (i, j) in _ZIGZAG]
    s, bits = _magnitude(zz[0] - prev_dc)
    code, length = _DC_CODES[s]
    wtr.write(code, length)
    if s:
        wtr.write(bits, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _AC_CODES[0xF0]  # ZRL
            wtr.write(c, ln)
            run -= 16
        s, bits = _magnitude(zz[k])
        c, ln = _AC_CODES[(run << 4) | s]
        wtr.write(c, ln)
        wtr.write(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]  # EOB
        wtr.write(c, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


_DHT_PAYLOAD = (
    bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
    + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
)


def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker (with
    DC-predictor reset) every that-many MCUs — the T.81 E.1.4 layout real
    encoders use for error resilience / parallel decode."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("image dims out of JPEG range")
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")

    wtr = _BitWriter()
    prev_dc = 0
    n_done = 0
    n_rst = 0
    for bj in range(by):
        for bi in range(bx):
            if restart_interval and n_done and n_done % restart_interval == 0:
                wtr.restart_marker(n_rst)
                n_rst += 1
                prev_dc = 0
            prev_dc = _encode_block(
                wtr, padded[bj * 8 : bj * 8 + 8, bi * 8 : bi * 8 + 8],
                _QTABLE, prev_dc,
            )
            n_done += 1
    wtr.flush()

    zz_q = bytes([0]) + bytes(int(_QTABLE[i, j]) for (i, j) in _ZIGZAG)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xDB, zz_q)
        + _seg(0xC0, sof)
        + _seg(0xC4, _DHT_PAYLOAD)
        + dri
        + _seg(0xDA, sos)
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


def _half_up(x: np.ndarray) -> np.ndarray:
    """Half-up rounding (floor(x + 0.5)) — the SAME rule the decoder's
    color conversion uses, so encoder and decoder agree at midpoints
    (np.round's half-even would diverge from any SQL oracle)."""
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF RGB→YCbCr (floats, then half-up rounded, clipped to uint8)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(_half_up(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


_SAMPLING = {"444": ((1, 1), (1, 1), (1, 1)),
             "422": ((2, 1), (1, 1), (1, 1)),
             "420": ((2, 2), (1, 1), (1, 1))}


def encode_jpeg_color(
    rgb: np.ndarray, subsampling: str = "420", restart_interval: int = 0
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline interleaved YCbCr
    JPEG (4:4:4, 4:2:2 or 4:2:0). Chroma is box-averaged (half-up) over
    each sampling window; quantization uses Annex K.1 (luma, table 0) and
    K.2 (chroma, table 1); all components share the fixed-length Huffman
    tables. Scans are interleaved per T.81 A.2.3 — the layout real-corpus
    decoders (and this module's :func:`decode_jpeg`) expect."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_color expects (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("image dims out of JPEG range")
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    factors = _SAMPLING[subsampling]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    ycc = rgb_to_ycbcr(rgb)
    planes: list[np.ndarray] = []
    for ci, (hi, vi) in enumerate(factors):
        plane = ycc[..., ci].astype(np.float64)
        sx, sy = hmax // hi, vmax // vi
        if sx > 1 or sy > 1:
            # box average over the sampling window (pad to a multiple first)
            ph = -(-h // sy) * sy
            pw = -(-w // sx) * sx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = _half_up(
                p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
            )
        th, tw = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        planes.append(plane)

    qtables = [_QTABLE, _QTABLE_CHROMA, _QTABLE_CHROMA]
    wtr = _BitWriter()
    prev_dc = [0, 0, 0]
    n_done = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_done and n_done % restart_interval == 0:
                wtr.restart_marker(n_rst)
                n_rst += 1
                prev_dc = [0, 0, 0]
            n_done += 1
            for ci, (hi, vi) in enumerate(factors):
                for v in range(vi):
                    for u in range(hi):
                        r0 = (my * vi + v) * 8
                        c0 = (mx * hi + u) * 8
                        prev_dc[ci] = _encode_block(
                            wtr,
                            planes[ci][r0 : r0 + 8, c0 : c0 + 8],
                            qtables[ci],
                            prev_dc[ci],
                        )
    wtr.flush()

    zz = lambda t: bytes(int(t[i, j]) for (i, j) in _ZIGZAG)  # noqa: E731
    dqt = bytes([0]) + zz(_QTABLE) + bytes([1]) + zz(_QTABLE_CHROMA)
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, (factors[0][0] << 4) | factors[0][1], 0,
         2, (factors[1][0] << 4) | factors[1][1], 1,
         3, (factors[2][0] << 4) | factors[2][1], 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, _DHT_PAYLOAD)
        + dri
        + _seg(0xDA, sos)
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 un-stuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG: entropy data truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(f"JPEG: unexpected marker 0xFF{nxt:02x} in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def expect_restart(self, m: int) -> None:
        """Consume an RSTm marker at a byte-aligned restart boundary
        (T.81 E.2.4): drop the partial byte's pad bits, then require the
        modulo-8-cycling marker."""
        self._n = 0
        self._acc = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("JPEG: entropy data truncated at restart")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + (m & 7):
            raise ValueError(
                f"JPEG: expected RST{m & 7} at restart boundary, "
                f"got 0x{b0:02x}{b1:02x}"
            )
        self.pos += 2

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(r: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude field."""
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def _huff_decode(rdr: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rdr.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def _decode_block(rdr: _BitReader, dc_tab, ac_tab, qt: np.ndarray, prev_dc: int):
    """Entropy-decode + dequantize + IDCT one block → ((8, 8) float
    spatial samples pre-level-shift, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    s = _huff_decode(rdr, dc_tab)
    prev_dc += _extend(rdr.read_bits(s), s)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = _huff_decode(rdr, ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        size = rs & 0x0F
        if k > 63:
            raise ValueError("JPEG: AC index out of range")
        zz[k] = _extend(rdr.read_bits(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    for idx, (i, j) in enumerate(_ZIGZAG):
        coef[i, j] = zz[idx]
    return _A.T @ (coef * qt) @ _A, prev_dc


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr→RGB (floats, half-up rounded, clipped to uint8) — the
    same rounding rule the encoder's forward transform uses."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(_half_up(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG: single-component files → (h, w) uint8 gray;
    three-component interleaved YCbCr (4:4:4 / 4:2:2 / 4:2:0 and any
    sampling whose factors divide the maxima) → (h, w, 3) uint8 RGB.

    Restart intervals (DRI/RSTn) are decoded per T.81 E.2.4: at each
    boundary the reader byte-aligns, requires the modulo-8-cycling
    marker, and resets every DC predictor. Raises ``NotImplementedError``
    for progressive scans, 12-bit precision, 16-bit quant tables,
    non-interleaved color scans, or component counts other than 1/3 —
    those route through the PIL hook when available.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    qtables: dict[int, np.ndarray] = {}
    # (class, id) -> {(length, code): symbol}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    scan: dict[int, tuple[int, int]] = {}  # cid -> (dc_id, ac_id)
    scan_order: list[int] = []
    pos = 2
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the stream
        # before a marker id — skip the run, dispatch on the first non-FF
        # byte (hardware encoders emit fill bytes; r7 review)
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG: no scan data")
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are STANDALONE markers — no length field; reading
            # one as length-prefixed would misparse data bytes (r7 advice).
            # RSTn before SOS is nonconformant but must not corrupt parse.
            continue
        (seglen,) = struct.unpack_from(">H", content, pos)
        payload = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                if p + 65 > len(payload):
                    raise ValueError("JPEG: truncated DQT payload")
                vals = payload[p + 1 : p + 65]
                q = np.zeros((8, 8), dtype=np.int32)
                for k, (i, j) in enumerate(_ZIGZAG):
                    q[i, j] = vals[k]
                qtables[tq] = q
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0)")
        elif marker == 0xC0:  # SOF0
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "JPEG: only 1 (gray) or 3 (YCbCr) components"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("JPEG: truncated SOF payload")
            for c in range(ncomp):
                cid = payload[6 + 3 * c]
                samp = payload[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, payload[8 + 3 * c]))
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise ValueError("JPEG: truncated DHT payload")
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nsym = sum(bits)
                if p + 17 + nsym > len(payload):
                    raise ValueError("JPEG: truncated DHT payload")
                symbols = list(payload[p + 17 : p + 17 + nsym])
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = symbols[k]
                        code += 1
                        k += 1
                    code <<= 1
                htables[(tc, th)] = table
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ValueError("JPEG: truncated DRI payload")
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "JPEG: only full interleaved scans (ns == ncomp)"
                )
            for c in range(ns):
                cid = payload[1 + 2 * c]
                tabs = payload[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
                scan_order.append(cid)
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("JPEG: no SOS marker")
    if h == 0 or w == 0 or not comps:
        raise ValueError("JPEG: SOS before SOF")

    by_cid = {c[0]: c for c in comps}
    plan = []  # (cid, hi, vi, qt, dc_tab, ac_tab) in scan order
    for cid in scan_order:
        if cid not in by_cid:
            raise ValueError("JPEG: scan references unknown component")
        _, hi, vi, tq = by_cid[cid]
        if tq not in qtables:
            raise ValueError("JPEG: missing quantization table")
        dc_id, ac_id = scan[cid]
        dc_tab = htables.get((0, dc_id))
        ac_tab = htables.get((1, ac_id))
        if dc_tab is None or ac_tab is None:
            raise ValueError("JPEG: missing Huffman table")
        plan.append((cid, hi, vi, qtables[tq].astype(np.float64), dc_tab, ac_tab))

    if len(comps) == 1:
        cid, hi, vi, qt, dc_tab, ac_tab = plan[0]
        if (hi, vi) != (1, 1):
            raise NotImplementedError("JPEG: subsampling on 1 component")
        by, bx = -(-h // 8), -(-w // 8)
        out = np.zeros((by * 8, bx * 8), dtype=np.float64)
        rdr = _BitReader(content, pos)
        prev_dc = 0
        n_done = 0
        n_rst = 0
        for bj in range(by):
            for bi in range(bx):
                if restart_interval and n_done and n_done % restart_interval == 0:
                    rdr.expect_restart(n_rst)
                    n_rst += 1
                    prev_dc = 0
                block, prev_dc = _decode_block(rdr, dc_tab, ac_tab, qt, prev_dc)
                out[bj * 8 : bj * 8 + 8, bi * 8 : bi * 8 + 8] = block
                n_done += 1
        return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]

    hmax = max(p[1] for p in plan)
    vmax = max(p[2] for p in plan)
    if any(hmax % p[1] or vmax % p[2] for p in plan):
        raise NotImplementedError("JPEG: non-dividing sampling factors")
    if any(not (1 <= p[1] <= 4 and 1 <= p[2] <= 4) for p in plan):
        raise ValueError("JPEG: sampling factors out of range")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for (cid, hi, vi, _, _, _) in plan
    }
    rdr = _BitReader(content, pos)
    prev = {cid: 0 for cid in scan_order}
    n_done = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_done and n_done % restart_interval == 0:
                rdr.expect_restart(n_rst)
                n_rst += 1
                prev = {cid: 0 for cid in scan_order}
            n_done += 1
            for cid, hi, vi, qt, dc_tab, ac_tab in plan:
                for v in range(vi):
                    for u in range(hi):
                        block, prev[cid] = _decode_block(
                            rdr, dc_tab, ac_tab, qt, prev[cid]
                        )
                        r0 = (my * vi + v) * 8
                        c0 = (mx * hi + u) * 8
                        planes[cid][r0 : r0 + 8, c0 : c0 + 8] = block

    full = {}
    for cid, hi, vi, _, _, _ in plan:
        p = np.clip(np.round(planes[cid] + 128.0), 0, 255)
        sy, sx = vmax // vi, hmax // hi
        if sy > 1 or sx > 1:
            p = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        full[cid] = p[:h, :w]
    # JFIF: the SOF component ORDER is Y, Cb, Cr (whatever the ids) — the
    # scan may list components in any order, so stack by SOF order
    return ycbcr_to_rgb(np.stack([full[c[0]] for c in comps], axis=-1))


def decode_jpeg_gray(content: bytes) -> np.ndarray:
    """Back-compat wrapper: decode and REQUIRE a grayscale result — color
    files raise NotImplementedError (callers wanting either shape use
    :func:`decode_jpeg`)."""
    out = decode_jpeg(content)
    if out.ndim != 2:
        raise NotImplementedError("JPEG: color file; use decode_jpeg")
    return out
