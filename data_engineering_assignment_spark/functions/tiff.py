"""Dependency-free baseline-TIFF codec for the multimodal column set.

The fourth real image format next to PNG/JPEG/GIF/BMP: the reference's
image scan route (Assignment-python.py:710, OpenCV imread) reads TIFFs
natively, and scanned-document / print-pipeline crawls still carry them,
so the decode path must be real, not a PIL hook.

* :func:`decode_tiff` — baseline TIFF 6.0 profile: both byte orders
  (``II``/``MM``), classic IFD walk (BYTE/SHORT/LONG entry types, inline
  vs offset values), multi-strip assembly with RowsPerStrip AND the
  TILED organization (TIFF 6.0 §15: TileWidth/TileLength grid,
  zero-padded edge tiles cropped, predictor restarting at every tile's
  left edge — round 10), Compression
  1 (none) / 5 (TIFF-LZW) / 32773 (PackBits), Predictor 2 (horizontal
  differencing, per-sample-component cumsum), Photometric 0 (WhiteIsZero,
  inverted gray) / 1 (BlackIsZero) / 2 (RGB, SamplesPerPixel 3 or 4 with
  alpha) / 3 (palette, 16-bit ColorMap planes taken high-byte like the
  PNG 16-bit convention) — all at 8 bits per sample, chunky planar
  config, → one (1, H, W, 4) uint8 BGRA frame like the other codecs.
* :func:`encode_tiff` — fixture generator (the encode_png16 / encode_gif
  discipline): every decode path above gets fixtures from our own
  encoder, including a real TIFF-LZW compressor with the spec's
  EARLY-CHANGE code-width schedule and a PackBits run packer.

TIFF-LZW differs from the GIF LZW in ``functions/gif.py`` on exactly
three axes (TIFF 6.0 §13): codes are packed MSB-first, the code width
always starts at 9 with CLEAR=256/EOI=257, and the width bumps one code
EARLY (at table sizes 511/1023/2047, vs 512/1024/2048 in GIF) — so the
two readers share structure but not bit-level behavior, and each is
tested against its own encoder.

The LZW symbol loops are plain Python (fine for icon/thumbnail fixtures,
the documented swap-in point for a compiled codec on megapixel corpora);
strip assembly, predictor cumsum, palette lookup and channel shuffles
are numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# IFD entry value types we read: {type code: (struct char, byte size)}
_TIFF_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325


def _lzw_decode(
    data: bytes, expected: int | None = None, early_change: bool = True
) -> bytes:
    """LZW decompress (MSB-first): TIFF strips pass ``expected`` (stop
    at the strip's byte count, truncation raises); PDF ``LZWDecode``
    passes None (decode to EOI / end of data — same code family, ISO
    32000-1 §7.4.4 references the TIFF algorithm) and ``early_change``
    per its /DecodeParms (default 1 == TIFF's schedule)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while bitpos + width <= nbits and (
        expected is None or len(out) < expected
    ):
        # MSB-first read of `width` bits starting at bitpos
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:  # CLEAR
            reset()
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: LZW code out of range")
        out += entry
        prev = entry
        # early change (TIFF 6.0 §13): the decoder bumps when the NEXT
        # entry to fill is 511/1023/2047 — one below the width ceiling,
        # one earlier than GIF. Verified bit-for-bit against the JDK
        # TIFF plugin's LZW output (tests/test_java_interop.py).
        # PDF /EarlyChange 0 disables the one-early bump.
        if len(table) + (1 if early_change else 0) >= (1 << width) and width < 12:
            width += 1
    if expected is None:
        return bytes(out)
    if len(out) < expected:
        raise ValueError("TIFF: LZW strip truncated")
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW compress one strip (MSB-first, early-change widths)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # leading CLEAR per spec
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: bump as soon as the table holds 2^w entries (the
        # decoder's next fill is then code 2^w - 1 + its one-behind lag);
        # verified against the JDK TIFF plugin's decoder AND encoder
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # keep clear of the 12-bit ceiling
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(257, width)  # EOI
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[pos : pos + 1] * (257 - n)
            pos += 1
        # n == 128: noop per spec
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip truncated")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs >= 2, literal runs otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 2:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def decode_tiff(content: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline TIFF (see module docstring for the profile) into
    one (1, h, w, 4) uint8 BGRA frame + meta, the shared codec contract."""
    if len(content) < 8 or content[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF: bad byte-order mark")
    bo = "<" if content[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", content, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack_from(bo + "I", content, 4)
    (n_entries,) = struct.unpack_from(bo + "H", content, ifd_off)
    tags: dict[int, tuple[int, ...]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", content, base)
        if typ not in _TIFF_TYPES:
            continue  # RATIONAL resolutions etc. — not needed for pixels
        ch, sz = _TIFF_TYPES[typ]
        total = sz * cnt
        off = base + 8 if total <= 4 else struct.unpack_from(bo + "I", content, base + 8)[0]
        tags[tag] = struct.unpack_from(bo + str(cnt) + ch, content, off)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF: required tag {tag} missing")
        return default

    w, h = one(_TAG_WIDTH), one(_TAG_HEIGHT)
    spp = one(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS, (1,) * spp)
    comp = one(_TAG_COMPRESSION, 1)
    photo = one(_TAG_PHOTOMETRIC)
    planar = one(_TAG_PLANAR, 1)
    predictor = one(_TAG_PREDICTOR, 1)
    rows_per_strip = one(_TAG_ROWS_PER_STRIP, h)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF: only 8 bits/sample supported (got {bits})")
    if planar != 1:
        raise NotImplementedError("TIFF: planar configuration 2 not supported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF: compression {comp} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF: predictor {predictor} not supported")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF: photometric {photo} not supported")
    if photo == 3 and spp != 1:
        raise ValueError("TIFF: palette images must have one sample per pixel")

    def _chunk(raw: bytes, expected: int, kind: str) -> bytes:
        if comp == 1:
            if len(raw) < expected:
                raise ValueError(f"TIFF: uncompressed {kind} truncated")
            return raw[:expected]
        if comp == 5:
            return _lzw_decode(raw, expected)
        return _packbits_decode(raw, expected)

    if _TAG_TILE_WIDTH in tags:  # tiled organization (TIFF 6.0 §15)
        tw, th = one(_TAG_TILE_WIDTH), one(_TAG_TILE_LENGTH)
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF: bad tile dimensions")
        toffs = tags.get(_TAG_TILE_OFFSETS)
        if toffs is None:
            raise ValueError("TIFF: tiled image missing TileOffsets")
        tcnts = tags.get(_TAG_TILE_COUNTS)
        tile_bytes = th * tw * spp
        if tcnts is None:
            if comp != 1:
                raise ValueError("TIFF: compressed tiles need TileByteCounts")
            tcnts = (tile_bytes,) * len(toffs)
        tiles_x, tiles_y = -(-w // tw), -(-h // th)
        if len(toffs) < tiles_x * tiles_y:
            raise ValueError("TIFF: too few tiles for the image grid")
        canvas = np.zeros((tiles_y * th, tiles_x * tw, spp), np.uint8)
        for i in range(tiles_x * tiles_y):
            raw = content[toffs[i] : toffs[i] + tcnts[i]]
            tile = np.frombuffer(
                _chunk(raw, tile_bytes, "tile"), np.uint8
            ).reshape(th, tw, spp)
            if predictor == 2:
                # horizontal differencing restarts at every tile's left
                # edge — undo per tile BEFORE placement, never globally
                tile = np.cumsum(tile.astype(np.uint32), axis=1).astype(
                    np.uint8
                )
            ty, tx = divmod(i, tiles_x)
            canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        pixels = canvas[:h, :w]
    else:
        offsets = tags.get(_TAG_STRIP_OFFSETS)
        if offsets is None:
            # absent OR carried with an unsupported entry type (the IFD
            # walk skips those) — structurally unreadable either way
            raise ValueError("TIFF: required tag StripOffsets missing")
        counts = tags.get(_TAG_STRIP_COUNTS)
        if counts is None:
            if comp != 1:
                raise ValueError("TIFF: compressed strips need StripByteCounts")
            counts = tuple(
                min(rows_per_strip, h - i * rows_per_strip) * w * spp
                for i in range(len(offsets))
            )
        row_bytes = w * spp
        chunks = []
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            n_rows = min(rows_per_strip, h - i * rows_per_strip)
            strip = _chunk(content[off : off + cnt], n_rows * row_bytes, "strip")
            chunks.append(np.frombuffer(strip, np.uint8))
        pixels = np.concatenate(chunks).reshape(h, w, spp)
        if predictor == 2:  # horizontal differencing: undo per-row cumsum
            pixels = np.cumsum(pixels.astype(np.uint32), axis=1).astype(np.uint8)

    opaque = np.full((h, w), 255, np.uint8)
    if photo in (0, 1):
        g = pixels[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        bgra = np.dstack([g, g, g, opaque])
    elif photo == 3:
        cmap = tags.get(_TAG_COLORMAP)
        if cmap is None:
            raise ValueError("TIFF: palette image missing ColorMap")
        n = len(cmap) // 3
        # ColorMap is three 16-bit planes (R, G, B); high byte, like the
        # 16-bit PNG convention
        planes = (np.asarray(cmap, np.uint32) >> 8).astype(np.uint8).reshape(3, n)
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF: palette index out of range")
        bgra = np.dstack(
            [planes[2][idx], planes[1][idx], planes[0][idx], opaque]
        )
    else:  # RGB / RGBA chunky
        if spp == 3:
            bgra = np.dstack([pixels[:, :, [2, 1, 0]], opaque])
        elif spp == 4:
            bgra = pixels[:, :, [2, 1, 0, 3]]
        else:
            raise NotImplementedError(f"TIFF: RGB with {spp} samples/pixel")
    bgra = np.ascontiguousarray(bgra)
    return bgra.reshape(1, h, w, 4), {
        "width": w,
        "height": h,
        "channels": 4,
        "n_frames": 1,
    }


def encode_tiff(
    frame: np.ndarray | None,
    photometric: int = 2,
    compression: int = 1,
    predictor: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    palette: np.ndarray | None = None,
    indices: np.ndarray | None = None,
    alpha: bool = False,
    tile_size: tuple[int, int] | None = None,
) -> bytes:
    """Fixture generator: serialize either a (h, w, 4) uint8 BGRA frame
    (photometric 0/1/2; gray forms take the B channel) or
    (indices, palette) with palette (n, 3) RGB uint8 (photometric 3).
    ``tile_size=(tw, th)`` emits the TILED organization (TIFF 6.0 §15:
    dims multiples of 16, zero-padded edge tiles, per-tile predictor)
    instead of strips."""
    bo = ">" if big_endian else "<"
    if photometric == 3:
        if palette is None or indices is None:
            raise ValueError("palette TIFF needs indices + palette")
        h, w = indices.shape
        spp = 1
        samples = indices.reshape(h, w, 1).astype(np.uint8)
    else:
        h, w = frame.shape[:2]
        if photometric in (0, 1):
            spp = 1
            g = frame[:, :, 0]
            samples = (255 - g if photometric == 0 else g).reshape(h, w, 1)
        else:
            spp = 4 if alpha else 3
            rgb = frame[:, :, [2, 1, 0]]
            samples = np.dstack([rgb, frame[:, :, 3]]) if alpha else rgb
        samples = samples.astype(np.uint8)
    def _diff(block: np.ndarray) -> np.ndarray:
        d = block.astype(np.int16)
        d[:, 1:, :] -= block[:, :-1, :].astype(np.int16)
        return (d & 0xFF).astype(np.uint8)

    def _compress(raw: bytes) -> bytes:
        if compression == 5:
            return _lzw_encode(raw)
        if compression == 32773:
            return _packbits_encode(raw)
        return raw

    rps = rows_per_strip or h
    strips = []
    if tile_size is not None:
        tw_, th_ = tile_size
        if tw_ % 16 or th_ % 16 or tw_ <= 0 or th_ <= 0:
            raise ValueError("TIFF: tile dims must be positive multiples of 16")
        tiles_x, tiles_y = -(-w // tw_), -(-h // th_)
        padded = np.zeros((tiles_y * th_, tiles_x * tw_, spp), np.uint8)
        padded[:h, :w] = samples
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                t = padded[ty * th_ : (ty + 1) * th_, tx * tw_ : (tx + 1) * tw_]
                if predictor == 2:  # restarts at every tile's left edge
                    t = _diff(t)
                strips.append(_compress(t.tobytes()))
    else:
        if predictor == 2:
            samples = _diff(samples)
        for y0 in range(0, h, rps):
            strips.append(_compress(samples[y0 : y0 + rps].tobytes()))

    entries: list[tuple[int, int, int, tuple[int, ...]]] = []

    def add(tag: int, typ: int, vals: tuple[int, ...]):
        entries.append((tag, typ, len(vals), vals))

    offsets_tag = _TAG_TILE_OFFSETS if tile_size is not None else _TAG_STRIP_OFFSETS
    add(_TAG_WIDTH, 4, (w,))
    add(_TAG_HEIGHT, 4, (h,))
    add(_TAG_BITS, 3, (8,) * spp)
    add(_TAG_COMPRESSION, 3, (compression,))
    add(_TAG_PHOTOMETRIC, 3, (photometric,))
    add(offsets_tag, 4, (0,) * len(strips))  # patched below
    add(_TAG_SPP, 3, (spp,))
    if tile_size is not None:
        add(_TAG_TILE_WIDTH, 4, (tile_size[0],))
        add(_TAG_TILE_LENGTH, 4, (tile_size[1],))
        add(_TAG_TILE_COUNTS, 4, tuple(len(s) for s in strips))
    else:
        add(_TAG_ROWS_PER_STRIP, 4, (rps,))
        add(_TAG_STRIP_COUNTS, 4, tuple(len(s) for s in strips))
    if predictor == 2:
        add(_TAG_PREDICTOR, 3, (predictor,))
    cmap_vals: tuple[int, ...] = ()
    if photometric == 3:
        # ColorMap must hold 2^BitsPerSample entries per plane (TIFF 6.0);
        # zero-pad short palettes to 256
        full = np.zeros((256, 3), np.uint32)
        full[: len(palette)] = np.asarray(palette, np.uint32)
        pal16 = full * 257
        cmap_vals = tuple(pal16[:, 0]) + tuple(pal16[:, 1]) + tuple(pal16[:, 2])
        add(_TAG_COLORMAP, 3, cmap_vals)
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | IFD | overflow values | strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    over_off = ifd_off + ifd_size
    overflow = bytearray()
    # first pass to size overflow so strip offsets are known
    for tag, typ, cnt, vals in entries:
        sz = _TIFF_TYPES[typ][1] * cnt
        if sz > 4:
            overflow += b"\0" * (sz + (sz & 1))
    data_off = over_off + len(overflow)
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s) + (len(s) & 1)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", len(entries))
    overflow = bytearray()
    opos = over_off
    for tag, typ, cnt, vals in entries:
        if tag == offsets_tag:
            vals = tuple(strip_offs)
        ch, sz = _TIFF_TYPES[typ]
        total = sz * cnt
        packed = struct.pack(bo + str(cnt) + ch, *vals)
        if total <= 4:
            out += struct.pack(bo + "HHI", tag, typ, cnt) + packed.ljust(4, b"\0")
        else:
            out += struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "I", opos)
            pad = packed + (b"\0" * (len(packed) & 1))
            overflow += pad
            opos += len(pad)
    out += struct.pack(bo + "I", 0)  # next-IFD pointer: none
    out += overflow
    for s in strips:
        out += s + (b"\0" * (len(s) & 1))
    return bytes(out)
