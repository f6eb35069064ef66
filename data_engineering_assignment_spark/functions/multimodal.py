"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with ``mapInPandas`` (north-star operator set; no
counterpart in the reference beyond the PNG task).

Design for 100 TB: media bytes stay in executor-side Arrow batches end to
end — the driver never sees pixel data; each transform is a narrow
``mapInPandas`` over whatever partitioning the source had, so scans
parallelize by file and no shuffle is introduced.

PNG and WAV decode natively: :func:`decode_png` is a dependency-free
decoder (stdlib ``zlib`` inflate + numpy scanline unfiltering) covering the
spec's common profile — 8-bit depth, color types 0/2/3/4/6 (gray / RGB /
palette / gray+alpha / RGBA), all five filter types, tRNS transparency —
which is the profile the reference's OpenMoji corpus uses
(Assignment-python.py:654-661, :710); :func:`decode_wav` covers RIFF/WAVE
integer PCM (8/16/32-bit), float32 and G.711 mu-law (r7), with
:func:`extract_audio_features` as the audio feature stage. JPEG now has a
dependency-free baseline decoder (r7); remaining compressed-audio/video
codecs are NOT in this container, so those decode steps stay behind a
guarded PIL hook / ``NotImplementedError``; the deterministic ``RAWM`` container —
``b"RAWM" + u16 width + u16 height + u8 channels + u8 n_frames + payload``
(little-endian, frame-major BGRA payload) — exercises the video paths
hermetically.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "path string, media_type string, width int, height int, channels int,"
    " n_frames int, content binary"
)

_HEADER = struct.Struct("<4sHHBB")


def encode_rawm(
    frames: np.ndarray,  # (n_frames, height, width, channels) uint8
) -> bytes:
    """Serialize a frame stack into the RAWM test container."""
    n, h, w, c = frames.shape
    return _HEADER.pack(b"RAWM", w, h, c, n) + frames.tobytes()


def decode_rawm(content: bytes) -> tuple[np.ndarray, dict]:
    """Parse a RAWM container → (frames array, metadata dict)."""
    magic, w, h, c, n = _HEADER.unpack_from(content)
    if magic != b"RAWM":
        raise NotImplementedError(
            "only the RAWM test container is decodable in this environment; "
            "standard codecs (PNG/JPEG/WAV/MP4) need PIL/ffmpeg on executors"
        )
    frames = np.frombuffer(content, dtype=np.uint8, offset=_HEADER.size)
    return frames.reshape(n, h, w, c), {"width": w, "height": h, "channels": c, "n_frames": n}


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"

# PNG color type → samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering (spec §9, filter types 0-4). Rows are
    sequential by construction (each references the previous reconstructed
    row); types 0/2 vectorize, 1/3/4 walk the row because each byte needs
    the already-reconstructed left neighbor. Fine for icon/thumbnail-sized
    media; megapixel-scale corpora should ship a compiled codec to the
    executors instead."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(content: bytes) -> tuple[np.ndarray, dict]:
    """Dependency-free PNG decode → one uint8 BGRA frame in the same
    (frames, meta) shape as :func:`decode_rawm`.

    Handles the common profile: 8-bit depth, non-interlaced, color types
    0/2/3/4/6, all filter types, PLTE + tRNS. 16-bit, sub-byte palette
    depths and Adam7 interlacing raise ``NotImplementedError`` (rare in
    training corpora; the reference's OpenMoji PNGs are plain 8-bit RGBA,
    Assignment-python.py:710). Byte order matches Spark's ``image`` source
    (CV BGRA), so ``functions/colors.py`` analytics apply unchanged."""
    import struct as _struct
    import zlib

    if content[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, trns, idat = len(_PNG_MAGIC), None, None, None, []
    while pos + 8 <= len(content):
        (length,) = _struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG: truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: invalid color type {color_type}")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG: only 8-bit non-interlaced images are supported "
            f"(got depth={depth}, interlace={interlace})"
        )
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed size mismatch")
    px = _png_unfilter(raw, h, stride, nch).reshape(h, w, nch)

    opaque = np.full((h, w), 255, dtype=np.uint8)
    if color_type == 3:  # palette
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG: palette index out of range")
        rgb = pal[idx]
        alpha = opaque
        if trns is not None:
            atab = np.full(len(pal), 255, dtype=np.uint8)
            t = np.frombuffer(trns, np.uint8)
            atab[: len(t)] = t
            alpha = atab[idx]
        rgba = np.dstack([rgb, alpha])
    elif color_type == 0:  # grayscale
        g = px[:, :, 0]
        rgba = np.dstack([g, g, g, opaque])
    elif color_type == 4:  # gray + alpha
        g = px[:, :, 0]
        rgba = np.dstack([g, g, g, px[:, :, 1]])
    elif color_type == 2:  # RGB
        rgba = np.dstack([px, opaque])
    else:  # 6: RGBA
        rgba = px
    bgra = np.ascontiguousarray(rgba[:, :, [2, 1, 0, 3]])
    return bgra.reshape(1, h, w, 4), {
        "width": w,
        "height": h,
        "channels": 4,
        "n_frames": 1,
    }


def encode_png(frame: np.ndarray) -> bytes:
    """Serialize one uint8 BGRA frame (h, w, 4) — :func:`decode_png`'s
    output shape — as an 8-bit RGBA PNG (filter 0, one IDAT)."""
    import struct as _struct
    import zlib

    h, w, c = frame.shape
    if c != 4 or frame.dtype != np.uint8:
        raise ValueError("encode_png expects a (h, w, 4) uint8 BGRA frame")
    rgba = np.ascontiguousarray(frame[:, :, [2, 1, 0, 3]])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + typ
            + data
            + _struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pil_image_module():
    """Optional-dependency hook for formats beyond PNG (JPEG, WebP, …): PIL
    is not in this container, but the path must exist. Returns PIL.Image or
    None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_pil(content: bytes) -> tuple[np.ndarray, dict]:
    """Decode a JPEG (or any PIL-supported format) into the same
    (frames, meta) shape as :func:`decode_png`: one frame of uint8 BGRA —
    byte order matching Spark's ``image`` source (CV BGR(A)), so the color
    analytics in ``functions/colors.py`` apply unchanged (reference parity
    with Assignment-python.py:654-661's image.data handling)."""
    Image = _pil_image_module()
    if Image is None:
        raise NotImplementedError(
            "JPEG decode needs PIL (pillow) on the executors; this "
            "container does not ship it. PNG decodes natively via "
            "decode_png; the RAWM container covers the video paths."
        )
    import io

    rgba = np.asarray(Image.open(io.BytesIO(content)).convert("RGBA"))
    bgra = rgba[:, :, [2, 1, 0, 3]]  # RGBA → BGRA, Spark image-source order
    h, w, c = bgra.shape
    frames = np.ascontiguousarray(bgra).reshape(1, h, w, c)
    return frames, {"width": w, "height": h, "channels": c, "n_frames": 1}


def decode_image_jpeg(content: bytes) -> tuple[np.ndarray, dict]:
    """JPEG → (frames, meta) in :func:`decode_png`'s BGRA shape. Baseline
    AND progressive JPEGs — grayscale and interleaved YCbCr color (4:4:4 /
    4:2:2 / 4:2:0), restart intervals included — decode via the
    dependency-free T.81 decoder in :mod:`.jpeg`: gray replicated to
    B=G=R (the decode_png color-type-0 convention), RGB reordered to
    BGRA, alpha 255. 12-bit / 16-bit-quant files fall through to the
    guarded PIL hook (with PIL absent they raise its NotImplementedError
    rather than guessing). Malformed-stream errors
    from the native parser (ValueError/IndexError/struct.error on
    truncated or exotic files) fall through to PIL as well: the hook is
    the decoder of last resort for anything the baseline parser can't
    PROVE it handles — a file PIL could decode must never be failed by our
    narrower parser (r7 review)."""
    import struct as _struct

    from .jpeg import decode_jpeg

    try:
        img = decode_jpeg(content)
    except (NotImplementedError, ValueError, IndexError, _struct.error):
        return decode_image_pil(content)
    h, w = img.shape[:2]
    bgra = np.empty((h, w, 4), dtype=np.uint8)
    if img.ndim == 2:
        bgra[:, :, 0] = bgra[:, :, 1] = bgra[:, :, 2] = img
    else:
        bgra[:, :, :3] = img[:, :, ::-1]  # RGB → BGR
    bgra[:, :, 3] = 255
    return bgra.reshape(1, h, w, 4), {
        "width": w,
        "height": h,
        "channels": 4,
        "n_frames": 1,
    }


def decode_any(content: bytes) -> tuple[np.ndarray, dict]:
    """Magic-byte dispatch: RAWM container, PNG, WAV and baseline grayscale
    JPEG natively (all dependency-free; color JPEG needs PIL). Other formats raise
    ``NotImplementedError``. WAV rows report (n_samples, n_channels) via
    the frame fields: width=n_samples, height=1, channels=n_channels."""
    if content[:4] == b"RAWM":
        return decode_rawm(content)
    if content[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        samples, meta = decode_wav(content)
        # (n_frames, height, width, channels) = (1, 1, n_samples, n_channels)
        # — same axis convention as decode_rawm/decode_png, matching the
        # width/height/channels meta below
        frames = samples.reshape(1, 1, meta["n_samples"], meta["n_channels"])
        return frames, {
            "width": meta["n_samples"],
            "height": 1,
            "channels": meta["n_channels"],
            "n_frames": 1,
        }
    if content[:3] == _JPEG_MAGIC:
        return decode_image_jpeg(content)
    return decode_rawm(content)  # raises the canonical NotImplementedError


def decode_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode + verify metadata for each media row (mapInPandas; bytes never
    leave the executor). Output adds ``decoded_ok`` and refreshed metadata."""
    schema = MEDIA_SCHEMA + ", decoded_ok boolean"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            for content in pdf[content_col]:
                try:
                    _, m = decode_any(bytes(content))
                    meta.append((m["width"], m["height"], m["channels"], m["n_frames"], True))
                except Exception:
                    meta.append((None, None, None, None, False))
            out = pdf.copy()
            out[["width", "height", "channels", "n_frames", "decoded_ok"]] = pd.DataFrame(
                meta, index=pdf.index
            )
            yield out

    return df.mapInPandas(mapper, schema)


def resize_media(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every frame (numpy index sampling)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for content in pdf["content"]:
                frames, _ = decode_rawm(bytes(content))
                n, h, w, c = frames.shape
                ys = (np.arange(out_h) * h // out_h).astype(np.int64)
                xs = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = frames[:, ys[:, None], xs[None, :], :]
                contents.append(encode_rawm(np.ascontiguousarray(resized)))
            out = pdf.copy()
            out["content"] = contents
            out["width"] = out_w
            out["height"] = out_h
            yield out

    return df.mapInPandas(mapper, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_k: int) -> DataFrame:
    """Keep every k-th frame of video media (temporal downsample)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, n_frames = [], []
            for content in pdf["content"]:
                frames, _ = decode_rawm(bytes(content))
                kept = np.ascontiguousarray(frames[::every_k])
                contents.append(encode_rawm(kept))
                n_frames.append(kept.shape[0])
            out = pdf.copy()
            out["content"] = contents
            out["n_frames"] = n_frames
            yield out

    return df.mapInPandas(mapper, MEDIA_SCHEMA)


def extract_mean_color(df: DataFrame) -> DataFrame:
    """Feature extraction example: per-channel mean over all frames."""
    schema = "path string, media_type string, mean_channels array<double>"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = []
            for content in pdf["content"]:
                frames, _ = decode_rawm(bytes(content))
                means.append(frames.reshape(-1, frames.shape[-1]).mean(axis=0).tolist())
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "media_type": pdf["media_type"],
                    "mean_channels": means,
                }
            )

    return df.mapInPandas(mapper, schema)

# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM codec (dependency-free, like decode_png) + features
# ---------------------------------------------------------------------------

def decode_wav(content: bytes) -> tuple[np.ndarray, dict]:
    """Dependency-free RIFF/WAVE decode → (samples, meta).

    Handles the common PCM profile: format tag 1 (integer PCM, 8/16/32-bit),
    3 (float32), and 7 (ITU-T G.711 mu-law, the 8-bit companded telephony
    format — expanded with the standard segment/mantissa formula, bit-exact
    to the reference g711 tables, vectorized); any channel count; chunks are
    walked by the spec (word-aligned), so fmt/data need not be adjacent.
    Remaining compressed formats (A-law, ADPCM, MP3-in-WAV…) raise
    ``NotImplementedError``.

    Returns samples as float64 in [-1, 1], shape (n_frames, n_channels),
    and meta {sample_rate, n_channels, n_samples, bit_depth}."""
    import struct as _struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    tag, n_ch, rate, _byterate, _align, bits = fmt
    if tag == 1 and bits in (8, 16, 32):
        if bits == 8:  # 8-bit PCM is unsigned per spec
            raw = np.frombuffer(data, np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        else:
            dtype = np.int16 if bits == 16 else np.int32
            raw = np.frombuffer(data, dtype).astype(np.float64)
            samples = raw / float(2 ** (bits - 1))
    elif tag == 3 and bits == 32:
        samples = np.frombuffer(data, np.float32).astype(np.float64)
    elif tag == 7 and bits == 8:
        # G.711 mu-law expansion (the inverted-byte segment/mantissa form
        # of the classic g711.c ulaw2linear): byte 0xFF/0x7F -> 0 silence,
        # 0x80 -> +32124, 0x00 -> -32124 (the codec's full-scale anchors)
        u = (~np.frombuffer(data, np.uint8)).astype(np.int32) & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        samples = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV: only integer PCM (8/16/32-bit), float32 and 8-bit mu-law "
            f"are supported (got format tag {tag}, {bits}-bit)"
        )
    n_frames = len(samples) // n_ch
    samples = samples[: n_frames * n_ch].reshape(n_frames, n_ch)
    return samples, {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": n_frames,
        "bit_depth": bits,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Serialize (n_frames, n_channels) float samples in [-1, 1] as 16-bit
    PCM WAV — :func:`decode_wav`'s common profile."""
    import struct as _struct

    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    fmt = _struct.pack("<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16)
    return (
        b"RIFF"
        + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )


def extract_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Audio feature extraction over WAV binary columns (mapInPandas; bytes
    never leave the executor): duration, RMS energy, peak amplitude and
    zero-crossing rate per row — the audio analog of
    :func:`extract_mean_color`."""
    schema = (
        "path string, media_type string, sample_rate int, n_channels int,"
        " duration_s double, rms double, peak double, zero_cross_rate double"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, mtype, content in zip(
                pdf["path"], pdf["media_type"], pdf[content_col]
            ):
                samples, meta = decode_wav(bytes(content))
                mono = samples.mean(axis=1)
                n = len(mono)
                dur = n / meta["sample_rate"] if meta["sample_rate"] else 0.0
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                peak = float(np.abs(mono).max()) if n else 0.0
                zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                rows.append(
                    (path, mtype, meta["sample_rate"], meta["n_channels"],
                     dur, rms, peak, zcr)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "media_type", "sample_rate", "n_channels",
                    "duration_s", "rms", "peak", "zero_cross_rate",
                ],
            )

    return df.mapInPandas(mapper, schema)
