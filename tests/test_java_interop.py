"""Cross-implementation codec validation against the JDK's javax.imageio
plugins (tests/javainterop/ImgTool.java) — a real third-party decoder, so
the repo's dependency-free TIFF/BMP/GIF/PNG codecs are held to foreign
ground truth, not just self-roundtrips. Both directions where the JDK has
a writer:

* Python encoder -> ImageIO decode: pixel-exact (TIFF across compression /
  predictor / byte order / strips / palette; BMP 24-bit + RLE8; GIF
  palette + interlace; PNG RGBA + 16-bit + palette + interlace).
* ImageIO encode -> Python decoder: pixel-exact (TIFF None/LZW/PackBits,
  BMP, GIF, PNG).

Skipped when no JDK is on PATH (this container has OpenJDK 17 for Spark).
"""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from data_engineering_assignment_spark.functions.gif import (
    decode_gif,
    encode_gif,
)
from data_engineering_assignment_spark.functions.multimodal import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    encode_png16,
    encode_png_palette,
)
from data_engineering_assignment_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
)

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK on PATH",
)

_JAVA_SRC = __file__.rsplit("/", 1)[0] + "/javainterop/ImgTool.java"


@pytest.fixture(scope="module")
def imgtool(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgtool")
    subprocess.run(
        ["javac", "-d", str(d), _JAVA_SRC], check=True, capture_output=True
    )
    def run(*args):
        subprocess.run(
            ["java", "-cp", str(d), "ImgTool", *map(str, args)],
            check=True,
            capture_output=True,
        )
    return run


def _java_decode(imgtool, tmp_path, data: bytes) -> np.ndarray:
    """Decode `data` with ImageIO; return (h, w, 4) uint8 BGRA."""
    src = tmp_path / "img.bin.in"
    out = tmp_path / "img.bin.out"
    src.write_bytes(data)
    imgtool("decode", src, out)
    buf = out.read_bytes()
    w, h = struct.unpack_from(">ii", buf)
    argb = np.frombuffer(buf, ">u4", h * w, 8).reshape(h, w).astype(np.uint32)
    return np.dstack(
        [
            (argb & 0xFF).astype(np.uint8),          # B
            ((argb >> 8) & 0xFF).astype(np.uint8),   # G
            ((argb >> 16) & 0xFF).astype(np.uint8),  # R
            ((argb >> 24) & 0xFF).astype(np.uint8),  # A
        ]
    )


def _java_decode_raw(imgtool, tmp_path, data: bytes) -> np.ndarray:
    """Decode with ImageIO but dump RAW raster samples (h, w, bands) —
    bypasses getRGB's nonlinear gray->sRGB conversion and 16->8 rescale."""
    src = tmp_path / "img.raw.in"
    out = tmp_path / "img.raw.out"
    src.write_bytes(data)
    imgtool("decode-raw", src, out)
    buf = out.read_bytes()
    w, h, b = struct.unpack_from(">iii", buf)
    return np.frombuffer(buf, ">u4", h * w * b, 12).reshape(h, w, b)


def _java_encode(imgtool, tmp_path, fmt, bgra, compression=None) -> bytes:
    """Encode a (h, w, 4) BGRA frame with ImageIO; returns the file bytes.
    Alpha is sent only when any pixel is non-opaque (RGB otherwise)."""
    h, w = bgra.shape[:2]
    alpha = bool((bgra[:, :, 3] != 255).any())
    rgb = bgra[:, :, [2, 1, 0, 3]] if alpha else bgra[:, :, [2, 1, 0]]
    raw = tmp_path / "raw.rgb"
    out = tmp_path / ("out." + fmt.lower())
    raw.write_bytes(np.ascontiguousarray(rgb).tobytes())
    imgtool("encode", fmt, w, h, raw, out, compression or "none")
    return out.read_bytes()


def test_tiff_python_encode_java_decode(imgtool, tmp_path):
    rng = np.random.default_rng(21)
    f = rng.integers(0, 256, (13, 17, 4), np.uint8)
    f[..., 3] = 255
    for comp in (1, 5, 32773):
        for pred in (1, 2) if comp == 5 else (1,):
            for be in (False, True):
                data = encode_tiff(f, 2, comp, pred, big_endian=be, rows_per_strip=4)
                got = _java_decode(imgtool, tmp_path, data)
                assert np.array_equal(got[:, :, :3], f[:, :, :3]), (comp, pred, be)
    # palette
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (9, 7)).astype(np.uint8)
    got = _java_decode(
        imgtool, tmp_path, encode_tiff(None, 3, 5, palette=pal, indices=idx)
    )
    assert np.array_equal(got[:, :, [2, 1, 0]], pal[idx])
    # gray + inverted gray: raw raster samples (the JDK reader normalizes
    # WhiteIsZero by inverting into the raster, same convention as
    # decode_tiff's BGRA output)
    for photo in (0, 1):
        got = _java_decode_raw(imgtool, tmp_path, encode_tiff(f, photo, 32773))
        assert np.array_equal(got[:, :, 0], f[:, :, 0]), photo
    # LZW width boundaries on a big image (36k samples -> >2 width bumps)
    big = rng.integers(0, 256, (100, 120, 4), np.uint8)
    big[..., 3] = 255
    got = _java_decode(imgtool, tmp_path, encode_tiff(big, 2, 5, 2))
    assert np.array_equal(got[:, :, :3], big[:, :, :3])


def test_tiff_java_encode_python_decode(imgtool, tmp_path):
    rng = np.random.default_rng(22)
    f = rng.integers(0, 256, (31, 23, 4), np.uint8)
    f[..., 3] = 255
    for comp in (None, "LZW", "PackBits"):
        data = _java_encode(imgtool, tmp_path, "TIFF", f, comp)
        d, meta = decode_tiff(data)
        assert np.array_equal(d[0, :, :, :3], f[:, :, :3]), comp
        assert meta["width"] == 23 and meta["height"] == 31


def test_bmp_interop(imgtool, tmp_path):
    rng = np.random.default_rng(23)
    f = rng.integers(0, 256, (9, 14, 4), np.uint8)
    f[..., 3] = 255
    # python encode -> ImageIO decode (both row orders)
    for td in (False, True):
        got = _java_decode(imgtool, tmp_path, encode_bmp(f, 24, top_down=td))
        assert np.array_equal(got[:, :, :3], f[:, :, :3]), td
    # RLE8 paletted
    pal = rng.integers(0, 256, (64, 3), np.uint8)
    idx = np.repeat(rng.integers(0, 64, (6, 5)), 2, axis=1).astype(np.uint8)
    got = _java_decode(
        imgtool, tmp_path, encode_bmp(None, 8, palette=pal, indices=idx, rle8=True)
    )
    # encode_bmp palettes are BGR; _java_decode returns BGRA
    assert np.array_equal(got[:, :, :3], pal[idx])
    # ImageIO encode -> python decode
    d, _ = decode_bmp(_java_encode(imgtool, tmp_path, "BMP", f))
    assert np.array_equal(d[0, :, :, :3], f[:, :, :3])


def test_gif_interop(imgtool, tmp_path):
    rng = np.random.default_rng(24)
    pal = rng.integers(0, 256, (16, 3), np.uint8)  # RGB palette
    idx = rng.integers(0, 16, (11, 13)).astype(np.uint8)
    for interlace in (False, True):
        data = encode_gif(idx, pal, interlace=interlace)
        got = _java_decode(imgtool, tmp_path, data)
        assert np.array_equal(got[:, :, [2, 1, 0]], pal[idx]), interlace
    # ImageIO encode -> python decode (ImageIO writes an ARGB-quantized
    # GIF; use few distinct colors so quantization is lossless)
    f = np.zeros((8, 10, 4), np.uint8)
    f[..., 0] = (np.arange(10) % 4 * 60)[None, :]
    f[..., 1] = 200
    f[..., 2] = (np.arange(8) % 2 * 255)[:, None]
    f[..., 3] = 255
    frames, _ = decode_gif(_java_encode(imgtool, tmp_path, "GIF", f))
    assert np.array_equal(frames[0, :, :, :3], f[:, :, :3])


def test_g711_interop(imgtool, tmp_path):
    """All 256 mu-law and A-law code bytes expand to the same 16-bit
    linear values as javax.sound's converters (the JDK ships the
    reference g711 tables)."""
    from tests.test_audio_codecs import make_wav
    from data_engineering_assignment_spark.functions.multimodal import (
        decode_wav,
    )

    sweep = bytes(range(256))
    for tag in (6, 7):
        wav = make_wav(tag, 1, sweep)
        mine = np.round(decode_wav(wav)[0][:, 0] * 32768.0).astype(np.int64)
        src = tmp_path / "g711.wav"
        out = tmp_path / "g711.bin"
        src.write_bytes(wav)
        imgtool("decode-wav", src, out)
        buf = out.read_bytes()
        n_ch = struct.unpack_from(">i", buf)[0]
        theirs = np.frombuffer(buf, ">i4", 256, 4).astype(np.int64)
        assert n_ch == 1
        assert np.array_equal(mine, theirs), tag


def test_png_interop(imgtool, tmp_path):
    rng = np.random.default_rng(25)
    f = rng.integers(0, 256, (12, 15, 4), np.uint8)
    # python encode -> ImageIO decode: RGBA incl. real alpha + interlace
    for interlace in (0, 1):
        got = _java_decode(imgtool, tmp_path, encode_png(f, interlace=interlace))
        assert np.array_equal(got, f), interlace
    # 16-bit: compare the full 16-bit raster samples (getRGB would rescale
    # 16->8 with rounding, not the codec's OpenCV-style high-byte take)
    rgba16 = rng.integers(0, 65536, (6, 7, 4), np.uint32).astype(np.uint16)
    rgba16[..., 3] = 65535
    got = _java_decode_raw(imgtool, tmp_path, encode_png16(rgba16))
    assert np.array_equal(got[:, :, :3], rgba16[:, :, :3])
    # paletted
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    idx = rng.integers(0, 8, (9, 9)).astype(np.uint8)
    got = _java_decode(imgtool, tmp_path, encode_png_palette(idx, pal))
    assert np.array_equal(got[:, :, [2, 1, 0]], pal[idx])
    # ImageIO encode -> python decode
    d, _ = decode_png(_java_encode(imgtool, tmp_path, "PNG", f))
    assert np.array_equal(d[0], f)
