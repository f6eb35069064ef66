"""Multimodal plumbing tests: RAWM round-trip, decode/resize/frame-sample
via mapInPandas, and the binaryFile source."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_assignment_spark import sources
from data_engineering_assignment_spark.functions.multimodal import (
    decode_media,
    decode_rawm,
    encode_rawm,
    extract_mean_color,
    resize_media,
    sample_frames,
)


def frames(n, h, w, c=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8)


def media_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "path string, media_type string, width int, height int, channels int,"
        " n_frames int, content binary",
    )


def test_rawm_roundtrip():
    f = frames(3, 4, 5)
    decoded, meta = decode_rawm(encode_rawm(f))
    assert np.array_equal(decoded, f)
    assert meta == {"width": 5, "height": 4, "channels": 4, "n_frames": 3}


def test_decode_media_flags_bad_content(spark):
    good = encode_rawm(frames(1, 2, 2))
    df = media_df(
        spark,
        [
            ("a.rawm", "image", 2, 2, 4, 1, bytearray(good)),
            ("b.png", "image", 0, 0, 0, 0, bytearray(b"\x89PNG not supported")),
        ],
    )
    out = {r["path"]: r for r in decode_media(df).collect()}
    assert out["a.rawm"]["decoded_ok"] and out["a.rawm"]["width"] == 2
    assert not out["b.png"]["decoded_ok"]


def test_resize_nearest_neighbor(spark):
    f = frames(2, 8, 8)
    df = media_df(spark, [("v", "video", 8, 8, 4, 2, bytearray(encode_rawm(f)))])
    out = resize_media(df, 4, 4).collect()[0]
    decoded, meta = decode_rawm(bytes(out["content"]))
    assert meta["width"] == 4 and meta["height"] == 4 and meta["n_frames"] == 2
    # nearest-neighbor with integer stride 2 → every other pixel
    assert np.array_equal(decoded, f[:, ::2, ::2, :])


def test_sample_frames(spark):
    f = frames(10, 2, 2)
    df = media_df(spark, [("v", "video", 2, 2, 4, 10, bytearray(encode_rawm(f)))])
    out = sample_frames(df, every_k=3).collect()[0]
    decoded, meta = decode_rawm(bytes(out["content"]))
    assert meta["n_frames"] == 4  # frames 0,3,6,9
    assert np.array_equal(decoded, f[::3])


def test_extract_mean_color(spark):
    f = np.zeros((1, 2, 2, 4), dtype=np.uint8)
    f[..., 2] = 200  # constant R channel (BGRA)
    df = media_df(spark, [("i", "image", 2, 2, 4, 1, bytearray(encode_rawm(f)))])
    out = extract_mean_color(df).collect()[0]
    assert out["mean_channels"] == [0.0, 0.0, 200.0, 0.0]


def test_binary_file_source_roundtrip(spark, tmp_path):
    f = frames(1, 3, 3)
    p = tmp_path / "x.rawm"
    p.write_bytes(encode_rawm(f))
    (tmp_path / "ignore.txt").write_text("not media")
    df = sources.read_binary_files(spark, str(tmp_path), glob="*.rawm")
    rows = df.collect()
    assert len(rows) == 1
    decoded, meta = decode_rawm(bytes(rows[0]["content"]))
    assert meta["width"] == 3 and np.array_equal(decoded, f)


def tiny_png(pixels: np.ndarray) -> bytes:
    """Minimal in-test PNG encoder (RGBA, 8-bit, no filters) — lets the PIL
    decode hook be exercised without shipping binary fixtures."""
    import struct
    import zlib

    h, w, _ = pixels.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pil_available() -> bool:
    from data_engineering_assignment_spark.functions.multimodal import (
        _pil_image_module,
    )

    return _pil_image_module() is not None


def test_png_without_pil_raises_clear_error():
    from data_engineering_assignment_spark.functions.multimodal import decode_any

    if _pil_available():
        pytest.skip("PIL present — covered by test_png_decode_with_pil")
    png = tiny_png(frames(1, 2, 2)[0])
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_any(png)


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed in this container")
def test_png_decode_with_pil():
    """Real-codec hook: PNG bytes → one BGRA frame matching Spark's image
    source byte order (reference decodes OpenMoji PNGs the same way)."""
    from data_engineering_assignment_spark.functions.multimodal import decode_any

    rgba = frames(1, 3, 2)[0]  # (h=3, w=2, 4) RGBA
    decoded, meta = decode_any(tiny_png(rgba))
    assert meta == {"width": 2, "height": 3, "channels": 4, "n_frames": 1}
    assert np.array_equal(decoded[0], rgba[:, :, [2, 1, 0, 3]])


def test_decode_media_png_graceful_without_pil(spark):
    """decode_media must not explode on real PNGs when PIL is absent — the
    row is flagged decoded_ok=False like any undecodable content."""
    if _pil_available():
        pytest.skip("PIL present — PNG would decode fine")
    png = tiny_png(frames(1, 2, 2)[0])
    df = media_df(spark, [("x.png", "image", 2, 2, 4, 1, bytearray(png))])
    row = decode_media(df).collect()[0]
    assert row["decoded_ok"] is False
