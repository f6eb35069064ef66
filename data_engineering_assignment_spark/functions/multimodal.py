"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with ``mapInPandas`` (north-star operator set; no
counterpart in the reference beyond the PNG task).

Design for 100 TB: media bytes stay in executor-side Arrow batches end to
end — the driver never sees pixel data; each transform is a narrow
``mapInPandas`` over whatever partitioning the source had, so scans
parallelize by file and no shuffle is introduced.

Real image/audio codecs are not installed in this environment, so the DECODE
step for standard formats raises ``NotImplementedError`` behind an
import-try (PIL hook), while the deterministic ``RAWM`` container below —
``b"RAWM" + u16 width + u16 height + u8 channels + u8 n_frames + payload``
(little-endian, frame-major BGRA payload) — exercises the full Spark-side
path (schema, batching, partition mapping) hermetically.
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


def _pil_image_module():
    """Optional-dependency hook: PIL is not in this container, but the decode
    path must exist (reference decodes real OpenMoji PNGs via Spark's image
    source, Assignment-python.py:710). Returns PIL.Image or None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_pil(content: bytes) -> tuple[np.ndarray, dict]:
    """Decode a real PNG/JPEG via PIL into the same (frames, meta) shape as
    ``decode_rawm``: one frame of uint8 BGRA — byte order matching Spark's
    ``image`` source (CV BGR(A)), so the color analytics in
    ``functions/colors.py`` apply unchanged (reference parity with
    Assignment-python.py:654-661's image.data handling)."""
    Image = _pil_image_module()
    if Image is None:
        raise NotImplementedError(
            "PNG/JPEG decode needs PIL (pillow) on the executors; this "
            "container does not ship it. The RAWM test container exercises "
            "the identical Spark-side path."
        )
    import io

    rgba = np.asarray(Image.open(io.BytesIO(content)).convert("RGBA"))
    bgra = rgba[:, :, [2, 1, 0, 3]]  # RGBA → BGRA, Spark image-source order
    h, w, c = bgra.shape
    frames = np.ascontiguousarray(bgra).reshape(1, h, w, c)
    return frames, {"width": w, "height": h, "channels": c, "n_frames": 1}


def decode_any(content: bytes) -> tuple[np.ndarray, dict]:
    """Magic-byte dispatch: RAWM container natively, PNG/JPEG via the guarded
    PIL hook. Other formats raise ``NotImplementedError``."""
    if content[:4] == b"RAWM":
        return decode_rawm(content)
    if content[: len(_PNG_MAGIC)] == _PNG_MAGIC or content[:3] == _JPEG_MAGIC:
        return decode_image_pil(content)
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
