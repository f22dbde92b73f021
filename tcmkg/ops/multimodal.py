"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas kernels, Arrow batch shapes, deterministic outputs. The codec
step itself is STUBBED: no image/audio libraries ship in this container, so
`_decode_image` / `_decode_audio` raise NotImplementedError unless a
deterministic fake is requested. On a real cluster inject your codec via
the `decoder=` parameter (any picklable `bytes -> np.ndarray` callable,
e.g. PIL/torchaudio-backed); nothing else changes — schema, batching, and
plan shape are codec-independent (tested).

Schema contract:
    media(doc_id long, modality string, media binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, mime string>)

Kernels (all mapInPandas — batch in, batch out, no per-row Spark Python):
    decode_features   binary -> fixed-dim feature vector
    resize_images     binary -> binary (re-encoded at target size)
    sample_frames     video binary -> N frame binaries (1 row -> N rows)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, modality string, media binary, "
    "meta struct<width int, height int, sample_rate int, n_frames int, mime string>"
)

FEATURE_DIM = 32


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (bytes = md5 stream of the id)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        blob = b"".join(
            hashlib.md5(f"{modality}:{i}:{j}".encode()).digest() for j in range(8)
        )
        meta = {
            "width": 64 + (i % 4) * 32 if modality == "image" else None,
            "height": 48 + (i % 3) * 32 if modality == "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": 8 + i % 5 if modality == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
        }
        rows.append((i, modality, bytearray(blob), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_bmp_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Media table whose image rows are REAL 24-bit BMP bytes (encode_bmp)
    over a deterministic per-id pixel pattern — the fixture for the
    fake_decode=False end-to-end path."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 3) * 4, 6 + (i % 4) * 2
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(xx * 7 + i) % 256, (yy * 13 + 2 * i) % 256, (xx * yy + 3 * i) % 256],
            axis=2,
        )
        meta = {
            "width": w, "height": h, "sample_rate": None, "n_frames": None,
            "mime": "image/bmp",
        }
        rows.append((i, "image", bytearray(encode_bmp(px)), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def bmp_pixels(i: int) -> np.ndarray:
    """The synth_bmp_media pixel pattern for id `i` (oracle side: features
    computed from the ARRAY, never touching BMP bytes — so the contract
    differential covers the encode→decode round-trip itself)."""
    w, h = 8 + (i % 3) * 4, 6 + (i % 4) * 2
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7 + i) % 256, (yy * 13 + 2 * i) % 256, (xx * yy + 3 * i) % 256],
        axis=2,
    ).astype(np.float64)


def nn_resize(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via index slicing (numpy-only)."""
    h, w = px.shape[:2]
    yi = np.arange(height) * h // height
    xi = np.arange(width) * w // width
    return px[yi][:, xi]


def _pil_decoder():
    """Capability probe: PIL if the image ships it, else None. Cached."""
    global _PIL_DECODER
    try:
        return _PIL_DECODER
    except NameError:
        pass
    try:
        import io

        from PIL import Image  # noqa: F401

        def dec(blob: bytes) -> np.ndarray:
            import io as _io

            from PIL import Image as _Image

            return np.asarray(_Image.open(_io.BytesIO(blob))).astype(np.float64)

        _PIL_DECODER = dec
    except ImportError:
        _PIL_DECODER = None
    return _PIL_DECODER


def decode_bmp(blob: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BI_RGB BMP (the one real
    format the real-codec path supports WITHOUT external libraries) ->
    (H, W, 3) float64 RGB array. Parses BITMAPFILEHEADER (14 bytes) +
    BITMAPINFOHEADER (40 bytes); rows are bottom-up and padded to 4
    bytes, pixels stored BGR — all per the public BMP spec."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP stream")
    off = int.from_bytes(blob[10:14], "little")
    hdr_size = int.from_bytes(blob[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    px = np.frombuffer(blob, dtype=np.uint8, count=stride * height, offset=off)
    px = px.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].astype(np.float64)  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) array -> uncompressed 24-bit bottom-up BMP bytes (the
    inverse of decode_bmp; round-trip tested)."""
    px = np.asarray(pixels)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (H, W, 3) pixels")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = (
        np.clip(px, 0, 255).astype(np.uint8)[::-1, :, ::-1].reshape(h, w * 3)
    )
    data = body.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def _decode_image(blob: bytes, fake: bool) -> np.ndarray:
    if not fake:
        # real path: PIL when the environment ships it (capability probe),
        # else the stdlib-only BMP decoder — so fake_decode=False has one
        # real format end-to-end even in a codec-free container
        pil = _pil_decoder()
        if pil is not None:
            return pil(blob)
        if blob[:2] == b"BM":
            return decode_bmp(blob)
        raise NotImplementedError(
            "no image codec for this format in this environment "
            "(PIL absent; stdlib path supports 24-bit BMP only)"
        )
    # deterministic fake decode: bytes -> pseudo-pixel grid
    arr = np.frombuffer(hashlib.md5(blob).digest() * 8, dtype=np.uint8)
    return arr.reshape(16, 8).astype(np.float64)


def _pick_decoder(decoder, fake_decode: bool):
    """Decoder injection: `decoder(blob: bytes) -> np.ndarray` (any
    picklable callable — PIL, torchvision, ...) wins; otherwise the
    deterministic fake or the gated real path per `fake_decode`."""
    if decoder is not None:
        return decoder
    return lambda blob: _decode_image(blob, fake_decode)


def _features_from(pixels: np.ndarray, dim: int = FEATURE_DIM) -> list[float]:
    flat = pixels.ravel()
    reps = int(np.ceil(dim / flat.size)) if flat.size else 1
    v = np.tile(flat, reps)[:dim]
    n = float(np.sqrt((v * v).sum()))
    return (v / n if n > 0 else v).tolist()


def decode_features(df: DataFrame, fake_decode: bool = True, decoder=None) -> DataFrame:
    """media -> (doc_id, modality, features array<double>). mapInPandas:
    partitioning preserved, batch-shaped, codec isolated behind the
    injectable `decoder` (see _pick_decoder)."""
    dec = _pick_decoder(decoder, fake_decode)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_from(dec(bytes(b)))
                for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": pdf["modality"], "features": feats}
            )

    return df.mapInPandas(
        kernel, schema="doc_id long, modality string, features array<double>"
    )


def resize_images(df: DataFrame, width: int, height: int,
                  fake_decode: bool = True, decoder=None, encoder=None) -> DataFrame:
    """image rows -> re-encoded binary at (width, height); non-images pass
    through untouched. Binary-in/binary-out transform shape.

    `encoder(pixels: np.ndarray) -> bytes` makes the re-encode REAL: the
    decoded pixels are nearest-neighbor-resampled (nn_resize) and
    re-encoded (e.g. encoder=encode_bmp for the stdlib BMP path, or a
    PIL-backed callable). Without it the re-encode is the deterministic
    content-hash fake (plumbing-only mode)."""
    dec = _pick_decoder(decoder, fake_decode)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media = []
            out_meta = []
            for mod, blob, meta in zip(pdf["modality"], pdf["media"], pdf["meta"]):
                if mod != "image":
                    out_media.append(blob)
                    out_meta.append(meta)
                    continue
                px = dec(bytes(blob))
                if encoder is not None:
                    payload = encoder(nn_resize(px, width, height))
                else:
                    # fake re-encode: content hash of (pixels, target size)
                    payload = hashlib.md5(
                        px.tobytes() + f":{width}x{height}".encode()
                    ).digest() * 4
                out_media.append(bytearray(payload))
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = width, height
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "media": out_media,
                    "meta": out_meta,
                }
            )

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every: int = 2, fake_decode: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame (1 -> N generator shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, blobs = [], [], []
            for did, mod, blob, meta in zip(
                pdf["doc_id"], pdf["modality"], pdf["media"], pdf["meta"]
            ):
                if mod != "video" or meta is None or meta["n_frames"] is None:
                    continue
                for fr in range(0, int(meta["n_frames"]), every):
                    ids.append(did)
                    frames.append(fr)
                    blobs.append(
                        bytearray(hashlib.md5(bytes(blob) + fr.to_bytes(4, "big")).digest())
                    )
            yield pd.DataFrame({"doc_id": ids, "frame": frames, "frame_bytes": blobs})

    return df.mapInPandas(kernel, schema="doc_id long, frame int, frame_bytes binary")
