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


def _decode_image(blob: bytes, fake: bool) -> np.ndarray:
    if not fake:
        # real path: PIL.Image.open(io.BytesIO(blob)) — library not in this
        # container image, see module docstring
        raise NotImplementedError("image codec not available in this environment")
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
                  fake_decode: bool = True, decoder=None) -> DataFrame:
    """image rows -> re-encoded binary at (width, height); non-images pass
    through untouched. Binary-in/binary-out transform shape."""
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
