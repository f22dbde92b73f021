"""Deduplication operators for web-scale corpora.

All hash choices are md5-based (stable across machines, engines, and
sessions — no seed, no PYTHONHASHSEED exposure), so every operator here is
deterministic and oracle-checkable.

  exact_dedup          content-hash groupBy; survivor = min id
  minhash_signatures   b-band MinHash over distinct tokens — pure JVM SQL
                       (explode + min(md5)), no Python
  lsh_candidate_pairs  docs sharing any band signature (the LSH bucket join)
  simhash              64-bit SimHash via a vectorized pandas UDF (bit-vote
                       accumulation is a numpy matmul per batch)
  simhash_candidates   banded SimHash bucket join (Hamming-adjacent docs
                       collide on at least one of 4 16-bit bands when
                       distance <= 3 of 64 bits is concentrated)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (text_hash, n_docs, keep_doc): survivor = min id per content hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("_id"))
        .groupBy("text_hash")
        .agg(F.count("*").cast("long").alias("n_docs"), F.min("_id").alias("keep_doc"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_bands: int = 4
) -> DataFrame:
    """-> (id, band, sig): per-band min of md5(band:token) over distinct
    tokens. Entirely JVM-side (explode + partial-agg min) — at corpus scale
    this is a map-side-combined aggregation, no Python."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    )
    bands = tok.select(
        "id", F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band"), "tok"
    )
    return (
        bands.withColumn(
            "h", F.md5(F.concat(F.col("band").cast("string"), F.lit(":"), F.col("tok")))
        )
        .groupBy("id", "band")
        .agg(F.min("h").alias("sig"))
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Docs sharing any (band, sig) bucket -> candidate near-dup pairs.
    The self-join is on the bucket key, so only same-bucket docs pair."""
    a = sigs.select("band", "sig", F.col("id").alias("a"))
    b = sigs.select("band", "sig", F.col("id").alias("b"))
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def _simhash_batch(texts: pd.Series, bits: int = 64) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        votes = np.zeros(bits, dtype=np.int64)
        for tok in set((t or "").split(" ")):
            d = hashlib.md5(tok.encode("utf-8")).digest()[:8]
            h = int.from_bytes(d, "big")
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(bits):
            if votes[b] > 0:
                v |= 1 << b
        # store as signed 64-bit
        out[i] = v - (1 << 64) if v >= (1 << 63) else v
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """64-bit SimHash (vectorized per Arrow batch)."""
    for batch in texts:
        yield _simhash_batch(batch)


def simhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Banded SimHash bucket join: 4 bands x 16 bits; docs agreeing on any
    band are candidates (catches Hamming distance <= 3 when spread across
    the other bands)."""
    sh = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    bands = sh.select(
        "id",
        "sh",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
    ).withColumn("bucket", F.expr("shiftrightunsigned(sh, band * 16) & 65535"))
    a = bands.select("band", "bucket", F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    b = bands.select("band", "bucket", F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .dropDuplicates(["a", "b"])
    )
    return pairs
