"""Document fingerprinting: k-gram hashing + winnowing (MOSS-style).

The standard local-fingerprinting scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
hash every k-character gram of the document, then keep the minimum hash of
each sliding window of `window` consecutive gram hashes. Any sufficiently
long match between two documents is guaranteed to share a fingerprint, so
shared-fingerprint pairs are the candidate set for substring-level
near-duplication (copy/paste, boilerplate overlap) — a different signal
from token-set MinHash (ops/dedup.py), which is order-insensitive.

Everything is native column algebra — sequence/transform/slice/array_min
evaluate inside the JVM per row; there is no Python and no shuffle until
the per-doc fingerprint set explodes into (doc, fp) rows. md5 hex is the
gram hash (stable across engines; lexicographic min == numeric min for
fixed-width hex), so a DuckDB oracle can replay the whole construction.

Candidate pairing reuses the hot-bucket cap from ops/dedup: one ubiquitous
fingerprint (a shared license header) must not produce a quadratic join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_hashes(text: Column, k: int) -> Column:
    """array<string>: md5 of every k-char gram (empty when len(text) < k)."""
    n = F.length(text) - k + 1
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(k))))


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """-> (doc_id, fp): the distinct winnowed fingerprints of each doc."""
    gh = _gram_hashes(F.col(text_col), k)
    n_win = F.size(gh) - window + 1
    wins = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    fps = F.array_distinct(
        F.transform(wins, lambda j: F.array_min(F.slice(gh, j, window)))
    )
    return df.select(F.col(id_col).alias("doc_id"), F.explode(fps).alias("fp"))


def fingerprint_candidates(
    fps: DataFrame, max_bucket: int | None = 256
) -> DataFrame:
    """Docs sharing any fingerprint -> (a, b) candidate pairs, with the
    degenerate-fingerprint cap (see ops/dedup hot-bucket doctrine)."""
    from .dedup import _cap_buckets

    capped = _cap_buckets(fps, ["fp"], max_bucket)
    a = capped.select("fp", F.col("doc_id").alias("a"))
    b = capped.select("fp", F.col("doc_id").alias("b"))
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
