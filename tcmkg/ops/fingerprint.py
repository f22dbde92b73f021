"""Document fingerprinting: k-gram hashing + winnowing (MOSS-style).

The standard local-fingerprinting scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
hash every k-character gram of the document, then keep the minimum hash of
each sliding window of `window` consecutive gram hashes. Any sufficiently
long match between two documents is guaranteed to share a fingerprint, so
shared-fingerprint pairs are the candidate set for substring-level
near-duplication (copy/paste, boilerplate overlap) — a different signal
from token-set MinHash (ops/dedup.py), which is order-insensitive.

r6: the construction runs as a mapInPandas kernel. The previous pure-
column formulation (sequence/transform/slice/array_min) evaluated
INTERPRETED per element — higher-order functions don't codegen, and the
slice-per-window shape made it O(L * window) expression evaluations per
document (the same pathology the repetition and PQ operators had);
combined with a single-file scan pinning the work to ONE task, the sf0.1
contract query measured 861 s. The kernel hashes each k-gram once
(hashlib.md5 hex — identical bytes/semantics: Python slicing and Spark
substr both index code points) and takes window minima with a monotonic
deque in O(L) per document; lexicographic min over fixed-width hex equals
the old array_min, so results are bit-identical (hash-gated by
q_fingerprints). Input is respread across cores first (ops/dedup's
single-file-scan rule). Same sf0.1 query after: ~1 s.

Candidate pairing reuses the hot-bucket cap from ops/dedup: one ubiquitous
fingerprint (a shared license header) must not produce a quadratic join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _winnow_one(t: str | None, k: int, window: int) -> list[str]:
    """Distinct winnowed fingerprints of one document, reproducing the old
    column formulation exactly: md5 hex per k-char gram (code-point
    slicing, like Spark substr), lexicographic min per sliding window of
    `window` gram hashes (== array_min over strings), first-occurrence
    dedup (== array_distinct). Empty for NULL/short docs — the old plan's
    empty-array guards explode to no rows."""
    import hashlib
    from collections import deque

    if t is None or len(t) < k:
        return []
    grams = [
        hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()
        for i in range(len(t) - k + 1)
    ]
    if len(grams) < window:
        return []
    # monotonic deque of candidate-minimum indices: O(L) total
    out: list[str] = []
    seen: set[str] = set()
    dq: deque[int] = deque()
    for i, g in enumerate(grams):
        while dq and grams[dq[-1]] >= g:
            # strict '>' would keep the EARLIER equal value; array_min
            # returns the value (not the index), so ties are value-equal
            # and either choice yields the same fp string
            dq.pop()
        dq.append(i)
        if dq[0] <= i - window:
            dq.popleft()
        if i >= window - 1:
            fp = grams[dq[0]]
            if fp not in seen:
                seen.add(fp)
                out.append(fp)
    return out


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """-> (doc_id, fp): the distinct winnowed fingerprints of each doc."""
    from .dedup import _respread_by

    src = _respread_by(df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    id_type = src.schema["doc_id"].dataType.simpleString()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for did, t in zip(pdf["doc_id"], pdf["_t"]):
                for fp in _winnow_one(t, k, window):
                    ids.append(did)
                    fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return src.mapInPandas(kernel, schema=f"doc_id {id_type}, fp string")


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
