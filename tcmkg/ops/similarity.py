"""Embedding similarity: the reference's blocked-cosine clustering pass
(symptom_similarity_using_sentence_embedding.py:48-112) re-expressed for
Spark, plus the ANN building blocks a training-data pipeline needs.

Kernels (SURVEY.md §2.9):
  embed_text      Iterator pandas UDF — "model loaded once per executor".
                  No embedding model ships in this image, so the default is
                  a DETERMINISTIC hash-projection embedder (real Spark
                  plumbing, fake weights); swap `_encode_batch` for a real
                  encoder on a GPU cluster.
  block_pair_sims groupBy(block).applyInPandas — within-block pairwise
                  cosine above a threshold (the reference blocks by
                  (locus, property) to avoid O(n²); the block key is the
                  partition key here, so the quadratic stays inside blocks).
  threshold-clustering = connected components over the >threshold pair
                  edges (the reference's greedy transitive clustering at
                  sim>0.98 is exactly CC on that graph).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline.cc import connected_components_edges

EMBED_DIM = 64


def _encode_batch(texts: pd.Series, dim: int = EMBED_DIM) -> pd.Series:
    """Deterministic stand-in encoder: character-trigram hash projection,
    L2-normalized. Pure numpy, no model download; stable across machines."""
    out = []
    for t in texts:
        v = np.zeros(dim, dtype=np.float64)
        s = t or ""
        for i in range(len(s)):
            tri = s[i : i + 3]
            h = 2166136261
            for ch in tri:
                h = ((h ^ ord(ch)) * 16777619) & 0xFFFFFFFF
            v[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        n = math.sqrt(float((v * v).sum()))
        out.append((v / n if n > 0 else v).tolist())
    return pd.Series(out)


def make_embed_udf(encoder=None):
    """Embedding UDF factory with an injectable encoder.

    `encoder(texts: pd.Series) -> pd.Series[list[float]]` — any picklable
    callable; it ships to executors inside the UDF closure, so swapping the
    hash-projection stand-in for a real model loader changes outputs but
    NOT the operator shape, schema, or plan (tested). A heavyweight model
    should be loaded lazily inside the callable on first use (the iterator
    form calls it once per Arrow batch in one long-lived Python worker)."""
    enc = encoder or _encode_batch

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # setup-once section (a real model's lazy load happens in `enc`)
        for batch in it:
            yield enc(batch)

    return embed


# default instance (deterministic hash-projection encoder)
embed_text = make_embed_udf()


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def block_pair_sims(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.98,
) -> DataFrame:
    """Within-block pairwise cosine pairs above `threshold`.

    applyInPandas per block: the numpy matmul stays quadratic ONLY inside a
    block (reference blocks by (locus, property) for the same reason —
    symptom_similarity_using_sentence_embedding.py:70-75). Vectors are
    assumed L2-normalized (embed_text normalizes)."""

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        ids = pdf[id_col].to_numpy()
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        sims = m @ m.T
        iu, ju = np.triu_indices(n, k=1)
        mask = sims[iu, ju] > threshold
        return pd.DataFrame(
            {
                "a": np.minimum(ids[iu[mask]], ids[ju[mask]]),
                "b": np.maximum(ids[iu[mask]], ids[ju[mask]]),
                "sim": sims[iu[mask], ju[mask]],
            }
        )

    return (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col).alias("_blk"))
        .groupBy("_blk")
        .applyInPandas(per_block, schema=_PAIR_SCHEMA)
    )


def similarity_clusters(pairs: DataFrame) -> DataFrame:
    """(a, b) similar pairs -> (node, component): transitive clustering =
    connected components; representative = min id (deterministic), matching
    the reference's first-occurrence-wins greedy clustering under
    lexicographic ids. Pair-edge CC fast path (r6): one join + one agg per
    propagation round — see connected_components_edges."""
    return connected_components_edges(pairs.select("a", "b"))


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """-> (a, b, cos): embedding-cosine near-duplicate pairs above
    `threshold`. Pure JVM SQL (zip_with/aggregate dot products).

    Without `assignments` this is the exact all-pairs baseline (a
    crossJoin — fine for verification scale, never for a corpus). Pass the
    (id, cid) table from ops/ann.build_ivf to confine the quadratic inside
    k-means cells (the scale path): only same-cell vectors pair, the
    standard IVF blocking trade — recall bounded by cell assignment,
    verified subset-of-exact in tests."""
    from .ann import _as_double, _dot, _norm

    base = emb.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", _norm(F.col("_v")))
    if assignments is not None:
        base = base.join(
            assignments.select(F.col("id").alias("_id"), "cid"), "_id"
        )
        a = base.select("cid", F.col("_id").alias("a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
        b = base.select("cid", F.col("_id").alias("b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
        joined = a.join(b, "cid").filter(F.col("a") < F.col("b"))
    else:
        a = base.select(F.col("_id").alias("a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
        b = base.select(F.col("_id").alias("b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
        joined = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    from .ann import _cos as _safe_cos

    cos = _safe_cos(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        joined.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
        .dropDuplicates(["a", "b"])
    )


def cluster_symptom_like(
    df: DataFrame, id_col: str, text_col: str, block_col: str,
    threshold: float = 0.98, encoder=None,
) -> DataFrame:
    """End-to-end EP3-stage-2 analogue: embed -> blocked pair sims -> CC ->
    `;`-joined member list per cluster (A10 list agg,
    symptom_similarity_using_sentence_embedding.py:103-111). `encoder`
    swaps the embedding model (see make_embed_udf)."""
    emb = df.withColumn("_v", make_embed_udf(encoder)(F.col(text_col)))
    pairs = block_pair_sims(emb, id_col, "_v", block_col, threshold)
    comp = similarity_clusters(pairs)
    return (
        comp.groupBy("component")
        .agg(F.array_join(F.array_sort(F.collect_set("node")), ";").alias("members"))
    )
