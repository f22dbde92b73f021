"""Benchmark decontamination — exact token-n-gram overlap vs an eval set.

The training-data op the dedup family does NOT cover: near-dedup removes
documents similar to OTHER TRAINING documents; decontamination removes
documents that leak the EVALUATION set (GPT-3 appendix C / PaLM / Llama
style: flag any training doc sharing at least `min_hits` verbatim token
n-grams, classically n=8..13, with any benchmark doc).

Scale design: the eval side is benchmark-sized (MBs) while the corpus is
the 100 TB side — so the distinct eval n-gram set is BROADCAST and the
corpus is one scan + explode + broadcast-hash semi-probe. The only shuffle
is the per-doc hit count groupBy, whose input is just the MATCHED n-gram
rows (rare by construction) with map-side partial counts. Nothing in the
plan is proportional to corpus x eval.

Tokenization is whitespace (`\\s+` on trimmed text), n-grams are the
space-rejoined windows, and each document's n-grams are counted ONCE
(set semantics) — all pinned by the DuckDB oracle (contract
q_decontaminate), which replays the same window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngram_col(text_col: str, n: int) -> Column:
    """Distinct token n-grams of one document as an array column (empty
    when the doc has fewer than n tokens — guarded because F.sequence
    would otherwise generate a DESCENDING range)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, windows).otherwise(
            F.array().cast("array<string>")
        )
    )


def contamination_hits(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """-> (id_col, n_hits) for EVERY corpus doc: how many of the doc's
    distinct token n-grams appear anywhere in the eval set (0 = clean).
    Emitting the zero rows makes false positives as hash-visible as
    false negatives in the differential."""
    from .dedup import _respread_by

    eval_text_col = eval_text_col or text_col
    eval_ng = (
        eval_df.select(
            F.explode(_ngram_col(eval_text_col, n)).alias("ng")
        ).distinct()
    )
    # the corpus-side n-gram projection is CPU-bound; spread it across the
    # cluster when the scan would run narrower than the core count
    # (single-file parquet = one map task), keyed by id so the hit-count
    # groupBy reuses the exchange
    doc_ng = _respread_by(docs, id_col).select(
        F.col(id_col), F.explode(_ngram_col(text_col, n)).alias("ng")
    )
    hits = (
        doc_ng.join(F.broadcast(eval_ng), "ng")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits")
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> dict[str, DataFrame]:
    """-> {"kept", "flagged", "metrics"}: flagged = docs with >= min_hits
    eval n-gram matches (with their hit count, for audit); kept = the rest
    with original columns; metrics = (metric, value) counts so removals are
    never silent (same contract as quality_filter/near_dedup)."""
    h = contamination_hits(docs, eval_df, id_col, text_col, eval_text_col, n)
    flagged = h.filter(F.col("n_hits") >= min_hits)
    kept = docs.join(flagged.select(id_col), id_col, "left_anti")
    metrics = (
        flagged.agg(F.count("*").alias("v"))
        .select(F.lit("docs_flagged").alias("metric"), F.col("v").cast("long").alias("value"))
        .unionByName(
            docs.agg(F.count("*").alias("v")).select(
                F.lit("docs_in").alias("metric"), F.col("v").cast("long").alias("value")
            )
        )
    )
    return {"kept": kept, "flagged": flagged, "metrics": metrics}
