"""Gopher-style repetition signals — the within-document repetition
filters a training-data pipeline runs beside `ops.quality`.

`quality_flags`' distinct-token ratio catches one-token spam; the Gopher
suite (Rae et al. 2021, "Scaling Language Models", table A1) measures
STRUCTURED repetition: duplicated lines, duplicated paragraphs, a single
dominating n-gram, and character mass locked up in repeated n-grams.
Thirteen signals per document:

  dup_line_frac        occurrences-beyond-first / total line occurrences
  dup_line_char_frac   chars in occurrences-beyond-first / chars in all
                       line occurrences
  dup_para_frac /      same two, over paragraphs (split on blank lines)
  dup_para_char_frac
  top_{n}gram_char_frac  n in {2,3,4}: chars covered by ALL occurrences of
                       the most frequent token n-gram / doc chars; 0 when
                       no n-gram repeats (requiring count>=2 keeps short
                       unique sentences from flagging — Gopher applies
                       the signal only after a 50-word length floor)
  dup_{n}gram_char_frac  n in {5..10}: chars covered by occurrences of
                       every n-gram seen more than once / doc chars
                       (counts each occurrence fully — a documented
                       simplification of Gopher's non-overlapping
                       character coverage, which needs positional
                       interval union; this version is a strict upper
                       bound, saturated at 1.0, and exactly
                       SQL-replicable)

Definitions pinned by the DuckDB oracle (contract q_repetition): lines =
non-empty elements of split on \\n; paragraphs = non-empty elements of
split on \\n{2,}; tokens = non-empty elements of whitespace-split of
trimmed text; an n-gram's char length is the space-rejoined window's
length; n-gram denominators are length(text).

Scale design: one projection builds every (kind, unit) occurrence as an
array of structs — lines, paragraphs, and all requested n-gram sizes —
so the document text is scanned ONCE. One explode feeds a single
groupBy(id, kind, unit) count with map-side partial aggregation (the
heavy reduction: its input is O(total units) but its output is O(distinct
units), and hot keys are bounded by document size, not corpus size),
then a second map-side-combinable groupBy(id) folds the per-unit counts
into the thirteen per-document ratios. No joins; every ratio is ONE
division of two exactly-summed longs, so results are bit-stable across
partitionings. At 100 TB this is a scan plus two combinable shuffles
keyed by doc — no all-pairs term anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# Gopher table A1 thresholds, in fixed precedence order (first failing
# rule is the removal reason)
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _nonempty_split(text: Column, pattern: str) -> Column:
    return F.filter(F.split(text, pattern), lambda x: F.length(x) > 0)


def _tagged(units: Column, kind: str) -> Column:
    return F.transform(
        units,
        lambda u: F.struct(F.lit(kind).alias("kind"), u.alias("unit")),
    )


def _ngrams(toks: Column, n: int) -> Column:
    """All (overlapping) token n-grams, space-rejoined; empty when the doc
    has fewer than n tokens (F.sequence would otherwise descend)."""
    windows = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
    respread: bool = True,
) -> DataFrame:
    """-> (id_col, dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac, top_{n}gram_char_frac..., dup_{n}gram_char_frac...)
    for EVERY input row (explode_outer keeps empty documents, whose
    signals are all 0.0). Fractions are rounded to 6dp.

    `respread`: round-robin the input across the cluster before the unit
    projection — the same explicit respread the mention kernel uses: this
    stage is CPU-bound (nine n-gram constructions per document), so its
    parallelism must be keyed to cores, not to the source's file count (a
    single small parquet file otherwise serializes the whole corpus onto
    one task; measured 30s -> ~2s at sf0.1 on local[32])."""
    if respread:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    text = F.col(text_col)
    toks = _nonempty_split(F.trim(text), r"\s+")
    arrays = [
        _tagged(_nonempty_split(text, "\n"), "line"),
        _tagged(_nonempty_split(text, r"\n{2,}"), "para"),
    ]
    for n in sorted(set(top_ns) | set(dup_ns)):
        arrays.append(_tagged(_ngrams(toks, n), f"tok{n}"))

    ex = df.select(
        F.col(id_col),
        F.length(text).alias("doc_chars"),
        F.explode_outer(F.flatten(F.array(*arrays))).alias("s"),
    ).select(id_col, "doc_chars", "s.kind", "s.unit")

    per_unit = ex.groupBy(id_col, "kind", "unit").agg(
        F.count("*").alias("c"), F.min("doc_chars").alias("doc_chars")
    )

    c, ulen = F.col("c"), F.length("unit")
    aggs = [F.min("doc_chars").alias("doc_chars")]
    for kind in ("line", "para"):
        k = F.col("kind") == kind
        aggs += [
            F.sum(F.when(k, c - 1)).alias(f"_{kind}_dn"),
            F.sum(F.when(k, c)).alias(f"_{kind}_dd"),
            F.sum(F.when(k, (c - 1) * ulen)).alias(f"_{kind}_cn"),
            F.sum(F.when(k, c * ulen)).alias(f"_{kind}_cd"),
        ]
    for n in top_ns:
        aggs.append(
            F.max(
                F.when((F.col("kind") == f"tok{n}") & (c > 1), c * ulen)
            ).alias(f"_top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(
                F.when((F.col("kind") == f"tok{n}") & (c > 1), c * ulen)
            ).alias(f"_dup{n}")
        )
    per_doc = per_unit.groupBy(id_col).agg(*aggs)

    def frac(num: str, den) -> Column:
        # least(…, 1.0): overlapping n-gram occurrences can cover more
        # characters than the document holds; the signal saturates at 1.
        # The null case (no qualifying units / zero denominator) must be
        # decided BEFORE least(): both Spark's and DuckDB's least() skip
        # NULL arguments, so least(NULL, 1.0) is 1.0, not NULL.
        ratio = F.try_divide(F.col(num), den)
        return F.when(ratio.isNull(), F.lit(0.0)).otherwise(
            F.least(F.round(ratio, 6), F.lit(1.0))
        )

    out = {
        "dup_line_frac": frac("_line_dn", F.col("_line_dd")),
        "dup_line_char_frac": frac("_line_cn", F.col("_line_cd")),
        "dup_para_frac": frac("_para_dn", F.col("_para_dd")),
        "dup_para_char_frac": frac("_para_cn", F.col("_para_cd")),
    }
    for n in top_ns:
        out[f"top_{n}gram_char_frac"] = frac(f"_top{n}", F.col("doc_chars"))
    for n in dup_ns:
        out[f"dup_{n}gram_char_frac"] = frac(f"_dup{n}", F.col("doc_chars"))
    return per_doc.select(F.col(id_col), *[v.alias(k) for k, v in out.items()])


def repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """-> repetition_signals + `keep` boolean + `reason` (NULL when kept;
    otherwise the FIRST signal, in GOPHER_THRESHOLDS order, strictly above
    its threshold — stable removal provenance, as in quality_flags)."""
    thresholds = GOPHER_THRESHOLDS if thresholds is None else thresholds
    sig = repetition_signals(df, id_col, text_col)
    reason = F.lit(None).cast("string")
    for name in reversed(list(thresholds)):
        reason = F.when(
            F.col(name) > thresholds[name], F.lit(name)
        ).otherwise(reason)
    return sig.withColumn("reason", reason).withColumn(
        "keep", F.col("reason").isNull()
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> dict[str, DataFrame]:
    """-> {"kept", "removed", "metrics"}: kept preserves df's columns via
    an id-keyed LEFT SEMI join against the keep set (the build side is the
    id-only keep list — AQE broadcasts it when it fits, else the corpus
    shuffles once on its id, the same key prepare_corpus already shards
    by); removed carries the reason; metrics = per-reason counts."""
    flags = repetition_flags(df, id_col, text_col, thresholds)
    kept = df.join(flags.filter(F.col("keep")).select(id_col), id_col, "semi")
    removed = flags.filter(~F.col("keep")).select(id_col, "reason")
    metrics = removed.groupBy("reason").agg(
        F.count("*").cast("long").alias("n")
    )
    return {"kept": kept, "removed": removed, "metrics": metrics}
