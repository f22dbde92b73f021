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
  top_{n}gram_char_frac  n in {2,3,4}: the MAXIMUM char coverage
                       (occurrences x joined length) over all REPEATED
                       token n-grams / doc chars; 0 when no n-gram repeats
                       (requiring count>=2 keeps short unique sentences
                       from flagging — Gopher applies the signal only
                       after a 50-word length floor). NOTE: Gopher's table
                       A1 scores the count-argmax n-gram; this signal
                       takes the coverage max instead (a longer but less
                       frequent repeated n-gram can win), which is
                       strictly >= the Gopher value — thresholds remove at
                       least what Gopher's would. The DuckDB oracle
                       replays this exact formula (hash-pinned).
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

Scale design (r6): every signal is a function of ONE document, so the
whole computation is a pure map — no explode, no shuffle, no join. One
mapInPandas kernel computes the exact long numerators per document
(Counter arithmetic over lines/paragraphs/n-gram tuples), and the
published ratios are produced by unchanged JVM round/try_divide/least
expressions over those longs — bit-identical to the former explode +
groupBy(id, kind, unit) + groupBy(id) plan, which shuffled O(total
units) rows (~9 n-gram families x tokens per doc, ~90M exploded rows
for 50k docs at sf1.0) twice for per-document arithmetic. The r6 shape
is scan -> map -> done: per-doc cost is local CPU, zero bytes shuffled,
and partitioning cannot affect results.
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


# Java-regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python's \s on str is
# UNICODE whitespace (U+3000, NBSP, ...). The kernel must tokenize exactly
# like the F.split(F.trim(text), r"\s+") column path, so the Python mirror
# pins the Java class explicitly.
_JAVA_WS_RE = None  # compiled lazily inside the kernel (worker-side import)


def _doc_counters(
    t: str | None, top_ns: tuple[int, ...], dup_ns: tuple[int, ...]
) -> list:
    """Exact long numerators/denominators for one document — the arithmetic
    of the old explode + groupBy plan, computed document-locally:
      [doc_chars, line_dn, line_dd, line_cn, line_cd, para_*(4),
       top{n} for top_ns..., dup{n} for dup_ns...]
    None entries reproduce the old empty-aggregation-group NULLs (the
    shared frac rule maps NULL -> 0.0 either way)."""
    import re
    from collections import Counter

    global _JAVA_WS_RE
    if _JAVA_WS_RE is None:
        _JAVA_WS_RE = (
            re.compile("[ \t\n\x0b\f\r]+"),  # Java \s, not Python unicode \s
            re.compile("\n"),
            re.compile("\n{2,}"),
        )
    ws_re, line_re, para_re = _JAVA_WS_RE
    if t is None:
        return [None] * (9 + len(top_ns) + len(dup_ns))
    out: list = [len(t)]
    for splitter in (line_re, para_re):
        units = [u for u in splitter.split(t) if u]
        if units:
            distinct = set(units)
            cd = sum(len(u) for u in units)
            out += [
                len(units) - len(distinct),
                len(units),
                cd - sum(len(u) for u in distinct),
                cd,
            ]
        else:
            out += [None, None, None, None]
    # F.trim strips SPACES only (not general whitespace) — mirror exactly
    toks = [x for x in ws_re.split(t.strip(" ")) if x]
    grams: dict[int, Counter] = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams[n] = Counter(
            tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    for n in top_ns:
        best = None
        for key, c in grams[n].items():
            if c > 1:
                # len(' '.join(key)) without building the string
                mass = c * (sum(len(x) for x in key) + n - 1)
                if best is None or mass > best:
                    best = mass
        out.append(best)
    for n in dup_ns:
        tot = None
        for key, c in grams[n].items():
            if c > 1:
                mass = c * (sum(len(x) for x in key) + n - 1)
                tot = mass if tot is None else tot + mass
        out.append(tot)
    return out


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
    for EVERY input row (empty/null documents read all 0.0). Fractions are
    rounded to 6dp.

    All thirteen signals are document-local, so this runs as ONE
    mapInPandas kernel (guide §4.2 shape): the Python pass receives only
    (id, text), computes the exact LONG numerators/denominators per
    document (_doc_counters — token/line/paragraph Counter arithmetic at
    native dict speed), and the published ratios are produced by the same
    try_divide/round/least JVM expressions as before over those longs —
    so results are bit-identical to the former explode + groupBy(id,
    kind, unit) + groupBy(id) plan, which shuffled O(total units) rows
    (~90M exploded units for 50k docs at sf1.0) twice for per-document
    arithmetic. A pure-JVM in-row formulation (array_sort + F.aggregate
    run-length folds) was measured SLOWER than the explode plan (17.7s vs
    9.6s at sf1.0): higher-order functions evaluate interpreted per
    element. The kernel shape is scan -> map -> done: zero bytes
    shuffled, no joins, and partitioning cannot affect results.

    `respread`: round-robin the input across the cluster before the
    kernel — the same explicit respread the mention kernel uses: this
    stage is CPU-bound, so its parallelism must be keyed to cores, not to
    the source's file count (a single small parquet file otherwise
    serializes the whole corpus onto one task)."""
    if respread:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)

    id_type = df.schema[id_col].dataType.simpleString()
    num_cols = (
        ["doc_chars"]
        + [f"_{k}_{p}" for k in ("line", "para") for p in ("dn", "dd", "cn", "cd")]
        + [f"_top{n}" for n in top_ns]
        + [f"_dup{n}" for n in dup_ns]
    )
    schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{c} long" for c in num_cols]
    )
    tns, dns = tuple(top_ns), tuple(dup_ns)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                _doc_counters(None if t is None or t is pd.NA else t, tns, dns)
                for t in pdf[text_col]
            ]
            out = pd.DataFrame(rows, columns=num_cols, dtype="object")
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    nums = df.select(id_col, text_col).mapInPandas(kernel, schema=schema)

    def frac(num: Column, den: Column) -> Column:
        # least(…, 1.0): overlapping n-gram occurrences can cover more
        # characters than the document holds; the signal saturates at 1.
        # The null case (no qualifying units / zero denominator) must be
        # decided BEFORE least(): both Spark's and DuckDB's least() skip
        # NULL arguments, so least(NULL, 1.0) is 1.0, not NULL.
        ratio = F.try_divide(num, den)
        return F.when(ratio.isNull(), F.lit(0.0)).otherwise(
            F.least(F.round(ratio, 6), F.lit(1.0))
        )

    out = {
        "dup_line_frac": frac(F.col("_line_dn"), F.col("_line_dd")),
        "dup_line_char_frac": frac(F.col("_line_cn"), F.col("_line_cd")),
        "dup_para_frac": frac(F.col("_para_dn"), F.col("_para_dd")),
        "dup_para_char_frac": frac(F.col("_para_cn"), F.col("_para_cd")),
    }
    for n in top_ns:
        out[f"top_{n}gram_char_frac"] = frac(F.col(f"_top{n}"), F.col("doc_chars"))
    for n in dup_ns:
        out[f"dup_{n}gram_char_frac"] = frac(F.col(f"_dup{n}"), F.col("doc_chars"))
    return nums.select(F.col(id_col), *[v.alias(k) for k, v in out.items()])


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
