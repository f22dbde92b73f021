"""Document quality filtering — the composed corpus-hygiene operator a
training-data pipeline runs before dedup/packing.

Each rule is a native column expression (no Python): length floor,
punctuation-ratio ceiling, stopword-ratio floor (the language-ID heuristic),
and a repetition guard (distinct-token ratio). `quality_flags` emits every
rule verdict plus a deterministic `reason` (the FIRST failing rule in fixed
order — so the removal provenance is stable and oracle-checkable);
`quality_filter` splits the corpus into kept/removed with per-reason
metrics. All rules are embarrassingly parallel maps: at 100 TB this is a
single scan, no shuffle except the tiny metrics aggregation.

The DEFAULTS are CJK-aware (the engine's flagship corpus is Chinese):
punctuation is the Unicode \\p{P}+\\p{S} classes (CJK ideographs are
letters, not "punctuation" as a bare [^A-Za-z0-9 ] class would count
them), and the stopword rule pools whitespace-token stopwords with
single-character CJK function-word occurrences over a token+CJK-char
denominator — so an unsegmented Chinese document (one giant whitespace
"token") is judged on its function-character density instead of being
unconditionally flagged `no_stopwords` by an English-only list. For pure
Latin text both defaults reduce to the classic rules. Every knob
(character class, stopword lists, thresholds) is a parameter, plumbed
through the `tcmkg prepare` CLI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ["the", "a", "of", "and", "to"]
# highest-frequency zh function characters (public frequency lists); one
# occurrence per character counts toward the stopword ratio for CJK text
DEFAULT_CJK_STOPCHARS = "的了是在不有和人这一与为也就都而"
# Unicode punctuation + symbols; NOT the ASCII complement (which counts
# every CJK char as punctuation and flags whole zh corpora as too_much_punct)
DEFAULT_PUNCT_CLASS = r"[\p{P}\p{S}]"
_CJK_CLASS = "[一-鿿]"

# fixed rule order = removal-reason precedence
RULES = ("too_short", "too_much_punct", "no_stopwords", "too_repetitive")


def quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: list[str] | None = None,
    min_chars: int = 20,
    max_punct_ratio: float = 0.3,
    min_stop_ratio: float = 0.01,
    min_distinct_ratio: float = 0.3,
    punct_class: str = DEFAULT_PUNCT_CLASS,
    cjk_stopchars: str = DEFAULT_CJK_STOPCHARS,
) -> DataFrame:
    """-> df + rule columns + `keep` boolean + `reason` (NULL when kept).

    `punct_class` is the regex character class counted as punctuation;
    `cjk_stopchars` ('' to disable) are single CJK characters whose
    occurrences count as stopwords, with the CJK character count joining
    the whitespace-token count in the ratio denominator."""
    stopwords = DEFAULT_STOPWORDS if stopwords is None else stopwords
    text = F.col(text_col)
    toks = F.split(text, " ")
    n_tok = F.size(toks)
    stops = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    # F.regexp_extract_all over F.col, not an interpolated F.expr string:
    # a non-identifier column name ('body-text') would otherwise parse as
    # SQL arithmetic
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(punct_class), F.lit(0))
    )
    if cjk_stopchars:
        n_cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit(_CJK_CLASS), F.lit(0)))
        n_stop_cjk = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[" + cjk_stopchars + "]"), F.lit(0))
        )
    else:
        n_cjk = F.lit(0)
        n_stop_cjk = F.lit(0)

    too_short = F.coalesce(F.length(text) < min_chars, F.lit(True))
    punct_ratio = F.round(F.try_divide(n_punct, F.length(text)), 6)
    too_punct = F.coalesce(punct_ratio > max_punct_ratio, F.lit(True))
    stop_ratio = F.round(F.try_divide(n_stop + n_stop_cjk, n_tok + n_cjk), 6)
    no_stop = F.coalesce(stop_ratio < min_stop_ratio, F.lit(True))
    distinct_ratio = F.round(F.try_divide(F.size(F.array_distinct(toks)), n_tok), 6)
    too_rep = F.coalesce(distinct_ratio < min_distinct_ratio, F.lit(True))

    flagged = df.withColumns(
        {
            "too_short": too_short,
            "too_much_punct": too_punct,
            "no_stopwords": no_stop,
            "too_repetitive": too_rep,
        }
    )
    reason = F.lit(None).cast("string")
    for r in reversed(RULES):  # wrap inward: first rule in RULES wins
        reason = F.when(F.col(r), F.lit(r)).otherwise(reason)
    return flagged.withColumn("reason", reason).withColumn(
        "keep", F.col("reason").isNull()
    )


def quality_filter(
    df: DataFrame, id_col: str, text_col: str, **thresholds
) -> dict[str, DataFrame]:
    """-> {"kept", "removed", "metrics"}: removed carries the reason;
    metrics = per-reason counts (no silent drops)."""
    flags = quality_flags(df, id_col, text_col, **thresholds)
    kept = flags.filter(F.col("keep")).select(*df.columns)
    removed = flags.filter(~F.col("keep")).select(id_col, "reason")
    metrics = removed.groupBy("reason").agg(
        F.count("*").cast("long").alias("n")
    )
    return {"kept": kept, "removed": removed, "metrics": metrics}
