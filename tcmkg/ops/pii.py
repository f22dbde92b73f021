"""PII detection and redaction — the privacy scrub a training-data
pipeline runs before packing (C4/Dolma/BigScience shape: regex classes
for emails, IP addresses, phone-like numbers, and long ID-like digit
runs, each replaced by a typed placeholder).

Everything is JVM-side regexp (regexp_extract_all / regexp_replace over
whole-stage codegen) — a pure map with NO shuffle: at 100 TB this is one
scan, and the only aggregation is the optional corpus-level metrics
rollup (map-side combinable sums). Patterns are deliberately restricted
to the regex subset where Java's engine and RE2 (DuckDB's) agree —
character classes, bounded repetition, \\b word boundaries, optional
groups; no backreferences or lookaround — so the DuckDB oracle (contract
q_pii) replays byte-identical semantics.

Counting happens BEFORE redaction and each class is counted
independently on the raw text (a digit run inside an unredacted URL
counts as a digit run — documented, hash-pinned). Redaction applies the
classes in fixed order (email, ipv4, phone, idnum); placeholders contain
no digits or '@', so later patterns can never match inside an earlier
replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed application order = redaction precedence
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"(\+\d{1,3}[- ])?\d{3,4}[- ]\d{3,4}[- ]\d{4}\b",
    "idnum": r"\b\d{9,}\b",
}
PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
    "idnum": "<NUMBER>",
}


def pii_signals(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """-> df + one `n_<class>` long column per pattern (independent counts
    over the RAW text) + `n_pii` total."""
    patterns = PII_PATTERNS if patterns is None else patterns
    counts = {
        f"n_{name}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in patterns.items()
    }
    out = df.withColumns(counts)
    total = None
    for name in counts:
        total = F.col(name) if total is None else total + F.col(name)
    return out.withColumn("n_pii", total.cast("long"))


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
    placeholders: dict[str, str] | None = None,
) -> DataFrame:
    """-> df with `out_col` (default: text_col replaced in place): every
    PII match replaced by its class placeholder, classes applied in
    PII_PATTERNS order."""
    patterns = PII_PATTERNS if patterns is None else patterns
    placeholders = PII_PLACEHOLDERS if placeholders is None else placeholders
    red = F.col(text_col)
    for name, pat in patterns.items():
        red = F.regexp_replace(red, pat, placeholders[name])
    return df.withColumn(out_col or text_col, red)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    placeholders: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """-> {"scrubbed", "metrics"}: scrubbed = df with text redacted and
    per-class counts attached; metrics = one corpus-level row of per-class
    totals + docs touched (map-side-combinable sums — the only shuffle)."""
    sig = pii_signals(df, text_col, patterns)
    scrubbed = pii_redact(sig, text_col, None, patterns, placeholders)
    # exact names derived from the patterns — NOT a startswith("n_") scan,
    # which would swallow unrelated pre-existing columns (e.g. n_chars)
    count_cols = [
        f"n_{name}" for name in (patterns or PII_PATTERNS)
    ] + ["n_pii"]
    metrics = scrubbed.agg(
        *[F.sum(c).cast("long").alias(c) for c in count_cols],
        F.sum((F.col("n_pii") > 0).cast("long")).cast("long").alias(
            "docs_with_pii"
        ),
        F.count("*").cast("long").alias("docs"),
    )
    return {"scrubbed": scrubbed, "metrics": metrics}
