"""prepare_corpus — the end-to-end training-data preparation pipeline:

    corpus → quality_filter [→ repetition_filter] → near_dedup
           [→ pii scrub] → deterministic split → packing

One call, the already-verified stages composed, full provenance out: the
packed corpus (split + shard + bin assignments), the per-stage removal
maps (with reasons), and unified metrics. This is the composition a data
team actually schedules nightly; each stage's scale story is documented
at its own operator (quality/repetition: scan + doc-keyed combinable
groupBys; near_dedup: capped candidate joins + CC; PII: pure map; split:
hash bucket map; packing: sharded windows — no global sort anywhere).

Stage order is deliberate: cheap single-scan quality rules first, then
the Gopher repetition pass (two doc-keyed shuffles) so structured spam
never reaches the dedup stage, near-dedup on the RAW surviving text,
and PII redaction after dedup (placeholders must not make two distinct
documents collide) but before token counting (a redacted span packs as
one placeholder token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dedup
from .pii import pii_redact, pii_signals
from .quality import quality_filter
from .repetition import repetition_filter
from .sampling import hash_mod, pack_greedy, split_by_hash


def prepare_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    fractions: dict[str, float],
    budget: int,
    shard_mod: int = 4,
    n_bands: int = 6,
    rows_per_band: int = 2,
    max_bucket: int = 256,
    threshold: float = 0.5,
    quality_kwargs: dict | None = None,
    repetition: bool | dict = False,
    pii: bool = False,
) -> dict[str, DataFrame]:
    """-> {"corpus", "holdout", "quality_removed", "repetition_removed",
    "dedup_removals", "metrics"}.

    `repetition`: False (default, stage skipped — repetition_removed is
    an empty frame), True (Gopher thresholds), or a {signal: threshold}
    dict. `pii`: when True, text is redacted with the default PII classes
    after dedup and before token counting, and the metrics gain
    pii_matches / pii_docs rows.

    corpus carries (split, shard, bin, n_tokens) — bins are packed WITHIN
    split (shard = '<split>|<md5-hash(id) mod shard_mod>' — a HASH shard,
    not `id % mod`, so string doc ids work and numeric-id shards stay
    balanced even when ids arrive striped), so a bin never mixes
    train and val documents. Documents removed by quality never reach the
    dedup stage (cheapest filter first). When `fractions` sum to < 1, the
    unassigned remainder (split NULL — split_by_hash's documented holdout
    contract) is EXCLUDED from packing and returned as `holdout` instead
    of silently landing in the packed corpus under a split-less shard."""
    q = quality_filter(df, id_col, text_col, **(quality_kwargs or {}))
    if repetition:
        rep = repetition_filter(
            q["kept"], id_col, text_col,
            thresholds=None if repetition is True else repetition,
        )
        rep_metrics = rep["metrics"].select(
            F.concat(F.lit("repetition_removed_"), "reason").alias("metric"),
            F.col("n").cast("long").alias("value"),
        )
    else:
        rep = {"kept": q["kept"],
               "removed": q["removed"].filter(F.lit(False))}
        rep_metrics = None
    nd = near_dedup(
        rep["kept"], id_col, text_col, n_bands=n_bands,
        rows_per_band=rows_per_band, max_bucket=max_bucket, threshold=threshold
    )
    deduped = nd["kept"]
    if pii:
        sig = pii_signals(deduped, text_col)
        pii_metrics = sig.agg(
            F.sum("n_pii").cast("long").alias("pii_matches"),
            F.sum((F.col("n_pii") > 0).cast("long")).cast("long").alias(
                "pii_docs"
            ),
        )
        deduped = pii_redact(deduped, text_col)
    else:
        pii_metrics = None
    base = deduped.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " ")).cast("long")
    )
    s = split_by_hash(base, id_col, fractions)
    holdout = s.filter(F.col("split").isNull()).drop("split")
    assigned = s.filter(F.col("split").isNotNull())
    shard = F.concat_ws("|", F.col("split"), hash_mod(id_col, shard_mod).cast("string"))
    corpus = pack_greedy(assigned, id_col, F.col("n_tokens"), budget=budget, shard_col=shard)
    metrics = (
        q["metrics"]
        .select(
            F.concat(F.lit("quality_removed_"), "reason").alias("metric"),
            F.col("n").cast("long").alias("value"),
        )
        .unionByName(nd["metrics"])
        .unionByName(
            holdout.agg(F.count("*").cast("long").alias("value")).select(
                F.lit("n_holdout").alias("metric"), "value"
            )
        )
    )
    if rep_metrics is not None:
        metrics = metrics.unionByName(rep_metrics)
    if pii_metrics is not None:
        metrics = metrics.unionByName(
            pii_metrics.selectExpr(
                "stack(2, 'pii_matches', pii_matches,"
                " 'pii_docs', pii_docs) AS (metric, value)"
            )
        )
    return {
        "corpus": corpus,
        "holdout": holdout,
        "quality_removed": q["removed"],
        "repetition_removed": rep["removed"],
        "dedup_removals": nd["removals"],
        "metrics": metrics,
    }
