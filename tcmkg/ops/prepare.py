"""prepare_corpus — the end-to-end training-data preparation pipeline:

    corpus → quality_filter → near_dedup → deterministic split → packing

One call, four already-verified stages, full provenance out: the packed
corpus (split + shard + bin assignments), the quality-removal map (with
reasons), the near-dup removal map (with survivor + via), and unified
metrics. This is the composition a data team actually schedules nightly;
each stage's scale story is documented at its own operator (quality: one
scan; near_dedup: capped candidate joins + CC; split: hash bucket map;
packing: sharded windows — no global sort anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dedup
from .quality import quality_filter
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
) -> dict[str, DataFrame]:
    """-> {"corpus", "holdout", "quality_removed", "dedup_removals",
    "metrics"}.

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
    nd = near_dedup(
        q["kept"], id_col, text_col, n_bands=n_bands,
        rows_per_band=rows_per_band, max_bucket=max_bucket, threshold=threshold
    )
    base = nd["kept"].withColumn(
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
    return {
        "corpus": corpus,
        "holdout": holdout,
        "quality_removed": q["removed"],
        "dedup_removals": nd["removals"],
        "metrics": metrics,
    }
