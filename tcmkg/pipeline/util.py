"""Engine utilities: scalable deterministic ranking, salted aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_rank(df: DataFrame, order_col: str, rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Deterministic 0-based dense rank by `order_col` WITHOUT a global
    single-partition window.

    The naive `row_number().over(Window.orderBy(c))` collapses the whole
    table into one task — fine for dimension tables, fatal at fact scale.
    This is the two-pass formulation: range-partition by the order column,
    count rows per partition, broadcast the tiny offset table, then add a
    per-partition row_number. Used for surrogate-ID assignment (SURVEY.md
    §1.3: reference IDs are row indices after merge, e.g.
    processed_code/extract_herb.py:447-449 — determinism is load-bearing).

    `order_col` values must be unique (they are: component representatives).
    """
    if num_partitions is None:
        num_partitions = max(1, df.sparkSession.sparkContext.defaultParallelism)
    parts = df.repartitionByRange(num_partitions, F.col(order_col))
    # pin the partitioning: range sampling must not re-run differently
    # between the offset action and the final query
    parts = parts.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    counts = (
        parts.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    offs = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        parts.withColumn(
            rank_col,
            (F.row_number().over(w) - 1 + offs[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )


def salted_group_count(df: DataFrame, group_cols: list[str], out_col: str = "count",
                       salt_buckets: int = 32) -> DataFrame:
    """Two-phase (salted) count per group — skew-proof aggregation.

    Plain `groupBy(k).count()` already does map-side partial aggregation in
    Spark, but aggregations whose partial state is large (collect_list,
    exact distinct) concentrate hot keys on one reducer. The salt pattern:
    aggregate per (key, salt) first, then combine per key — the hot key's
    work spreads over `salt_buckets` reducers. Used where the 甘草-scale
    hot-entity skew named in BASELINE.json would otherwise serialize.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*group_cols).agg(F.sum("_pc").cast("long").alias(out_col))


def salted_distinct_count(df: DataFrame, group_cols: list[str], distinct_col: str,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per group without a skewed single-reducer
    expand: dedup (group, value) pairs first (map-side combinable), then a
    plain count — the formulation used for the degree cap
    (reference: merge_tcm_symptom.py:289-294)."""
    return (
        df.select(*group_cols, distinct_col)
        .dropDuplicates([*group_cols, distinct_col])
        .groupBy(*group_cols)
        .agg(F.count("*").cast("long").alias(out_col))
    )
