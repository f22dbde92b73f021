"""Training-data sampling & packing operators.

  split_by_hash   deterministic train/val/test split: bucket = md5(key) mod
                  DENOM compared against cumulative fraction cutoffs. Unlike
                  rand()-based splits this is reproducible across runs,
                  engines, partitionings, and re-executions of failed tasks
                  (a rand() split silently resamples on task retry), and a
                  document keeps its split when the corpus grows — the
                  properties a 100 TB training pipeline actually needs.
  pack_greedy     sequence packing for LLM training: assign docs to
                  fixed-token-budget bins by prefix-sum chunking over a
                  deterministic order (bin = floor(cumsum_before / budget)).
                  One window over the sort key — no driver loop, no Python.
                  This is the streaming-chunk heuristic, not bin-packing
                  first-fit: a bin may overflow by at most one document,
                  which is the standard trade for a shuffle-free packing at
                  corpus scale (exact first-fit is inherently sequential).

Both are pure column algebra with exact DuckDB oracles (contract queries
q_split / q_pack_bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPLIT_DENOM = 10_000


def split_by_hash(
    df: DataFrame, key_col: str, fractions: dict[str, float], salt: str = ""
) -> DataFrame:
    """Adds a `split` column. fractions: ordered {name: fraction} summing
    to <= 1; the remainder (if any) gets split = NULL. `salt` decorrelates
    independent splits over the same keys."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("long") % SPLIT_DENOM
    )
    expr = F.lit(None).cast("string")
    cum = 0.0
    cutoffs = []
    for name, frac in fractions.items():
        cum += frac
        cutoffs.append((name, int(round(cum * SPLIT_DENOM))))
    # wrap from the largest cutoff inward so the outermost (first-checked)
    # condition is the smallest cutoff — bucket < cut picks the right band
    for name, cut in reversed(cutoffs):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def pack_greedy(
    df: DataFrame, id_col: str, size_col, budget: int, order_col: str | None = None
) -> DataFrame:
    """-> df + `bin` column: prefix-sum chunking into token-budget bins.

    Deterministic order = `order_col` (default: id_col). The single window
    is the op's only shuffle; at corpus scale, pre-partition by a shard key
    and pack within shards (pass a composite order) so the sort is
    range-partition-local rather than global."""
    order = order_col or id_col
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn("bin", F.floor(cum_before / budget).cast("long"))
