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


def hash_mod(key_col: str, mod: int, salt: str = ""):
    """Column: md5(key||salt) first-8-hex as an integer in [0, mod).
    Works for ANY key type (string or numeric — the key is cast to string
    before hashing), unlike a bare `key % mod`, which under ANSI mode
    aborts on string ids. Deterministic across runs/engines/partitionings,
    and exactly replayable in DuckDB as
    ('0x' || substr(md5(key::VARCHAR || salt), 1, 8))::BIGINT % mod."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def _hash_bucket(key_col: str, salt: str):
    """Column: md5(key||salt) first-8-hex as an integer bucket in
    [0, SPLIT_DENOM). ONE definition shared by split_by_hash and
    stratified_sample_by_hash — the two must stay bit-identical for their
    decorrelation/reproducibility claims and the DuckDB oracles."""
    return hash_mod(key_col, SPLIT_DENOM, salt)


def split_by_hash(
    df: DataFrame, key_col: str, fractions: dict[str, float], salt: str = ""
) -> DataFrame:
    """Adds a `split` column. fractions: ordered {name: fraction} summing
    to <= 1; the remainder (if any) gets split = NULL. `salt` decorrelates
    independent splits over the same keys."""
    bucket = _hash_bucket(key_col, salt)
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


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5 bucket
    falls under its stratum's fraction cutoff. Same reproducibility
    properties as split_by_hash (stable across runs, engines,
    partitionings, task retries; a document keeps its verdict as the corpus
    grows) — which df.sampleBy (rand-based) lacks. The stratum→fraction map
    compiles to a CASE expression: a single scan, no join, no shuffle."""
    bucket = _hash_bucket(key_col, salt)
    cutoff = F.lit(int(round(default_fraction * SPLIT_DENOM)))
    for stratum, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(frac * SPLIT_DENOM)))
        ).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def pack_greedy(
    df: DataFrame,
    id_col: str,
    size_col,
    budget: int,
    order_col: str | None = None,
    shard_col=None,
) -> DataFrame:
    """-> df + (`shard`,) `bin` columns: prefix-sum chunking into
    token-budget bins, deterministic order = `order_col` (default id_col).

    ALWAYS pass `shard_col` at corpus scale: packing is order-dependent, so
    an unsharded window is a single-partition global sort (fine only for
    verification-sized inputs). With a shard key the window is
    PARTITION BY shard — each shard packs independently and in parallel,
    bins are (shard, bin) composites, and at most one under-filled bin per
    shard is the cost. A hash of any stable id makes a fine shard key."""
    order = order_col or id_col
    if shard_col is None:
        import warnings

        warnings.warn(
            "pack_greedy without shard_col builds a SINGLE-PARTITION global-"
            "sort window — verification-sized inputs only. Pass shard_col "
            "(hash of any stable id) to pack shards independently in "
            "parallel at corpus scale.",
            stacklevel=2,
        )
        w = Window.orderBy(order)
    else:
        df = df.withColumn("shard", shard_col)
        w = Window.partitionBy("shard").orderBy(order)
    cum_before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return df.withColumn("bin", F.floor(cum_before / budget).cast("long"))


def materialize_sequences(
    packed: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "<|eos|>",
    bin_cols: tuple[str, ...] = ("shard", "bin"),
) -> DataFrame:
    """Turn pack_greedy's bin assignments into the actual training
    sequences: one row per bin with the member documents joined in id
    order by `sep` — the concat-with-EOS step a pretraining loader
    consumes. -> (*bin_cols, seq_text, n_docs, n_tokens<when present>).

    Deterministic without a sort shuffle: members collect into an array
    of (id, text) structs per bin (map-side combinable collect_list),
    array_sort orders WITHIN the row by id, then one array_join — so the
    only exchange is the groupBy on the bin key, whose fan-in is bounded
    by the token budget (a bin holds ~budget tokens no matter how big
    the corpus is; hot keys cannot exist by construction)."""
    aggs = [
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("i"),
                                            F.col(text_col).alias("t")))
                ),
                lambda s: s["t"],
            ),
            sep,
        ).alias("seq_text"),
        F.count("*").cast("long").alias("n_docs"),
    ]
    if "n_tokens" in packed.columns:
        aggs.append(F.sum("n_tokens").cast("long").alias("n_tokens"))
    return packed.groupBy(*bin_cols).agg(*aggs)
