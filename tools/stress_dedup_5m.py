"""Dedup stress at realistic scale/density: ~5M synthetic docs, <10% of
them near-duplicates, through the full near_dedup chain — the size where
the signature aggregation and CC shuffles actually matter (the 489k-doc
stress in stress_dedup.py is the worst-case-DENSITY probe; this one is the
volume probe the round-3 verdict asked for).

The corpus is synthesized entirely JVM-side (spark.range + hash-driven
token picks — no Python in the generate path, so generation doesn't bound
the measurement):
  - every doc is a sequence of 30..119 tokens drawn from a 200,000-token
    effective vocabulary by hash(seed, position) — tokens are the hash
    values themselves rendered as strings, so no vocab literal rides the
    plan. The vocabulary must be LARGE: a first cut with 2,000 tokens put
    99.99% of docs into capped hot buckets (min-hash over a tiny token
    universe concentrates onto a handful of minima, so every band bucket
    explodes) — realistic corpora have >=10^5 distinct tokens and diverse
    signatures, which is the regime this stress must exercise.
  - ~DUP_PCT% of docs reuse a PARENT doc's seed (parent strictly earlier,
    offset hash-picked in [1, 977]) and append one extra variant token —
    a near-duplicate with Jaccard ~ L/(L+2) >> threshold
  - everything is a pure function of the doc id: deterministic across
    runs and partitionings

Reported: wall, docs/sec, chain metrics (candidate pairs / verified /
removed / dropped buckets — the no-silent-caps check is n_dropped_buckets
== 0 at this density), and per-stage shuffle write: total plus the single
largest stage ("peak"), read from the Spark REST API (UI enabled for this
run only).

Run exclusively (NOISE.md). Usage:
    python tools/stress_dedup_5m.py            # 5M docs, 7% dup density
    TCMKG_STRESS_DOCS=1000000 python tools/stress_dedup_5m.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("TCMKG_STRESS_DOCS", "5000000"))
DUP_PCT = int(os.environ.get("TCMKG_STRESS_DUP_PCT", "7"))
VOCAB_N = 200_000


def synth_docs(spark, n_docs: int):
    """(doc_id bigint, text string): hash-derived token sequences with
    ~DUP_PCT% near-duplicates of earlier docs. Pure JVM expressions."""
    from pyspark.sql import functions as F

    def tok(seed_col, i):
        return F.concat(
            F.lit("t"), F.pmod(F.hash(seed_col, i), F.lit(VOCAB_N)).cast("string")
        )

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    is_dup = (F.pmod(F.hash(F.col("doc_id"), F.lit("dup")), F.lit(100)) < DUP_PCT) & (
        F.col("doc_id") >= 1000
    )
    parent = F.col("doc_id") - (
        F.pmod(F.hash(F.col("doc_id"), F.lit("par")), F.lit(977)) + 1
    )
    seed = F.when(is_dup, parent).otherwise(F.col("doc_id"))
    df = df.withColumn("_seed", seed)
    length = F.pmod(F.hash(F.col("_seed"), F.lit("len")), F.lit(90)) + 30
    tokens = F.transform(
        F.sequence(F.lit(1), length), lambda i: tok(F.col("_seed"), i)
    )
    base = F.array_join(tokens, " ")
    variant = tok(F.col("doc_id"), F.lit(-1))
    text = F.when(is_dup, F.concat(base, F.lit(" "), variant)).otherwise(base)
    return df.select("doc_id", text.alias("text"))


def shuffle_stats(ui_port: int = 4040) -> dict:
    """Total + single-largest-stage shuffle write bytes via the REST API."""
    try:
        base = f"http://localhost:{ui_port}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=30)
        )
        writes = [s.get("shuffleWriteBytes", 0) for s in stages]
        reads = [s.get("shuffleReadBytes", 0) for s in stages]
        return {
            "shuffle_write_total_mb": round(sum(writes) / 2**20, 1),
            "shuffle_write_peak_stage_mb": round(max(writes, default=0) / 2**20, 1),
            "shuffle_read_total_mb": round(sum(reads) / 2**20, 1),
            "n_stages": len(stages),
        }
    except Exception as e:  # REST off / port taken: stress still reports walls
        return {"shuffle_stats_error": str(e)}


def main() -> None:
    from tcmkg.ops.dedup import near_dedup
    from tcmkg.session import get_spark

    spark = get_spark(
        "tcmkg-stress-dedup-5m",
        cores=os.cpu_count() or 32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    t_gen = time.time()
    docs = synth_docs(spark, N_DOCS)
    # materialize the corpus once so the timed chain measures dedup, not
    # synthesis (at 100 TB the corpus is a parquet table, not an expression)
    docs = docs.localCheckpoint()
    n = docs.count()
    gen_s = round(time.time() - t_gen, 1)

    # b=6, r=2: the web-scale banding regime (the library default; see q_near_dedup). r=1
    # on this corpus produced 87M candidate pairs / 500k docs (recorded in
    # BENCH/BASELINE.md) — single-row bands collide with probability J,
    # which a realistic vocabulary turns quadratic.
    t0 = time.time()
    out = near_dedup(
        docs, "doc_id", "text", n_bands=6, rows_per_band=2,
        max_bucket=256, threshold=0.5,
    )
    n_removed = out["removals"].count()
    wall = time.time() - t0
    metrics = {r["metric"]: r["value"] for r in out["metrics"].collect()}
    out["unpersist"]()

    print(
        json.dumps(
            {
                "metric": "near_dedup_5m_wall",
                "value": round(wall, 1),
                "unit": "sec",
                "docs": n,
                "docs_per_sec": round(n / wall, 1),
                "dup_pct_planted": DUP_PCT,
                "n_removed": n_removed,
                "removed_frac": round(n_removed / n, 4),
                "chain_metrics": metrics,
                "gen_sec_untimed": gen_s,
                "cores": spark.sparkContext.defaultParallelism,
                **shuffle_stats(),
            }
        )
    )


if __name__ == "__main__":
    main()
