"""Run-order confound probe for the kg_triples_corpus bench leg.

BENCH_r03 appended q_near_dedup (6.7s, heavy Python-worker + CC churn) to
the bench order; in round-robin rounds 2..N the corpus leg therefore runs
in a post-near-dedup JVM (GC pressure, evicted code/page cache) that the
r02 bench never saw. This probe measures that contamination directly, in
ONE session: time the corpus leg K times, run q_near_dedup once, time the
corpus leg K times again. If post/pre >> 1 the bench ORDER, not the
engine, explains part of a cross-round corpus delta.

Usage: python tools/order_confound.py [repo] [K]
Run exclusively (NOISE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

repo = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".")
K = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, repo)


def main() -> None:
    from tcmkg.contract.generic import q_near_dedup
    from tcmkg.contract.kg import _pipeline
    from tcmkg.session import get_spark

    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "data", "bench", "transcripts_v2_60000.parquet",
    )
    if not os.path.exists(corpus_path):
        sys.exit(
            "order_confound.py needs the HISTORICAL v2 bench corpus at\n"
            f"  {os.path.abspath(corpus_path)}\n"
            "(the round-3 fixture this probe's r02-vs-r03 comparison was "
            "adjudicated on). bench.py now generates v3 fixtures only; the "
            "v2 content is not reproducible from current code. Restore the "
            "file from a round-3/4 checkout or skip this probe."
        )
    print(f"loadavg={os.getloadavg()} repo={repo}", file=sys.stderr)
    spark = get_spark("order-confound", cores=32)
    pipe = _pipeline(spark)
    corpus = spark.read.parquet(os.path.abspath(corpus_path))
    pipe.triples(corpus.limit(2000)).count()  # untimed warmup

    def leg() -> float:
        t0 = time.time()
        pipe.triples(corpus).count()
        return round(time.time() - t0, 3)

    pre = [leg() for _ in range(K)]
    t0 = time.time()
    q_near_dedup(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
    nd_s = round(time.time() - t0, 3)
    post = [leg() for _ in range(K)]

    print(json.dumps({
        "metric": "order_confound_kg_triples_corpus",
        "pre": pre, "post": post, "near_dedup_sec": nd_s,
        "pre_min": min(pre), "post_min": min(post),
        "post_over_pre_min": round(min(post) / min(pre), 3),
        "post_over_pre_med": round(
            statistics.median(post) / statistics.median(pre), 3
        ),
    }))


if __name__ == "__main__":
    main()
