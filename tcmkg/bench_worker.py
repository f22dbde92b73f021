"""Subprocess bench worker: run the KG pipeline at a given parallelism on a
given transcript corpus, print one JSON line with wall time, triple count,
and an order-insensitive content checksum (determinism evidence across
parallelism levels — north-rule scaling requirement).

Usage: python -m tcmkg.bench_worker --cores 8 --corpus /path/tr.parquet
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from .session import get_spark

    spark = get_spark(f"bench-{args.cores}", cores=args.cores)
    from .pipeline.runner import KGPipeline

    pipe = KGPipeline(spark)
    transcripts = spark.read.parquet(args.corpus)
    n_turns = transcripts.count()  # warms the page cache / file listing

    best = None
    for _ in range(args.runs):
        t0 = time.time()
        agg = (
            pipe.triples(transcripts)
            .select(
                F.count("*").alias("n"),
                F.sum(F.crc32(F.concat_ws("|", "subj", "pred", "obj"))).alias("chk"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best[0]:
            best = (wall, agg["n"], agg["chk"])

    wall, n_triples, chk = best
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_turns": n_turns,
                "n_triples": n_triples,
                "checksum": int(chk),
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
