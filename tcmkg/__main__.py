"""CLI: the spark-submit entry point.

    spark-submit --py-files tcmkg.zip -m ...   # cluster
    python -m tcmkg build --input <transcripts.parquet> --output <dir>      # local

Subcommands:
    build     run the full KG pipeline: transcripts -> nodes/edges/metrics
    bench     one timed pipeline run (JSON line)
    fixture   write a synthetic transcript corpus (deterministic)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_build(args) -> None:
    from .pipeline.runner import KGPipeline
    from .session import get_spark

    spark = get_spark("tcmkg-build", cores=args.cores)
    transcripts = spark.read.parquet(args.input)
    pipe = KGPipeline(spark)
    ckpt = args.checkpoint or (args.output.rstrip("/") + "/_checkpoints")
    out = pipe.run(transcripts, checkpoint_dir=ckpt)
    out["nodes"].write.mode("overwrite").parquet(args.output.rstrip("/") + "/nodes")
    out["triples"].write.mode("overwrite").partitionBy("pred").parquet(
        args.output.rstrip("/") + "/edges"
    )
    out["metrics"].write.mode("overwrite").parquet(args.output.rstrip("/") + "/metrics")
    counts = {r["pred"]: r["count"] for r in out["triples"].groupBy("pred").count().collect()}
    print(json.dumps({"status": "ok", "edges_by_pred": counts,
                      "nodes": out["nodes"].count(), "output": args.output}))


def cmd_bench(args) -> None:
    from pyspark.sql import functions as F

    from .pipeline.runner import KGPipeline
    from .session import get_spark

    spark = get_spark("tcmkg-bench", cores=args.cores)
    transcripts = spark.read.parquet(args.input)
    pipe = KGPipeline(spark)
    n = transcripts.count()
    t0 = time.time()
    nt = pipe.triples(transcripts).select(F.count("*")).collect()[0][0]
    wall = time.time() - t0
    print(json.dumps({"turns": n, "triples": nt, "wall_sec": round(wall, 3),
                      "turns_per_sec": round(n / wall, 1)}))


def cmd_fixture(args) -> None:
    from .fixtures.transcripts import write_parquet

    write_parquet(args.output, args.conversations)
    print(json.dumps({"status": "ok", "output": args.output,
                      "conversations": args.conversations}))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tcmkg")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="transcripts -> KG (nodes/edges/metrics)")
    b.add_argument("--input", required=True, help="transcripts parquet path")
    b.add_argument("--output", required=True, help="output directory")
    b.add_argument("--checkpoint", default=None, help="stage checkpoint dir (resume)")
    b.add_argument("--cores", default=None)
    b.set_defaults(fn=cmd_build)

    be = sub.add_parser("bench", help="one timed pipeline run")
    be.add_argument("--input", required=True)
    be.add_argument("--cores", default=None)
    be.set_defaults(fn=cmd_bench)

    f = sub.add_parser("fixture", help="write synthetic transcript corpus")
    f.add_argument("--output", required=True)
    f.add_argument("--conversations", type=int, default=1000)
    f.set_defaults(fn=cmd_fixture)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
