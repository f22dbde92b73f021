"""Data-scale stress: flagship KGPipeline.triples at 1x and 4x the bench
corpus, optionally sweeping the kernel re-spread multiplier.

The 4x corpus is a conv_id-remapped replication (conversations stay whole,
so carry-forward window semantics are unchanged; replica r prefixes conv_id
with `r<r>_`). Interleaves configurations in ONE session so A/B deltas are
not cross-session noise (this box shows ~2x run-to-run wall variance).

Usage: python tools/stress_4x.py [multiplier ...]   # default: 2 4 8
Prints one JSON line per (corpus, multiplier) cell plus a summary.
Run exclusively (no concurrent pytest/bench) — see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("TCMKG_STRESS_RUNS", "2"))


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [2, 4, 8]

    from bench import bench_corpus_path
    from tcmkg.session import get_spark

    spark = get_spark("tcmkg-stress", cores=os.cpu_count() or 32)
    from pyspark.sql import functions as F

    from tcmkg.contract.kg import _pipeline

    pipe = _pipeline(spark)
    base = spark.read.parquet(bench_corpus_path())
    rep = base
    for r in range(1, 4):
        rep = rep.unionByName(
            base.withColumn("conv_id", F.concat(F.lit(f"r{r}_"), F.col("conv_id")))
        )
    corpora = {"1x": base, "4x": rep}
    n_turns = {k: df.count() for k, df in corpora.items()}
    par = spark.sparkContext.defaultParallelism

    pipe.triples(base.limit(2000)).count()  # warmup

    cells: dict[tuple[str, int], float] = {}
    for _ in range(RUNS):
        for name, df in corpora.items():
            for mult in mults:
                from tcmkg.pipeline.triples import assemble_triples

                t0 = time.time()
                # same persist discipline as KGPipeline.triples: the Arrow
                # kernel pass runs once, not once per predicate branch
                m = pipe.mentions(df, kernel_partitions=par * mult).persist()
                n = assemble_triples(m).count()
                dt = time.time() - t0
                m.unpersist()
                key = (name, mult)
                cells[key] = min(cells.get(key, float("inf")), dt)
                print(json.dumps({
                    "corpus": name, "mult": mult, "wall": round(dt, 2),
                    "turns": n_turns[name], "triples": n,
                    "turns_per_sec": round(n_turns[name] / dt, 1),
                }), flush=True)

    summary = {
        f"{name}_m{mult}": {
            "best_wall": round(w, 2),
            "turns_per_sec": round(n_turns[name] / w, 1),
        }
        for (name, mult), w in sorted(cells.items())
    }
    for mult in mults:
        if ("1x", mult) in cells and ("4x", mult) in cells:
            ratio = (cells[("4x", mult)] / n_turns["4x"]) / (
                cells[("1x", mult)] / n_turns["1x"]
            )
            summary[f"per_turn_cost_4x_over_1x_m{mult}"] = round(ratio, 3)
    print(json.dumps({"summary": summary, "agg": f"min_of_{RUNS}", "cores": par}))


if __name__ == "__main__":
    main()
