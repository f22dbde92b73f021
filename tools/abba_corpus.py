"""Interleaved ABBA adjudication of the kg_triples_corpus bench leg.

BENCH_r03 recorded the corpus leg at 4.05s vs BENCH_r02's 3.17s (+28%,
outside r03's recorded 1.09 spread) — but r02 recorded no noise bar and the
two numbers come from different sessions on a host with ~2x ambient wall
variance (NOISE.md). Per NOISE.md, a cross-session delta is adjudicated by
interleaving the two CODE VERSIONS within one time window on the SAME
cached corpus:

    A = a git worktree pinned at the BENCH_r02 code SHA
    B = current HEAD

Each trial is a fresh subprocess (fresh JVM — exactly what a bench round
is), pinned to the same corpus parquet; trials alternate A B B A A B ...
so ambient-load drift hits both sides symmetrically. Reported: per-trial
best-of-rounds, per-side min/median, and the B/A ratio to compare against
the recorded spreads.

Usage:
    python tools/abba_corpus.py <repoA> <repoB> [trials_per_side]
e.g.
    git worktree add data/wt_r02 <r02-sha>
    python tools/abba_corpus.py data/wt_r02 . 3

Run EXCLUSIVELY (loadavg < 1; no concurrent pytest) per NOISE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

WORKER = r"""
import sys, time, json, os
repo, corpus_path, n_rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)
from tcmkg.session import get_spark
# default local[8], NOT local[32]: on this 32-core box an ambient-load
# burst (loadavg spikes to 15+ with nothing of ours running) steals cores
# from a 32-wide job directly, but a 8-wide job keeps its full share —
# wall times are far more stable, and a code-version A/B only needs EQUAL
# conditions, not maximal parallelism.
spark = get_spark("abba-corpus", cores=int(os.environ.get("TCMKG_ABBA_CORES", "8")))
from tcmkg.contract.kg import _pipeline
pipe = _pipeline(spark)
corpus = spark.read.parquet(corpus_path)
pipe.triples(corpus.limit(2000)).count()  # untimed warmup
times = []
for _ in range(n_rounds):
    t0 = time.time()
    n = pipe.triples(corpus).count()
    times.append(round(time.time() - t0, 3))
print("ABBA_RESULT " + json.dumps({"times": times, "triples": n}))
spark.stop()
"""


def _trial(repo: str, corpus: str, rounds: int) -> list[float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, os.path.abspath(repo), corpus, str(rounds)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABBA_RESULT "):
            return json.loads(line[len("ABBA_RESULT "):])["times"]
    raise RuntimeError(f"trial failed for {repo}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    repo_a = sys.argv[1] if len(sys.argv) > 1 else "data/wt_r02"
    repo_b = sys.argv[2] if len(sys.argv) > 2 else "."
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rounds = int(os.environ.get("TCMKG_ABBA_ROUNDS", "2"))
    corpus = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "data", "bench", "transcripts_v2_60000.parquet")
    )
    print(f"loadavg={os.getloadavg()}  corpus={corpus}", file=sys.stderr)

    # A B B A A B B A ... — palindromic blocks cancel linear drift
    order: list[str] = []
    for i in range(trials):
        order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
    mins: dict[str, list[float]] = {"A": [], "B": []}
    alltimes: dict[str, list[list[float]]] = {"A": [], "B": []}
    for side in order:
        repo = repo_a if side == "A" else repo_b
        t = _trial(repo, corpus, rounds)
        mins[side].append(min(t))
        alltimes[side].append(t)
        print(f"{side} {repo}: {t}", file=sys.stderr)

    a_min, b_min = min(mins["A"]), min(mins["B"])
    a_med, b_med = statistics.median(mins["A"]), statistics.median(mins["B"])
    print(json.dumps({
        "metric": "abba_kg_triples_corpus",
        "repo_a": repo_a, "repo_b": repo_b,
        "trials": alltimes,
        "per_trial_min": mins,
        "a_min": round(a_min, 3), "b_min": round(b_min, 3),
        "a_med": round(a_med, 3), "b_med": round(b_med, 3),
        "b_over_a_min": round(b_min / a_min, 3),
        "b_over_a_med": round(b_med / a_med, 3),
        "spread_a": round(max(mins["A"]) / min(mins["A"]), 2),
        "spread_b": round(max(mins["B"]) / min(mins["B"]), 2),
    }))


if __name__ == "__main__":
    main()
