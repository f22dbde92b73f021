"""Round-5 session-5 operators: PageRank (checkpointed iterative join) and
benchmark decontamination (eval n-gram broadcast probe) — each differentialed
against an independent pure-Python reference."""

import math

from pyspark.sql import functions as F


def _py_pagerank(edges, d=0.85, iters=6):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: 1.0 for n in nodes}
    for _ in range(iters):
        s = {n: 0.0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] / outdeg[u]
        r = {n: (1 - d) + d * s[n] for n in nodes}
    return r


def test_pagerank_vs_pure_python(spark):
    from tcmkg.pipeline.pagerank import pagerank

    # a ring with a chord, a hub, a dangling sink, and a parallel edge
    # (must count once): every structural case in one small graph
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("c", "sink"),
        ("a", "b"),  # parallel duplicate
    ]
    df = spark.createDataFrame(edges, ["subj", "obj"])
    got = {
        row["node"]: row["pagerank"]
        for row in pagerank(df, iters=6, round_to=None).collect()
    }
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for n in want:
        assert math.isclose(got[n], want[n], rel_tol=1e-9), (n, got[n], want[n])
    # dangling sink keeps its base mass plus inflow; hub has no inflow
    assert math.isclose(got["hub"], 0.15, rel_tol=1e-9)


def test_pagerank_deterministic_across_parallelism(spark):
    from tcmkg.pipeline.pagerank import pagerank

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(200)]
    df = spark.createDataFrame(edges, ["subj", "obj"])
    a = sorted(map(tuple, pagerank(df).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(13)).collect()))
    assert a == b


def _py_ngrams(text, n):
    toks = text.strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_vs_pure_python(spark):
    from tcmkg.ops.decontaminate import decontaminate

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),          # leaks eval 4-gram
        (1, "one two three four five six seven"),            # clean
        (2, "beta gamma delta epsilon zeta eta theta"),      # leaks (shifted)
        (3, "short doc"),                                    # < n tokens
        (4, "alpha beta gamma delta epsilon zeta"),          # exact dup of 0
    ]
    ev = [(100, "xx alpha beta gamma delta epsilon yy"),
          (101, "beta gamma delta epsilon zeta")]
    n = 4
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    edf = spark.createDataFrame(ev, ["doc_id", "text"])
    out = decontaminate(ddf, edf, n=n, min_hits=1)

    ev_ngrams = set().union(*[_py_ngrams(t, n) for _, t in ev])
    want_hits = {
        i: len(_py_ngrams(t, n) & ev_ngrams)
        for i, t in docs
        if _py_ngrams(t, n) & ev_ngrams
    }
    got_flagged = {r["doc_id"]: r["n_hits"] for r in out["flagged"].collect()}
    assert got_flagged == want_hits and 1 in {r["doc_id"] for r in out["kept"].collect()}
    kept_ids = {r["doc_id"] for r in out["kept"].collect()}
    assert kept_ids == {i for i, _ in docs} - set(want_hits)
    m = {r["metric"]: r["value"] for r in out["metrics"].collect()}
    assert m == {"docs_flagged": len(want_hits), "docs_in": len(docs)}


def test_decontaminate_broadcasts_eval_side(spark):
    """The plan contract: the eval n-gram set reaches the corpus probe as a
    BroadcastExchange — no hash-shuffle of the O(corpus) exploded side
    before the semi-probe."""
    from tcmkg.ops.decontaminate import contamination_hits

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.lit(f"w{j}") for j in range(12)]).alias("text"),
    )
    h = contamination_hits(docs, docs.limit(5), n=8)
    plan = h._sc._jvm.PythonSQLUtils.explainString(
        h._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" in plan
