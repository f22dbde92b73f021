"""Approximate nearest neighbors over an embedding column.

Baseline: brute-force cosine top-k (contract query q_ann_topk — the exact
answer an index must approximate). Scale path: IVF (inverted-file) —
k-means-cluster the corpus, search only the `nprobe` nearest cells:

    build_ivf    deterministic Lloyd's k-means as DataFrame ops (assign =
                 broadcast-join argmin over centroids; update = groupBy avg)
    ivf_search   query -> nprobe nearest centroids -> brute force within
                 those cells only (a broadcast-join + window top-k)

With nprobe == n_centroids IVF degenerates to exact brute force (tested);
recall at small nprobe is the usual IVF trade (tested >= threshold on the
driver's embeddings table).

All vectors are cast to double and L2-handling is explicit; everything is
native Spark SQL (F.zip_with/F.aggregate for the dot products) — no Python
in the search path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def build_ivf(
    emb: DataFrame, id_col: str, vec_col: str, n_centroids: int = 8, n_iter: int = 5
) -> tuple[DataFrame, DataFrame]:
    """-> (centroids(cid, cvec), assignments(id, cid)).

    Deterministic init: centroids = vectors of the n smallest ids. Each
    Lloyd round is one broadcast join (argmin over centroids via a window)
    plus one groupBy-avg (posexplode/collect by position)."""
    base = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    base = base.localCheckpoint()  # iterated below; truncate lineage once
    seed_rows = base.orderBy("id").limit(n_centroids).collect()  # tiny: k vectors
    cent = emb.sparkSession.createDataFrame(
        [(i, r["v"]) for i, r in enumerate(seed_rows)], "cid int, cvec array<double>"
    )
    for _ in range(n_iter):
        joined = base.crossJoin(F.broadcast(cent)).withColumn(
            "dist", -_dot(F.col("v"), F.col("cvec")) / (_norm(F.col("v")) * _norm(F.col("cvec")))
        )
        w = Window.partitionBy("id").orderBy(F.col("dist"), F.col("cid"))
        assign = (
            joined.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("id", "cid", "v")
        )
        cent = (
            assign.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("cvec"))
        )
        cent = cent.localCheckpoint()
    joined = base.crossJoin(F.broadcast(cent)).withColumn(
        "dist", -_dot(F.col("v"), F.col("cvec")) / (_norm(F.col("v")) * _norm(F.col("cvec")))
    )
    w = Window.partitionBy("id").orderBy(F.col("dist"), F.col("cid"))
    assignments = (
        joined.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).select("id", "cid")
    )
    return cent, assignments


def ivf_search(
    queries: DataFrame,
    emb: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 2,
    topk: int = 3,
) -> DataFrame:
    """-> (qid, rk, neighbor): cosine top-k searching only nprobe cells.

    queries: (qid, qv). The candidate join is cell-pruned: each query pairs
    only with vectors assigned to its nprobe nearest centroids — at 10^12
    vectors that is the difference between scanning the corpus per query
    and scanning corpus/n_centroids*nprobe."""
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", -_dot(F.col("qv"), F.col("cvec")) / (_norm(F.col("qv")) * _norm(F.col("cvec")))
    )
    wq = Window.partitionBy("qid").orderBy(F.col("dist"), F.col("cid"))
    probe = (
        qc.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("qid", "qv", "cid")
    )
    base = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    cand = probe.join(assignments.withColumnRenamed("id", "nid"), "cid")
    cand = cand.join(base, "nid")
    scored = cand.withColumn(
        "cos", _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("qid", F.col("rk").cast("long").alias("rk"), F.col("nid").alias("neighbor"))
    )
