"""Approximate nearest neighbors over an embedding column.

Baseline: brute-force cosine top-k (contract query q_ann_topk — the exact
answer an index must approximate). Scale path: IVF (inverted-file) —
k-means-cluster the corpus, search only the `nprobe` nearest cells:

    build_ivf    deterministic Lloyd's k-means as DataFrame ops (assign =
                 shuffle-free F.aggregate argmin over a centroid array
                 literal; update = map-side-combinable groupBy avg)
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


def _cos(dot, na, nb):
    """ANSI-safe cosine: zero-norm vectors yield NULL (Spark 4's ANSI mode
    makes 0/0 a SparkArithmeticException, not NaN). NULL compares false
    everywhere, so degenerate vectors lose every argmin/top-k comparison
    instead of crashing the job."""
    return F.try_divide(dot, na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _argmin_cid(cent_list: list[tuple[int, list[float]]]):
    """Column: cid of the nearest (cosine) centroid, as a shuffle-free
    F.aggregate fold over a centroid array LITERAL. Ties keep the lowest
    cid (the list is cid-ascending and the fold compares strictly).
    Expects columns `v` (array<double>) and `v_norm` (its L2 norm).

    Zero-norm vectors make every distance NULL (_cos's try_divide; raw
    division would be an ANSI-mode error); NULL comparisons are false, so
    the accumulator never advances — seed it with the FIRST centroid so
    degenerate vectors land in a real cell instead of an unreachable
    cid."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
                F.lit(float(sum(x * x for x in vec)) ** 0.5).alias("cnorm"),
            )
            for cid, vec in cent_list
        ]
    )
    acc0 = F.struct(
        F.lit(int(cent_list[0][0])).cast("int").alias("cid"),
        F.lit(float("inf")).alias("d"),
    )

    def step(acc, c):
        d = -_cos(_dot(F.col("v"), c["cvec"]), F.col("v_norm"), c["cnorm"])
        return F.when(
            d < acc["d"], F.struct(c["cid"].alias("cid"), d.alias("d"))
        ).otherwise(acc)

    return F.aggregate(cent_arr, acc0, step)["cid"]


def build_ivf(
    emb: DataFrame, id_col: str, vec_col: str, n_centroids: int = 8, n_iter: int = 5
) -> tuple[DataFrame, DataFrame]:
    """-> (centroids(cid, cvec), assignments(id, cid)).

    Returns exactly n_centroids cells (bounded by the input row count):
    a cluster that goes empty in a Lloyd round keeps its previous centroid
    rather than silently shrinking k — ivf_search's nprobe/recall semantics
    are sized against n_centroids.

    Deterministic init: centroids = vectors of the n smallest ids. Each
    Lloyd round is ONE map-side-combinable groupBy-avg; the assign step is
    a pure map (F.aggregate argmin over the centroid literal — no
    crossJoin, no window, no Exchange). Centroids round-trip through the
    driver each round: k vectors, the same tiny payload a broadcast would
    ship, but without a per-round shuffle to argmin them.

    Scale note: the literal holds k*dim scalars — fine through k in the
    thousands at typical dims. At the k ~ 10^5-10^6 a trillion-vector
    corpus wants, switch to hierarchical k-means (cluster a sample for
    coarse cells, then per-cell sub-kmeans); the per-round dataflow here is
    unchanged inside each level."""
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("v_norm", _norm(F.col("v")))
    base = base.localCheckpoint()  # iterated below; truncate lineage once
    seed_rows = base.orderBy("id").limit(n_centroids).collect()  # tiny: k vectors
    cent_list = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]
    for _ in range(n_iter):
        assign = base.withColumn("cid", _argmin_cid(cent_list))
        new_cent = (
            assign.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("cvec"))
            .collect()  # k rows
        )
        # a centroid that attracted no vectors this round vanishes from the
        # groupBy result; keep its previous position instead of silently
        # shrinking k (callers size nprobe/recall against n_centroids)
        updated = {r["cid"]: list(r["cvec"]) for r in new_cent}
        cent_list = sorted(
            (cid, updated.get(cid, prev)) for cid, prev in cent_list
        )
    assignments = base.withColumn("cid", _argmin_cid(cent_list)).select("id", "cid")
    cent = emb.sparkSession.createDataFrame(
        cent_list, "cid int, cvec array<double>"
    )
    return cent, assignments


def save_ivf(store, centroids: DataFrame, assignments: DataFrame, prefix: str = "ivf") -> None:
    """Persist an IVF index as CheckpointStore stage tables — the index is
    built once per corpus snapshot and reused across search sessions (the
    Lloyd rounds are the expensive part; a search session only reads two
    tables)."""
    store.write(centroids, f"{prefix}_centroids")
    store.write(assignments, f"{prefix}_assignments")


def load_ivf(spark, store, prefix: str = "ivf") -> tuple[DataFrame, DataFrame]:
    """-> (centroids, assignments) previously saved by save_ivf."""
    return (
        store.read(spark, f"{prefix}_centroids"),
        store.read(spark, f"{prefix}_assignments"),
    )


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
        "dist", -_cos(_dot(F.col("qv"), F.col("cvec")), _norm(F.col("qv")), _norm(F.col("cvec")))
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
        "cos", _cos(_dot(F.col("qv"), F.col("nv")), _norm(F.col("qv")), _norm(F.col("nv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("qid", F.col("rk").cast("long").alias("rk"), F.col("nid").alias("neighbor"))
    )
