"""Triangle counting + local clustering coefficient over the published KG.

Completes the graph-analytics surface (degree = one-pass agg, connected
components = fixpoint, PageRank = fixed-iteration, k-hop = bucket-local
traversal) with the one-shot motif count a KG consumer runs to find
tightly-coupled entity clusters.

Scale design — the classic degree-orientation plan (Suri &
Vassilvitskii, WWW'11, expressed as DataFrame joins): every undirected
edge is directed from its lower-(degree, id) endpoint to the higher, so
each node's ORIENTED out-degree is bounded by O(sqrt(E)) regardless of
its real degree. The wedge join — the only step that looks quadratic —
is therefore skew-safe: a hub entity of degree D contributes
min(D, sqrt(2E))^2 wedge candidates instead of D^2, which is exactly the
protection a 甘草-grade hub needs at 10^12-edge scale. Each triangle has
exactly ONE node with two out-edges under a total-order orientation, so
it is enumerated once, then exploded to its three corners for the
per-node counts (map-side-combinable sum). The DuckDB oracle (contract
kg_triangles) enumerates by id-sorted a<b<c closure instead — an
independent formulation of the same set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """-> (node, degree, triangles, lcc) for every node of the undirected
    simple graph induced by `edges` (parallel/reverse duplicates collapse,
    self-loops drop). `degree` is the simple-graph degree; `lcc` =
    2*triangles / (degree*(degree-1)), 0.0 when degree < 2, rounded 6dp."""
    und = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # r6: und is referenced by deg, withdeg and (via oriented) the
        # three wedge-join sides — without truncation an expensive caller
        # plan (the full triple assembly) executes once PER REFERENCE
        # (measured 26s -> 7s for the kg_triangles query at sf0.1). The
        # checkpointed frame is the deduped O(E) edge list.
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    withdeg = (
        und.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
    )
    # orient from the smaller (deg, id) endpoint; carry the head's key so
    # the wedge join can order out-neighbors without another degree join
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    # three self-join sides (x, y, z) read oriented: checkpoint so the
    # und⨝deg⨝deg derivation runs once, not three times (same O(E) size)
    ).localCheckpoint()
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(y, F.col("x.a") == F.col("y.a")).where(
        (F.col("x.db") < F.col("y.db"))
        | ((F.col("x.db") == F.col("y.db")) & (F.col("x.b") < F.col("y.b")))
    )
    # the wedge order (db, b) < (dc, c) matches the orientation rule, so a
    # closing edge b—c, if present, is oriented b -> c: one equi-join
    z = oriented.alias("z")
    tri = wedges.join(
        z, (F.col("x.b") == F.col("z.a")) & (F.col("y.b") == F.col("z.b"))
    ).select(
        F.col("x.a").alias("c1"), F.col("x.b").alias("c2"),
        F.col("y.b").alias("c3"),
    )
    per_node = (
        tri.select(
            F.explode(F.array("c1", "c2", "c3")).alias("n")
        )
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("t"))
    )
    lcc = F.try_divide(2 * F.col("t"), F.col("deg") * (F.col("deg") - 1))
    return (
        deg.join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("triangles"),
            F.coalesce(F.round(lcc, 6), F.lit(0.0)).alias("lcc"),
        )
    )
