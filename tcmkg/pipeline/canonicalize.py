"""Entity canonicalization: connected components over the alias/ID graph.

Spark-native equivalent of the reference's union-find merge
(processed_code/merge_utility.py:166-231) and the canonical-ID assignment
(extract_herb.py:447-449 style `PREFIX{:05d}` by merged row order):

  1. explode every record's `;`-joined keys into (record_id, (kind, key))
     incidence rows — name keys, symmap keys, external-DB keys each in their
     own namespace (a name can't merge with an ID that spells the same);
  2. connected components by checkpointed min-label propagation (cc.py);
  3. component representative = min record_id ("first occurrence wins" under
     lexicographic record ids);
  4. canonical id = PREFIX + zero-padded stable rank of the representative
     (two-pass scalable ranking, pipeline/util.stable_rank);
  5. alias map = exploded normalized names -> canonical id, collisions
     resolved to the minimum canonical id (deterministic; the oracle uses
     the same rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.normalize import text_norm
from .cc import connected_components
from .util import stable_rank


def gazetteer_incidence(records: DataFrame) -> DataFrame:
    """records(record_id, names, symmap_id, extdb_id) -> (node, key)."""
    keys = []
    for col, kind in (("names", "name"), ("symmap_id", "symmap"), ("extdb_id", "extdb")):
        keys.append(
            records.select(
                F.col("record_id").alias("node"),
                F.explode(
                    F.transform(F.split(F.col(col), ";"), lambda x: F.trim(x))
                ).alias("_tok"),
            )
            .filter(F.col("_tok").isNotNull() & (F.col("_tok") != ""))
            .select("node", F.concat(F.lit(kind + ":"), F.col("_tok")).alias("key"))
        )
    out = keys[0]
    for k in keys[1:]:
        out = out.unionByName(k)
    return out


def canonicalize(records: DataFrame, prefix: str) -> tuple[DataFrame, DataFrame]:
    """-> (rec2canon(record_id, canonical_id), alias2canon(alias, canonical_id)).

    `records` is a gazetteer record table; small enough to broadcast by
    definition (it is the dictionary side), but every step here is also
    correct at fact-table scale — CC and ranking never collapse to one task.
    """
    inc = gazetteer_incidence(records)
    comp = connected_components(inc)  # (node, component)

    reps = comp.select(F.col("component").alias("rep")).distinct()
    ranked = stable_rank(reps, "rep", "rank")
    canon = ranked.select(
        "rep", F.format_string(prefix + "%05d", F.col("rank").cast("int")).alias("canonical_id")
    )
    rec2canon = (
        comp.join(F.broadcast(canon), comp.component == canon.rep)
        .select(F.col("node").alias("record_id"), "canonical_id")
    )

    names = records.select(
        "record_id",
        F.explode(F.transform(F.split("names", ";"), lambda x: F.trim(x))).alias("alias"),
    ).filter(F.col("alias") != "")
    alias2canon = (
        names.join(rec2canon, "record_id")
        .groupBy("alias")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    return rec2canon, alias2canon


def normalize_alias_map(alias_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side: normalized alias -> canonical id dict (broadcast to the
    mention kernels). Uses the SAME text normalization (text_norm: Q2B +
    lowercase) that transcript text gets before matching, so lookup keys
    always agree with scanned text. Collisions -> min canonical id."""
    out: dict[str, str] = {}
    for alias, canon in alias_rows:
        norm = text_norm(alias)
        if norm in out:
            out[norm] = min(out[norm], canon)
        else:
            out[norm] = canon
    return out
