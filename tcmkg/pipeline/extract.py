"""Ingest + mention extraction.

Spark-first layering (BASELINE.json north_star):

  ingest          dedup duplicate (conv_id, turn_idx) rows and establish
                  stable turn order — window functions, all JVM-side.
  resolve_anchors rule dispatch + formula carry-forward: prefix parsing with
                  native string expressions, TWO broadcast joins against the
                  formula alias map, and a running `last(..., ignorenulls)`
                  window for the carried formula. No Python.
  extract_mentions the only Python hot path: one `mapInPandas` pass over the
                  (JVM-prefiltered) rule-bearing turns, running the shared
                  Aho-Corasick / token-probe / dose kernels per Arrow batch.
                  Gazetteer maps ride in as broadcast variables; automatons
                  are built once per executor process and cached.

Reference semantics being reproduced: extraction rules documented in
oracle/extractor.py (the normative contract); per-site citations there.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels.normalize import text_norm_col

MENTION_SCHEMA = (
    "kind string, conv_id string, turn_idx int, subj string, obj string, "
    "amount double, unit string, buke boolean"
)


def ingest(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Dedup (conv_id, turn_idx) keeping min (ts, text); add normalized text.

    Explicit conv_id hash partitioning up front (the north-rule layout):
    hash(conv_id) clustering satisfies BOTH downstream window requirements —
    the (conv_id, turn_idx) dedup window here and the per-conversation
    carry-forward window in resolve_anchors — so the whole
    ingest→anchor→prefilter chain runs on ONE shuffle of the fact stream.
    `tnorm` (Q2B+lower) is a codegen'd expression.
    """
    if num_partitions is None:
        num_partitions = transcripts.sparkSession.sparkContext.defaultParallelism
    slim = transcripts.drop("tool")  # dead column: don't pay shuffle bytes for it
    parts = slim.repartition(num_partitions, "conv_id")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "text")
    return (
        parts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("tnorm", text_norm_col(F.col("text")))
    )


def resolve_anchors(turns: DataFrame, formula_alias: DataFrame) -> DataFrame:
    """Attach `f1_id` (prescription-line formula), `t2_formula` (indication
    formula incl. carry-forward) to every turn.

    formula_alias: (alias, canonical_id) — already text-normalized aliases.
    Broadcast hash joins (the dictionary side is small by construction),
    then one window per conversation for the carried formula. This is the
    stage that makes stable turn ordering load-bearing.
    """
    fa1 = F.broadcast(
        formula_alias.select(
            F.col("alias").alias("_p1"), F.col("canonical_id").alias("f1_id")
        )
    )
    fa2 = F.broadcast(
        formula_alias.select(
            F.col("alias").alias("_p2"), F.col("canonical_id").alias("f2_id")
        )
    )
    t = F.col("tnorm")
    df = turns.withColumn(
        "_p1",
        F.when(t.contains(":"), F.substring_index(t, ":", 1)),
    )
    df = df.join(fa1, "_p1", "left")
    df = df.withColumn(
        "_p2",
        F.when(
            t.contains("主治") & F.col("f1_id").isNull(),
            F.substring_index(t, "主治", 1),
        ),
    )
    df = df.join(fa2, "_p2", "left")

    # carried formula: last resolved anchor among *assistant* turns, in
    # stable (turn_idx) order within the conversation
    anchor = F.when(
        F.col("role") == "assistant", F.coalesce("f1_id", "f2_id")
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("_anchor", anchor).withColumn(
        "last_formula", F.last("_anchor", ignorenulls=True).over(w)
    )
    df = df.withColumn(
        "t2_formula",
        F.when(
            t.contains("主治") & F.col("f1_id").isNull(),
            F.coalesce("f2_id", "last_formula"),
        ),
    )
    return df.drop("_p1", "_p2", "_anchor")


def rule_prefilter(resolved: DataFrame) -> DataFrame:
    """JVM-side predicate: only rule-bearing assistant turns reach Python.

    At 10^12-turn scale most turns carry no extractable pattern; this filter
    (pushed into the scan where possible) keeps the Arrow channel narrow.
    """
    t = F.col("tnorm")
    has_rule = (
        F.col("f1_id").isNotNull()
        | t.contains("主治")
        | t.contains("可治")
        | t.contains("可致")
        | t.contains("常见")
        | t.contains("属于")
    )
    out = resolved.filter((F.col("role") == "assistant") & has_rule).select(
        "conv_id", "turn_idx", "tnorm", "f1_id", "t2_formula"
    )
    # Re-spread before the Arrow kernel: AQE's post-shuffle coalescing sizes
    # partitions for ~64MB of JVM bytes, which leaves the (CPU-heavy) Python
    # stage running on a handful of tasks. Round-robin repartition keys the
    # kernel's parallelism to the cluster, not to the byte size. (Spark
    # sorts before round-robin redistribution, so this stays deterministic.)
    par = resolved.sparkSession.sparkContext.defaultParallelism
    return out.repartition(par * 2)


def extract_mentions(spark, prefiltered: DataFrame, maps: dict[str, dict[str, str]],
                     cache_key: str = "default") -> DataFrame:
    """mapInPandas mention kernel. `maps`: entity_type -> {norm alias: canon}.

    Emits rows (kind, conv_id, turn_idx, subj, obj, amount, unit, buke):
      contains   subj=formula  obj=herb   amount/unit from the dose grammar
      p_symptom  subj=formula  obj=symptom  buke = indication tail has 不渴
      p_syndrome subj=formula  obj=syndrome
      treats / induces  subj=herb  obj=disease
      indicates  subj=symptom  obj=syndrome
      is_a       subj=disease  obj=disease
    """
    sc = spark.sparkContext
    b_maps = sc.broadcast(maps)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.dose import parse_dose_string
        from ..kernels.matcher import (
            extract_herb_dose_pairs,
            get_automaton,
            probe_herb,
        )

        m = b_maps.value
        hmap = m["herb"]
        key = f"gaz:{cache_key}:"
        ac_sym = get_automaton(key + "symptom", m["symptom"].keys())
        ac_syn = get_automaton(key + "syndrome", m["syndrome"].keys())
        ac_dis = get_automaton(key + "disease", m["disease"].keys())
        ac_herb = get_automaton(key + "herb", m["herb"].keys())

        for pdf in batches:
            # columnar accumulators: list-of-tuples -> DataFrame is the slow
            # path at millions of mentions; per-column appends + a dict
            # constructor keep the batch overhead linear and cheap
            c_kind: list[str] = []
            c_conv: list[str] = []
            c_turn: list[int] = []
            c_subj: list[str] = []
            c_obj: list[str] = []
            c_amt: list[float | None] = []
            c_unit: list[str | None] = []
            c_buke: list[bool | None] = []

            def emit(kind, conv, turn, subj, obj, amt=None, unit=None, buke=None):
                c_kind.append(kind)
                c_conv.append(conv)
                c_turn.append(turn)
                c_subj.append(subj)
                c_obj.append(obj)
                c_amt.append(amt)
                c_unit.append(unit)
                c_buke.append(buke)

            for conv, turn, t, f1, t2f in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["tnorm"],
                pdf["f1_id"], pdf["t2_formula"],
            ):
                handled = False
                if f1 is not None and not pd.isna(f1):
                    body = t.partition(":")[2]
                    for tok, dose in extract_herb_dose_pairs(body):
                        hid = probe_herb(tok, hmap)
                        if hid is not None:
                            amt, unit = parse_dose_string(dose)
                            emit("contains", conv, turn, f1, hid, amt, unit)
                    handled = True
                if not handled and "主治" in t:
                    if t2f is not None and not pd.isna(t2f):
                        tail = t.partition("主治")[2]
                        buke = "不渴" in tail
                        for s in ac_sym.find_set(tail):
                            emit("p_symptom", conv, turn, t2f, m["symptom"][s], buke=buke)
                        for s in ac_syn.find_set(tail):
                            emit("p_syndrome", conv, turn, t2f, m["syndrome"][s])
                    handled = True
                if "可治" in t:
                    for h in ac_herb.find_set(t):
                        for d in ac_dis.find_set(t):
                            emit("treats", conv, turn, hmap[h], m["disease"][d])
                if "可致" in t:
                    for h in ac_herb.find_set(t):
                        for d in ac_dis.find_set(t):
                            emit("induces", conv, turn, hmap[h], m["disease"][d])
                if not handled and "常见" in t:
                    left, _, right = t.partition("常见")
                    syns = ac_syn.find_set(left)
                    if syns:
                        for sm in ac_sym.find_set(right):
                            for sy in syns:
                                emit("indicates", conv, turn, m["symptom"][sm],
                                     m["syndrome"][sy])
                elif not handled and "属于" in t:
                    left, _, right = t.partition("属于")
                    lefts = ac_dis.find_set(left)
                    if lefts:
                        rights = ac_dis.find_set(right)
                        for a in lefts:
                            for b in rights:
                                ca, cb = m["disease"][a], m["disease"][b]
                                if ca != cb:
                                    emit("is_a", conv, turn, ca, cb)

            yield pd.DataFrame(
                {
                    "kind": pd.Series(c_kind, dtype="object"),
                    "conv_id": pd.Series(c_conv, dtype="object"),
                    "turn_idx": pd.Series(c_turn, dtype="int32"),
                    "subj": pd.Series(c_subj, dtype="object"),
                    "obj": pd.Series(c_obj, dtype="object"),
                    "amount": pd.Series(c_amt, dtype="float64"),
                    "unit": pd.Series(c_unit, dtype="object"),
                    "buke": pd.Series(c_buke, dtype="object"),
                }
            )

    return prefiltered.mapInPandas(kernel, schema=MENTION_SCHEMA)
