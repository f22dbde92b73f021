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


def ingest(transcripts: DataFrame) -> DataFrame:
    """Dedup (conv_id, turn_idx) keeping min (ts, text); add normalized text.

    The dedup is a per-key window, not a global sort — it shuffles once on
    (conv_id, turn_idx) hash. `tnorm` (Q2B+lower) is a codegen'd expression.
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "text")
    return (
        transcripts.withColumn("_rn", F.row_number().over(w))
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
    return resolved.filter((F.col("role") == "assistant") & has_rule).select(
        "conv_id", "turn_idx", "tnorm", "f1_id", "t2_formula"
    )


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
            out: list[tuple] = []
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
                            out.append(("contains", conv, turn, f1, hid, amt, unit, None))
                    handled = True
                if not handled and "主治" in t:
                    if t2f is not None and not pd.isna(t2f):
                        tail = t.partition("主治")[2]
                        buke = "不渴" in tail
                        for s in ac_sym.find_set(tail):
                            out.append(
                                ("p_symptom", conv, turn, t2f, m["symptom"][s],
                                 None, None, buke)
                            )
                        for s in ac_syn.find_set(tail):
                            out.append(
                                ("p_syndrome", conv, turn, t2f, m["syndrome"][s],
                                 None, None, None)
                            )
                    handled = True
                if "可治" in t:
                    for h in ac_herb.find_set(t):
                        for d in ac_dis.find_set(t):
                            out.append(("treats", conv, turn, hmap[h],
                                        m["disease"][d], None, None, None))
                if "可致" in t:
                    for h in ac_herb.find_set(t):
                        for d in ac_dis.find_set(t):
                            out.append(("induces", conv, turn, hmap[h],
                                        m["disease"][d], None, None, None))
                if not handled and "常见" in t:
                    left, _, right = t.partition("常见")
                    syns = ac_syn.find_set(left)
                    syms = ac_sym.find_set(right)
                    for sy in syns:
                        for sm in syms:
                            out.append(("indicates", conv, turn, m["symptom"][sm],
                                        m["syndrome"][sy], None, None, None))
                elif not handled and "属于" in t:
                    left, _, right = t.partition("属于")
                    for a in ac_dis.find_set(left):
                        for b in ac_dis.find_set(right):
                            ca, cb = m["disease"][a], m["disease"][b]
                            if ca != cb:
                                out.append(("is_a", conv, turn, ca, cb,
                                            None, None, None))
            res = pd.DataFrame(
                out,
                columns=["kind", "conv_id", "turn_idx", "subj", "obj",
                         "amount", "unit", "buke"],
            )
            # pin dtypes so empty/all-null batches convert to Arrow cleanly
            res["amount"] = pd.to_numeric(res["amount"], errors="coerce")
            res["turn_idx"] = res["turn_idx"].astype("int32")
            yield res

    return prefiltered.mapInPandas(kernel, schema=MENTION_SCHEMA)
