"""Tests for sources, merge-fold functions, and similarity ops."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F


def test_json_tree_reader(spark, tmp_path):
    """S1: entity id recovered from the path, one distributed read."""
    from tcmkg.sources.readers import read_json_tree

    for eid in ["12", "34"]:
        d = tmp_path / "herb" / eid
        d.mkdir(parents=True)
        (d / "herb.json").write_text(json.dumps({"name": f"h{eid}", "x": int(eid)}))
    df = read_json_tree(spark, str(tmp_path / "herb"))
    rows = {r["path_id"]: r["name"] for r in df.collect()}
    assert rows == {"12": "h12", "34": "h34"}


def test_csv_tsv_null_norm(spark, tmp_path):
    from tcmkg.sources.readers import normalize_nulls, read_csv, read_tsv

    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,None\n2,-\n3,ok\n")
    df = normalize_nulls(read_csv(spark, str(p)))
    vals = {r["a"]: r["b"] for r in df.collect()}
    assert vals == {"1": None, "2": None, "3": "ok"}

    t = tmp_path / "x.tsv"
    t.write_text("a\tb\n1\tz\n")
    assert read_tsv(spark, str(t)).collect()[0]["b"] == "z"


def test_group_merge_fold(spark):
    """A1/A2: set-union of ;-tokens, first-non-null numerics, tolerance."""
    from tcmkg.functions.merge import group_merge

    df = spark.createDataFrame(
        [
            ("k1", "a;b", 10.0),
            ("k1", "b;c", 11.0),      # within rel_tol 0.2 of 10.0
            ("k2", "x", None),
            ("k2", None, 5.0),
            (None, "solo", 1.0),
        ],
        "key string, names string, score double",
    )
    out = {r["key"]: r for r in group_merge(df, "key", ["names"], ["score"], True).collect()}
    assert out["k1"]["names"] == "a;b;c"
    assert out["k1"]["score"] == 10.0
    assert out["k1"]["score_agrees"] is True
    assert out["k2"]["names"] == "x"
    assert out["k2"]["score"] == 5.0
    assert out[None]["names"] == "solo"


def test_group_merge_tolerance_violation(spark):
    from tcmkg.functions.merge import group_merge

    df = spark.createDataFrame(
        [("k", "a", 10.0), ("k", "b", 20.0)], "key string, names string, score double"
    )
    row = group_merge(df, "key", ["names"], ["score"], True).collect()[0]
    assert row["score_agrees"] is False  # data, not a crash (vs reference assert)


def test_standardize(spark):
    from tcmkg.functions.standardize import standardize_vocab, surrogate_id, tokenize_against_vocab

    df = spark.createDataFrame([("Poisonous and CALM",)], "p string")
    out = df.select(standardize_vocab(F.col("p")).alias("p")).collect()[0]["p"]
    assert out == "toxic and neutral"
    df2 = spark.createDataFrame([(3,)], "rank int")
    assert df2.select(surrogate_id("TMHB", "rank")).collect()[0][0] == "TMHB00003"
    df3 = spark.createDataFrame([("cold and very toxic",)], "p string")
    toks = df3.select(tokenize_against_vocab(F.col("p"), ["toxic", "cold", "warm"]).alias("t")).collect()[0]["t"]
    assert toks == ["toxic", "cold"]


def test_embed_deterministic():
    from tcmkg.ops.similarity import _encode_batch
    import pandas as pd

    a = _encode_batch(pd.Series(["头痛发热", "头痛发热", "咳嗽"]))
    assert a[0] == a[1]
    assert a[0] != a[2]
    assert abs(sum(x * x for x in a[0]) - 1.0) < 1e-9  # L2-normalized


def test_blocked_similarity_clusters(spark):
    """EP3-stage-2 analogue: identical texts in the same block must cluster;
    different blocks never pair (the blocking contract)."""
    from tcmkg.ops.similarity import cluster_symptom_like

    rows = [
        ("s1", "头痛而胀", "blk1"),
        ("s2", "头痛而胀", "blk1"),      # identical -> sim 1.0 -> clustered
        ("s3", "咳嗽气喘", "blk1"),
        ("s4", "头痛而胀", "blk2"),      # same text, other block -> NOT merged
    ]
    df = spark.createDataFrame(rows, "id string, text string, blk string")
    clusters = {r["component"]: r["members"] for r in
                cluster_symptom_like(df, "id", "text", "blk", 0.98).collect()}
    assert clusters == {"s1": "s1;s2"}


def test_ann_vs_bruteforce(spark):
    """q_ann_topk's Spark plan agrees with a numpy brute-force oracle."""
    import numpy as np
    from tcmkg.contract.generic import q_ann_topk

    sf = "/root/testdata/sf0.001"
    got = {(r["qid"], r["rk"]): r["neighbor"] for r in q_ann_topk(spark, sf).collect()}
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    for qid in range(5):
        qv = vecs[qid]
        sims = sorted(
            (
                (-float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), vid)
                for vid, v in vecs.items() if vid >= 5
            )
        )[:3]
        for rk, (_, vid) in enumerate(sims, 1):
            assert got[(qid, rk)] == vid


def test_json_envelope_reader(spark, tmp_path):
    """S2: {"data": {...}} envelope unwrap + nested field access."""
    import json
    from pyspark.sql import functions as F
    from tcmkg.sources.readers import read_json_envelope

    p = tmp_path / "e.json"
    p.write_text(json.dumps({"data": {"name": "x", "props": {"k1": "v1"}}}))
    df = read_json_envelope(spark, str(p))
    row = df.select("name", F.col("props.k1").alias("k1")).collect()[0]
    assert (row["name"], row["k1"]) == ("x", "v1")


def test_literal_dict_kernel(spark):
    """P6: the vectorized literal-dict parse must match the reference's
    per-row semantics (ast.literal_eval + xrefs split on FIRST colon,
    per-database ';'-join, None when absent — merge_utility.py:263-287),
    including the true/false retry patch and malformed -> NULL."""
    from tcmkg.kernels.pydict import (
        extract_external_ids,
        parse_literal_dict,
        parse_literal_dict_py,
        prop_first,
    )

    # pure-Python cell semantics
    assert parse_literal_dict_py("{'a': 1, 'b': ['x', 'y']}") == {
        "a": ["1"], "b": ["x", "y"]
    }
    assert parse_literal_dict_py("{'ok': true, 'n': null}") == {
        "ok": ["True"], "n": ["None"]
    }
    assert parse_literal_dict_py("{'k': broken") is None
    assert parse_literal_dict_py("[1, 2]") is None  # non-dict literal
    assert parse_literal_dict_py(None) is None

    rows = [
        (0, "{'name': 'aspirin', 'xrefs': ['OMIM:1234', 'GO:GO:0001', 'OMIM:99'], 'flag': true}"),
        (1, "{'name': 'x', 'xrefs': []}"),
        (2, "{'name': 'y'}"),
        (3, "not a dict at all"),
    ]
    df = spark.createDataFrame(rows, "rid long, props string")
    parsed = df.select("rid", parse_literal_dict(F.col("props")).alias("p"))
    out = extract_external_ids(parsed, "p", ["OMIM", "GO"])
    got = {
        r["rid"]: (r["OMIM_id"], r["GO_id"], r["name"], r["flag"])
        for r in out.select(
            "rid", "OMIM_id", "GO_id",
            prop_first(F.col("p"), "name").alias("name"),
            prop_first(F.col("p"), "flag").alias("flag"),
        ).collect()
    }
    assert got[0] == ("1234;99", "GO:0001", "aspirin", "True")  # first-colon split
    assert got[1] == (None, None, "x", None)
    assert got[2] == (None, None, "y", None)
    assert got[3] == (None, None, None, None)
