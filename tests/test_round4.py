"""Round-4 regression tests: the ADVICE fixes (pipe-delimiter CC key
collision, per-call signature cache, hash shard for string ids, CJK-aware
quality defaults) and the persisted-signature incremental dedup path."""

import pytest
from pyspark.sql import functions as F


def test_near_dedup_pipe_delimiter_ids(spark):
    """Composite string ids CONTAINING '|' must not collide in the CC
    incidence key. With the old concat(a,'|',b) key, edges
    ('x|y','z') and ('x','y|z') produced the same key 'x|y|z' and an
    incidence key links every node sharing it — merging two unrelated
    components. The struct key keeps them apart."""
    from tcmkg.ops.dedup import near_dedup

    rows = [
        # component 1: 'x|y' near-dups 'z0' (shared token set)
        ("x|y", "alpha beta gamma delta epsilon"),
        ("z0", "alpha beta gamma delta epsilon"),
        # component 2: 'x' near-dups 'y|z0' — under the concat key, the
        # edge ('x','y|z0') encodes 'x|y|z0' exactly like ('x|y','z0')
        ("x", "one two three four five"),
        ("y|z0", "one two three four five"),
        ("lone", "totally different content entirely words"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = near_dedup(df, "doc_id", "text", threshold=0.5)
    removals = {r["removed_doc"]: r["keep_doc"] for r in out["removals"].collect()}
    # two SEPARATE components: survivors 'x|y'... min of {'x|y','z0'} is
    # 'x|y'; min of {'x','y|z0'} is 'x'. A spurious merge would collapse
    # all four under one survivor.
    assert removals == {"z0": "x|y", "y|z0": "x"}
    assert {r["doc_id"] for r in out["kept"].collect()} == {"x|y", "x", "lone"}
    out["unpersist"]()


def test_near_dedup_interleaved_caches(spark):
    """Each near_dedup call owns its signature cache: interleaving two
    chains and releasing ONE must not degrade or release the other's
    (the old module-global unpersisted the previous call's handle on
    every new call)."""
    from tcmkg.ops.dedup import near_dedup

    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(10, "one two three four"), (11, "one two three four")],
        "doc_id long, text string",
    )
    out_a = near_dedup(a, "doc_id", "text")
    out_b = near_dedup(b, "doc_id", "text")  # must NOT unpersist out_a's cache
    # evaluate A's outputs AFTER B's call — correct under either caching
    # regime, but with the fix A's signature table is still cached
    assert {r["removed_doc"] for r in out_a["removals"].collect()} == {2}
    assert {r["removed_doc"] for r in out_b["removals"].collect()} == {11}
    out_b["unpersist"]()
    # releasing B leaves A evaluable (and vice versa — idempotent handles)
    assert out_a["kept"].count() == 1
    out_a["unpersist"]()
    out_a["unpersist"]()  # double-release is a no-op


def test_near_dedup_incremental_persisted_sigs(spark, tmp_path):
    """near_dedup_incremental(seen_sigs=...) — the 10^12-doc shape: seen
    signatures come from a CheckpointStore-persisted index instead of
    re-signing the corpus. Results must be IDENTICAL to recompute mode."""
    from tcmkg.ops.dedup import minhash_signatures, near_dedup_incremental
    from tcmkg.pipeline.checkpoints import CheckpointStore

    seen = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five"),
            (3, "lorem ipsum dolor sit amet"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta zeta"),   # near-dup of 1
            (11, "one two three four five"),       # exact dup of 2
            (12, "completely novel words here now"),
        ],
        "doc_id long, text string",
    )

    # persist the seen index once (ingestion time), read it back (tranche time)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.write(minhash_signatures(seen, "doc_id", "text"), "seen_sigs")
    stored = store.read(spark, "seen_sigs")

    ref = near_dedup_incremental(seen, new, "doc_id", "text")
    got = near_dedup_incremental(seen, new, "doc_id", "text", seen_sigs=stored)

    def snap(out):
        rem = sorted(
            (r["removed_doc"], r["keep_doc"], r["via"])
            for r in out["removals"].collect()
        )
        kept = sorted(r["doc_id"] for r in out["kept_new"].collect())
        return rem, kept

    assert snap(got) == snap(ref)
    rem, kept = snap(got)
    assert rem == [(10, 1, "near"), (11, 2, "near")]
    assert kept == [12]
    ref["unpersist"]()
    got["unpersist"]()


def test_quality_defaults_cjk(spark):
    """Default quality rules are sane on Chinese text: an ordinary zh
    document (CJK letters, normal 的/了/是 density, light punctuation) is
    KEPT by quality_flags defaults — under the old ASCII-complement punct
    class and English-only stopword rule it failed both too_much_punct and
    no_stopwords. A zh punctuation wall still fails."""
    from tcmkg.ops.quality import quality_flags

    rows = [
        (1, "患者自述脾胃虚弱，饮食不化，医师诊断为脾胃气虚之证。处方用了四君子汤加减，方中的人参与白术是主药。"),
        (2, "Plain english document with the usual amount of words and a comma, fine."),
        (3, "！？。，；：（）【】《》——……！？。，；：（）【】《》！？。，"),  # zh punct wall
        (4, "короткий"),  # < 20 chars -> too_short regardless of language
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = {r["doc_id"]: r["reason"] for r in
             quality_flags(df, "doc_id", "text").collect()}
    assert flags[1] is None, f"zh doc flagged: {flags[1]}"
    assert flags[2] is None
    assert flags[3] == "too_much_punct"
    assert flags[4] == "too_short"


def test_quality_punct_class_configurable(spark):
    """punct_class is a parameter: the legacy ASCII-complement class can be
    restored explicitly, and then CJK text counts as 'punctuation' again
    (the documented legacy behavior, now opt-in)."""
    from tcmkg.ops.quality import quality_flags

    df = spark.createDataFrame(
        [(1, "患者脾胃虚弱饮食不化医师诊断的是脾胃气虚之证需要调理的方剂")],
        "doc_id long, text string",
    )
    legacy = quality_flags(
        df, "doc_id", "text", punct_class="[^A-Za-z0-9 ]", cjk_stopchars=""
    ).collect()[0]
    assert legacy["reason"] == "too_much_punct"


def test_prepare_corpus_string_ids(spark):
    """prepare_corpus works with STRING doc ids end-to-end: the shard key
    is an md5 hash (the old `id % shard_mod` raised a cast error under
    ANSI mode for string ids its own dedup stage supported)."""
    from tcmkg.ops.prepare import prepare_corpus

    rows = [
        (f"src|{i:04d}", f"document body number {i} with unique words w{i} v{i} "
                         f"and some shared the of and to filler text")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = prepare_corpus(
        df, "doc_id", "text",
        fractions={"train": 0.8, "val": 0.2}, budget=50, shard_mod=2,
    )
    corpus = out["corpus"].collect()
    assert len(corpus) > 0
    shards = {r["shard"] for r in corpus}
    # shard = '<split>|<hash mod 2>' — well-formed for every row
    assert all(s.split("|")[0] in ("train", "val") and s.split("|")[1] in ("0", "1")
               for s in shards)
    # deterministic: same input -> same shard/bin assignment
    again = prepare_corpus(
        df, "doc_id", "text",
        fractions={"train": 0.8, "val": 0.2}, budget=50, shard_mod=2,
    )["corpus"].collect()
    key = lambda rs: sorted((r["doc_id"], r["shard"], r["bin"]) for r in rs)
    assert key(corpus) == key(again)


def test_parse_dim_clause_slots():
    """Slot parser contract: exact property/tropism/toxicity lookups, P13
    containment flavour tokenization, multi-valued toxicity -> 毒 (the
    reference's rule), unknown tokens skipped, clause stops at first 。."""
    from tcmkg.fixtures.dimensions import dim_maps
    from tcmkg.kernels.dims import parse_dim_clause

    d = dim_maps()
    # normalized form (ASCII commas, as the kernel sees it)
    out = parse_dim_clause("温,味甘淡,归脾、肺经,无毒。后有闲话不相干。")
    assert out == [
        ("has_property", d["property"]["温"]),
        ("has_flavour", d["flavour"]["甘"]),
        ("has_flavour", d["flavour"]["淡"]),
        ("tropism_of", d["tropism"]["脾"]),
        ("tropism_of", d["tropism"]["肺"]),
        ("toxicity_of", d["toxicity"]["无毒"]),
    ]
    # raw full-width commas accepted too
    assert parse_dim_clause("大寒，味苦，归心经，极毒。") == [
        ("has_property", d["property"]["大寒"]),
        ("has_flavour", d["flavour"]["苦"]),
        ("tropism_of", d["tropism"]["心"]),
        ("toxicity_of", d["toxicity"]["极毒"]),
    ]
    # multi-valued toxicity collapses to 毒; unknown tokens skipped
    out = parse_dim_clause("怪性,味怪,归怪经,微毒、毒。")
    assert out == [("toxicity_of", d["toxicity"]["毒"])]
    # flavour containment handles 微-variants when they appear alone
    out = parse_dim_clause("平,味微苦,归胆经,毒。")
    kinds = [(k, v) for k, v in out if k == "has_flavour"]
    assert (("has_flavour", d["flavour"]["微苦"]) in kinds
            and ("has_flavour", d["flavour"]["苦"]) in kinds)  # documented P13 shape
    assert parse_dim_clause("") == []


def _data_exchanges(df, section: str = "final") -> int:
    """Count data Exchanges (hash/range/round-robin/single-partition) in
    the EXECUTED plan, excluding broadcasts and AQE-reused exchanges."""
    import re

    # collect() executes THIS df's own QueryExecution (count() would spawn a
    # separate one and leave df's executedPlan un-finalized pre-AQE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints BOTH the final and the initial
    # plan; slice to one section or every exchange appears twice.
    # 'final' = what actually ran (post-AQE, runtime broadcasts applied);
    # 'initial' = the structural pre-AQE shape (deterministic across runs
    # on tiny fixtures, where AQE's broadcast decisions can flip per side).
    parts = plan.split("== Initial Plan ==")
    plan = parts[0] if section == "final" else parts[-1]
    n = 0
    for line in plan.splitlines():
        if "Reused" in line or "BroadcastExchange" in line:
            continue
        if re.search(
            r"\bExchange (hashpartitioning|rangepartitioning|RoundRobin|SinglePartition)",
            line,
        ):
            n += 1
    return n


def test_prepare_corpus_plan_shape(spark):
    """The composed quality → near_dedup → split → pack path must not
    introduce exchange classes its stages don't have: quality is a pure
    filter (zero exchanges), packing partitions by the shard key (no
    range/global sort), and the packed-corpus plan stays within a small
    fixed exchange budget (a regression here = an accidental shuffle in
    the composition). PLANS.md §prepare_corpus carries the captured plan."""
    import re

    from tcmkg.ops.prepare import prepare_corpus
    from tcmkg.ops.quality import quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # quality alone: one scan, no shuffle
    assert _data_exchanges(quality_filter(docs, "doc_id", "text")["removed"]) == 0

    out = prepare_corpus(
        docs, "doc_id", "text",
        fractions={"train": 0.8, "val": 0.1}, budget=2048, shard_mod=4,
        max_bucket=64,
    )
    corpus = out["corpus"]
    corpus.count()
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    # no global sort anywhere in the packed output
    assert len(re.findall(r"Exchange rangepartitioning", plan)) == 0
    # no single-partition funnel (the no-shard_col footgun)
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 0
    # exchange budget of the composition: corpus-side dedup anti-join +
    # the shard window partitioning (CC/candidate shuffles are behind the
    # chain's checkpoint boundary and don't grow this plan). Measured 3 at
    # pinning time; the assert is a regression tripwire, not a target.
    assert _data_exchanges(corpus) <= 4
    assert out["holdout"].count() >= 0  # holdout leg stays evaluable


def test_run_incremental_plan_shape(spark, tmp_path, pipeline, transcripts_pdf):
    """Incremental assembly must (a) never re-run the Python mention
    kernel — mentions come back from the committed tranche parquet — and
    (b) spend no more data exchanges than the batch assembly over the same
    mentions (the partials are combinable; assembly shape is identical).
    PLANS.md §run_incremental carries the captured plan."""
    landing = tmp_path / "landing"
    landing.mkdir()
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    transcripts_pdf.to_parquet(landing / "arrival_0.parquet", **kw)

    out = pipeline.run_incremental(str(landing), str(tmp_path / "ckpt"))
    triples = out["triples"]
    triples.count()
    plan = triples._jdf.queryExecution().executedPlan().toString()
    # the kernel does not re-run: no Arrow-Python eval node in the plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    # FLAGSHIP comparison: batch triples over the same transcripts
    batch = pipeline.triples(
        spark.read.parquet(str(landing / "arrival_0.parquet"))
    )
    # STRUCTURAL comparison on the initial plans: AQE's runtime broadcast
    # conversions on contract-sized inputs can differ between the two
    # sides (a size-statistics accident, not an assembly-shape property)
    assert _data_exchanges(triples, "initial") <= _data_exchanges(batch, "initial")


def test_dim_ids_reference_scheme():
    """Surrogate ids follow the reference's prefix+width scheme."""
    from tcmkg.fixtures.dimensions import dim_id, dim_node_rows

    assert dim_id("property", 0) == "TMPP00001"
    assert dim_id("flavour", 12) == "TMFV00013"
    assert dim_id("tropism", 11) == "TMTP12"
    assert dim_id("toxicity", 3) == "TMTX00004"
    assert dim_id("pharm_class", 0) == "TMPC00001"  # extract_ingredient.py:424
    # gene-side families (late r5; extract_other_entities.py prefixes)
    assert dim_id("pathway", 0) == "TMPW00001"
    assert dim_id("bioprocess", 0) == "TMBP00001"
    assert dim_id("cellcomp", 0) == "TMCC00001"
    assert dim_id("molfunction", 0) == "TMMF00001"
    rows = dim_node_rows()
    assert dim_id("sideeffect", 0) == "TMSE00001"
    assert len(rows) == 11 + 13 + 12 + 4 + 10 + 8 + 6 + 6 + 5 + 7
    assert all(len(r["names"]) == 2 for r in rows)
