"""Round-5 additions: derived-entity families (ingredient/target), the
ingredient→gene de-conflict algebra, and fixture-safety invariants."""

import pytest


def test_new_names_substring_free():
    """Ingredient/target names (and their aliases) must be mutually
    containment-free against EVERY other gazetteer surface form — the AC
    automatons scan whole turns, so a contained name would emit mentions
    the SQL oracles cannot predict (contract/kg._pick_free invariant)."""
    from tcmkg.fixtures.gazetteers import (
        INGREDIENT_ALIASES,
        INGREDIENT_NAMES,
        TARGET_ALIASES,
        TARGET_NAMES,
        build_gazetteers,
    )
    from tcmkg.kernels.normalize import text_norm

    new = set(INGREDIENT_NAMES + TARGET_NAMES)
    for al in (INGREDIENT_ALIASES, TARGET_ALIASES):
        for vs in al.values():
            new.update(vs)
    new = {text_norm(n) for n in new}
    universe = {
        text_norm(n)
        for recs in build_gazetteers().tables().values()
        for r in recs
        for n in r.names
    }
    old = universe - new
    bad = [(n, u) for n in new for u in old if n in u or u in n]
    assert not bad, f"containment between new and existing names: {bad[:5]}"
    # markers must not appear inside any universe name
    markers = ["含有", "上调", "下调", "作用于"]
    bad2 = [(m, u) for m in markers for u in universe if m in u]
    assert not bad2, bad2


def test_gene_edge_algebra(spark):
    """gene_edges implements extract_target.py:365-372 + 404-417: up∩down
    conflicts move to associate; associate loses pairs still held by a
    directional set. Verified against a direct set-algebra model."""
    from tcmkg.pipeline.triples import gene_edges

    mention = [
        # (kind, subj, obj): plain up / plain down / plain assoc
        ("up_gene", "I1", "G1"), ("down_gene", "I2", "G1"),
        ("assoc_gene", "I3", "G1"),
        # conflict: up and down for the same pair -> associate
        ("up_gene", "I4", "G2"), ("down_gene", "I4", "G2"),
        # priority: assoc + up -> up only
        ("assoc_gene", "I5", "G2"), ("up_gene", "I5", "G2"),
        # conflict pair ALSO stated as assoc -> still exactly one assoc edge
        ("up_gene", "I6", "G3"), ("down_gene", "I6", "G3"),
        ("assoc_gene", "I6", "G3"),
    ]
    pairs = spark.createDataFrame(
        [(k, s, o) for k, s, o in mention], "kind string, subj string, obj string"
    ).dropDuplicates(["kind", "subj", "obj"])
    up, down, assoc = gene_edges(pairs)
    got_up = {(r["subj"], r["obj"]) for r in up.collect()}
    got_down = {(r["subj"], r["obj"]) for r in down.collect()}
    got_assoc = {(r["subj"], r["obj"]) for r in assoc.collect()}

    # independent set-algebra model
    ups = {(s, o) for k, s, o in mention if k == "up_gene"}
    downs = {(s, o) for k, s, o in mention if k == "down_gene"}
    assocs = {(s, o) for k, s, o in mention if k == "assoc_gene"}
    conflict = ups & downs
    want_up, want_down = ups - conflict, downs - conflict
    want_assoc = (assocs | conflict) - want_up - want_down
    assert got_up == want_up == {("I1", "G1"), ("I5", "G2")}
    assert got_down == want_down == {("I2", "G1")}
    assert got_assoc == want_assoc == {("I3", "G1"), ("I4", "G2"), ("I6", "G3")}


def test_derived_entity_maps_exist(pipeline):
    """KGPipeline canonicalizes the two new gazetteers; alias surfaces
    resolve to the same canonical id as their primary name (the CC merge
    the reference does through shared source ids)."""
    from tcmkg.kernels.normalize import text_norm

    m = pipeline.maps
    assert m["ingredient"][text_norm("栎精")] == m["ingredient"][text_norm("槲皮素")]
    assert m["ingredient"][text_norm("乌索酸")] == m["ingredient"][text_norm("熊果酸")]
    assert m["target"]["trp53"] == m["target"]["tp53"]
    assert m["target"]["cox2"] == m["target"]["ptgs2"]
    assert m["ingredient"][text_norm("槲皮素")].startswith("TMIN")
    assert m["target"]["tp53"].startswith("TMGE")


def test_symptom_locus_edges(pipeline):
    """Spark name-containment join vs the pure-Python derivation — and a
    few hand-checked anchor edges (目赤→眼 through the reference's 目→眼
    alias surface; 腰痛→腰部 through the stem surface)."""
    from tcmkg.fixtures.locus import derive_symptom_locus, locus_id_map
    from tcmkg.kernels.normalize import text_norm

    got = {(r["subj"], r["obj"]) for r in pipeline.symptom_locus().collect()}
    # independent derivation from the pipeline's own canonical entities
    names_by_canon = {}
    for r in pipeline.nodes_table().filter("entity_type = 'symptom'").collect():
        names_by_canon[r["canonical_id"]] = list(r["names"])
    want = derive_symptom_locus(names_by_canon)
    assert got == want and got
    ids = locus_id_map()
    sym = pipeline.maps["symptom"]
    assert (sym[text_norm("目赤")], ids["眼"]) in got
    assert (sym[text_norm("腰痛")], ids["腰部"]) in got
    assert (sym[text_norm("关节痛")], ids["关节"]) in got
    # a locus-free symptom derives nothing
    assert all(s != sym[text_norm("发热")] for s, _ in got)


def test_locus_ids_reference_scheme():
    from tcmkg.fixtures.locus import LOCUS_VOCAB, locus_id

    assert locus_id(0) == "TMLC00001"
    assert locus_id(len(LOCUS_VOCAB) - 1) == f"TMLC{len(LOCUS_VOCAB):05d}"


def test_nodes_table_has_derived_types(pipeline):
    types = {
        r["entity_type"]
        for r in pipeline.nodes_table().select("entity_type").distinct().collect()
    }
    assert {"ingredient", "target", "locus"} <= types
