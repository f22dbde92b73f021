"""Golden-triple parity: Spark pipeline vs plain-Python oracle (the P/R gate).

BASELINE.json: triple-extraction P/R >= 0.95 vs the reference extractor.
The oracle implements the normative contract with independent dataflow
(dicts/loops/union-find); the Spark pipeline must reproduce its
(subj, pred, obj) set. Weights are compared with the reference's numeric
tolerance discipline (merge_utility.py:151 uses rel_tol) separately.
"""

import math

import pytest


@pytest.fixture(scope="module")
def spark_triples(pipeline, transcripts_df):
    rows = pipeline.triples(transcripts_df).collect()
    return {(r["subj"], r["pred"], r["obj"]): r["weight"] for r in rows}


def test_precision_recall(spark_triples, golden_triples):
    got = set(spark_triples.keys())
    want = {(s, p, o) for s, p, o, _ in golden_triples}
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    # diagnostics on failure
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f}; "
        f"spurious={sorted(got - want)[:10]} missing={sorted(want - got)[:10]}"
    )
    # we expect exact agreement, not just 0.95 — same kernels, same contract
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision:.4f} R={recall:.4f}; "
        f"spurious={sorted(got - want)[:10]} missing={sorted(want - got)[:10]}"
    )


def test_weights_match(spark_triples, golden_triples):
    golden_w = {(s, p, o): w for s, p, o, w in golden_triples}
    for key, w in spark_triples.items():
        gw = golden_w.get(key)
        if gw is None and w is None:
            continue
        assert (gw is None) == (w is None), f"weight nullness mismatch at {key}: {w} vs {gw}"
        if w is not None:
            assert math.isclose(w, gw, rel_tol=1e-9), f"{key}: {w} != {gw}"


def test_reserved_entities_absent(spark_triples, pipeline):
    """Duplicate-turn rows plant reserved entities; their presence in the
    output means (conv_id, turn_idx) dedup failed."""
    from tcmkg.fixtures.transcripts import reserved_entities
    from tcmkg.kernels.normalize import text_norm

    res = reserved_entities()
    bad_ids = set()
    for etype, names in res.items():
        for n in names:
            cid = pipeline.maps[etype].get(text_norm(n))
            if cid:
                bad_ids.add(cid)
    assert bad_ids, "fixture should reserve entities"
    for s, p, o in spark_triples:
        assert s not in bad_ids and o not in bad_ids, (s, p, o)


def test_predicate_coverage(spark_triples):
    preds = {p for _, p, _ in spark_triples}
    assert preds == {
        "formula_contains_herb",
        "prescription_treat_symptom",
        "prescription_treat_syndrome",
        "herb_treats_disease",
        "symptom_indicates_syndrome",
        "disease_is_a_disease",
        "herb_has_flavour",
        "herb_has_property",
        "tropism_of_herb",
        "toxicity_of_herb",
        "herb_consistof_ingredient",
        "ingredient_upregulate_gene",
        "ingredient_downregulate_gene",
        "ingredient_associate_gene",
        "ingredient_treat_disease",
        "ingredient_induce_disease",
        "ingredient_contraindicate_disease",
        "ingredient_belong_to_pharmacologic_class",
        "gene_regulate_gene",
        "gene_covary_gene",
        "gene_associate_gene",
        "disease_upregulate_gene",
        "disease_downregulate_gene",
        "disease_associate_gene",
        "gene_associate_pathway",
        "gene2biological_process",
        "gene2cell_component",
        "gene2molecular_function",
        "anatomy_express_gene",
        "ingredient_bind_gene",
        "ingredient_cause_sideeffect",
        "ingredient_might_cause_sideeffect",
        "anatomy_upregulate_gene",
        "anatomy_downregulate_gene",
        "disease_resemble_disease",
        "ingredient_resemble_ingredient",
        "ingredient_associate_ingredient",
        "herb_treat_symptom",
        "herb_treat_syndrome",
        "disease_present_symptom",
        "syndrome_present_symptom",
        "pathway_lead_to_disease",
        "ingredient_associate_pathway",
        "ingredient_associate_biological_process",
        "ingredient_associate_cellular_component",
        "ingredient_associate_molecular_function",
        "tcm_symptom_map_mm_symptom",
    }
