"""Driver-contract queries: Spark callables + DuckDB oracle SQL.

Two families:
  kg.py       the KG pipeline run over a deterministic "transcriptization"
              of the driver's events table. The Spark side runs the REAL
              pipeline (window ordering, mention kernel, CC canonicalization,
              weighting); the DuckDB oracle regenerates expected triples from
              the same arithmetic derivation plus canonical-ID constants
              computed by the pure-Python union-find — a genuine differential
              test of the distributed dataflow.
  generic.py  SURVEY.md §2 operator demonstrations + training-data ops
              (dedup, minhash, text stats, ANN) over the TPC-H-ish tables,
              each with an exact ANSI-SQL oracle.
"""

from .kg import KG_QUERIES, KG_ORACLES
from .generic import GENERIC_QUERIES, GENERIC_ORACLES

# The driver's per-round correctness gate checks queries in registry order
# and may cap the checked set (~50 of what is now 64). Order therefore
# encodes PROOF PRIORITY: (1) queries whose code/oracle changed this round
# or that have never had a driver row go FIRST (the explicit list below);
# (2) everything else forms a tail that ROTATES deterministically by round
# (rotation seed = how many driver CORRECTNESS files exist), so every
# long-stable query lands inside the driver cap at least every other round
# instead of going permanently stale while code evolves under it.
_CHECK_FIRST = [
    # round-5 session 6: Gopher repetition signals/filter, PII
    # detection/redaction, and triangle counting are new
    "q_repetition",
    "q_pii",
    "kg_triangles",
    "q_prepare_full",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_pack_sequences",
    "kg_pagerank_w",
    # round-5 session 5: PageRank over the published KG (fixed-iteration
    # checkpointed iterative join) and benchmark decontamination (eval
    # n-gram broadcast probe) are new
    "kg_pagerank",
    "q_decontaminate",
    # round-5 session 4: disease_present_symptom retargeted to mm_symptom
    # entities (the reference's disease2mm_symptom.csv is disease→MODERN
    # symptom) and the reference-layout export landed — kg_treat2 and the
    # roundtrip derivation changed with it
    "kg_export",
    "kg_all_edges",
    "kg_degree",
    "kg_components",
    "kg_three_hop",
    "kg_treat2",
    "kg_text_roundtrip",
    # round-5 session 3: the 20/20 entity-parity batch — anatomy became a
    # CC-canonicalized TMAT gazetteer (anat_* edge subjects changed ids),
    # mm_symptom (TMMS) + the two-direction tcm_symptom_map_mm_symptom
    # relation landed, and the roundtrip/nodes oracles changed with them
    "kg_ts_mm",
    "kg_anat_gene",
    "kg_anat_updown",
    "kg_nodes",
    "kg_text_roundtrip",
    # round-5 final: the last reference-inventory families (herb→symptom/
    # syndrome, disease/syndrome present, pathway→disease, ingredient→GO
    # quad) — their clauses also extend the roundtrip derivation
    "kg_treat2",
    "kg_ing_go",
    "kg_text_roundtrip",
    # round-5 latest: bind set (changes kg_gene_edges + both chain
    # queries), side-effect certainty pair, anatomy up/down-regulate
    "kg_sideeffect",
    "kg_anat_updown",
    "kg_resemble",
    "kg_ing_pairs",
    "kg_gene_edges",
    "kg_chain_herb_gene",
    # round-5 late additions: gene-side families (gene↔gene, disease→gene,
    # gene→pathway/GO, anatomy-express, ingredient→gene→pathway chain).
    # kg_text_roundtrip's derivation gained the T11-T14 clauses and
    # kg_nodes/kg_dim_nodes gained four entity families — re-prove.
    "kg_gene_gene",
    "kg_dis_gene",
    "kg_gene_go",
    "kg_anat_gene",
    "kg_chain_ing_pathway",
    # round-5 additions: derived-entity families (ingredient/target),
    # symptom→locus name-containment edges, streaming near-dedup,
    # incremental IVF, real-codec multimodal. kg_nodes/text_roundtrip
    # oracles changed (new entity types, new T7/T8 clauses) — re-prove.
    "kg_consistof",
    "kg_gene_edges",
    "kg_ingr_disease",
    "kg_pclass",
    "kg_chain_herb_gene",
    "kg_symptom_locus",
    "kg_stream_neardup",
    "q_ann_ivf_add",
    "q_multimodal_bmp",
    "kg_nodes",
    "kg_text_roundtrip",
    # oracle-changed in late round 4 (banding-default flip:
    # q_near_dedup/_inc/_sigs + q_prepare_corpus now verify the b=6,r=2
    # DEFAULT regime; q_lsh_* re-pinned; q_near_dedup_r1 renamed from _r2)
    "q_near_dedup",
    "q_near_dedup_r1",
    "q_near_dedup_inc",
    "q_near_dedup_sigs",
    "q_prepare_corpus",
    "q_lsh_pairs",
    "q_lsh_dropped",
    # no driver row as of CORRECTNESS_r04 (the r03-green stable tail)
    "q_minhash_sigs",
    "q_minhash_clusters",
    "q_jaccard_pairs",
    "q_simhash_pairs",
    "q_literal_dict",
    "q_fingerprints",
    "q_token_quality",
    "q_cos_neardup",
    "q_split",
    "q_pack_bins",
    "q_shingle_jaccard",
    "q_lang_id",
]


def _round_index() -> int:
    """Completed driver rounds = CORRECTNESS_r*.json files at the repo
    root (the driver writes r{N} after round N's gate, so during round N
    the count is N-1 — constant within a round, +1 each round: a
    deterministic rotation seed with no clock or RNG)."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    return len(list(root.glob("CORRECTNESS_r*.json")))


def _ordered(full: dict) -> dict:
    head = [k for k in _CHECK_FIRST if k in full]
    seen = set(head)
    tail = [k for k in full if k not in seen]
    if tail:
        # rotate by half the tail per round: with a ~50-query driver cap and
        # a ~20-query head, every tail query is inside the cap at least
        # every other round
        off = (_round_index() * ((len(tail) + 1) // 2)) % len(tail)
        tail = tail[off:] + tail[:off]
    return {k: full[k] for k in head + tail}


def all_queries():
    q = {}
    q.update(KG_QUERIES)
    q.update(GENERIC_QUERIES)
    return _ordered(q)


def all_oracles():
    o = {}
    o.update(KG_ORACLES)
    o.update(GENERIC_ORACLES)
    return _ordered(o)
