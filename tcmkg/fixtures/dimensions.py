"""Dimension-entity vocabularies: herb property / flavour / tropism /
toxicity.

The reference derives four DIMENSION entity families from per-herb
attribute strings and emits herb→dimension edges via dict lookups
(reference: processed_code/extract_herb.py:466-585 builds the
flavour/toxicity/tropism/property entity tables with TMFV/TMTX/TMTP/TMPP
surrogate ids; :587-651 emits herb2flavour / herb2property / herb2tropism /
herb2toxicity relations). The vocabularies below are that public TCM
vocabulary (zh surface forms + the reference's English glosses); surrogate
ids follow the reference's prefix+index scheme over the fixed vocabulary
order, so they are deterministic constants — no data-dependent ranking.

In the transcript KG these attributes arrive as TEXT (a herb statement's
"其性温，味甘，归脾、肺经，无毒。" clause); the mention kernel parses the
clause and resolves each slot against these maps (flavour via the P13
containment tokenizer — functions/standardize.tokenize_against_vocab
semantics; property/tropism/toxicity via exact lookups, the reference's
`;`-split-then-dict-lookup shape).
"""

from __future__ import annotations

# (zh surface form, English gloss) — fixed order defines the surrogate ids
PROPERTY_VOCAB: list[tuple[str, str]] = [
    ("大温", "extremely warm"),
    ("大热", "extremely hot"),
    ("大寒", "extremely cold"),
    ("热", "hot"),
    ("温", "warm"),
    ("平", "neutral"),
    ("凉", "cool"),
    ("寒", "cold"),
    ("小凉", "slightly cool"),
    ("小寒", "slightly cold"),
    ("小温", "slightly warm"),
]

# the first 7 are the base flavours (pairwise substring-free — the set the
# containment tokenizer can resolve exactly); 微-prefixed variants complete
# the reference vocabulary
FLAVOUR_VOCAB: list[tuple[str, str]] = [
    ("甘", "sweet"),
    ("苦", "bitter"),
    ("辛", "pungent"),
    ("酸", "sour"),
    ("咸", "salty"),
    ("淡", "tasteless"),
    ("涩", "astringent"),
    ("微甘", "slightly sweet"),
    ("微苦", "slightly bitter"),
    ("微辛", "slightly pungent"),
    ("微酸", "slightly sour"),
    ("微咸", "slightly salty"),
    ("微涩", "slightly astringent"),
]

TROPISM_VOCAB: list[tuple[str, str]] = [
    ("胃", "stomach"),
    ("肝", "liver"),
    ("肾", "kidney"),
    ("脾", "spleen"),
    ("心", "heart"),
    ("肺", "lung"),
    ("胆", "gallbladder"),
    ("小肠", "small intestine"),
    ("大肠", "large intestine"),
    ("膀胱", "bladder"),
    ("三焦", "triple energizers"),
    ("心包", "pericardium"),
]

TOXICITY_VOCAB: list[tuple[str, str]] = [
    ("无毒", "nontoxic"),
    ("微毒", "slightly toxic"),
    ("毒", "toxic"),
    ("极毒", "extremely toxic"),
]

# pharmacologic classes: a fixed INGREDIENT-dimension vocabulary (the
# reference's pharmacologic_class entity table, extract_ingredient.py:
# 404-428, TMPC%05d ids); edges are ingredient_belong_to_pharmacologic_class
# (:451-460, merged from BOTH pharmebinet directions — BELONGS_TO plus the
# reversed INCLUDES — which the transcript analogue mirrors with the
# 归为 / 包括 dual statement forms)
PHARM_CLASS_VOCAB: list[tuple[str, str]] = [
    ("黄酮类", "flavonoids"),
    ("生物碱类", "alkaloids"),
    ("皂苷类", "saponins"),
    ("萜类", "terpenoids"),
    ("酚酸类", "phenolic acids"),
    ("木脂素类", "lignans"),
    ("香豆素类", "coumarins"),
    ("多糖类", "polysaccharides"),
    ("挥发油类", "volatile oils"),
    ("蒽醌类", "anthraquinones"),
]

# ---- gene-side fixed entity families (reference extract_other_entities.py:
# pathway :329-396 TMPW%05d, biological process :221-279 TMBP%05d, cellular
# component :19-97 TMCC%05d, molecular function :181-271 TMMF%05d). In the
# reference these are external-database entity tables merged by GO/reactome
# id; in the transcript KG they are fixed vocabularies (like pharm_class)
# whose edges arrive as statement text. Names are chosen substring-free vs
# every gazetteer alias and every other vocabulary (asserted in
# contract/kg.py), so AC scans stay oracle-predictable.
PATHWAY_VOCAB: list[tuple[str, str]] = [
    ("凋亡通路", "apoptosis pathway"),
    ("炎症通路", "inflammation pathway"),
    ("免疫通路", "immune pathway"),
    ("传导通路", "signal transduction pathway"),
    ("代谢通路", "metabolic pathway"),
    ("修复通路", "repair pathway"),
    ("周期通路", "cell cycle pathway"),
    ("分泌通路", "secretion pathway"),
]

BIOPROC_VOCAB: list[tuple[str, str]] = [
    ("增殖过程", "proliferation process"),
    ("分化过程", "differentiation process"),
    ("自噬过程", "autophagy process"),
    ("迁移过程", "migration process"),
    ("粘附过程", "adhesion process"),
    ("衰老过程", "senescence process"),
]

CELLCOMP_VOCAB: list[tuple[str, str]] = [
    ("线粒体", "mitochondrion"),
    ("细胞核", "nucleus"),
    ("内质网", "endoplasmic reticulum"),
    ("溶酶体", "lysosome"),
    ("核糖体", "ribosome"),
    ("高尔基体", "golgi apparatus"),
]

MOLFUNC_VOCAB: list[tuple[str, str]] = [
    ("激酶活性", "kinase activity"),
    ("磷酸酶活性", "phosphatase activity"),
    ("转录活性", "transcription activity"),
    ("结合活性", "binding activity"),
    ("转运活性", "transport activity"),
]

# side-effect entity family (reference extract_other_entities.py:436-496:
# PrimeKG + PharMeBINet side-effect tables xref-merged by six external-id
# keys into TMSE ids — the reference's format string "TMSE{:5d}" space-pads;
# we zero-pad like every other family and note the quirk here). In the
# transcript KG the family is a fixed vocabulary whose edges arrive as
# 必致/或致 statements (extract_ingredient.py:684-735 CAUSES_CHcSE /
# MIGHT_CAUSES_CHmcSE). The 反应/感 suffixes keep every name substring-free
# vs the symptom/disease gazetteers (asserted in contract/kg.py).
SIDEEFFECT_VOCAB: list[tuple[str, str]] = [
    ("药疹反应", "drug rash"),
    ("晕沉反应", "drowsiness"),
    ("胃逆反应", "gastric upset"),
    ("倦乏反应", "fatigue"),
    ("悸动反应", "palpitation"),
    ("浮泛反应", "edema reaction"),
    ("燥渴反应", "dry-mouth reaction"),
]

# surrogate-id scheme per the reference (extract_herb.py:491-493 TMFV%05d,
# :512-514 TMTX%05d, :547-549 TMTP%02d, :578-580 TMPP%05d)
DIM_SPECS: dict[str, tuple[list[tuple[str, str]], str, int]] = {
    "property": (PROPERTY_VOCAB, "TMPP", 5),
    "flavour": (FLAVOUR_VOCAB, "TMFV", 5),
    "tropism": (TROPISM_VOCAB, "TMTP", 2),
    "toxicity": (TOXICITY_VOCAB, "TMTX", 5),
    # ingredient dimension (extract_ingredient.py:423-424 TMPC%05d)
    "pharm_class": (PHARM_CLASS_VOCAB, "TMPC", 5),
    # gene-side families (extract_other_entities.py, prefixes per reference)
    "pathway": (PATHWAY_VOCAB, "TMPW", 5),
    "bioprocess": (BIOPROC_VOCAB, "TMBP", 5),
    "cellcomp": (CELLCOMP_VOCAB, "TMCC", 5),
    "molfunction": (MOLFUNC_VOCAB, "TMMF", 5),
    # side-effect family (extract_other_entities.py:491-493 TMSE ids)
    "sideeffect": (SIDEEFFECT_VOCAB, "TMSE", 5),
}

# kernel mention kind -> edge predicate (the reference's Relation_type
# strings, extract_herb.py:598,613,629,645)
DIM_PRED_OF_KIND = {
    "has_flavour": "herb_has_flavour",
    "has_property": "herb_has_property",
    "tropism_of": "tropism_of_herb",
    "toxicity_of": "toxicity_of_herb",
}


def dim_id(dim: str, index: int) -> str:
    """index is 0-based position in the vocabulary; ids are 1-based."""
    _, prefix, width = DIM_SPECS[dim]
    return f"{prefix}{index + 1:0{width}d}"


def dim_maps() -> dict[str, dict[str, str]]:
    """dim -> {zh surface form: surrogate id} — the kernel's lookup dicts.
    Static constants (they ship in the package zip), so no broadcast is
    needed: every executor imports the same tables."""
    return {
        dim: {zh: dim_id(dim, i) for i, (zh, _en) in enumerate(vocab)}
        for dim, (vocab, _p, _w) in DIM_SPECS.items()
    }


def dim_node_rows() -> list[dict]:
    """Node-table rows for the dimension entities (all of them — the
    vocabulary IS the entity table, like the reference's entity CSVs;
    which ones appear in edges depends on the corpus)."""
    rows = []
    for dim, (vocab, _p, _w) in DIM_SPECS.items():
        for i, (zh, en) in enumerate(vocab):
            rows.append(
                {
                    "canonical_id": dim_id(dim, i),
                    "entity_type": dim,
                    "names": [zh, en],
                    "symmap_id": None,
                    "extdb_id": None,
                    "source_records": [],
                }
            )
    return rows
