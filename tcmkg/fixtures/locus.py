"""Locus (body-part) entities + the symptom-name→locus surface map.

The reference defines a fixed locus entity table with TMLC%05d surrogate
ids (merge_tcm_symptom.py:92-98) and derives symptom→locus edges by
SUBSTRING-SCANNING a symptom attribute string against a locus surface map —
an identity map over the locus list updated with alias surfaces like
肩臂→上肢, 项→颈部, 目→眼, 咽喉→咽部, 肢体→四肢 (merge_tcm_symptom.py:
100-131). This is name-vs-name containment between two ENTITY tables —
a different join shape from the transcript text scan (J4): the probe side
is an entity's name, not a document.

Here the scanned string is the symptom entity's own names (symptoms in the
transcript KG carry no separate locus attribute column); the surface map
extends the reference's alias entries with single-character anatomical
stems (头→头部, 腰→腰部, …) so the synthetic symptom vocabulary
(颈项/肩背/肘臂/… compounds) derives meaningful edges deterministically.
"""

from __future__ import annotations

# (zh canonical, en gloss) — fixed order defines the TMLC surrogate ids
LOCUS_VOCAB: list[tuple[str, str]] = [
    ("头部", "head"),
    ("颈部", "neck"),
    ("胸部", "chest"),
    ("腹部", "abdomen"),
    ("腰部", "lumbar region"),
    ("背部", "back"),
    ("上肢", "upper limb"),
    ("下肢", "lower limb"),
    ("四肢", "limbs"),
    ("关节", "joint"),
    ("眼", "eye"),
    ("耳", "ear"),
    ("鼻", "nose"),
    ("咽部", "throat"),
    ("皮肤", "skin"),
    ("全身", "whole body"),
]

# surface form -> canonical locus zh name. Reference alias entries
# (merge_tcm_symptom.py:100-112) plus anatomical stems for the synthetic
# symptom compounds. Identity surfaces for every canonical are implied.
LOCUS_SURFACE_MAP: dict[str, str] = {
    # reference alias entries
    "肩臂": "上肢",
    "项": "颈部",
    "体表": "皮肤",
    "通身": "全身",
    "躯体": "全身",
    "目": "眼",
    "咽喉": "咽部",
    "肢体": "四肢",
    # anatomical stems (deterministic hits in the symptom vocabulary)
    "头": "头部",
    "颈": "颈部",
    "胸": "胸部",
    "胁": "胸部",
    "腹": "腹部",
    "腰": "腰部",
    "背": "背部",
    "脊": "背部",
    "肩": "上肢",
    "臂": "上肢",
    "肘": "上肢",
    "手": "上肢",
    "腕": "上肢",
    "指": "上肢",
    "髋": "下肢",
    "股": "下肢",
    "膝": "下肢",
    "胫": "下肢",
    "足": "下肢",
    "肢": "四肢",
    "咽": "咽部",
    "皮": "皮肤",
    "眉": "头部",
    "颞": "头部",
    "枕": "头部",
    "齿": "头部",
    "舌": "头部",
    "唇": "头部",
}

PRED_SYMPTOM_LOCUS = "symptom_locus"  # merge_tcm_symptom.py:127 Relation_type


def locus_id(index: int) -> str:
    """0-based vocab position -> TMLC%05d (1-based, reference scheme)."""
    return f"TMLC{index + 1:05d}"


def locus_id_map() -> dict[str, str]:
    return {zh: locus_id(i) for i, (zh, _en) in enumerate(LOCUS_VOCAB)}


def locus_surface_rows() -> list[dict]:
    """(surface, locus_id) rows — identity surfaces + alias/stem surfaces.
    Constant-size: the broadcast side of the containment join."""
    ids = locus_id_map()
    rows = [{"surface": zh, "locus_id": ids[zh]} for zh, _en in LOCUS_VOCAB]
    rows += [
        {"surface": s, "locus_id": ids[canon]}
        for s, canon in LOCUS_SURFACE_MAP.items()
    ]
    return rows


def locus_node_rows() -> list[dict]:
    """Node-table rows (entity_type='locus'), like the dimension families."""
    return [
        {
            "canonical_id": locus_id(i),
            "entity_type": "locus",
            "names": [zh, en],
            "symmap_id": None,
            "extdb_id": None,
            "source_records": [],
        }
        for i, (zh, en) in enumerate(LOCUS_VOCAB)
    ]


def derive_symptom_locus(symptom_names_by_canon: dict[str, list[str]]) -> set[tuple[str, str]]:
    """Pure-Python derivation (the oracle side): scan each canonical
    symptom entity's names for locus surfaces -> (symptom_id, locus_id)."""
    ids = locus_id_map()
    surfaces = {zh: ids[zh] for zh, _en in LOCUS_VOCAB}
    surfaces.update({s: ids[c] for s, c in LOCUS_SURFACE_MAP.items()})
    out: set[tuple[str, str]] = set()
    for canon, names in symptom_names_by_canon.items():
        for name in names:
            for s, lid in surfaces.items():
                if s in name:
                    out.add((canon, lid))
    return out
