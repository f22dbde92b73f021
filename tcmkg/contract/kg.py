"""KG queries over a deterministic transcriptization of `events`.

Every row of the driver's events table becomes one assistant transcript turn
whose text is a pure-arithmetic function of event_id — so a DuckDB oracle
can regenerate the expected triples exactly, while the Spark side must
recover them by actually parsing the text through the full pipeline
(Q2B normalization, formula-prefix resolution, token probe, dose grammar,
Aho-Corasick scans, CC-canonical entity IDs, dose weighting).

Canonical-ID constants in the oracle SQL come from the pure-Python
union-find (oracle/extractor.canonicalize_records) — independent of the
Spark CC implementation, so ID agreement is itself a differential test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures.gazetteers import (
    CANON_PREFIX,
    DISEASE_NAMES,
    FORMULA_NAMES,
    HERB_NAMES,
    SYMPTOM_NAMES,
    SYNDROME_NAMES,
    build_gazetteers,
)
from ..kernels.normalize import text_norm

# ---------------------------------------------------------------- pools ----
# Mention-pool names must be pairwise substring-free (the SQL oracle predicts
# Aho-Corasick matches positionally, so containment between planted names
# would desynchronize the two sides). Pools are selected greedily and
# deterministically from the gazetteer name lists under that constraint.
_SCAFFOLD = ["可治", "主治", "常见", "口不渴", "：", "、", "，", "。"]
_CHOSEN: list[str] = []


def _alias_universe() -> set[str]:
    """Every name the Aho-Corasick automatons know — including aliases. A
    planted name that CONTAINS any other universe name (e.g. 破伤风 ⊃ 伤风,
    an alias of 感冒) would make the AC emit an extra mention the SQL
    oracle cannot predict."""
    gaz = build_gazetteers()
    return {
        text_norm(n)
        for recs in gaz.tables().values()
        for r in recs
        for n in r.names
    }


_UNIVERSE = _alias_universe()


def _pick_free(candidates: list[str], n: int) -> list[str]:
    out: list[str] = []
    for cand in candidates:
        if len(out) >= n:
            break
        ok = all(cand not in c and c not in cand for c in _CHOSEN)
        ok = ok and all(cand not in s and s not in cand for s in _SCAFFOLD)
        ok = ok and not any(u != cand and u in cand for u in _UNIVERSE)
        if ok:
            out.append(cand)
            _CHOSEN.append(cand)
    if len(out) < n:
        raise AssertionError(f"could not select {n} substring-free names")
    return out


POOL_DOSE = ["三钱", "一两", "9g", "五分", "半两", "2两", "四钱", "6mg"]
DOSE_GRAMS = [9.375, 31.25, 9.0, 1.5625, 15.625, 62.5, 12.5, 0.006]

# ------------------------------------------------- dimension clause pools --
# Herb statements (m5==2, every eid%3==1) carry a dimension clause
# 其性P，味F…，归T…经，X。 (kernels/dims.py). Pools are the dimension
# vocabularies; FLAVOURS is the base (pairwise substring-free) prefix of the
# vocabulary so the P13 containment tokenizer resolves concatenated
# multi-flavour slots exactly.
from ..fixtures.dimensions import (  # noqa: E402
    DIM_PRED_OF_KIND,
    FLAVOUR_VOCAB,
    PROPERTY_VOCAB,
    TOXICITY_VOCAB,
    TROPISM_VOCAB,
    dim_id,
    dim_node_rows,
)

from ..fixtures.dimensions import PHARM_CLASS_VOCAB  # noqa: E402

POOL_PCLS = [zh for zh, _ in PHARM_CLASS_VOCAB]
N_PCLS = len(POOL_PCLS)
ID_PCLS = [dim_id("pharm_class", i) for i in range(N_PCLS)]

POOL_PROP = [zh for zh, _ in PROPERTY_VOCAB]
POOL_FLAV = [zh for zh, _ in FLAVOUR_VOCAB[:7]]
POOL_TROP = [zh for zh, _ in TROPISM_VOCAB]
POOL_TOX = [zh for zh, _ in TOXICITY_VOCAB]
N_PROP, N_FLAV, N_TROP, N_TOX = map(len, (POOL_PROP, POOL_FLAV, POOL_TROP, POOL_TOX))
ID_PROP = [dim_id("property", i) for i in range(N_PROP)]
ID_FLAV = [dim_id("flavour", i) for i in range(N_FLAV)]
ID_TROP = [dim_id("tropism", i) for i in range(N_TROP)]
ID_TOX = [dim_id("toxicity", i) for i in range(N_TOX)]

# ------------------------------------------- gene-side family pools (T11+) --
from ..fixtures.dimensions import (  # noqa: E402
    BIOPROC_VOCAB,
    CELLCOMP_VOCAB,
    MOLFUNC_VOCAB,
    PATHWAY_VOCAB,
    SIDEEFFECT_VOCAB,
)
POOL_PW = [zh for zh, _ in PATHWAY_VOCAB]
POOL_BPROC = [zh for zh, _ in BIOPROC_VOCAB]
POOL_CCOMP = [zh for zh, _ in CELLCOMP_VOCAB]
POOL_MFUNC = [zh for zh, _ in MOLFUNC_VOCAB]
POOL_SE = [zh for zh, _ in SIDEEFFECT_VOCAB]
N_PW, N_BPROC, N_CCOMP, N_MFUNC, N_SE = map(
    len, (POOL_PW, POOL_BPROC, POOL_CCOMP, POOL_MFUNC, POOL_SE)
)
ID_PW = [dim_id("pathway", i) for i in range(N_PW)]
ID_BPROC = [dim_id("bioprocess", i) for i in range(N_BPROC)]
ID_CCOMP = [dim_id("cellcomp", i) for i in range(N_CCOMP)]
ID_MFUNC = [dim_id("molfunction", i) for i in range(N_MFUNC)]
ID_SE = [dim_id("sideeffect", i) for i in range(N_SE)]

_GENE_MARKERS = (
    "调控", "共变", "相互作用", "升高", "降低", "关联",
    "参与", "驱动", "定位于", "活跃于", "介导", "表达",
    # late-r5 statement families: bind, side-effect certainty pair,
    # anatomy up/down-regulate, resemble (disease + ingredient), interact
    "绑定", "必致", "或致", "富集", "缺失", "相类", "协同",
    # final reference-inventory families: herb→symptom/syndrome treats,
    # disease/syndrome present symptom, pathway→disease, ingredient→GO quad
    "善治", "善解", "呈现", "引动", "增进", "削减",
    # tcm↔mm symptom mapping, both statement directions (T25)
    "对应", "溯源",
)


def _assert_gene_side_safe() -> None:
    """The gene-side vocabularies and statement markers must be (a) free
    of gazetteer aliases — existing full-turn AC scans cover the new
    clauses, so an embedded alias would emit mentions the SQL oracles
    cannot predict; (b) pairwise substring-free across the four
    vocabularies — 参与's object window is scanned by two automatons;
    (c) marker-free, and the markers themselves must not hide inside any
    alias or already-planted name."""
    vocab = POOL_PW + POOL_BPROC + POOL_CCOMP + POOL_MFUNC + POOL_SE
    for name in vocab:
        assert not any(u in name for u in _UNIVERSE), name
        assert not any(mk in name for mk in _GENE_MARKERS), name
    for a in vocab:
        for b in vocab:
            assert a == b or a not in b, (a, b)
    for mk in _GENE_MARKERS:
        assert not any(mk in u for u in _UNIVERSE), mk
        assert not any(mk in c for c in _CHOSEN), mk
        assert not any(mk in s or s in mk for s in _SCAFFOLD), mk


_assert_gene_side_safe()
_SCAFFOLD.extend(_GENE_MARKERS)  # future _pick_free calls must avoid them


def _assert_dim_fragments_safe() -> None:
    """Every inter-punctuation fragment the dimension clause can produce
    must be free of gazetteer aliases (else the AC automatons would emit
    mentions the SQL oracles cannot predict — the same invariant _pick_free
    maintains for planted names). Aliases cannot span fragments because no
    alias contains the clause punctuation (asserted)."""
    assert all(
        "，" not in u and "。" not in u and "、" not in u for u in _UNIVERSE
    ), "universe alias contains clause punctuation"
    frags: set[str] = set()
    for p in POOL_PROP:
        frags.add("其性" + p)
    for a in POOL_FLAV:
        frags.add("味" + a)
        for b in POOL_FLAV:
            if b != a:
                frags.add("味" + a + b)
    for t1 in POOL_TROP:
        frags.add("归" + t1 + "经")
        frags.add("归" + t1)
        frags.add(t1 + "经")
    for x in POOL_TOX:
        frags.add(x)
    bad = sorted(
        (u, f) for f in frags for u in _UNIVERSE if u in f
    )
    assert not bad, f"gazetteer aliases inside dimension fragments: {bad[:5]}"


_assert_dim_fragments_safe()


def _dose_grammar_safe(name: str) -> bool:
    """The reference token grammar drops/garbles some names (e.g. 三七 is
    all dose-numeral characters, so 三七9g parses as one dose mention —
    extract_prescription_herb_relation.py:31-37). Such names stay in the
    pytest fixtures (the python oracle reproduces the behavior) but are
    excluded from the SQL-oracle event pools, which predict clean parses."""
    from ..kernels.matcher import extract_herb_dose_pairs

    return all(extract_herb_dose_pairs(name + d) == [(name, d)] for d in POOL_DOSE)


# alias entries exercise canonicalization: they map to the same canonical
# entity as their primary name via the CC merge.
_safe = [h for h in HERB_NAMES if _dose_grammar_safe(h)]
POOL_HERB1 = _pick_free(_safe[:60], 37) + _pick_free(["国老", "云苓", "将军"], 3)
POOL_HERB2 = _pick_free(_safe[60:] + _safe[37:60], 40)
POOL_FORMULA = FORMULA_NAMES  # exact-lookup only (never AC-scanned)
POOL_SYM = _pick_free(SYMPTOM_NAMES, 45)
POOL_SYN = _pick_free(SYNDROME_NAMES, 15)
POOL_DIS = _pick_free(DISEASE_NAMES, 30)
# derived-entity pools (r5): canonical-DISTINCT surfaces — alias forms
# (栎精=槲皮素, 乌索酸=熊果酸, trp53=tp53, aprf=stat3, cox2=ptgs2) are
# included INSTEAD of their primaries, so each pool index is a distinct
# canonical entity (the T8 residue algebra needs pair bijectivity) while
# still exercising alias→canonical resolution through the new CC maps.
# Sizes 12 and 15: lcm=60 makes p -> (p%12, p%15) a bijection on 0..59.
POOL_INGR = _pick_free(
    ["栎精", "山奈酚", "木犀草素", "绿原酸", "齐墩果酸", "乌索酸",
     "芦丁", "青藤碱", "灯盏花素", "穿心莲内酯", "水飞蓟宾", "延胡索乙素"], 12
)
POOL_TGT = _pick_free(
    ["trp53", "egfr", "vegfa", "akt1", "aprf", "mapk1", "jak2", "nos2",
     "casp3", "bcl2", "nfkb1", "mtor", "tnfa", "cox2", "hmox1"], 15
)
# anatomy (TMAT, extract_other_entities.py:276-324) and mm_symptom (TMMS,
# extract_mm_symmptom.py) gazetteer pools — canonical-distinct surfaces,
# alias forms (海马回=海马体, 大动脉=主动脉, 眼底膜=视网膜; 紫绀=发绀,
# 昏厥=晕厥, 颤抖=震颤) included INSTEAD of their primaries so each index
# is a distinct canonical entity while still exercising the CC maps.
# 14 anatomy entries keep the T14 index arithmetic of the former locus
# pool unchanged.
POOL_ANAT = _pick_free(
    ["海马回", "垂体", "甲状腺", "肾上腺", "胸腺", "骨髓", "脊髓",
     "淋巴结", "大动脉", "支气管", "眼底膜", "角膜", "膈肌", "胰岛"], 14
)
POOL_MMS = _pick_free(
    ["紫绀", "昏厥", "谵妄", "构音障碍", "吞咽困难", "心动过速",
     "低血压", "恶病质", "共济失调", "颤抖", "瞳孔散大", "呼吸急促"], 12
)

N_F, N_H1, N_H2 = len(POOL_FORMULA), len(POOL_HERB1), len(POOL_HERB2)
N_SYM, N_SYN, N_DIS, N_D = len(POOL_SYM), len(POOL_SYN), len(POOL_DIS), len(POOL_DOSE)
N_ING, N_TGT = len(POOL_INGR), len(POOL_TGT)
N_ANAT, N_MMS = len(POOL_ANAT), len(POOL_MMS)


def _canon_maps() -> dict[str, dict[str, str]]:
    """Pure-Python canonicalization (union-find) — NO Spark involved."""
    from ..oracle.extractor import canonicalize_records

    gaz = build_gazetteers()
    maps = {}
    for etype, records in gaz.tables().items():
        _, alias2canon = canonicalize_records(records, CANON_PREFIX[etype])
        maps[etype] = alias2canon
    return maps


_MAPS = _canon_maps()


def _canon_pool(etype: str, names: list[str]) -> list[str]:
    return [_MAPS[etype][text_norm(n)] for n in names]


CANON_HERB1 = _canon_pool("herb", POOL_HERB1)
CANON_HERB2 = _canon_pool("herb", POOL_HERB2)
CANON_FORMULA = _canon_pool("formula", POOL_FORMULA)
CANON_SYM = _canon_pool("symptom", POOL_SYM)
CANON_SYN = _canon_pool("syndrome", POOL_SYN)
CANON_DIS = _canon_pool("disease", POOL_DIS)
CANON_INGR = _canon_pool("ingredient", POOL_INGR)
CANON_TGT = _canon_pool("target", POOL_TGT)
CANON_ANAT = _canon_pool("anatomy", POOL_ANAT)
CANON_MMS = _canon_pool("mm_symptom", POOL_MMS)
assert len(set(CANON_INGR)) == N_ING and len(set(CANON_TGT)) == N_TGT
assert len(set(CANON_ANAT)) == N_ANAT and len(set(CANON_MMS)) == N_MMS


# ------------------------------------------------------------ derivation ---
def _arr(pool: list[str]):
    return F.array(*[F.lit(x) for x in pool])


def _pick(pool: list[str], idx):
    return F.element_at(_arr(pool), (idx + 1).cast("int"))


def _dim_clause(eid):
    """其性P，味F[F']，归T[、T']经，X。 — index arithmetic mirrored exactly
    by the SQL derivations (the +1+offset trick keeps second picks distinct
    from the first)."""
    p = _pick(POOL_PROP, eid % N_PROP)
    f1 = _pick(POOL_FLAV, eid % N_FLAV)
    f2 = _pick(POOL_FLAV, ((eid % N_FLAV) + 1 + (F.floor(eid / 11) % 5)) % N_FLAV)
    t1 = _pick(POOL_TROP, eid % N_TROP)
    t2 = _pick(
        POOL_TROP,
        ((eid % N_TROP) + 1 + (F.floor(eid / 13) % (N_TROP - 1))) % N_TROP,
    )
    x = _pick(POOL_TOX, eid % N_TOX)
    return F.concat(
        F.lit("其性"), p,
        F.lit("，味"), f1, F.when(eid % 2 == 0, f2).otherwise(F.lit("")),
        F.lit("，归"), t1,
        F.when(eid % 4 == 0, F.concat(F.lit("、"), t2)).otherwise(F.lit("")),
        F.lit("经，"), x, F.lit("。"),
    )


def transcriptize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> transcripts(conv_id, turn_idx, role, text, tool, ts).

    The returned DataFrame is memoized per (session, sf_dir): the
    template expression tree (dozens of pool-literal picks and nested
    CASEs) costs ~1.6s of pure driver-side analysis to construct, paid
    again on every call. A DataFrame is an immutable PLAN — reusing the
    object skips only that re-analysis; every action still reads the
    parquet events fresh (nothing is persisted or cached here)."""
    global _TRANSCRIPTIZE_CACHE
    try:
        _TRANSCRIPTIZE_CACHE
    except NameError:
        _TRANSCRIPTIZE_CACHE = {}
    ck = (id(spark), sf_dir)
    hit = _TRANSCRIPTIZE_CACHE.get(ck)
    if hit is not None:
        return hit
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    conv = F.concat(F.lit("conv_"), F.lpad((F.col("user_id") % 97).cast("string"), 3, "0"))
    df = ev.select(eid.alias("eid"), conv.alias("conv_id"), "ts")
    m5 = F.col("eid") % 5
    f = _pick(POOL_FORMULA, F.col("eid") % N_F)
    h1 = _pick(POOL_HERB1, F.col("eid") % N_H1)
    h2 = _pick(POOL_HERB2, F.floor(F.col("eid") / 7) % N_H2)
    d1 = _pick(POOL_DOSE, F.col("eid") % N_D)
    d2 = _pick(POOL_DOSE, F.floor(F.col("eid") / 3) % N_D)
    s1 = _pick(POOL_SYM, F.col("eid") % N_SYM)
    s2 = _pick(POOL_SYM, F.floor(F.col("eid") / 5) % N_SYM)
    syn = _pick(POOL_SYN, F.col("eid") % N_SYN)
    dis = _pick(POOL_DIS, F.col("eid") % N_DIS)
    dis2 = _pick(POOL_DIS, F.floor(F.col("eid") / 2) % N_DIS)
    dis3 = _pick(POOL_DIS, F.floor(F.col("eid") / 4) % N_DIS)
    # derived-entity clause arithmetic (T7 on herb statements, T8 on
    # taxonomy lines) — mirrored exactly by the SQL twins below
    iA_idx = F.floor(F.col("eid") / 15) % N_ING
    iA = _pick(POOL_INGR, iA_idx)
    pcls = _pick(POOL_PCLS, F.floor(F.col("eid") / 15) % N_PCLS)
    iB = _pick(
        POOL_INGR,
        (iA_idx + 1 + (F.floor(F.col("eid") / 45) % (N_ING - 1))) % N_ING,
    )
    p60 = F.floor(F.col("eid") / 5) % 60
    g_ing = _pick(POOL_INGR, p60 % N_ING)
    g_tgt = _pick(POOL_TGT, p60 % N_TGT)
    r5 = p60 % 5
    # T9 (on m5==3 lines): ingredient→disease three-way wheel; same p60
    # pair bijection, disease from the first 15 pool entries (12×15=60)
    d_ing = _pick(POOL_INGR, p60 % N_ING)
    d_dis = _pick(POOL_DIS[:15], p60 % 15)
    dis_clause = (
        F.when(r5 == 0, F.concat(d_ing, F.lit("能治"), d_dis, F.lit("。")))
        .when(r5 == 1, F.concat(d_ing, F.lit("能致"), d_dis, F.lit("。")))
        .when(r5 == 2, F.concat(d_ing, F.lit("忌用于"), d_dis, F.lit("。")))
        # treats∩induces conflict: both edges drop corpus-wide
        .when(r5 == 3, F.concat(d_ing, F.lit("能治"), d_dis,
                                F.lit("，然亦能致"), d_dis, F.lit("。")))
        # induces + contraindicates, no treats: BOTH survive (the
        # asymmetric reference rule)
        .otherwise(F.concat(d_ing, F.lit("能致"), d_dis,
                            F.lit("，故忌用于"), d_dis, F.lit("。")))
    )
    # T17 (m5==3, BEFORE dis_clause in the turn text — the unbounded 能治
    # partition scans diseases right of the marker, so resemble diseases
    # must precede it): disease↔disease resemble wheel. rd=1/2 emit the
    # is_a pair of the NEXT event (eid+1 ≡ 4 mod 5 — the m5==4 taxonomy
    # line's own pick arithmetic) in forward/swapped order, so the
    # published-is_a kill is live in both directions at every scale; the
    # oracle replays resemble − (is_a ∪ rev is_a) over the actual event
    # sets, boundary events included.
    v3 = F.floor(F.col("eid") / 5)
    rd = F.floor(v3 / 2) % 3
    dr1_idx = v3 % N_DIS
    dr2_idx = (dr1_idx + 1 + (F.floor(v3 / 11) % (N_DIS - 1))) % N_DIS
    dR1, dR2 = _pick(POOL_DIS, dr1_idx), _pick(POOL_DIS, dr2_idx)
    e2 = F.col("eid") + 1
    dj1 = _pick(POOL_DIS, F.floor(e2 / 2) % N_DIS)
    dj2 = _pick(POOL_DIS, F.floor(e2 / 4) % N_DIS)
    disr_clause = (
        F.when(rd == 0, F.concat(dR1, F.lit("相类"), dR2, F.lit("。")))
        .when(rd == 1, F.concat(dj1, F.lit("相类"), dj2, F.lit("。")))
        .otherwise(F.concat(dj2, F.lit("相类"), dj1, F.lit("。")))
    )
    # T18/T19 (m5==4): ingredient interact (协同) and ingredient resemble
    # (相类) wheels; ri=1/3 alternate between the REVERSE of the previous
    # event-in-residue's pair (mutual — the collapse branch is live) and an
    # independently swapped pair (non-mutual survivor), gg-r=4 style.
    v4 = v3
    ri = v4 % 4
    mb = F.floor(v4 / 4) % 2
    iiA_idx = v4 % N_ING
    iiB_idx = (iiA_idx + 1 + (F.floor(v4 / 7) % (N_ING - 1))) % N_ING
    v4m1 = v4 - 1
    iiA1_idx = v4m1 % N_ING
    iiB1_idx = (iiA1_idx + 1 + (F.floor(v4m1 / 7) % (N_ING - 1))) % N_ING
    irC_idx = (v4 + 5) % N_ING
    irD_idx = (irC_idx + 1 + (F.floor(v4 / 9) % (N_ING - 1))) % N_ING
    irC1_idx = (v4m1 + 5) % N_ING
    irD1_idx = (irC1_idx + 1 + (F.floor(v4m1 / 9) % (N_ING - 1))) % N_ING
    ii_clause = (
        F.when(ri == 0, F.concat(_pick(POOL_INGR, iiA_idx), F.lit("协同"),
                                 _pick(POOL_INGR, iiB_idx), F.lit("。")))
        .when(ri == 1, F.when(
            mb == 0,
            F.concat(_pick(POOL_INGR, iiB1_idx), F.lit("协同"),
                     _pick(POOL_INGR, iiA1_idx), F.lit("。")),
        ).otherwise(
            F.concat(_pick(POOL_INGR, iiB_idx), F.lit("协同"),
                     _pick(POOL_INGR, iiA_idx), F.lit("。")),
        ))
        .when(ri == 2, F.concat(_pick(POOL_INGR, irC_idx), F.lit("相类"),
                                _pick(POOL_INGR, irD_idx), F.lit("。")))
        .otherwise(F.when(
            mb == 0,
            F.concat(_pick(POOL_INGR, irD1_idx), F.lit("相类"),
                     _pick(POOL_INGR, irC1_idx), F.lit("。")),
        ).otherwise(
            F.concat(_pick(POOL_INGR, irD_idx), F.lit("相类"),
                     _pick(POOL_INGR, irC_idx), F.lit("。")),
        ))
    )
    # T11 (m5==2, eid%3==0 — eid ≡ 12 mod 15, so eid//15 walks consecutive
    # ints): gene↔gene wheel over p75 with planted conflict (r=3: regulate
    # claims the associate pair in one turn) and swapped-direction associate
    # lines (r=4) that create MUTUAL pairs only where the r=2 set holds the
    # reverse — both algebra branches exercised, oracle replays the sets.
    p75 = F.floor(F.col("eid") / 15) % 75
    ga_idx = p75 % 15
    gb_idx = (ga_idx + 1 + (F.floor(p75 / 5) % 14)) % 15
    ga = _pick(POOL_TGT, ga_idx)
    gb = _pick(POOL_TGT, gb_idx)
    rg = p75 % 5
    # r=4 alternates between (a) the REVERSE of the r=2 line two positions
    # back — guaranteeing surviving MUTUAL pairs so the symmetric-dedup
    # branch is live at every scale (a parity argument shows the naive
    # independent-wheel construction can never produce one) — and (b) an
    # independent swapped line (the non-mutual survivor case)
    p75m2 = p75 - 2
    ga4_idx = p75m2 % 15
    gb4_idx = (ga4_idx + 1 + (F.floor(p75m2 / 5) % 14)) % 15
    use_rev = F.floor(p75 / 5) % 2 == 0
    ga4 = F.when(use_rev, _pick(POOL_TGT, ga4_idx)).otherwise(ga)
    gb4 = F.when(use_rev, _pick(POOL_TGT, gb4_idx)).otherwise(gb)
    gg_clause = (
        F.when(rg == 0, F.concat(ga, F.lit("调控"), gb, F.lit("。")))
        .when(rg == 1, F.concat(ga, F.lit("共变"), gb, F.lit("。")))
        .when(rg == 2, F.concat(ga, F.lit("相互作用"), gb, F.lit("。")))
        .when(rg == 3, F.concat(ga, F.lit("调控"), gb,
                                F.lit("，且相互作用"), gb, F.lit("。")))
        .otherwise(F.concat(gb4, F.lit("相互作用"), ga4, F.lit("。")))
    )
    # T14 (every second T11 line): anatomy express; T14b on the odd p75
    # half: anatomy up/down-regulate (p75%4==1 富集 / ==3 缺失). The
    # subject is a CC-canonicalized TMAT anatomy entity (r5: replaced the
    # former locus-vocabulary stand-in — extract_other_entities.py:276-324)
    loc = _pick(POOL_ANAT, p75 % N_ANAT)
    g2 = _pick(POOL_TGT, (p75 + 7) % 15)
    g3 = _pick(POOL_TGT, (p75 + 11) % 15)
    anat_clause = (
        F.when(p75 % 2 == 0, F.concat(loc, F.lit("表达"), g2, F.lit("。")))
        .when(p75 % 4 == 1, F.concat(loc, F.lit("富集"), g3, F.lit("。")))
        .otherwise(F.concat(loc, F.lit("缺失"), g3, F.lit("。")))
    )
    # T13 (m5==1): disease→gene wheel; residue decoupled from the pair
    # bijection's disease index via the +q//12 term
    q60 = F.floor(F.col("eid") / 5) % 60
    dgd = _pick(POOL_DIS[:12], q60 % 12)
    dgg = _pick(POOL_TGT, q60 % 15)
    rq = (q60 + F.floor(q60 / 12)) % 4
    dg_clause = (
        F.when(rq == 0, F.concat(dgd, F.lit("升高"), dgg, F.lit("。")))
        .when(rq == 1, F.concat(dgd, F.lit("降低"), dgg, F.lit("。")))
        .when(rq == 2, F.concat(dgd, F.lit("关联"), dgg, F.lit("。")))
        # assoc + up in one turn: the generic associate edge loses
        .otherwise(F.concat(dgd, F.lit("关联"), dgg,
                            F.lit("，且升高"), dgg, F.lit("。")))
    )
    # T12 (m5==3): gene→pathway/GO wheel — 参与 resolves against BOTH the
    # pathway and bioprocess vocabularies (reference parameterized-id-map
    # shape); 参与∪驱动, 定位于∪活跃于 are the multi-source union predicates
    v5 = F.floor(F.col("eid") / 5)
    w6 = v5 % 6
    u6 = F.floor(v5 / 6)
    gg0 = _pick(POOL_TGT, u6 % 15)
    go_clause = (
        F.when(w6 == 0, F.concat(gg0, F.lit("参与"), _pick(POOL_PW, u6 % N_PW), F.lit("。")))
        .when(w6 == 1, F.concat(gg0, F.lit("参与"), _pick(POOL_BPROC, u6 % N_BPROC), F.lit("。")))
        .when(w6 == 2, F.concat(gg0, F.lit("驱动"), _pick(POOL_BPROC, (u6 + 1) % N_BPROC), F.lit("。")))
        .when(w6 == 3, F.concat(gg0, F.lit("定位于"), _pick(POOL_CCOMP, u6 % N_CCOMP), F.lit("。")))
        .when(w6 == 4, F.concat(gg0, F.lit("活跃于"), _pick(POOL_CCOMP, (u6 + 1) % N_CCOMP), F.lit("。")))
        .otherwise(F.concat(gg0, F.lit("介导"), _pick(POOL_MFUNC, u6 % N_MFUNC), F.lit("。")))
    )
    # T8 wheel widened to %6 late r5: r=5 adds the bind set (plain bind on
    # even p60//6, assoc∩bind priority — associate loses to bind — on odd).
    # The pair↔p60 bijection keeps each pair on ONE residue at every scale,
    # so the oracle's per-residue CASE stays the algebra's fixed point.
    r6 = p60 % 6
    b2 = F.floor(p60 / 6) % 2
    gene_clause = (
        F.when(r6 == 0, F.concat(g_ing, F.lit("上调"), g_tgt, F.lit("。")))
        .when(r6 == 1, F.concat(g_ing, F.lit("下调"), g_tgt, F.lit("。")))
        .when(r6 == 2, F.concat(g_ing, F.lit("作用于"), g_tgt, F.lit("。")))
        # up∩down conflict in one turn: both directional edges die
        # corpus-wide, pair moves to associate (triples.gene_edges)
        .when(r6 == 3, F.concat(g_ing, F.lit("上调"), g_tgt,
                                F.lit("，亦下调"), g_tgt, F.lit("。")))
        # assoc∩up priority: the generic associate edge loses
        .when(r6 == 4, F.concat(g_ing, F.lit("作用于"), g_tgt,
                                F.lit("，且上调"), g_tgt, F.lit("。")))
        .otherwise(
            F.when(b2 == 0, F.concat(g_ing, F.lit("绑定"), g_tgt, F.lit("。")))
            .otherwise(F.concat(g_ing, F.lit("作用于"), g_tgt,
                                F.lit("，且绑定"), g_tgt, F.lit("。")))
        )
    )
    # T20-T23 (m5==2, appended after the herb statement): one social-clause
    # wheel on v=eid//5 covering herb→symptom (善治), herb→syndrome (善解),
    # disease→symptom (呈现), pathway→disease (引动), syndrome→symptom
    # (呈现 again — one marker, two subject maps; at most ONE 呈现 per turn
    # because clause_window binds the FIRST occurrence). The herb/disease
    # slots reuse the turn's own h1/dis so the whole-turn 可治 scan sees no
    # new herb×disease pairs.
    sc = v3 % 5
    scS = _pick(POOL_SYM, (v3 + 7) % N_SYM)
    # the disease-subject 呈现 targets an mm_symptom surface (the
    # reference's disease2mm_symptom.csv is disease→MODERN symptom);
    # the syndrome-subject direction keeps the TCM symptom pool
    scMm = _pick(POOL_MMS, (v3 + 7) % N_MMS)
    scSyn = _pick(POOL_SYN, (v3 + 3) % N_SYN)
    scSyn2 = _pick(POOL_SYN, (v3 + 9) % N_SYN)
    scPw = _pick(POOL_PW, v3 % N_PW)
    social_clause = (
        F.when(sc == 0, F.concat(h1, F.lit("善治"), scS, F.lit("。")))
        .when(sc == 1, F.concat(h1, F.lit("善解"), scSyn, F.lit("。")))
        .when(sc == 2, F.concat(dis, F.lit("呈现"), scMm, F.lit("。")))
        .when(sc == 3, F.concat(scPw, F.lit("引动"), dis, F.lit("。")))
        .otherwise(F.concat(scSyn2, F.lit("呈现"), scS, F.lit("。")))
    )
    # T24 (m5==4, appended last): ingredient→pathway/GO quad wheel
    # (extract_ingredient.py:550-676). gq=2 plants the SAME (ing, BP) pair
    # through two statement kinds (参与 ASSOCIATES + 增进 INCREASES) — the
    # published predicate is their union, so exactly one edge survives;
    # gq=4's second sentence plants the DECREASES kind (削减). The clause
    # sits at the END of the turn, so its ingredient is right of every
    # unbounded marker (those scan ingredients only LEFT) and it introduces
    # no targets/diseases for the whole-turn scans to see.
    gq = v3 % 5
    goI = _pick(POOL_INGR, (v3 + 4) % N_ING)
    goPw = _pick(POOL_PW, (v3 + 1) % N_PW)
    goBp = _pick(POOL_BPROC, v3 % N_BPROC)
    goBp2 = _pick(POOL_BPROC, (v3 + 2) % N_BPROC)
    goCc = _pick(POOL_CCOMP, v3 % N_CCOMP)
    goCc2 = _pick(POOL_CCOMP, (v3 + 3) % N_CCOMP)
    goMf = _pick(POOL_MFUNC, v3 % N_MFUNC)
    ing_go_clause = (
        F.when(gq == 0, F.concat(goI, F.lit("参与"), goPw, F.lit("。")))
        .when(gq == 1, F.concat(goI, F.lit("参与"), goBp, F.lit("。")))
        .when(gq == 2, F.concat(goI, F.lit("参与"), goBp, F.lit("。"),
                                goI, F.lit("增进"), goBp, F.lit("。")))
        .when(gq == 3, F.concat(goI, F.lit("定位于"), goCc, F.lit("。"),
                                goI, F.lit("增进"), goCc2, F.lit("。")))
        .otherwise(F.concat(goI, F.lit("介导"), goMf, F.lit("。"),
                            goI, F.lit("削减"), goBp2, F.lit("。")))
    )
    # T25 (m5==4, appended after the GO quad): tcm↔mm symptom mapping
    # wheel (merge_tcm_symptom.py:213-239 tcm_symptom_map_mm_symptom —
    # the reference merges the symmap tcm→mm direction with the REVERSED
    # cpmcp mm→tcm direction into one set). tm3=0 states it tcm-first
    # (对应), tm3=1 mm-first (溯源), tm3=2 plants BOTH directions of the
    # same pair — the union dedup must yield ONE edge. All residues emit
    # the same (sym, mm) index pair, so the oracle is a uniform pick; a
    # Spark side that mis-parses either direction loses a residue's pairs
    # and hash-mismatches. Safe on m5==4: the turn has no 主治/常见/善治/
    # 呈现 handler, so the planted symptom is invisible to every other
    # scan, and both markers are sentence-bounded.
    mmS = _pick(POOL_SYM, (v3 + 13) % N_SYM)
    mmM = _pick(POOL_MMS, v3 % N_MMS)
    tm3 = v3 % 3
    mm_clause = (
        F.when(tm3 == 0, F.concat(mmS, F.lit("对应"), mmM, F.lit("。")))
        .when(tm3 == 1, F.concat(mmM, F.lit("溯源"), mmS, F.lit("。")))
        .otherwise(F.concat(mmS, F.lit("对应"), mmM, F.lit("。"),
                            mmM, F.lit("溯源"), mmS, F.lit("。")))
    )
    # T16 (m5==4): ingredient→side-effect certainty wheel; rs=2 plants a
    # pair claimed by BOTH certainty sets — no de-conflict, both publish
    se_ing = _pick(POOL_INGR, p60 % N_ING)
    se_obj = _pick(POOL_SE, (p60 + F.floor(p60 / 12)) % N_SE)
    rs = F.floor(p60 / 4) % 3
    se_clause = (
        F.when(rs == 0, F.concat(se_ing, F.lit("必致"), se_obj, F.lit("。")))
        .when(rs == 1, F.concat(se_ing, F.lit("或致"), se_obj, F.lit("。")))
        .otherwise(F.concat(se_ing, F.lit("必致"), se_obj, F.lit("。"),
                            se_ing, F.lit("或致"), se_obj, F.lit("。")))
    )

    # One projection PER m5 residue, unioned — not a single 5-way CASE.
    # The single-expression form grew past the JVM's 64KB generated-method
    # limit when the T25 clause landed ("Failed to compile the generated
    # Java code" → whole-PROJECTION interpreted fallback, ~5× slower on
    # the bench's events leg). Splitting by residue keeps every generated
    # method small enough for codegen; each branch scans the (tiny
    # relative to 100 TB) events parquet with the residue filter pushed
    # down, and the row set is identical by construction.
    branch_texts = {
        0: F.concat(f, F.lit("："), h1, d1, F.lit("、"), h2, d2, F.lit("。")),
        1: (
            F.concat(
                # every 7th indication line is a carry-forward ("亦主治…"):
                # no formula prefix — the pipeline must attach it to the last
                # anchored formula of the conversation, in stable turn order
                F.when(F.col("eid") % 7 == 0, F.lit("亦")).otherwise(f),
                F.lit("主治"), s1, F.lit("，"), s2,
                F.when(F.col("eid") % 3 == 0, F.concat(F.lit("，"), syn)).otherwise(F.lit("")),
                F.when(F.col("eid") % 31 == 0, F.lit("，口不渴")).otherwise(F.lit("")),
                F.lit("。"),
                dg_clause,  # T13: disease→gene statement
            )
        ),
        2: (
            F.concat(
                h1, F.lit("可治"), dis,
                # the treats pair set cycles with eid mod 600 (lcm of the
                # pick moduli x 5); a conflict condition aligned to that
                # cycle (eid ≡ 22 mod 600) kills exactly one pair residue at
                # EVERY scale — a kill rule coprime to the cycle (e.g. %11)
                # would eventually erase the whole predicate
                F.when(
                    F.col("eid") % 600 == 22,
                    F.concat(F.lit("。但"), h1, F.lit("可致"), dis),
                ).otherwise(F.lit("")),
                F.lit("。"),
                # dimension clause (every eid%3==1 herb statement): property
                # single, flavour 1-2 concatenated base terms, tropism 1-2
                # 、-joined terms, toxicity single — kernels/dims.py slots
                F.when(F.col("eid") % 3 == 1, _dim_clause(F.col("eid"))).otherwise(
                    F.lit("")
                ),
                # T7 (eid%3==2, disjoint from the dim-clause residue): the
                # statement's herb 含有 one or two ingredients -> the
                # herb_consistof_ingredient derived-entity edge; odd eids
                # (no second ingredient) may carry a T10 pharm-class
                # clause in either statement direction
                F.when(
                    F.col("eid") % 3 == 2,
                    F.concat(
                        F.lit("含有"), iA,
                        F.when(F.col("eid") % 2 == 0,
                               F.concat(F.lit("、"), iB)).otherwise(F.lit("")),
                        F.lit("。"),
                        F.when(F.col("eid") % 4 == 1,
                               F.concat(F.lit("归为"), pcls, F.lit("。")))
                        .when(F.col("eid") % 4 == 3,
                              F.concat(pcls, F.lit("包括"), iA, F.lit("。")))
                        .otherwise(F.lit("")),
                    ),
                ).otherwise(F.lit("")),
                # T11+T14 (eid%3==0, disjoint from the dim/T7 residues):
                # gene↔gene statement + anatomy-express clause
                F.when(
                    F.col("eid") % 3 == 0, F.concat(gg_clause, anat_clause)
                ).otherwise(F.lit("")),
                # T20-T23 social-clause wheel (herb/disease slots reuse
                # h1/dis — see the wheel's construction note)
                social_clause,
            )
        ),
        # m5 == 3: syndrome-symptom line + T17 (disease resemble — must
        # precede the 能治 marker, see disr_clause note) + T9
        # (ingredient→disease wheel) + T12 (gene→pathway/GO wheel)
        3: F.concat(syn, F.lit("常见"), s1, F.lit("，"), s2,
                    F.lit("。"), disr_clause, dis_clause, go_clause),
        # m5 == 4: disease taxonomy line -> disease_is_a_disease with the
        # antisymmetry rule (both directions present corpus-wide -> both
        # die) + T8 (ingredient→gene wheel with planted conflict and
        # priority residues) + T16 side-effect + T18/T19 interact/resemble
        # + T24 ingredient→pathway/GO quad (its ingredient must stay right
        # of every unbounded marker — the T25 mm clause after it introduces
        # no ingredients/targets/diseases, so the quad's invariant holds)
        # + T25 tcm↔mm mapping
        4: F.concat(dis2, F.lit("属于"), dis3, F.lit("。"), gene_clause,
                    se_clause, ii_clause, ing_go_clause, mm_clause),
    }
    parts = [
        df.filter(m5 == k).withColumn("text", t)
        for k, t in branch_texts.items()
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    w = Window.partitionBy("conv_id").orderBy("ts", "eid")
    out = un.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )
    _TRANSCRIPTIZE_CACHE[ck] = out
    return out


def _pipeline(spark: SparkSession):
    """One KGPipeline per Spark session (gazetteer CC is reusable)."""
    global _PIPELINE_CACHE
    try:
        _PIPELINE_CACHE
    except NameError:
        _PIPELINE_CACHE = {}
    key = id(spark)
    if key not in _PIPELINE_CACHE:
        from ..session import package_zip
        try:
            spark.sparkContext.addPyFile(package_zip())
        except Exception:
            pass
        # the driver supplies its own session; right-size the runtime-
        # settable knobs (a 200-partition default makes the CC loop and the
        # small contract tables schedule-bound)
        try:
            par = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(8, par)))
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        except Exception:
            pass
        from ..pipeline.runner import KGPipeline

        _PIPELINE_CACHE[key] = KGPipeline(spark)
    return _PIPELINE_CACHE[key]


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline(spark).triples(transcriptize(spark, sf_dir))


# ---------------------------------------------------------- SQL helpers ----
def _sql_list(pool: list[str]) -> str:
    inner = ",".join("'" + x.replace("'", "''") + "'" for x in pool)
    return f"[{inner}]"


def _sql_pick(pool: list[str], idx_expr: str) -> str:
    return f"({_sql_list(pool)})[({idx_expr}) + 1]"


def _sql_pick_d(vals: list[float], idx_expr: str) -> str:
    inner = ",".join(repr(v) for v in vals)
    return f"([{inner}])[({idx_expr}) + 1]"


# ---------------------------------------------------------------- queries --
def q_kg_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return (
        t.filter(F.col("pred") == "formula_contains_herb")
        .select("subj", "obj", F.round("weight", 6).alias("weight"))
    )


SQL_KG_CONTAINS = f"""
WITH tr AS (SELECT event_id AS eid FROM events WHERE event_id % 5 = 0),
rows AS (
  SELECT {_sql_pick(CANON_FORMULA, f'eid % {N_F}')} AS subj,
         {_sql_pick(CANON_HERB1, f'eid % {N_H1}')} AS obj,
         {_sql_pick_d(DOSE_GRAMS, f'eid % {N_D}')} AS amt
  FROM tr
  UNION ALL
  SELECT {_sql_pick(CANON_FORMULA, f'eid % {N_F}')},
         {_sql_pick(CANON_HERB2, f'(eid // 7) % {N_H2}')},
         {_sql_pick_d(DOSE_GRAMS, f'(eid // 3) % {N_D}')}
  FROM tr
),
tot AS (SELECT subj, sum(amt) AS total FROM rows GROUP BY subj)
SELECT r.subj AS subj, r.obj AS obj,
       ROUND(SUM(r.amt / t.total), 6)::DOUBLE AS weight
FROM rows r JOIN tot t USING (subj)
GROUP BY r.subj, r.obj
"""


def q_kg_stream_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming path vs the BATCH oracle: land the transcript
    corpus as files (whole conversations per file), run incremental_mentions
    (availableNow micro-batches through the same kernel, epoch-keyed
    idempotent sink), assemble triples from the landed partials — the
    formula_contains_herb weights must hash-match SQL_KG_CONTAINS exactly,
    proving stream==batch equivalence end to end."""
    import os
    import tempfile

    from ..pipeline.triples import assemble_triples
    from ..streaming.ingest import incremental_mentions

    p = _pipeline(spark)
    tmp = tempfile.mkdtemp(prefix="tcmkg_stream_contract_")
    landing = os.path.join(tmp, "landing")
    out = os.path.join(tmp, "mentions")
    ckpt = os.path.join(tmp, "ckpt")
    # whole conversations per file (the carry-forward unit): hash-cluster
    # conversations into a handful of files -> several micro-batches
    transcriptize(spark, sf_dir).repartition(8, "conv_id").write.mode(
        "overwrite"
    ).parquet(landing)
    q = incremental_mentions(spark, landing, out, ckpt, pipeline=p)
    assert q.awaitTermination(600), "streaming query timed out (600s)"
    t = assemble_triples(spark.read.parquet(out))
    return _materialize_then_cleanup(
        spark,
        t.filter(F.col("pred") == "formula_contains_herb").select(
            "subj", "obj", F.round("weight", 6).alias("weight")
        ),
        tmp,
    )


def _materialize_then_cleanup(spark: SparkSession, df: DataFrame, tmp: str) -> DataFrame:
    """Collect the (small) final result and rebuild it as a local DataFrame
    so the temp landing/checkpoint directory can be deleted immediately —
    repeated gate runs must not accumulate corpus copies in /tmp."""
    import shutil

    rows = df.collect()
    out = spark.createDataFrame(rows, df.schema)
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_kg_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful streaming vs the BATCH oracle: every
    conversation is SPLIT into three turn-thirds landed as three
    time-ordered files, one file per micro-batch — so a carry-forward line
    can only resolve through applyInPandasWithState state from an earlier
    micro-batch. The assembled formula_contains_herb weights must still
    hash-match SQL_KG_CONTAINS."""
    import os
    import tempfile

    from ..pipeline.triples import assemble_triples
    from ..streaming.ingest import incremental_triples_stateful

    p = _pipeline(spark)
    tmp = tempfile.mkdtemp(prefix="tcmkg_stateful_contract_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    pdf = transcriptize(spark, sf_dir).toPandas()
    pdf["tool"] = pdf["tool"].astype("string")  # all-null col: keep string type
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    rank = pdf.groupby("conv_id")["turn_idx"].rank(method="first")
    size = pdf.groupby("conv_id")["turn_idx"].transform("count")
    third = ((rank - 1) * 3 // size).astype(int)
    for i in range(3):
        _land_file(pdf[third == i], os.path.join(landing, f"chunk_{i}.parquet"),
                   1_700_000_000 + i * 60)
    q = incremental_triples_stateful(
        spark, landing, os.path.join(tmp, "mentions"), os.path.join(tmp, "ckpt"),
        pipeline=p, max_files_per_trigger=1,
    )
    assert q.awaitTermination(600), "streaming query timed out (600s)"
    t = assemble_triples(spark.read.parquet(os.path.join(tmp, "mentions")))
    return _materialize_then_cleanup(
        spark,
        t.filter(F.col("pred") == "formula_contains_herb").select(
            "subj", "obj", F.round("weight", 6).alias("weight")
        ),
        tmp,
    )


def q_kg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BATCH maintenance vs the full-batch oracle: the corpus
    lands in two tranches (whole conversations per tranche), each processed
    by run_incremental — only unseen files are read, mention partials merge
    across tranches (they are combinable by construction), and the final
    formula_contains_herb weights must hash-match SQL_KG_CONTAINS exactly:
    two incremental runs ≡ one full-batch run."""
    import os
    import shutil
    import tempfile

    p = _pipeline(spark)
    tmp = tempfile.mkdtemp(prefix="tcmkg_incr_contract_")
    landing = os.path.join(tmp, "landing")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(landing)
    full = transcriptize(spark, sf_dir)
    half = F.crc32(F.col("conv_id")) % 2 == 0
    tranche_a = os.path.join(tmp, "a")
    tranche_b = os.path.join(tmp, "b")
    full.filter(half).repartition(4, "conv_id").write.parquet(tranche_a)
    full.filter(~half).repartition(4, "conv_id").write.parquet(tranche_b)

    def _land(src: str, prefix: str) -> None:
        for i, f in enumerate(sorted(os.listdir(src))):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f), os.path.join(landing, f"{prefix}_{i}.parquet"))

    _land(tranche_a, "t0")
    p.run_incremental(landing, ckpt)  # tranche 1
    _land(tranche_b, "t1")
    out = p.run_incremental(landing, ckpt)  # tranche 2: only the new files
    t = out["triples"]
    return _materialize_then_cleanup(
        spark,
        t.filter(F.col("pred") == "formula_contains_herb").select(
            "subj", "obj", F.round("weight", 6).alias("weight")
        ),
        tmp,
    )


def _land_file(pdf, path: str, mtime: int) -> None:
    """Write one landing parquet with a pinned mtime (the streaming file
    source orders micro-batches by mtime, oldest first)."""
    import os

    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    os.utime(path, (mtime, mtime))


def q_kg_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming feed dedup vs a batch oracle: the corpus is
    landed TWICE (full copy in each of two micro-batch files — every row a
    cross-batch duplicate) plus an in-file duplication of the first file;
    stream_dedup_turns must surface each (conv_id, turn_idx) exactly once,
    so per-conversation counts and turn-idx checksums equal the batch
    distinct oracle."""
    import os
    import tempfile

    from ..streaming.ingest import stream_dedup_turns, stream_transcripts

    tmp = tempfile.mkdtemp(prefix="tcmkg_streamdedup_contract_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    pdf = transcriptize(spark, sf_dir).toPandas()
    pdf["tool"] = pdf["tool"].astype("string")  # all-null col: keep string type
    import pandas as pd

    _land_file(pd.concat([pdf, pdf.head(len(pdf) // 2)]),
               os.path.join(landing, "a.parquet"), 1_700_000_000)  # in-file dups
    _land_file(pdf, os.path.join(landing, "b.parquet"), 1_700_000_060)  # replay

    deduped = stream_dedup_turns(
        stream_transcripts(spark, landing, max_files_per_trigger=1),
        watermark="365 days",  # synthetic ts span: keep every key in state
    )
    name = f"stream_dedup_{abs(hash(tmp)) % 10**9}"
    q = (
        deduped.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "streaming query timed out (600s)"
    out = spark.sql(
        f"SELECT conv_id, count(*) AS n_turns, sum(turn_idx) AS idx_sum "
        f"FROM {name} GROUP BY conv_id"
    ).select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("idx_sum").cast("long").alias("idx_sum"),
    )
    result = _materialize_then_cleanup(spark, out, tmp)
    # free the memory sink: repeated gate runs in one long-lived session
    # must not accumulate pinned row sets
    spark.catalog.dropTempView(name)
    return result


def q_kg_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation vs the batch
    window oracle (§2.8 'windowed aggs for late data'): the corpus lands
    in TWO micro-batch files, the second carrying only LATE rows — event
    times interleaved with (and older than) everything batch 1 already
    processed. With the lateness inside the watermark horizon,
    streaming_turn_stats must put every late row in its EVENT-TIME window,
    not its arrival window, so per-(day-window, conv) counts hash-match a
    plain batch GROUP BY time-bucket — the stream/batch equivalence that
    makes the operator trustworthy for incremental rollups.

    Scope note: outputMode('complete') keeps all window state and never
    drops late rows, so this verifies EVENT-TIME WINDOW ASSIGNMENT across
    micro-batches, not watermark-based eviction/emission; the append-mode
    eviction path is exercised by tests/test_streaming.py's
    watermark-bounded cases."""
    import os
    import tempfile

    from ..streaming.ingest import stream_transcripts, streaming_turn_stats

    tmp = tempfile.mkdtemp(prefix="tcmkg_streamwin_contract_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    pdf = transcriptize(spark, sf_dir).toPandas()
    pdf["tool"] = pdf["tool"].astype("string")  # all-null col: keep string type
    late = pdf["turn_idx"] % 7 == 3  # deterministic, scattered across event time
    _land_file(pdf[~late], os.path.join(landing, "a.parquet"), 1_700_000_000)
    _land_file(pdf[late], os.path.join(landing, "b.parquet"), 1_700_000_060)

    stats = streaming_turn_stats(
        stream_transcripts(spark, landing, max_files_per_trigger=1),
        window="24 hours",
        watermark="3650 days",  # synthetic ts span: no late row falls off
    )
    name = f"stream_win_{abs(hash(tmp)) % 10**9}"
    q = (
        stats.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "streaming query timed out (600s)"
    out = spark.table(name).select(
        F.unix_timestamp("w_start").alias("w_start_epoch"),
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
    )
    result = _materialize_then_cleanup(spark, out, tmp)
    spark.catalog.dropTempView(name)
    return result


SQL_KG_STREAM_WINDOW = """
SELECT (floor(epoch(ts) / 86400)::BIGINT) * 86400 AS w_start_epoch,
       'conv_' || lpad((user_id % 97)::VARCHAR, 3, '0') AS conv_id,
       count(*)::BIGINT AS n_turns
FROM events
GROUP BY 1, 2
"""


SQL_KG_STREAM_DEDUP = """
WITH tr AS (
  SELECT 'conv_' || lpad((user_id % 97)::VARCHAR, 3, '0') AS conv_id,
         row_number() OVER (PARTITION BY user_id % 97 ORDER BY ts, event_id) - 1 AS turn_idx
  FROM events
)
SELECT conv_id, count(*)::BIGINT AS n_turns, sum(turn_idx)::BIGINT AS idx_sum
FROM tr GROUP BY conv_id
"""


# planted near-miss herb variants (tier-3 linking inputs): real-name
# decorations/typos that exact/probe linking cannot resolve
SOFT_LINK_TOKENS = [
    "甘草霜", "红参须", "川黄连片", "炒白术粉", "野山参",
    "zzz无关词", "丹参滴", "枸杞子干",
]


def q_kg_soft_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-3 entity linking (north-star: 'alias + context embedding
    similarity'): embedding-cosine top-1 link of unresolved tokens against
    the herb gazetteer. The oracle VALUES table is computed by a direct
    driver-side numpy evaluation over the pure-Python canonical map — the
    differential verifies the Spark side's broadcast + Arrow batching +
    threshold filter (`sf_dir` unused: the gazetteer is the corpus)."""
    from ..pipeline.linking import soft_link

    p = _pipeline(spark)
    toks = spark.createDataFrame([(t,) for t in SOFT_LINK_TOKENS], "token string")
    out = soft_link(spark, toks, p.maps["herb"], threshold=0.6)
    return out.select(
        "token", "canonical_id", "matched_alias", F.round("sim", 6).alias("sim")
    )


def _sql_kg_soft_link() -> str:
    import numpy as np
    import pandas as pd

    from ..pipeline.linking import _encode_names

    alias_map = {text_norm(a): c for a, c in _MAPS["herb"].items()}
    aliases = sorted(alias_map)
    gaz = _encode_names(pd.Series(aliases))
    toks = _encode_names(pd.Series(SOFT_LINK_TOKENS))
    sims = toks @ gaz.T
    best = sims.argmax(axis=1)
    rows = []
    for i, t in enumerate(SOFT_LINK_TOKENS):
        s = float(sims[i, best[i]])
        if s >= 0.6:
            a = aliases[best[i]]
            rows.append(
                f"('{t}','{alias_map[a]}','{a}',{round(s, 6)!r})"
            )
    return (
        "SELECT token, canonical_id, matched_alias, sim::DOUBLE AS sim "
        "FROM (VALUES\n" + ",\n".join(rows) +
        "\n) AS t(token, canonical_id, matched_alias, sim)"
    )


def q_kg_treats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "herb_treats_disease").select("subj", "obj")


SQL_KG_TREATS = f"""
SELECT DISTINCT {_sql_pick(CANON_HERB1, f'event_id % {N_H1}')} AS subj,
                {_sql_pick(CANON_DIS, f'event_id % {N_DIS}')} AS obj
FROM events WHERE event_id % 5 = 2
EXCEPT
SELECT {_sql_pick(CANON_HERB1, f'event_id % {N_H1}')},
       {_sql_pick(CANON_DIS, f'event_id % {N_DIS}')}
FROM events WHERE event_id % 600 = 22
"""


def q_kg_is_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "disease_is_a_disease").select("subj", "obj")


SQL_KG_IS_A = f"""
WITH pairs AS (
  SELECT DISTINCT {_sql_pick(CANON_DIS, f'(event_id // 2) % {N_DIS}')} AS subj,
                  {_sql_pick(CANON_DIS, f'(event_id // 4) % {N_DIS}')} AS obj
  FROM events WHERE event_id % 5 = 4
)
SELECT p.subj, p.obj FROM pairs p
WHERE p.subj <> p.obj
  AND NOT EXISTS (SELECT 1 FROM pairs r WHERE r.subj = p.obj AND r.obj = p.subj)
"""


def q_kg_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop traversal ON THE KG ITSELF: herb —treats→ disease —is_a→
    disease (the forward+reverse walk of merge_utility.py:11-34 applied to
    this graph's own predicates). The oracle composes the treats and is_a
    oracles and replays the join — so both edge derivations AND the
    traversal are hash-verified together. At scale this is exactly the
    join two_hop runs bucket-local over the materialized copies
    (tests/test_round3.py asserts the zero-exchange plan)."""
    t = _triples(spark, sf_dir)
    e1 = t.filter(F.col("pred") == "herb_treats_disease").select(
        F.col("subj").alias("herb"), F.col("obj").alias("via")
    )
    e2 = t.filter(F.col("pred") == "disease_is_a_disease").select(
        F.col("subj").alias("via"), F.col("obj").alias("disease")
    )
    return e1.join(e2, "via").select("herb", "via", "disease").distinct()


SQL_KG_TWO_HOP = f"""
WITH treats AS ({SQL_KG_TREATS}),
isa AS ({SQL_KG_IS_A})
SELECT DISTINCT t.subj AS herb, t.obj AS via, i.obj AS disease
FROM treats t JOIN isa i ON t.obj = i.subj
"""


def q_kg_p_symptom(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "prescription_treat_symptom").select("subj", "obj")


# carried-formula CTE: anchor = own formula on prescription lines and
# resolved indication lines; carry-forward lines (eid%7==0) inherit the last
# anchor in stable turn order — the SQL twin of resolve_anchors' window.
_SQL_CARRIED = f"""
tr AS (
  SELECT event_id AS eid, user_id % 97 AS conv,
         row_number() OVER (PARTITION BY user_id % 97 ORDER BY ts, event_id) - 1 AS tix
  FROM events
),
anch AS (
  SELECT eid, conv, tix,
         CASE WHEN eid % 5 = 0 OR (eid % 5 = 1 AND eid % 7 <> 0)
              THEN {_sql_pick(CANON_FORMULA, f'eid % {N_F}')} END AS anchor
  FROM tr
),
carried AS (
  SELECT eid,
         last_value(anchor IGNORE NULLS) OVER (
           PARTITION BY conv ORDER BY tix
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
  FROM anch
)
"""

SQL_KG_P_SYMPTOM = f"""
WITH {_SQL_CARRIED},
base AS (
  SELECT eid, cur FROM carried
  WHERE eid % 5 = 1 AND eid % 31 <> 0 AND cur IS NOT NULL
),
pairs AS (
  SELECT DISTINCT subj, obj FROM (
    SELECT cur AS subj, {_sql_pick(CANON_SYM, f'eid % {N_SYM}')} AS obj FROM base
    UNION
    SELECT cur, {_sql_pick(CANON_SYM, f'(eid // 5) % {N_SYM}')} FROM base
  )
),
deg AS (SELECT subj, count(DISTINCT obj) AS n FROM pairs GROUP BY subj)
SELECT p.subj AS subj, p.obj AS obj FROM pairs p JOIN deg d USING (subj)
WHERE d.n < 50
"""


def q_kg_p_syndrome(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "prescription_treat_syndrome").select("subj", "obj")


SQL_KG_P_SYNDROME = f"""
WITH {_SQL_CARRIED}
SELECT DISTINCT cur AS subj,
                {_sql_pick(CANON_SYN, f'eid % {N_SYN}')} AS obj
FROM carried WHERE eid % 5 = 1 AND eid % 3 = 0 AND cur IS NOT NULL
"""


def q_kg_indicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "symptom_indicates_syndrome").select("subj", "obj")


SQL_KG_INDICATES = f"""
WITH base AS (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3)
SELECT DISTINCT subj, obj FROM (
  SELECT {_sql_pick(CANON_SYM, f'eid % {N_SYM}')} AS subj,
         {_sql_pick(CANON_SYN, f'eid % {N_SYN}')} AS obj FROM base
  UNION
  SELECT {_sql_pick(CANON_SYM, f'(eid // 5) % {N_SYM}')},
         {_sql_pick(CANON_SYN, f'eid % {N_SYN}')} FROM base
)
"""


def q_kg_turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn ordering + ingest: per-conversation count, turn-idx
    checksum, and time span in seconds (tz-independent)."""
    from ..pipeline.extract import ingest

    turns = ingest(transcriptize(spark, sf_dir))
    return turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("turn_idx").cast("long").alias("idx_sum"),
        # parquet ts is TIMESTAMP_NTZ; cast before unix_micros. Only the
        # difference is returned, so the session-tz offset cancels.
        (
            F.max(F.unix_micros(F.col("ts").cast("timestamp")))
            - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        )
        .cast("long")
        .alias("span_us"),
    )


SQL_KG_TURN_ORDER = """
WITH tr AS (
  SELECT 'conv_' || lpad((user_id % 97)::VARCHAR, 3, '0') AS conv_id,
         row_number() OVER (PARTITION BY user_id % 97 ORDER BY ts, event_id) - 1 AS turn_idx,
         ts
  FROM events
)
SELECT conv_id, count(*)::BIGINT AS n_turns, sum(turn_idx)::BIGINT AS idx_sum,
       (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS span_us
FROM tr GROUP BY conv_id
"""


def q_kg_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn text equality through ingest: the kept rows' raw text must
    equal the deterministic derivation, turn for turn."""
    from ..pipeline.extract import ingest

    return ingest(transcriptize(spark, sf_dir)).select("conv_id", "turn_idx", "text")


def _sql_text_derivation() -> str:
    f = _sql_pick(POOL_FORMULA, f"eid % {N_F}")
    h1 = _sql_pick(POOL_HERB1, f"eid % {N_H1}")
    h2 = _sql_pick(POOL_HERB2, f"(eid // 7) % {N_H2}")
    d1 = _sql_pick(POOL_DOSE, f"eid % {N_D}")
    d2 = _sql_pick(POOL_DOSE, f"(eid // 3) % {N_D}")
    s1 = _sql_pick(POOL_SYM, f"eid % {N_SYM}")
    s2 = _sql_pick(POOL_SYM, f"(eid // 5) % {N_SYM}")
    syn = _sql_pick(POOL_SYN, f"eid % {N_SYN}")
    dis = _sql_pick(POOL_DIS, f"eid % {N_DIS}")
    dis2 = _sql_pick(POOL_DIS, f"(eid // 2) % {N_DIS}")
    dis3 = _sql_pick(POOL_DIS, f"(eid // 4) % {N_DIS}")
    iA = _sql_pick(POOL_INGR, _SQL_IA_IDX)
    iB = _sql_pick(POOL_INGR, _SQL_IB_IDX)
    g_ing = _sql_pick(POOL_INGR, f"{_SQL_P60} % {N_ING}")
    g_tgt = _sql_pick(POOL_TGT, f"{_SQL_P60} % {N_TGT}")
    d_dis = _sql_pick(POOL_DIS[:15], f"{_SQL_P60} % 15")
    pcls = _sql_pick(POOL_PCLS, f"(eid // 15) % {N_PCLS}")
    # T16 side-effect clause twins (subject shares g_ing's index)
    se_ing = g_ing
    se_obj = _sql_pick(POOL_SE, f"(({_SQL_P60}) + (({_SQL_P60}) // 12)) % {N_SE}")
    # T17-T19 resemble/interact clause twins
    dr1 = _sql_pick(POOL_DIS, _SQL_DR1)
    dr2 = _sql_pick(POOL_DIS, _SQL_DR2)
    dj1 = _sql_pick(POOL_DIS, _SQL_DJ1)
    dj2 = _sql_pick(POOL_DIS, _SQL_DJ2)
    iiA = _sql_pick(POOL_INGR, _SQL_IIA)
    iiB = _sql_pick(POOL_INGR, _SQL_IIB)
    iiA1 = _sql_pick(POOL_INGR, _SQL_IIA1)
    iiB1 = _sql_pick(POOL_INGR, _SQL_IIB1)
    irC = _sql_pick(POOL_INGR, _SQL_IRC)
    irD = _sql_pick(POOL_INGR, _SQL_IRD)
    irC1 = _sql_pick(POOL_INGR, _SQL_IRC1)
    irD1 = _sql_pick(POOL_INGR, _SQL_IRD1)
    # gene-side clause twins (T11-T14)
    ga = _sql_pick(POOL_TGT, _SQL_GA_IDX)
    gb = _sql_pick(POOL_TGT, _SQL_GB_IDX)
    ga4 = _sql_pick(POOL_TGT, _SQL_GA4_IDX)
    gb4 = _sql_pick(POOL_TGT, _SQL_GB4_IDX)
    loc = _sql_pick(POOL_ANAT, f"({_SQL_P75}) % {N_ANAT}")
    g2 = _sql_pick(POOL_TGT, f"(({_SQL_P75}) + 7) % 15")
    g3 = _sql_pick(POOL_TGT, f"(({_SQL_P75}) + 11) % 15")
    dgd = _sql_pick(POOL_DIS[:12], f"({_SQL_P60}) % 12")
    dgg = _sql_pick(POOL_TGT, f"({_SQL_P60}) % 15")
    g0 = _sql_pick(POOL_TGT, f"({_SQL_U6}) % 15")
    pw = _sql_pick(POOL_PW, f"({_SQL_U6}) % {N_PW}")
    bp1 = _sql_pick(POOL_BPROC, f"({_SQL_U6}) % {N_BPROC}")
    bp2 = _sql_pick(POOL_BPROC, f"(({_SQL_U6}) + 1) % {N_BPROC}")
    cc1 = _sql_pick(POOL_CCOMP, f"({_SQL_U6}) % {N_CCOMP}")
    cc2 = _sql_pick(POOL_CCOMP, f"(({_SQL_U6}) + 1) % {N_CCOMP}")
    mf = _sql_pick(POOL_MFUNC, f"({_SQL_U6}) % {N_MFUNC}")
    # T20-T23 social clause + T24 ingredient→GO quad twins
    scS = _sql_pick(POOL_SYM, _SQL_SC_S)
    scMm = _sql_pick(POOL_MMS, _SQL_SC_MM)
    scSyn = _sql_pick(POOL_SYN, _SQL_SC_SYN)
    scSyn2 = _sql_pick(POOL_SYN, _SQL_SC_SYN2)
    scPw = _sql_pick(POOL_PW, _SQL_SC_PW)
    goI = _sql_pick(POOL_INGR, _SQL_GO_I)
    goPw = _sql_pick(POOL_PW, _SQL_GO_PW)
    goBp = _sql_pick(POOL_BPROC, _SQL_GO_BP)
    goBp2 = _sql_pick(POOL_BPROC, _SQL_GO_BP2)
    goCc = _sql_pick(POOL_CCOMP, _SQL_GO_CC)
    goCc2 = _sql_pick(POOL_CCOMP, _SQL_GO_CC2)
    goMf = _sql_pick(POOL_MFUNC, _SQL_GO_MF)
    # T25 tcm↔mm mapping clause twins
    mmS = _sql_pick(POOL_SYM, _SQL_MM_S)
    mmM = _sql_pick(POOL_MMS, _SQL_MM_M)
    return f"""
  CASE
    WHEN eid % 5 = 0 THEN {f} || '：' || {h1} || {d1} || '、' || {h2} || {d2} || '。'
    WHEN eid % 5 = 1 THEN (CASE WHEN eid % 7 = 0 THEN '亦' ELSE {f} END)
         || '主治' || {s1} || '，' || {s2}
         || (CASE WHEN eid % 3 = 0 THEN '，' || {syn} ELSE '' END)
         || (CASE WHEN eid % 31 = 0 THEN '，口不渴' ELSE '' END) || '。'
         || (CASE {_SQL_RQ}
               WHEN 0 THEN {dgd} || '升高' || {dgg} || '。'
               WHEN 1 THEN {dgd} || '降低' || {dgg} || '。'
               WHEN 2 THEN {dgd} || '关联' || {dgg} || '。'
               ELSE {dgd} || '关联' || {dgg} || '，且升高' || {dgg} || '。'
             END)
    WHEN eid % 5 = 2 THEN {h1} || '可治' || {dis}
         || (CASE WHEN eid % 600 = 22 THEN '。但' || {h1} || '可致' || {dis} ELSE '' END) || '。'
         || (CASE WHEN eid % 3 = 1 THEN {_sql_dim_clause()} ELSE '' END)
         || (CASE WHEN eid % 3 = 2 THEN '含有' || {iA}
                  || (CASE WHEN eid % 2 = 0 THEN '、' || {iB} ELSE '' END) || '。'
                  || (CASE WHEN eid % 4 = 1 THEN '归为' || {pcls} || '。'
                           WHEN eid % 4 = 3 THEN {pcls} || '包括' || {iA} || '。'
                           ELSE '' END)
             ELSE '' END)
         || (CASE WHEN eid % 3 = 0 THEN
                  (CASE ({_SQL_P75}) % 5
                     WHEN 0 THEN {ga} || '调控' || {gb} || '。'
                     WHEN 1 THEN {ga} || '共变' || {gb} || '。'
                     WHEN 2 THEN {ga} || '相互作用' || {gb} || '。'
                     WHEN 3 THEN {ga} || '调控' || {gb} || '，且相互作用' || {gb} || '。'
                     ELSE {gb4} || '相互作用' || {ga4} || '。'
                   END)
                  || (CASE WHEN ({_SQL_P75}) % 2 = 0
                           THEN {loc} || '表达' || {g2} || '。'
                           WHEN ({_SQL_P75}) % 4 = 1
                           THEN {loc} || '富集' || {g3} || '。'
                           ELSE {loc} || '缺失' || {g3} || '。' END)
             ELSE '' END)
         || (CASE {_SQL_SC}
               WHEN 0 THEN {h1} || '善治' || {scS} || '。'
               WHEN 1 THEN {h1} || '善解' || {scSyn} || '。'
               WHEN 2 THEN {dis} || '呈现' || {scMm} || '。'
               WHEN 3 THEN {scPw} || '引动' || {dis} || '。'
               ELSE {scSyn2} || '呈现' || {scS} || '。'
             END)
    WHEN eid % 5 = 3 THEN {syn} || '常见' || {s1} || '，' || {s2} || '。' ||
      (CASE {_SQL_RD}
         WHEN 0 THEN {dr1} || '相类' || {dr2} || '。'
         WHEN 1 THEN {dj1} || '相类' || {dj2} || '。'
         ELSE {dj2} || '相类' || {dj1} || '。'
       END) ||
      (CASE ({_SQL_P60}) % 5
         WHEN 0 THEN {g_ing} || '能治' || {d_dis} || '。'
         WHEN 1 THEN {g_ing} || '能致' || {d_dis} || '。'
         WHEN 2 THEN {g_ing} || '忌用于' || {d_dis} || '。'
         WHEN 3 THEN {g_ing} || '能治' || {d_dis} || '，然亦能致' || {d_dis} || '。'
         ELSE {g_ing} || '能致' || {d_dis} || '，故忌用于' || {d_dis} || '。'
       END) ||
      (CASE {_SQL_W6}
         WHEN 0 THEN {g0} || '参与' || {pw}
         WHEN 1 THEN {g0} || '参与' || {bp1}
         WHEN 2 THEN {g0} || '驱动' || {bp2}
         WHEN 3 THEN {g0} || '定位于' || {cc1}
         WHEN 4 THEN {g0} || '活跃于' || {cc2}
         ELSE {g0} || '介导' || {mf}
       END) || '。'
    ELSE {dis2} || '属于' || {dis3} || '。' ||
      (CASE ({_SQL_P60}) % 6
         WHEN 0 THEN {g_ing} || '上调' || {g_tgt} || '。'
         WHEN 1 THEN {g_ing} || '下调' || {g_tgt} || '。'
         WHEN 2 THEN {g_ing} || '作用于' || {g_tgt} || '。'
         WHEN 3 THEN {g_ing} || '上调' || {g_tgt} || '，亦下调' || {g_tgt} || '。'
         WHEN 4 THEN {g_ing} || '作用于' || {g_tgt} || '，且上调' || {g_tgt} || '。'
         ELSE (CASE WHEN (({_SQL_P60}) // 6) % 2 = 0
                    THEN {g_ing} || '绑定' || {g_tgt} || '。'
                    ELSE {g_ing} || '作用于' || {g_tgt} || '，且绑定' || {g_tgt} || '。'
               END)
       END) ||
      (CASE ((({_SQL_P60}) // 4) % 3)
         WHEN 0 THEN {se_ing} || '必致' || {se_obj} || '。'
         WHEN 1 THEN {se_ing} || '或致' || {se_obj} || '。'
         ELSE {se_ing} || '必致' || {se_obj} || '。' || {se_ing} || '或致' || {se_obj} || '。'
       END) ||
      (CASE {_SQL_RI}
         WHEN 0 THEN {iiA} || '协同' || {iiB} || '。'
         WHEN 1 THEN (CASE WHEN {_SQL_MB} = 0
                           THEN {iiB1} || '协同' || {iiA1} || '。'
                           ELSE {iiB} || '协同' || {iiA} || '。' END)
         WHEN 2 THEN {irC} || '相类' || {irD} || '。'
         ELSE (CASE WHEN {_SQL_MB} = 0
                    THEN {irD1} || '相类' || {irC1} || '。'
                    ELSE {irD} || '相类' || {irC} || '。' END)
       END) ||
      (CASE {_SQL_GQ}
         WHEN 0 THEN {goI} || '参与' || {goPw} || '。'
         WHEN 1 THEN {goI} || '参与' || {goBp} || '。'
         WHEN 2 THEN {goI} || '参与' || {goBp} || '。' || {goI} || '增进' || {goBp} || '。'
         WHEN 3 THEN {goI} || '定位于' || {goCc} || '。' || {goI} || '增进' || {goCc2} || '。'
         ELSE {goI} || '介导' || {goMf} || '。' || {goI} || '削减' || {goBp2} || '。'
       END) ||
      (CASE {_SQL_TM3}
         WHEN 0 THEN {mmS} || '对应' || {mmM} || '。'
         WHEN 1 THEN {mmM} || '溯源' || {mmS} || '。'
         ELSE {mmS} || '对应' || {mmM} || '。' || {mmM} || '溯源' || {mmS} || '。'
       END)
  END"""


# SQL twins of the _dim_clause index arithmetic (shared by the roundtrip
# derivation and the herb-dims edge oracle)
_SQL_FI2 = f"((eid % {N_FLAV}) + 1 + ((eid // 11) % 5)) % {N_FLAV}"
_SQL_TI2 = f"((eid % {N_TROP}) + 1 + ((eid // 13) % {N_TROP - 1})) % {N_TROP}"
# SQL twins of the derived-entity clause arithmetic (roundtrip + the
# consistof/gene-edge oracles)
_SQL_IA_IDX = f"(eid // 15) % {N_ING}"
_SQL_IB_IDX = f"(({_SQL_IA_IDX}) + 1 + ((eid // 45) % {N_ING - 1})) % {N_ING}"
_SQL_P60 = "(eid // 5) % 60"
# gene-side clause arithmetic (T11-T14 twins)
_SQL_P75 = "(eid // 15) % 75"
_SQL_GA_IDX = f"(({_SQL_P75}) % 15)"
_SQL_GB_IDX = f"(({_SQL_GA_IDX}) + 1 + ((({_SQL_P75}) // 5) % 14)) % 15"
# r=4 mutual-construction twins (reverse of the r=2 line at p75-2 on even
# p75//5; independent swapped line otherwise)
_SQL_P75M2 = f"(({_SQL_P75}) - 2)"
_SQL_USE_REV = f"(({_SQL_P75}) % 5 = 4 AND (({_SQL_P75}) // 5) % 2 = 0)"
_SQL_GA4_IDX = (
    f"(CASE WHEN {_SQL_USE_REV} THEN ({_SQL_P75M2}) % 15"
    f" ELSE {_SQL_GA_IDX} END)"
)
_SQL_GB4_IDX = (
    f"(CASE WHEN {_SQL_USE_REV}"
    f" THEN ((({_SQL_P75M2}) % 15) + 1 + ((({_SQL_P75M2}) // 5) % 14)) % 15"
    f" ELSE {_SQL_GB_IDX} END)"
)
_SQL_RQ = f"((({_SQL_P60}) + (({_SQL_P60}) // 12)) % 4)"
_SQL_U6 = "((eid // 5) // 6)"
_SQL_W6 = "((eid // 5) % 6)"
# T17 disease-resemble and T18/T19 interact/resemble-ingredient twins
_SQL_V = "(eid // 5)"
_SQL_RD = f"((({_SQL_V}) // 2) % 3)"
_SQL_DR1 = f"(({_SQL_V}) % {N_DIS})"
_SQL_DR2 = f"((({_SQL_DR1}) + 1 + ((({_SQL_V}) // 11) % {N_DIS - 1})) % {N_DIS})"
_SQL_DJ1 = f"(((eid + 1) // 2) % {N_DIS})"
_SQL_DJ2 = f"(((eid + 1) // 4) % {N_DIS})"
_SQL_RI = f"(({_SQL_V}) % 4)"
_SQL_MB = f"((({_SQL_V}) // 4) % 2)"
_SQL_IIA = f"(({_SQL_V}) % {N_ING})"
_SQL_IIB = f"((({_SQL_IIA}) + 1 + ((({_SQL_V}) // 7) % {N_ING - 1})) % {N_ING})"
_SQL_VM1 = f"(({_SQL_V}) - 1)"
_SQL_IIA1 = f"(({_SQL_VM1}) % {N_ING})"
_SQL_IIB1 = f"((({_SQL_IIA1}) + 1 + ((({_SQL_VM1}) // 7) % {N_ING - 1})) % {N_ING})"
_SQL_IRC = f"((({_SQL_V}) + 5) % {N_ING})"
_SQL_IRD = f"((({_SQL_IRC}) + 1 + ((({_SQL_V}) // 9) % {N_ING - 1})) % {N_ING})"
_SQL_IRC1 = f"((({_SQL_VM1}) + 5) % {N_ING})"
_SQL_IRD1 = f"((({_SQL_IRC1}) + 1 + ((({_SQL_VM1}) // 9) % {N_ING - 1})) % {N_ING})"
# T20-T23 social-clause wheel and T24 ingredient→GO quad twins
_SQL_SC = f"(({_SQL_V}) % 5)"
_SQL_SC_S = f"((({_SQL_V}) + 7) % {N_SYM})"
_SQL_SC_MM = f"((({_SQL_V}) + 7) % {N_MMS})"
_SQL_SC_SYN = f"((({_SQL_V}) + 3) % {N_SYN})"
_SQL_SC_SYN2 = f"((({_SQL_V}) + 9) % {N_SYN})"
_SQL_SC_PW = f"(({_SQL_V}) % {N_PW})"
_SQL_GQ = f"(({_SQL_V}) % 5)"
_SQL_GO_I = f"((({_SQL_V}) + 4) % {N_ING})"
_SQL_GO_PW = f"((({_SQL_V}) + 1) % {N_PW})"
_SQL_GO_BP = f"(({_SQL_V}) % {N_BPROC})"
_SQL_GO_BP2 = f"((({_SQL_V}) + 2) % {N_BPROC})"
_SQL_GO_CC = f"(({_SQL_V}) % {N_CCOMP})"
_SQL_GO_CC2 = f"((({_SQL_V}) + 3) % {N_CCOMP})"
_SQL_GO_MF = f"(({_SQL_V}) % {N_MFUNC})"
# T25 tcm↔mm mapping twins
_SQL_TM3 = f"(({_SQL_V}) % 3)"
_SQL_MM_S = f"((({_SQL_V}) + 13) % {N_SYM})"
_SQL_MM_M = f"(({_SQL_V}) % {N_MMS})"


def _sql_dim_clause() -> str:
    p = _sql_pick(POOL_PROP, f"eid % {N_PROP}")
    f1 = _sql_pick(POOL_FLAV, f"eid % {N_FLAV}")
    f2 = _sql_pick(POOL_FLAV, _SQL_FI2)
    t1 = _sql_pick(POOL_TROP, f"eid % {N_TROP}")
    t2 = _sql_pick(POOL_TROP, _SQL_TI2)
    x = _sql_pick(POOL_TOX, f"eid % {N_TOX}")
    return (
        f"'其性' || {p} || '，味' || {f1}"
        f" || (CASE WHEN eid % 2 = 0 THEN {f2} ELSE '' END)"
        f" || '，归' || {t1}"
        f" || (CASE WHEN eid % 4 = 0 THEN '、' || {t2} ELSE '' END)"
        f" || '经，' || {x} || '。'"
    )


SQL_KG_TEXT_ROUNDTRIP = f"""
WITH tr AS (
  SELECT event_id AS eid,
         'conv_' || lpad((user_id % 97)::VARCHAR, 3, '0') AS conv_id,
         (row_number() OVER (PARTITION BY user_id % 97 ORDER BY ts, event_id) - 1)::INT AS turn_idx
  FROM events
)
SELECT conv_id, turn_idx, {_sql_text_derivation()} AS text FROM tr
"""


def q_kg_herb_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-entity edge families (the reference's herb2flavour /
    herb2property / herb2tropism / herb2toxicity, extract_herb.py:587-651):
    the pipeline must parse each herb statement's 其性…味…归…经…
    clause through the mention kernel's slot parser (exact lookups +
    the P13 containment tokenizer for multi-flavour slots) and emit
    herb→dimension edges through the same assemble_triples path as every
    other predicate. The oracle predicts every edge arithmetically."""
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred").isin(*DIM_PRED_OF_KIND.values())).select(
        "subj", "pred", "obj"
    )


def _sql_kg_herb_dims() -> str:
    herb = _sql_pick(CANON_HERB1, f"eid % {N_H1}")
    return f"""
WITH base AS (
  SELECT event_id AS eid FROM events WHERE event_id % 5 = 2 AND event_id % 3 = 1
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT {herb} AS subj, 'herb_has_property' AS pred,
         {_sql_pick(ID_PROP, f'eid % {N_PROP}')} AS obj FROM base
  UNION
  SELECT {herb}, 'herb_has_flavour', {_sql_pick(ID_FLAV, f'eid % {N_FLAV}')} FROM base
  UNION
  SELECT {herb}, 'herb_has_flavour', {_sql_pick(ID_FLAV, _SQL_FI2)}
  FROM base WHERE eid % 2 = 0
  UNION
  SELECT {herb}, 'tropism_of_herb', {_sql_pick(ID_TROP, f'eid % {N_TROP}')} FROM base
  UNION
  SELECT {herb}, 'tropism_of_herb', {_sql_pick(ID_TROP, _SQL_TI2)}
  FROM base WHERE eid % 4 = 0
  UNION
  SELECT {herb}, 'toxicity_of_herb', {_sql_pick(ID_TOX, f'eid % {N_TOX}')} FROM base
)
"""


def q_kg_consistof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-entity → derived-entity edge family #1: herb 含有 ingredient
    (reference herb_consistof_ingredient, extract_ingredient.py:276-317 —
    source-keyed pairs pushed through per-source id maps; here BOTH
    endpoints are text-extracted and resolved through their own
    CC-canonical alias map). The oracle predicts every edge arithmetically
    with canonical ids from the independent pure-Python union-find."""
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "herb_consistof_ingredient").select(
        "subj", "obj"
    )


def _sql_kg_consistof() -> str:
    herb = _sql_pick(CANON_HERB1, f"eid % {N_H1}")
    ia = _sql_pick(CANON_INGR, _SQL_IA_IDX)
    ib = _sql_pick(CANON_INGR, _SQL_IB_IDX)
    return f"""
WITH base AS (
  SELECT event_id AS eid FROM events WHERE event_id % 5 = 2 AND event_id % 3 = 2
)
SELECT DISTINCT subj, obj FROM (
  SELECT {herb} AS subj, {ia} AS obj FROM base
  UNION
  SELECT {herb}, {ib} FROM base WHERE eid % 2 = 0
)
"""


def q_kg_gene_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-entity → derived-entity edge family #2 with the reference's
    de-conflict algebra (extract_target.py:365-372 + 404-417): ingredient
    上调/下调/作用于 gene statements; up∩down pairs move to associate, and
    associate loses any pair still held by a directional set. The T8
    residue wheel plants one conflict residue (r=3: up+down in one turn),
    one priority residue (r=4: assoc+up), and — late r5 — the bind set
    (extract_target.py:303-308; :405-411 subtracts bind from associate):
    r=5 alternates plain bind with an assoc∩bind priority case, so every
    residue still resolves to exactly one surviving edge."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "ingredient_upregulate_gene",
            "ingredient_downregulate_gene",
            "ingredient_associate_gene",
            "ingredient_bind_gene",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_gene_edges() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    tgt = _sql_pick(CANON_TGT, f"p % {N_TGT}")
    return f"""
WITH base AS (
  SELECT ({_SQL_P60}) AS p FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4)
)
SELECT DISTINCT
  {ing} AS subj,
  CASE p % 6
    WHEN 0 THEN 'ingredient_upregulate_gene'
    WHEN 4 THEN 'ingredient_upregulate_gene'
    WHEN 1 THEN 'ingredient_downregulate_gene'
    WHEN 5 THEN 'ingredient_bind_gene'
    ELSE 'ingredient_associate_gene'
  END AS pred,
  {tgt} AS obj
FROM base
"""


def q_kg_ingr_disease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingredient→disease three-way family with the reference's
    de-conflict (extract_ingredient.py:476-542): 能治/能致/忌用于
    statements; conflict = treats ∩ (induces ∪ contraindicates), dropped
    from ALL sets — and, asymmetrically, an induces∩contraindicates pair
    with no treats claim survives in BOTH directional sets. The T9 residue
    wheel plants one conflict residue (r=3) and one both-survive residue
    (r=4), so the oracle's per-residue CASE — including a residue that
    emits TWO rows — is the algebra's fixed point at every scale."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "ingredient_treat_disease",
            "ingredient_induce_disease",
            "ingredient_contraindicate_disease",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_ingr_disease() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    dis = _sql_pick(_canon_pool("disease", POOL_DIS[:15]), "p % 15")
    return f"""
WITH base AS (
  SELECT ({_SQL_P60}) AS p FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3)
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT {ing} AS subj,
         CASE p % 5
           WHEN 0 THEN 'ingredient_treat_disease'
           WHEN 1 THEN 'ingredient_induce_disease'
           WHEN 2 THEN 'ingredient_contraindicate_disease'
           ELSE 'ingredient_induce_disease'  -- r=4 first survivor; r=3 filtered below
         END AS pred,
         {dis} AS obj
  FROM base WHERE p % 5 <> 3
  UNION ALL
  SELECT {ing}, 'ingredient_contraindicate_disease', {dis}
  FROM base WHERE p % 5 = 4
)
"""


def q_kg_pclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingredient→pharmacologic-class edges (reference
    ingredient_belong_to_pharmacologic_class, extract_ingredient.py:
    451-460): the reference merges the BELONGS_TO direction with the
    REVERSED INCLUDES direction into one set — mirrored here by the two
    statement forms 归为 (ingredient-first) and 包括 (class-first), which
    must land in the SAME edge set."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred") == "ingredient_belong_to_pharmacologic_class"
    ).select("subj", "obj")


def _sql_kg_pclass() -> str:
    ing = _sql_pick(CANON_INGR, _SQL_IA_IDX)
    pc = _sql_pick(ID_PCLS, f"(eid // 15) % {N_PCLS}")
    return f"""
WITH base AS (
  SELECT event_id AS eid FROM events
  WHERE event_id % 5 = 2 AND event_id % 3 = 2 AND event_id % 4 IN (1, 3)
)
SELECT DISTINCT {ing} AS subj, {pc} AS obj FROM base
"""


def q_kg_chain_herb_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order chain herb→ingredient→gene (the reference's
    herb2ingredient ⨝ ingredient→gene composition): both edge families are
    derived-entity tables distilled from the corpus, so the join runs on
    the small deduped edge frames, never the mention stream."""
    t = _triples(spark, sf_dir)
    hi = t.filter(F.col("pred") == "herb_consistof_ingredient").select(
        F.col("subj").alias("herb"), F.col("obj").alias("ingr")
    )
    ig = t.filter(
        F.col("pred").isin(
            "ingredient_upregulate_gene",
            "ingredient_downregulate_gene",
            "ingredient_associate_gene",
            "ingredient_bind_gene",
        )
    ).select(F.col("subj").alias("ingr"), F.col("obj").alias("gene"))
    return hi.join(ig, "ingr").select("herb", "gene").distinct()


def _sql_kg_chain() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    tgt = _sql_pick(CANON_TGT, f"p % {N_TGT}")
    return f"""
WITH hi AS ({_sql_kg_consistof()}),
ig AS (
  SELECT DISTINCT {ing} AS ingr, {tgt} AS gene
  FROM (SELECT ({_SQL_P60}) AS p
        FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4))
)
SELECT DISTINCT hi.subj AS herb, ig.gene AS gene
FROM hi JOIN ig ON hi.obj = ig.ingr
"""


CANON_DIS12 = _canon_pool("disease", POOL_DIS[:12])


def q_kg_gene_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gene↔gene family with the reference's de-conflict algebra
    (extract_target.py:453-486): associate loses any pair present IN
    EITHER DIRECTION in covary or regulate, then mutual associate pairs
    collapse to one canonical (subj<obj) edge. The T11 wheel plants the
    in-turn conflict residue (r=3) and a swapped-direction residue (r=4)
    whose pairs are mutual only where the r=2 set holds the reverse — so
    the oracle REPLAYS the set algebra over the arithmetic-derived mention
    sets rather than using a per-residue closed form."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "gene_regulate_gene", "gene_covary_gene", "gene_associate_gene"
        )
    ).select("subj", "pred", "obj")


def _sql_kg_gene_gene() -> str:
    a = _sql_pick(CANON_TGT, "ai")
    b = _sql_pick(CANON_TGT, "bi")
    return f"""
WITH base AS (
  SELECT DISTINCT ({_SQL_P75}) % 5 AS r, {_SQL_GA4_IDX} AS ai, {_SQL_GB4_IDX} AS bi
  FROM (SELECT event_id AS eid FROM events
        WHERE event_id % 5 = 2 AND event_id % 3 = 0)
),
prs AS (SELECT r, {a} AS a, {b} AS b FROM base),
reg AS (SELECT DISTINCT a, b FROM prs WHERE r IN (0, 3)),
cov AS (SELECT DISTINCT a, b FROM prs WHERE r = 1),
asc0 AS (
  SELECT a, b FROM prs WHERE r IN (2, 3)
  UNION
  SELECT b, a FROM prs WHERE r = 4
),
dirall AS (SELECT a, b FROM reg UNION SELECT a, b FROM cov),
asc1 AS (
  SELECT a, b FROM asc0
  WHERE NOT EXISTS (SELECT 1 FROM dirall d
                    WHERE (d.a = asc0.a AND d.b = asc0.b)
                       OR (d.a = asc0.b AND d.b = asc0.a))
),
asc2 AS (
  SELECT a, b FROM asc1
  WHERE NOT (a > b AND EXISTS (SELECT 1 FROM asc1 x
                               WHERE x.a = asc1.b AND x.b = asc1.a))
)
SELECT a AS subj, 'gene_regulate_gene' AS pred, b AS obj FROM reg
UNION ALL SELECT a, 'gene_covary_gene', b FROM cov
UNION ALL SELECT a, 'gene_associate_gene', b FROM asc2
"""


def q_kg_dis_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disease→gene family (extract_target.py:520-607): 升高/降低/关联
    statements on indication lines; associate = assoc − up − down. The
    T13 pair wheel is a bijection (q ↔ (q%12, q%15) over 60), so each
    pair carries exactly one residue and the per-residue CASE — with the
    r=3 conflict clause resolving to the directional edge — is the
    algebra's fixed point at every scale."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "disease_upregulate_gene",
            "disease_downregulate_gene",
            "disease_associate_gene",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_dis_gene() -> str:
    d = _sql_pick(CANON_DIS12, "q % 12")
    g = _sql_pick(CANON_TGT, "q % 15")
    return f"""
WITH base AS (
  SELECT ({_SQL_P60}) AS q
  FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 1)
)
SELECT DISTINCT {d} AS subj,
  CASE (q + q // 12) % 4
    WHEN 0 THEN 'disease_upregulate_gene'
    WHEN 3 THEN 'disease_upregulate_gene'
    WHEN 1 THEN 'disease_downregulate_gene'
    ELSE 'disease_associate_gene'
  END AS pred,
  {g} AS obj
FROM base
"""


def q_kg_gene_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gene→pathway/GO families (extract_target.py:653-761): four
    predicates over four fixed entity vocabularies, two of which are
    MULTI-MARKER UNIONS (参与∪驱动 → biological process, 定位于∪活跃于 →
    cellular component) and one marker (参与) resolves against two
    vocabularies — the reference's extract_specific_relation
    parameterized-id-map shape, re-expressed as statement verbs."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "gene_associate_pathway",
            "gene2biological_process",
            "gene2cell_component",
            "gene2molecular_function",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_gene_go() -> str:
    g = _sql_pick(CANON_TGT, "u % 15")
    pw = _sql_pick(ID_PW, f"u % {N_PW}")
    bp1 = _sql_pick(ID_BPROC, f"u % {N_BPROC}")
    bp2 = _sql_pick(ID_BPROC, f"(u + 1) % {N_BPROC}")
    cc1 = _sql_pick(ID_CCOMP, f"u % {N_CCOMP}")
    cc2 = _sql_pick(ID_CCOMP, f"(u + 1) % {N_CCOMP}")
    mf = _sql_pick(ID_MFUNC, f"u % {N_MFUNC}")
    return f"""
WITH base AS (
  SELECT DISTINCT {_SQL_W6} AS w, {_SQL_U6} AS u
  FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3)
)
SELECT DISTINCT {g} AS subj,
  CASE w WHEN 0 THEN 'gene_associate_pathway'
         WHEN 1 THEN 'gene2biological_process'
         WHEN 2 THEN 'gene2biological_process'
         WHEN 3 THEN 'gene2cell_component'
         WHEN 4 THEN 'gene2cell_component'
         ELSE 'gene2molecular_function' END AS pred,
  CASE w WHEN 0 THEN {pw} WHEN 1 THEN {bp1} WHEN 2 THEN {bp2}
         WHEN 3 THEN {cc1} WHEN 4 THEN {cc2} ELSE {mf} END AS obj
FROM base
"""


def q_kg_anat_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anatomy→gene express edges (extract_target.py:612-658
    EXPRESSES_AeG): BOTH endpoints are CC-canonicalized derived entities —
    the subject through the anatomy gazetteer (TMAT,
    extract_other_entities.py:276-324 xref-group merge), the object
    through the gene gazetteer."""
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "anatomy_express_gene").select(
        "subj", "obj"
    )


def _sql_kg_anat_gene() -> str:
    lid = _sql_pick(CANON_ANAT, f"p % {N_ANAT}")
    g2 = _sql_pick(CANON_TGT, "(p + 7) % 15")
    return f"""
WITH base AS (
  SELECT DISTINCT ({_SQL_P75}) AS p
  FROM (SELECT event_id AS eid FROM events
        WHERE event_id % 5 = 2 AND event_id % 3 = 0)
)
SELECT DISTINCT {lid} AS subj, {g2} AS obj FROM base WHERE p % 2 = 0
"""


def q_kg_chain_ing_pathway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-order composition ingredient→gene→pathway: joins two
    derived-edge families whose endpoints are all non-gazetteer entities.
    Like kg_chain_herb_gene, the join runs on the tiny deduped edge
    frames — the oracle composes both edge derivations and replays the
    join, so the traversal is hash-verified end-to-end."""
    t = _triples(spark, sf_dir)
    ig = t.filter(
        F.col("pred").isin(
            "ingredient_upregulate_gene",
            "ingredient_downregulate_gene",
            "ingredient_associate_gene",
            "ingredient_bind_gene",
        )
    ).select(F.col("subj").alias("ingr"), F.col("obj").alias("gene"))
    gp = t.filter(F.col("pred") == "gene_associate_pathway").select(
        F.col("subj").alias("gene"), F.col("obj").alias("pathway")
    )
    return ig.join(gp, "gene").select("ingr", "gene", "pathway").distinct()


def _sql_kg_chain_ing_pathway() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    tgt = _sql_pick(CANON_TGT, f"p % {N_TGT}")
    g = _sql_pick(CANON_TGT, "u % 15")
    pw = _sql_pick(ID_PW, f"u % {N_PW}")
    return f"""
WITH ig AS (
  SELECT DISTINCT {ing} AS ingr, {tgt} AS gene
  FROM (SELECT ({_SQL_P60}) AS p
        FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4))
),
gp AS (
  SELECT DISTINCT {g} AS gene, {pw} AS pathway
  FROM (SELECT DISTINCT {_SQL_U6} AS u
        FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3)
        WHERE {_SQL_W6} = 0)
)
SELECT DISTINCT ig.ingr, ig.gene, gp.pathway
FROM ig JOIN gp ON ig.gene = gp.gene
"""


def q_kg_sideeffect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingredient→side-effect certainty pair (reference
    extract_ingredient.py:684-735: CAUSES_CHcSE and MIGHT_CAUSES_CHmcSE
    publish as two independent relation sets with NO de-conflict — the T16
    wheel's rs=2 residue plants a pair claimed by both, which must appear
    under BOTH predicates). Side-effect entities are the TMSE fixed table
    (extract_other_entities.py:436-496)."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "ingredient_cause_sideeffect", "ingredient_might_cause_sideeffect"
        )
    ).select("subj", "pred", "obj")


def _sql_kg_sideeffect() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    se = _sql_pick(ID_SE, f"(p + p // 12) % {N_SE}")
    return f"""
WITH base AS (
  SELECT ({_SQL_P60}) AS p FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4)
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT {ing} AS subj, 'ingredient_cause_sideeffect' AS pred, {se} AS obj
  FROM base WHERE (p // 4) % 3 IN (0, 2)
  UNION ALL
  SELECT {ing}, 'ingredient_might_cause_sideeffect', {se}
  FROM base WHERE (p // 4) % 3 IN (1, 2)
)
"""


def q_kg_anat_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anatomy up/down-regulate gene (the UPREGULATES_AuG /
    DOWNREGULATES_AdG relations of the reference's anatomy→gene family,
    extract_target.py:612-658): both endpoints CC-canonicalized (anatomy
    TMAT gazetteer subject, gene gazetteer object) — published as plain
    distinct pairs alongside anatomy_express_gene."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin("anatomy_upregulate_gene", "anatomy_downregulate_gene")
    ).select("subj", "pred", "obj")


def _sql_kg_anat_updown() -> str:
    lid = _sql_pick(CANON_ANAT, f"p % {N_ANAT}")
    g3 = _sql_pick(CANON_TGT, "(p + 11) % 15")
    return f"""
WITH base AS (
  SELECT DISTINCT ({_SQL_P75}) AS p
  FROM (SELECT event_id AS eid FROM events
        WHERE event_id % 5 = 2 AND event_id % 3 = 0)
)
SELECT DISTINCT {lid} AS subj,
  CASE WHEN p % 4 = 1 THEN 'anatomy_upregulate_gene'
       ELSE 'anatomy_downregulate_gene' END AS pred,
  {g3} AS obj
FROM base WHERE p % 2 = 1
"""


def q_kg_ts_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tcm_symptom_map_mm_symptom (merge_tcm_symptom.py:213-239): the
    reference merges TWO statement directions — symmap tcm→mm files plus
    cpmcp mm→tcm files REVERSED — into one set-deduped relation. Both
    endpoints are CC-canonicalized gazetteer entities (TMTS × TMMS); the
    T25 wheel's tm3=2 residue plants both directions of one pair, so the
    union dedup is value-verified (two statements → ONE edge)."""
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "tcm_symptom_map_mm_symptom").select(
        "subj", "obj"
    )


def _sql_kg_ts_mm() -> str:
    mmS = _sql_pick(CANON_SYM, _SQL_MM_S)
    mmM = _sql_pick(CANON_MMS, _SQL_MM_M)
    return f"""
SELECT DISTINCT {mmS} AS subj, {mmM} AS obj
FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4)
"""


def q_kg_resemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """disease_resemble_disease with the reference's cross-family kill
    (extract_disease.py:311-317): resemble loses any pair present — in
    either direction — in the PUBLISHED disease_is_a_disease set. The T17
    wheel emits the NEXT event's is_a pair forward (rd=1) and swapped
    (rd=2), so both kill directions are live; the oracle replays
    resemble − (is_a ∪ reversed is_a) over the actual event sets."""
    t = _triples(spark, sf_dir)
    return t.filter(F.col("pred") == "disease_resemble_disease").select(
        "subj", "obj"
    )


def _sql_kg_resemble() -> str:
    cr1 = _sql_pick(CANON_DIS, _SQL_DR1)
    cr2 = _sql_pick(CANON_DIS, _SQL_DR2)
    cj1 = _sql_pick(CANON_DIS, _SQL_DJ1)
    cj2 = _sql_pick(CANON_DIS, _SQL_DJ2)
    isa_s = _sql_pick(CANON_DIS, f"(event_id // 2) % {N_DIS}")
    isa_o = _sql_pick(CANON_DIS, f"(event_id // 4) % {N_DIS}")
    return f"""
WITH res AS (
  SELECT DISTINCT
    CASE {_SQL_RD} WHEN 0 THEN {cr1} WHEN 1 THEN {cj1} ELSE {cj2} END AS subj,
    CASE {_SQL_RD} WHEN 0 THEN {cr2} WHEN 1 THEN {cj2} ELSE {cj1} END AS obj
  FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3)
),
isap AS (
  SELECT DISTINCT {isa_s} AS subj, {isa_o} AS obj
  FROM events WHERE event_id % 5 = 4
),
isaf AS (
  SELECT subj, obj FROM isap p
  WHERE p.subj <> p.obj
    AND NOT EXISTS (SELECT 1 FROM isap r WHERE r.subj = p.obj AND r.obj = p.subj)
)
SELECT subj, obj FROM res
WHERE subj <> obj
  AND NOT EXISTS (SELECT 1 FROM isaf f
                  WHERE (f.subj = res.subj AND f.obj = res.obj)
                     OR (f.subj = res.obj AND f.obj = res.subj))
"""


def q_kg_ing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingredient↔ingredient families (extract_ingredient.py:320-391):
    interact (INTERACTS_CHiCH → ingredient_associate_ingredient) and
    resemble (RESEMBLES_CrC), both with the reference's mutual-pair
    collapse — the kept direction here is the deterministic subj<obj one
    (the reference keeps whichever direction set iteration yields first;
    the output SET is identical). The T18/T19 wheels plant guaranteed
    mutual pairs (reverse-of-previous construction), so the collapse
    branch is live at every scale; the oracle replays the sets."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "ingredient_associate_ingredient", "ingredient_resemble_ingredient"
        )
    ).select("subj", "pred", "obj")


def _sql_kg_ing_pairs() -> str:
    n, n1 = N_ING, N_ING - 1
    a = _sql_pick(CANON_INGR, f"v % {n}")
    b = _sql_pick(CANON_INGR, f"((v % {n}) + 1 + ((v // 7) % {n1})) % {n}")
    a1 = _sql_pick(CANON_INGR, f"(v - 1) % {n}")
    b1 = _sql_pick(CANON_INGR, f"(((v - 1) % {n}) + 1 + (((v - 1) // 7) % {n1})) % {n}")
    c = _sql_pick(CANON_INGR, f"(v + 5) % {n}")
    d = _sql_pick(CANON_INGR, f"(((v + 5) % {n}) + 1 + ((v // 9) % {n1})) % {n}")
    c1 = _sql_pick(CANON_INGR, f"((v - 1) + 5) % {n}")
    d1 = _sql_pick(CANON_INGR, f"((((v - 1) + 5) % {n}) + 1 + (((v - 1) // 9) % {n1})) % {n}")
    collapse = (
        "SELECT subj, obj FROM {src} s "
        "WHERE NOT (subj > obj AND EXISTS "
        "(SELECT 1 FROM {src} r WHERE r.subj = s.obj AND r.obj = s.subj))"
    )
    return f"""
WITH base AS (
  SELECT (eid // 5) AS v FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4)
),
ii AS (
  SELECT DISTINCT
    CASE WHEN v % 4 = 0 THEN {a}
         WHEN (v // 4) % 2 = 0 THEN {b1} ELSE {b} END AS subj,
    CASE WHEN v % 4 = 0 THEN {b}
         WHEN (v // 4) % 2 = 0 THEN {a1} ELSE {a} END AS obj
  FROM base WHERE v % 4 IN (0, 1)
),
ir AS (
  SELECT DISTINCT
    CASE WHEN v % 4 = 2 THEN {c}
         WHEN (v // 4) % 2 = 0 THEN {d1} ELSE {d} END AS subj,
    CASE WHEN v % 4 = 2 THEN {d}
         WHEN (v // 4) % 2 = 0 THEN {c1} ELSE {c} END AS obj
  FROM base WHERE v % 4 IN (2, 3)
)
SELECT subj, 'ingredient_associate_ingredient' AS pred, obj
FROM ({collapse.format(src='ii')})
UNION ALL
SELECT subj, 'ingredient_resemble_ingredient', obj
FROM ({collapse.format(src='ir')})
"""


def q_kg_dim_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension entities in the nodes table (zh surface + English gloss),
    with reference-scheme surrogate ids — the static entity-table side of
    the dimension families (`sf_dir` unused: the vocabulary is the table)."""
    p = _pipeline(spark)
    return p.nodes_table().filter(
        F.col("entity_type").isin(
            "property", "flavour", "tropism", "toxicity", "pharm_class",
            "pathway", "bioprocess", "cellcomp", "molfunction", "sideeffect",
        )
    ).select(
        "canonical_id",
        "entity_type",
        F.element_at("names", 1).alias("zh_name"),
        F.element_at("names", 2).alias("en_name"),
    )


def _sql_kg_dim_nodes() -> str:
    rows = ",\n".join(
        f"('{r['canonical_id']}','{r['entity_type']}','{r['names'][0]}','{r['names'][1]}')"
        for r in dim_node_rows()
    )
    return (
        "SELECT canonical_id, entity_type, zh_name, en_name FROM (VALUES\n"
        + rows
        + "\n) AS t(canonical_id, entity_type, zh_name, en_name)"
    )


def q_kg_symptom_locus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symptom→locus edges by ENTITY-NAME containment (reference
    merge_tcm_symptom.py:90-131): each canonical symptom entity's names are
    substring-scanned against the fixed locus surface vocabulary — a
    name-vs-name theta-join between two entity tables, not a text scan.
    The oracle derives the same edges in pure Python from the union-find
    canonical symptom entities (`sf_dir` unused: both sides are
    corpus-independent)."""
    p = _pipeline(spark)
    return p.symptom_locus()


def _sql_kg_symptom_locus() -> str:
    from collections import defaultdict

    from ..fixtures.locus import derive_symptom_locus
    from ..oracle.extractor import canonicalize_records

    gaz = build_gazetteers()
    rec2canon, _ = canonicalize_records(gaz.symptom, CANON_PREFIX["symptom"])
    names_by_canon: dict[str, list[str]] = defaultdict(list)
    for r in gaz.symptom:
        names_by_canon[rec2canon[r.record_id]].extend(r.names)
    edges = sorted(derive_symptom_locus(names_by_canon))
    rows = ",\n".join(f"('{s}','{o}')" for s, o in edges)
    return (
        "SELECT subj, obj FROM (VALUES\n" + rows + "\n) AS t(subj, obj)"
    )


def q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark CC canonicalization vs pure-Python union-find constants."""
    p = _pipeline(spark)
    return p.nodes_table().select(
        "canonical_id", "entity_type", F.size("names").cast("long").alias("n_names")
    )


def _sql_kg_nodes() -> str:
    from collections import defaultdict

    gaz = build_gazetteers()
    counts: dict[tuple[str, str], set] = defaultdict(set)
    from ..oracle.extractor import canonicalize_records

    for etype, records in gaz.tables().items():
        rec2canon, _ = canonicalize_records(records, CANON_PREFIX[etype])
        for r in records:
            for n in r.names:
                counts[(rec2canon[r.record_id], etype)].add(n)
    from ..fixtures.locus import locus_node_rows

    vals = [
        (cid, et, len(names)) for (cid, et), names in sorted(counts.items())
    ] + [
        # dimension + locus entities: names = [zh, en]
        (r["canonical_id"], r["entity_type"], len(r["names"]))
        for r in dim_node_rows() + locus_node_rows()
    ]
    rows = ",\n".join(f"('{cid}','{et}',{n})" for cid, et, n in vals)
    return (
        "SELECT canonical_id, entity_type, n_names::BIGINT AS n_names "
        "FROM (VALUES\n" + rows +
        "\n) AS t(canonical_id, entity_type, n_names)"
    )


def q_kg_treat2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five remaining pair families of the reference's relation
    inventory outside the gene/ingredient clusters: herb_treat_symptom
    (merge_tcm_symptom.py:206), herb_treat_syndrome (extract_syndrome.py:
    41-53), disease_present_symptom (extract_disease.py:240-267),
    syndrome_present_symptom (merge_tcm_symptom.py:243-261) and
    pathway_lead_to_disease (extract_disease.py:335-347). All publish as
    plain set-deduped pairs; the T20-T23 social-clause wheel plants one
    family per v%5 residue, with 呈现 resolved against TWO subject maps
    (the parameterized-id-map shape)."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "herb_treat_symptom", "herb_treat_syndrome",
            "disease_present_symptom", "syndrome_present_symptom",
            "pathway_lead_to_disease",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_treat2() -> str:
    h1 = _sql_pick(CANON_HERB1, f"eid % {N_H1}")
    dis = _sql_pick(CANON_DIS, f"eid % {N_DIS}")
    scS = _sql_pick(CANON_SYM, _SQL_SC_S)
    scMm = _sql_pick(CANON_MMS, _SQL_SC_MM)
    scSyn = _sql_pick(CANON_SYN, _SQL_SC_SYN)
    scSyn2 = _sql_pick(CANON_SYN, _SQL_SC_SYN2)
    scPw = _sql_pick(ID_PW, _SQL_SC_PW)
    return f"""
WITH base AS (
  SELECT event_id AS eid, ({_SQL_SC}) AS sc FROM events WHERE event_id % 5 = 2
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT {h1} AS subj, 'herb_treat_symptom' AS pred, {scS} AS obj
  FROM base WHERE sc = 0
  UNION ALL
  SELECT {h1}, 'herb_treat_syndrome', {scSyn} FROM base WHERE sc = 1
  UNION ALL
  SELECT {dis}, 'disease_present_symptom', {scMm} FROM base WHERE sc = 2
  UNION ALL
  SELECT {scPw}, 'pathway_lead_to_disease', {dis} FROM base WHERE sc = 3
  UNION ALL
  SELECT {scSyn2}, 'syndrome_present_symptom', {scS} FROM base WHERE sc = 4
)
"""


def q_kg_three_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-hop chain herb→ingredient→gene→pathway across three derived
    edge families (consistof ⨝ the four ingredient→gene sets ⨝
    gene_associate_pathway) — the KGPipeline.k_hop(3) semantics verified
    end-to-end: every hop's edge derivation AND the two joins hash
    together. The middle hop unions the published algebra outputs, whose
    union equals the raw statement sets (de-conflict moves pairs BETWEEN
    the four sets, never out of their union). At scale this is the
    frontier plan: the bucketed edge tables are never re-shuffled; only
    the path frame re-keys per added hop (see runner.k_hop)."""
    t = _triples(spark, sf_dir)
    hi = t.filter(F.col("pred") == "herb_consistof_ingredient").select(
        F.col("subj").alias("herb"), F.col("obj").alias("ingr")
    )
    ig = t.filter(
        F.col("pred").isin(
            "ingredient_upregulate_gene",
            "ingredient_downregulate_gene",
            "ingredient_associate_gene",
            "ingredient_bind_gene",
        )
    ).select(F.col("subj").alias("ingr"), F.col("obj").alias("gene"))
    gp = t.filter(F.col("pred") == "gene_associate_pathway").select(
        F.col("subj").alias("gene"), F.col("obj").alias("pw")
    )
    return (
        hi.join(ig, "ingr").join(gp, "gene")
        .select("herb", "ingr", "gene", "pw")
        .distinct()
    )


def _sql_kg_three_hop() -> str:
    ing = _sql_pick(CANON_INGR, f"p % {N_ING}")
    tgt = _sql_pick(CANON_TGT, f"p % {N_TGT}")
    g = _sql_pick(CANON_TGT, "u % 15")
    pw = _sql_pick(ID_PW, f"u % {N_PW}")
    return f"""
WITH hi AS ({_sql_kg_consistof()}),
ig AS (
  SELECT DISTINCT {ing} AS ingr, {tgt} AS gene
  FROM (SELECT ({_SQL_P60}) AS p
        FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 4))
),
gp AS (
  SELECT DISTINCT {g} AS gene, {pw} AS pw
  FROM (SELECT {_SQL_W6} AS w, {_SQL_U6} AS u
        FROM (SELECT event_id AS eid FROM events WHERE event_id % 5 = 3))
  WHERE w = 0
)
SELECT DISTINCT hi.subj AS herb, hi.obj AS ingr, ig.gene AS gene, gp.pw AS pw
FROM hi JOIN ig ON hi.obj = ig.ingr JOIN gp ON ig.gene = gp.gene
"""


def _sql_kg_all_edges() -> str:
    """The FULL published edge set (subj, pred, obj) as ONE SQL union of
    every per-family derivation — the single strongest differential for
    assemble_triples: any mis-mapped predicate, lost family arm, or
    cross-family dedup/conflict regression in the 47-branch union changes
    this hash. Composed from the same per-family oracles the driver
    already verifies individually (weight dropped: the contains edge
    exists whether or not its dose parses)."""
    singles = [
        (SQL_KG_TREATS, "herb_treats_disease"),
        (SQL_KG_IS_A, "disease_is_a_disease"),
        (SQL_KG_P_SYMPTOM, "prescription_treat_symptom"),
        (SQL_KG_P_SYNDROME, "prescription_treat_syndrome"),
        (SQL_KG_INDICATES, "symptom_indicates_syndrome"),
        (_sql_kg_consistof(), "herb_consistof_ingredient"),
        (_sql_kg_pclass(), "ingredient_belong_to_pharmacologic_class"),
        (_sql_kg_anat_gene(), "anatomy_express_gene"),
        (_sql_kg_ts_mm(), "tcm_symptom_map_mm_symptom"),
        (_sql_kg_resemble(), "disease_resemble_disease"),
    ]
    multis = [
        _sql_kg_herb_dims(), _sql_kg_gene_edges(), _sql_kg_ingr_disease(),
        _sql_kg_gene_gene(), _sql_kg_dis_gene(), _sql_kg_gene_go(),
        _sql_kg_sideeffect(), _sql_kg_anat_updown(), _sql_kg_ing_pairs(),
        _sql_kg_treat2(), _sql_kg_ing_go(),
    ]
    arms = [f"SELECT subj, pred, obj FROM ({m})" for m in multis]
    arms += [
        f"SELECT subj, '{p}' AS pred, obj FROM ({s})" for s, p in singles
    ]
    arms.append(
        f"SELECT subj, 'formula_contains_herb' AS pred, obj "
        f"FROM ({SQL_KG_CONTAINS})"
    )
    return "\nUNION ALL\n".join(arms)


def q_kg_all_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assemble_triples' ENTIRE output — all 47 predicates in one frame —
    against the composed all-families oracle (_sql_kg_all_edges)."""
    return _triples(spark, sf_dir).select("subj", "pred", "obj")


def q_kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the PUBLISHED graph (undirected): the
    same checkpointed label-propagation operator that canonicalizes
    entities (pipeline/cc.py, SURVEY A3) applied to the KG it built —
    (node, component), component = min node id reachable. r6: runs the
    pair-edge CC fast path (one join + one agg per propagation round —
    pipeline/cc.connected_components_edges) instead of the incidence
    formulation; per-round labels and the fixpoint are identical.
    The oracle computes min-reachable-id through a recursive transitive
    closure over the same full-edge derivation — so the iterative Spark
    plan is hash-checked against an independent fixpoint."""
    from ..pipeline.cc import connected_components_edges

    t = _triples(spark, sf_dir)
    return connected_components_edges(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
    )


def _sql_kg_components() -> str:
    return f"""
WITH RECURSIVE all_e AS ({_sql_kg_all_edges()}),
und AS (
  SELECT subj AS x, obj AS y FROM all_e
  UNION
  SELECT obj, subj FROM all_e
),
nodes AS (SELECT DISTINCT x AS n FROM und),
reach AS (
  SELECT n AS src, n AS dst FROM nodes
  UNION
  SELECT r.src, u.y FROM reach r JOIN und u ON r.dst = u.x
)
SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
"""


def q_kg_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-analytics surface: per-node degree over the FULL published
    edge set (out-degree, in-degree, total) — the hub-detection
    aggregation a KG consumer runs first, and the quantity the pipeline's
    own degree cap and skew handling reason about. One pass over the
    O(edges) triple frame: explode each edge into two (node, role) rows,
    then a single map-side-combinable groupBy — no join, no per-predicate
    branching."""
    t = _triples(spark, sf_dir)
    roles = t.select(
        F.col("subj").alias("node"), F.lit(1).alias("outd"), F.lit(0).alias("ind")
    ).unionAll(
        t.select(F.col("obj").alias("node"), F.lit(0), F.lit(1))
    )
    return roles.groupBy("node").agg(
        F.sum("outd").cast("long").alias("out_degree"),
        F.sum("ind").cast("long").alias("in_degree"),
        (F.sum("outd") + F.sum("ind")).cast("long").alias("degree"),
    )


def _sql_kg_degree() -> str:
    return f"""
WITH edges AS ({_sql_kg_all_edges()}),
roles AS (
  SELECT subj AS node, 1 AS outd, 0 AS ind FROM edges
  UNION ALL
  SELECT obj, 0, 1 FROM edges
)
SELECT node, CAST(SUM(outd) AS BIGINT) AS out_degree,
       CAST(SUM(ind) AS BIGINT) AS in_degree,
       CAST(SUM(outd) + SUM(ind) AS BIGINT) AS degree
FROM roles GROUP BY node
"""


_PR_ITERS = 6
_PR_DAMPING = 0.85


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the FULL published edge set — the fixed-iteration
    power-method analytics shape (pipeline/pagerank.py: checkpointed
    iterative join, the O(E) side shuffled once before the loop). The
    oracle unrolls the exact recurrence r_{t+1} = 0.15 + 0.85*sum(r_t/deg)
    as chained SQL CTEs, so every iteration's join+aggregate is inside the
    hash (final ranks rounded to 6dp on both sides; the double drift
    between independent sum orders is ~1e-15, nine orders below the
    rounding quantum)."""
    from ..pipeline.pagerank import pagerank

    t = _triples(spark, sf_dir)
    return pagerank(
        t.select("subj", "obj"), damping=_PR_DAMPING, iters=_PR_ITERS
    )


def _sql_kg_pagerank(iters: int = _PR_ITERS, d: float = _PR_DAMPING) -> str:
    parts = [
        f"""WITH all_e AS ({_sql_kg_all_edges()}),
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM all_e),
nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src),
r0 AS (SELECT n, CAST(1.0 AS DOUBLE) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT nodes.n, {1.0 - d!r} + {d!r} * COALESCE(c.s, 0) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS n, SUM(r{i - 1}.r / od.deg) AS s
    FROM e JOIN r{i - 1} ON e.src = r{i - 1}.n JOIN od ON od.src = e.src
    GROUP BY e.dst) c ON nodes.n = c.n
)"""
        )
    parts.append(f"\nSELECT n AS node, ROUND(r, 6) AS pagerank FROM r{iters}")
    return "".join(parts)


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the FULL
    published edge set (pipeline/triangles.py) — the degree-orientation
    plan (each edge directed low→high (degree, id), so oriented
    out-degrees are O(sqrt(E)) and the wedge join survives hub skew). The
    oracle enumerates triangles by id-ordered a<b<c closure over the same
    composed all-families edge derivation — an independent formulation,
    so an orientation bug that drops or double-counts a motif
    hash-mismatches per node."""
    from ..pipeline.triangles import triangle_counts

    t = _triples(spark, sf_dir)
    return triangle_counts(t.select("subj", "obj"))


def _sql_kg_triangles() -> str:
    return f"""
WITH all_e AS ({_sql_kg_all_edges()}),
und AS (
  SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM all_e WHERE subj <> obj
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS n FROM und UNION ALL SELECT v FROM und
  ) GROUP BY n
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
tc AS (
  SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY n
)
SELECT deg.n AS node, deg.deg AS degree,
       CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.deg < 2 THEN 0.0
            ELSE round(2.0 * COALESCE(tc.t, 0) / (deg.deg * (deg.deg - 1)), 6)
       END AS lcc
FROM deg LEFT JOIN tc USING (n)
"""


def q_kg_pagerank_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank over the published KG: edge weight = relation
    multiplicity (how many distinct predicates connect the pair — an edge
    supported by treats AND indicates AND co-occurrence carries more
    mass), so u spreads rank as r(u)*w(u,v)/out_strength(u). Same
    checkpointed-iterative-join plan as kg_pagerank (the out-STRENGTH
    join replaces the out-degree join; nothing else moves); the oracle
    unrolls the weighted recurrence as chained CTEs."""
    from ..pipeline.pagerank import pagerank

    t = _triples(spark, sf_dir)
    e = (
        t.select("subj", "obj", "pred").distinct()
        .groupBy("subj", "obj")
        .agg(F.count("*").cast("double").alias("w"))
    )
    return pagerank(e, damping=_PR_DAMPING, iters=_PR_ITERS, weight_col="w")


def _sql_kg_pagerank_w(iters: int = _PR_ITERS, d: float = _PR_DAMPING) -> str:
    parts = [
        f"""WITH all_e AS ({_sql_kg_all_edges()}),
e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
        SELECT DISTINCT subj AS src, obj AS dst, pred FROM all_e
      ) GROUP BY src, dst),
nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
od AS (SELECT src, SUM(w) AS deg FROM e GROUP BY src),
r0 AS (SELECT n, CAST(1.0 AS DOUBLE) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT nodes.n, {1.0 - d!r} + {d!r} * COALESCE(c.s, 0) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS n, SUM(r{i - 1}.r * e.w / od.deg) AS s
    FROM e JOIN r{i - 1} ON e.src = r{i - 1}.n JOIN od ON od.src = e.src
    GROUP BY e.dst) c ON nodes.n = c.n
)"""
        )
    parts.append(f"\nSELECT n AS node, ROUND(r, 6) AS pagerank FROM r{iters}")
    return "".join(parts)


def q_kg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-layout export round-trip through DISK (pipeline/export.py;
    the reference's merge scripts write merge_result_dir/relation/<stem>.csv
    with source_id,target_id,Relation_type — e.g. merge_tcm_symptom.py:
    126-131, extract_disease.py:263-267): the pipeline's triples are
    exported as that directory, read BACK from the partitioned CSV tree,
    and six files are value-verified against independent derivations — the
    five treat2 families under their reference stems (disease2mm_symptom,
    syndrome2tcm_symptom, herb2symptom, herb2syndrome, pathway2disease;
    stems differ from predicate names, so a mis-mapped stem or mis-routed
    partition hash-mismatches) plus the corpus-independent
    tcm_symptom2locus file."""
    import tempfile

    from ..pipeline.export import read_relation

    p = _pipeline(spark)
    tmp = tempfile.mkdtemp(prefix="tcmkg_export_contract_")
    p.export_reference_layout(_triples(spark, sf_dir), tmp)
    stems = (
        "herb2symptom", "herb2syndrome", "disease2mm_symptom",
        "syndrome2tcm_symptom", "pathway2disease", "tcm_symptom2locus",
    )
    out = (
        read_relation(spark, tmp)
        .filter(F.col("rel_file").isin(*stems))
        .select(
            "rel_file",
            "source_id",
            "target_id",
            F.col("Relation_type").alias("relation_type"),
        )
    )
    return _materialize_then_cleanup(spark, out, tmp)


def _sql_kg_export() -> str:
    stem_case = """CASE pred
        WHEN 'herb_treat_symptom' THEN 'herb2symptom'
        WHEN 'herb_treat_syndrome' THEN 'herb2syndrome'
        WHEN 'disease_present_symptom' THEN 'disease2mm_symptom'
        WHEN 'syndrome_present_symptom' THEN 'syndrome2tcm_symptom'
        ELSE 'pathway2disease' END"""
    return f"""
SELECT {stem_case} AS rel_file, subj AS source_id, obj AS target_id,
       pred AS relation_type
FROM ({_sql_kg_treat2()})
UNION ALL
SELECT 'tcm_symptom2locus', subj, obj, 'symptom_locus'
FROM ({_sql_kg_symptom_locus()})
"""


def q_kg_ing_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingredient→pathway/GO quad (reference extract_ingredient.py:
    550-676): ingredient_associate_pathway is a single relation kind;
    the biological-process / cellular-component / molecular-function
    predicates are each the UNION of three statement kinds (ASSOCIATES ∪
    INCREASES ∪ DECREASES relabelled to one type). The T24 wheel's gq=2
    residue plants the same (ingredient, bioprocess) pair through 参与
    AND 增进 — exactly one edge must survive the union dedup."""
    t = _triples(spark, sf_dir)
    return t.filter(
        F.col("pred").isin(
            "ingredient_associate_pathway",
            "ingredient_associate_biological_process",
            "ingredient_associate_cellular_component",
            "ingredient_associate_molecular_function",
        )
    ).select("subj", "pred", "obj")


def _sql_kg_ing_go() -> str:
    goI = _sql_pick(CANON_INGR, _SQL_GO_I)
    goPw = _sql_pick(ID_PW, _SQL_GO_PW)
    goBp = _sql_pick(ID_BPROC, _SQL_GO_BP)
    goBp2 = _sql_pick(ID_BPROC, _SQL_GO_BP2)
    goCc = _sql_pick(ID_CCOMP, _SQL_GO_CC)
    goCc2 = _sql_pick(ID_CCOMP, _SQL_GO_CC2)
    goMf = _sql_pick(ID_MFUNC, _SQL_GO_MF)
    return f"""
WITH base AS (
  SELECT event_id AS eid, ({_SQL_GQ}) AS gq FROM events WHERE event_id % 5 = 4
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT {goI} AS subj, 'ingredient_associate_pathway' AS pred, {goPw} AS obj
  FROM base WHERE gq = 0
  UNION ALL
  -- gq=1 plain ASSOCIATES; gq=2 the 参与∪增进 union plant (ONE edge)
  SELECT {goI}, 'ingredient_associate_biological_process', {goBp}
  FROM base WHERE gq IN (1, 2)
  UNION ALL
  SELECT {goI}, 'ingredient_associate_biological_process', {goBp2}
  FROM base WHERE gq = 4
  UNION ALL
  SELECT {goI}, 'ingredient_associate_cellular_component', {goCc}
  FROM base WHERE gq = 3
  UNION ALL
  SELECT {goI}, 'ingredient_associate_cellular_component', {goCc2}
  FROM base WHERE gq = 3
  UNION ALL
  SELECT {goI}, 'ingredient_associate_molecular_function', {goMf}
  FROM base WHERE gq = 4
)
"""


KG_QUERIES = {
    "kg_triangles": q_kg_triangles,
    "kg_ts_mm": q_kg_ts_mm,
    "kg_treat2": q_kg_treat2,
    "kg_export": q_kg_export,
    "kg_three_hop": q_kg_three_hop,
    "kg_all_edges": q_kg_all_edges,
    "kg_degree": q_kg_degree,
    "kg_components": q_kg_components,
    "kg_pagerank": q_kg_pagerank,
    "kg_pagerank_w": q_kg_pagerank_w,
    "kg_ing_go": q_kg_ing_go,
    "kg_sideeffect": q_kg_sideeffect,
    "kg_anat_updown": q_kg_anat_updown,
    "kg_resemble": q_kg_resemble,
    "kg_ing_pairs": q_kg_ing_pairs,
    "kg_gene_gene": q_kg_gene_gene,
    "kg_dis_gene": q_kg_dis_gene,
    "kg_gene_go": q_kg_gene_go,
    "kg_anat_gene": q_kg_anat_gene,
    "kg_chain_ing_pathway": q_kg_chain_ing_pathway,
    "kg_consistof": q_kg_consistof,
    "kg_gene_edges": q_kg_gene_edges,
    "kg_ingr_disease": q_kg_ingr_disease,
    "kg_pclass": q_kg_pclass,
    "kg_chain_herb_gene": q_kg_chain_herb_gene,
    "kg_symptom_locus": q_kg_symptom_locus,
    "kg_herb_dims": q_kg_herb_dims,
    "kg_dim_nodes": q_kg_dim_nodes,
    "kg_contains_weights": q_kg_contains,
    "kg_treats": q_kg_treats,
    "kg_p_symptom": q_kg_p_symptom,
    "kg_p_syndrome": q_kg_p_syndrome,
    "kg_indicates": q_kg_indicates,
    "kg_turn_order": q_kg_turn_order,
    "kg_text_roundtrip": q_kg_text_roundtrip,
    "kg_is_a": q_kg_is_a,
    "kg_two_hop": q_kg_two_hop,
    "kg_nodes": q_kg_nodes,
    "kg_stream_contains": q_kg_stream_contains,
    "kg_stream_stateful": q_kg_stream_stateful,
    "kg_incremental": q_kg_incremental,
    "kg_stream_dedup": q_kg_stream_dedup,
    "kg_stream_window": q_kg_stream_window,
    "kg_soft_link": q_kg_soft_link,
}

KG_ORACLES = {
    "kg_triangles": _sql_kg_triangles(),
    "kg_ts_mm": _sql_kg_ts_mm(),
    "kg_treat2": _sql_kg_treat2(),
    "kg_export": _sql_kg_export(),
    "kg_three_hop": _sql_kg_three_hop(),
    "kg_all_edges": _sql_kg_all_edges(),
    "kg_degree": _sql_kg_degree(),
    "kg_components": _sql_kg_components(),
    "kg_pagerank": _sql_kg_pagerank(),
    "kg_pagerank_w": _sql_kg_pagerank_w(),
    "kg_ing_go": _sql_kg_ing_go(),
    "kg_sideeffect": _sql_kg_sideeffect(),
    "kg_anat_updown": _sql_kg_anat_updown(),
    "kg_resemble": _sql_kg_resemble(),
    "kg_ing_pairs": _sql_kg_ing_pairs(),
    "kg_gene_gene": _sql_kg_gene_gene(),
    "kg_dis_gene": _sql_kg_dis_gene(),
    "kg_gene_go": _sql_kg_gene_go(),
    "kg_anat_gene": _sql_kg_anat_gene(),
    "kg_chain_ing_pathway": _sql_kg_chain_ing_pathway(),
    "kg_consistof": _sql_kg_consistof(),
    "kg_gene_edges": _sql_kg_gene_edges(),
    "kg_ingr_disease": _sql_kg_ingr_disease(),
    "kg_pclass": _sql_kg_pclass(),
    "kg_chain_herb_gene": _sql_kg_chain(),
    "kg_symptom_locus": _sql_kg_symptom_locus(),
    "kg_herb_dims": _sql_kg_herb_dims(),
    "kg_dim_nodes": _sql_kg_dim_nodes(),
    "kg_contains_weights": SQL_KG_CONTAINS,
    "kg_treats": SQL_KG_TREATS,
    "kg_p_symptom": SQL_KG_P_SYMPTOM,
    "kg_p_syndrome": SQL_KG_P_SYNDROME,
    "kg_indicates": SQL_KG_INDICATES,
    "kg_turn_order": SQL_KG_TURN_ORDER,
    "kg_text_roundtrip": SQL_KG_TEXT_ROUNDTRIP,
    "kg_is_a": SQL_KG_IS_A,
    "kg_two_hop": SQL_KG_TWO_HOP,
    "kg_nodes": _sql_kg_nodes(),
    "kg_stream_contains": SQL_KG_CONTAINS,  # stream must equal batch oracle
    "kg_stream_stateful": SQL_KG_CONTAINS,  # cross-batch state, same oracle
    "kg_incremental": SQL_KG_CONTAINS,  # two tranches must equal full batch
    "kg_stream_dedup": SQL_KG_STREAM_DEDUP,
    "kg_stream_window": SQL_KG_STREAM_WINDOW,
    "kg_soft_link": _sql_kg_soft_link(),
}
