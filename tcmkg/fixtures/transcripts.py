"""Deterministic multi-turn transcript generator (FIXTURES.md F1).

Produces the BASELINE.json input shape:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Properties:
  - pure arithmetic on (conversation index, block index) — same content at
    every scale, on every machine; scale = more conversations.
  - rows are emitted in a deterministically *shuffled* order so stable
    turn reordering is actually exercised;
  - ~2% duplicated (conv_id, turn_idx) rows with a LATER ts and text that
    plants otherwise-unused entities — a pipeline that fails to dedup (keep
    earliest ts) emits detectably-false triples;
  - the hot herb 甘草 appears in the majority of prescription lines (skew);
  - planted edge cases: full-width digits/punctuation (Q2B), decorated herb
    tokens (two-stage probe), parentheticals, noise words, ml/unparseable
    doses, 不渴 indication drops, treats∩induces conflicts, bidirectional
    属于 pairs, a ≥50-symptom degree-cap formula, carry-forward indication
    lines that depend on stable turn order.

Turn-text templates (the extraction rules live in pipeline/ and oracle/):
  T1  "<formula>：<herb+dose>、…。"          -> formula_contains_herb (+weight)
  T2  "<formula>主治<indications>。"          -> prescription_treat_{symptom,syndrome}
  T2b "亦主治<indications>。"                 -> same, formula carried forward in conv order
  T3  "<herb>可治<disease>。"                 -> herb_treats_disease
  T3b "<herb>可致<disease>。"                 -> (induces; conflict-kill only)
  T4  "<syndrome>常见<symptoms>。"            -> symptom_indicates_syndrome
  T5  "<disease>属于<disease>。"              -> disease_is_a_disease (antisym dedup)
  T6  distractor prose (near-miss names, full-width chars)
  T7  "<herb>含有<ingredients>。"             -> herb_consistof_ingredient
  T8  "<ingredient>上调/下调/作用于<target>。"  -> ingredient_{up,down,assoc}_gene
      with planted up∩down conflicts (move to associate) and assoc∩up
      priority cases (associate loses)
  T9  "<ingredient>能治/能致/忌用于<disease>。" -> ingredient_{treat,induce,
      contraindicate}_disease with planted treats∩induces conflicts (all
      drop) and induces∩contraindicates pairs (both survive — the
      asymmetric reference rule, extract_ingredient.py:514-521)
  T10 "<ingredient>归为<class>。" / "<class>包括<ingredient>。" -> the
      ingredient_belong_to_pharmacologic_class edge from either statement
      direction (the reference merges BELONGS_TO with reversed INCLUDES)
  T11 "<gene>调控/共变/相互作用<gene>。"      -> gene_{regulate,covary,
      associate}_gene with planted directional-kill (assoc pair also held
      by regulate), reverse-direction kill, conflict clause, and MUTUAL
      associate pairs (both directions planted -> one canonical edge)
  T12 "<gene>参与<pathway|process>。" etc.     -> gene_associate_pathway /
      gene2biological_process (参与∪驱动) / gene2cell_component
      (定位于∪活跃于) / gene2molecular_function (介导) — the reference's
      multi-source union predicates
  T13 "<disease>升高/降低/关联<gene>。"        -> disease_{up,down}regulate_
      gene / disease_associate_gene (assoc − up − down)
  T14 "<anatomy>表达<gene>。"                 -> anatomy_express_gene
  T14b "<anatomy>富集/缺失<gene>。"           -> anatomy_{up,down}regulate_gene
       (anatomy = CC-canonicalized TMAT gazetteer entities,
        extract_other_entities.py:276-324)
  T25 "<tcm_symptom>对应<mm_symptom>。" /
      "<mm_symptom>溯源<tcm_symptom>。"        -> tcm_symptom_map_mm_symptom
      (both statement directions set-merged, merge_tcm_symptom.py:213-239;
       mutual-direction plants verify the union dedup)
  T15 "<ingredient>绑定<gene>。"              -> ingredient_bind_gene (also
      subtracts from ingredient_associate_gene, with a planted
      assoc∩bind priority case)
  T16 "<ingredient>必致/或致<side-effect>。"   -> ingredient_{cause,
      might_cause}_sideeffect (both certainty sets published; a planted
      pair holds BOTH — no de-conflict, per the reference)
  T17 "<disease>相类<disease>。"              -> disease_resemble_disease
      (killed by published is_a in either direction; both kill directions
      planted)
  T18 "<ingredient>协同<ingredient>。"        -> ingredient_associate_
      ingredient (mutual pairs planted -> one canonical edge)
  T19 "<ingredient>相类<ingredient>。"        -> ingredient_resemble_
      ingredient (same mutual collapse)
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from .dimensions import (
    BIOPROC_VOCAB,
    CELLCOMP_VOCAB,
    FLAVOUR_VOCAB,
    MOLFUNC_VOCAB,
    PATHWAY_VOCAB,
    PHARM_CLASS_VOCAB,
    PROPERTY_VOCAB,
    SIDEEFFECT_VOCAB,
    TOXICITY_VOCAB,
    TROPISM_VOCAB,
)
from .gazetteers import (
    ANATOMY_NAMES,
    DISEASE_NAMES,
    HERB_NAMES,
    HOT_HERB,
    INGREDIENT_NAMES,
    MM_SYMPTOM_NAMES,
    SYNDROME_NAMES,
    TARGET_NAMES,
    all_formula_names,
    all_symptom_names,
)

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

# dose strings planted into prescription lines; each exercises a grammar path
DOSE_POOL: list[str | None] = [
    "三钱", "一两", "二钱半", "半两", "9g", "1.5g", "五分", "3-5钱",
    "一钱至二钱", "二两", "十二铢", "一斤", "四钱", "２钱",  # full-width digit -> Q2B
    "6mg", "七厘", "半钱", "2两", "八分", "三钱", "一两半", "2.5钱",
]
# doses that null the formula's percentages (ml unit / non-whitelist unit)
DOSE_POOL_BAD: list[str] = ["三合", "三升", "三枚", "一字"]

# decoration prefixes resolvable by the 2-stage probe; 真 also strips
_DECOR = ["炒", "制", "醋", "煨", "炙"]
# near-miss tokens that must NOT link (probe fails both stages)
_NEARMISS = ["甘草霜", "红参须", "假黄芪"]

# entities reserved for duplicate-row corruption text: never used elsewhere,
# so their appearance in output triples proves a dedup failure.
_N_RESERVED = 3  # last 3 herbs + last formula + last disease are reserved

# ingredient/target mention pools: primary names plus alias surface forms
# (the aliases resolve to the same canonical entity through CC — exercised
# in T7/T8 lines)
_ING_POOL = INGREDIENT_NAMES + ["栎精", "芸香苷", "乌索酸"]
_TGT_POOL = TARGET_NAMES + ["trp53", "cox2", "aprf"]

# dimension-clause pools (T3c lines): zh surface forms of the dimension
# vocabularies; flavour uses the base (substring-free) prefix
_PROPS = [zh for zh, _ in PROPERTY_VOCAB]
_FLAVS = [zh for zh, _ in FLAVOUR_VOCAB[:7]]
_TROPS = [zh for zh, _ in TROPISM_VOCAB]
_TOXES = [zh for zh, _ in TOXICITY_VOCAB]

# gene-side statement pools (T11-T14)
_PWS = [zh for zh, _ in PATHWAY_VOCAB]
_BPS = [zh for zh, _ in BIOPROC_VOCAB]
_CCS = [zh for zh, _ in CELLCOMP_VOCAB]
_MFS = [zh for zh, _ in MOLFUNC_VOCAB]
_SES = [zh for zh, _ in SIDEEFFECT_VOCAB]
# anatomy/mm-symptom mention pools: primaries plus alias surfaces (resolve
# to the same canonical entity through their gazetteer CC — like _ING_POOL)
_ANAT_POOL = ANATOMY_NAMES + ["海马回", "大动脉", "眼底膜"]
_MMS_POOL = MM_SYMPTOM_NAMES + ["紫绀", "昏厥", "颤抖"]


def _dim_clause(c: int, k: int) -> str:
    """其性P，味F…，归T…经，X。 with planted edge cases: multi-flavour,
    multi-tropism, a multi-valued toxicity (collapses to 毒 per the
    reference rule), and an unknown flavour token (must be skipped)."""
    p = _PROPS[(c * 3 + k) % len(_PROPS)]
    fi = (c + k * 5) % len(_FLAVS)
    fl = _FLAVS[fi]
    if (c + k) % 2 == 0:
        fl += _FLAVS[(fi + 2 + c % 4) % len(_FLAVS)]
    if (c * 7 + k) % 11 == 0:
        fl += "怪"  # unknown flavour char: parser must skip it
    ti = (c * 5 + k) % len(_TROPS)
    tr = _TROPS[ti]
    if (c + k) % 3 == 0:
        tr += "、" + _TROPS[(ti + 1 + c % 5) % len(_TROPS)]
    if (c * 3 + k) % 13 == 0:
        tox = "微毒、毒"  # multi-valued -> 毒 (reference extract_herb.py:640-646)
    else:
        tox = _TOXES[(c + k) % len(_TOXES)]
    return f"其性{p}，味{fl}，归{tr}经，{tox}。"

# Inert filler prose: pads turns to realistic transcript lengths without
# adding extractable content. MUST NOT contain any gazetteer name, rule
# trigger (：/主治/可治/可致/常见/属于/不渴), or dose pattern — asserted by
# tests/test_fixtures.py::test_fillers_inert.
FILLER = [
    "患者素体尚可",
    "脉象沉细而缓",
    "舌质淡而苔薄",
    "病程迁延反复",
    "饮食起居如故",
    "家中无类似旧案",
    "前医诊查未明",
    "嘱其调摄静养",
    "七日后复诊再议",
    "药后以温粥送服",
    "忌生冷油腻之品",
    "夜卧安然无他",
]


def _sizes() -> tuple[list[str], list[str], list[str], list[str], list[str]]:
    herbs = HERB_NAMES[:-_N_RESERVED]
    formulas = all_formula_names()[:-1]
    symptoms = all_symptom_names()
    syndromes = SYNDROME_NAMES
    diseases = DISEASE_NAMES[:-1]
    return herbs, formulas, symptoms, syndromes, diseases


def reserved_entities() -> dict[str, list[str]]:
    return {
        "herb": HERB_NAMES[-_N_RESERVED:],
        "formula": all_formula_names()[-1:],
        "disease": DISEASE_NAMES[-1:],
    }


def _prescription_body(c: int, k: int, herbs: list[str], dirty: bool) -> str:
    """herb+dose list with decorations / parentheticals / edge-case doses.

    `dirty` formulas (a fixed ~1/7 of the formula table) get no-dose / ml /
    non-whitelist-unit tokens, which null that formula's weights corpus-wide;
    clean formulas always carry parseable gram doses.
    """
    n_herbs = 3 + (c * 5 + k) % 5  # 3..7
    toks: list[str] = []
    seen: set[str] = set()
    for j in range(n_herbs):
        h = herbs[(c * 13 + k * 29 + j * 7) % len(herbs)]
        if h in seen or h == HOT_HERB:
            continue
        seen.add(h)
        v = (c + k * 3 + j) % 23
        dose = DOSE_POOL[(c * 3 + k + j * 5) % len(DOSE_POOL)]
        tok = h + dose
        if v == 0:
            tok = _DECOR[(c + j) % len(_DECOR)] + tok       # decorated, stage-2 probe
        elif v == 1:
            tok = h + "（去皮）" + dose                       # parenthetical
        elif v == 2:
            tok = h + "末" + dose                            # suffix-stripped by probe
        elif v == 3 and dirty:
            tok = h                                          # no dose -> incomplete
        elif v == 4 and dirty:
            tok = h + DOSE_POOL_BAD[(c + j) % len(DOSE_POOL_BAD)]  # ml/bad unit
        elif v == 5:
            tok = _NEARMISS[(c + j) % len(_NEARMISS)] + dose  # unlinkable
        toks.append(tok)
    # hot herb in ~2/3 of prescriptions (skew target: >=30%)
    if (c + k) % 3 != 0:
        toks.append(HOT_HERB + DOSE_POOL[(c + k) % 12])
    if (c * 7 + k) % 9 == 0:
        toks.append("各等分")  # noise phrase, removed before tokenization
    return "、".join(toks)


def _indications(c: int, k: int, symptoms: list[str], syndromes: list[str]) -> str:
    n_sym = 2 + (c + k) % 3
    parts = [symptoms[(c * 11 + k * 17 + j * 5) % len(symptoms)] for j in range(n_sym)]
    if syndromes and (c + k) % 4 == 0:
        parts.append(syndromes[(c * 3 + k) % len(syndromes)])
    if (c * 5 + k) % 13 == 0:
        parts.append("口不渴")  # plants 不渴 -> this line's symptom edges dropped
    return "，".join(dict.fromkeys(parts))


def generate_turns(n_conversations: int = 200, conv_offset: int = 0):
    """Yield transcript rows as dicts (shuffled order applied by caller)."""
    herbs, formulas, symptoms, syndromes, diseases = _sizes()
    res = reserved_entities()
    for c in range(conv_offset, conv_offset + n_conversations):
        conv_id = f"conv_{c:07d}"
        t = 0

        def row(text: str, role: str, tool: str | None = None, pad_prefix: bool = False):
            nonlocal t
            # realistic turn lengths: 2-3 inert filler sentences appended,
            # optional prefix filler on AC-scanned (non-prefix-resolving)
            # templates. Extraction semantics are unchanged by construction.
            nf = len(FILLER)
            suffix = FILLER[(c * 3 + t) % nf] + "。" + FILLER[(c + t * 7) % nf] + "。"
            if (c + t) % 2 == 0:
                suffix += FILLER[(c * 5 + t * 11) % nf] + "。"
            if pad_prefix and t % 3 == 0:
                text = FILLER[(c + t) % nf] + "，" + text
            r = {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text + suffix,
                "tool": tool,
                "ts": _BASE_TS + timedelta(seconds=c * 3600 + t * 10),
            }
            t += 1
            return r

        yield row("请推荐适合的方剂。", "user")
        n_blocks = 3 + c % 5
        for k in range(n_blocks):
            kind = (c + 2 * k) % 12
            # ~9% of template turns land in a *user* turn: rules only mine
            # assistant turns, so these are planted negatives.
            role = "user" if (c + k) % 11 == 0 else "assistant"
            tool = ("search", "calculator", None)[(c + k) % 3] if role != "user" else None
            if kind in (0, 2):
                fidx = (c * 7 + k * 31) % len(formulas)
                f = formulas[fidx]
                yield row(f"可用{f}加减。", "user" if role != "user" else "assistant")
                yield row(
                    f"{f}：{_prescription_body(c, k, herbs, dirty=fidx % 7 == 0)}。",
                    role, tool,
                )
            elif kind == 1:
                f = formulas[(c * 7 + k * 31) % len(formulas)]
                yield row(
                    f"{f}主治{_indications(c, k, symptoms, syndromes)}。", role, tool
                )
            elif kind == 3:
                yield row(f"亦主治{_indications(c, k + 5, symptoms, syndromes)}。", role, tool)
            elif kind == 4:
                h = herbs[(c * 3 + k) % len(herbs)]
                d = diseases[(c * 5 + k) % len(diseases)]
                h2 = herbs[(c * 3 + k + 7) % len(herbs)]
                d2 = diseases[(c * 5 + k + 3) % len(diseases)]
                yield row(f"{h}可治{d}，{h2}亦可治{d2}。", role, tool)
                if c % 13 == 0 and k == 0:
                    # plant the treats∩induces conflict for (h, d)
                    yield row(f"但须注意，{h}可致{d}。", "assistant")
                if (c + k) % 4 == 0:
                    # T3c: dimension clause on a herb statement ->
                    # herb_has_property/flavour, tropism_of/toxicity_of_herb
                    h3 = herbs[(c * 3 + k + 11) % len(herbs)]
                    d3 = diseases[(c * 5 + k + 7) % len(diseases)]
                    yield row(f"{h3}可治{d3}。{_dim_clause(c, k)}", role, tool)
                # T20 herb→symptom / herb→syndrome treats
                # (merge_tcm_symptom.py:206, extract_syndrome.py:41-53)
                w5 = (c // 12 + k) % 3
                if w5 == 0:
                    sm = symptoms[(c * 7 + k) % len(symptoms)]
                    yield row(f"{h}善治{sm}。", role, tool)
                elif w5 == 1 and syndromes:
                    sy = syndromes[(c * 7 + k) % len(syndromes)]
                    yield row(f"{h2}善解{sy}。", role, tool)
            elif kind == 5:
                s = syndromes[(c * 3 + k) % len(syndromes)]
                yield row(
                    f"{s}常见{_indications(c, k + 9, symptoms, [])}。", role, tool
                )
                # T21 syndrome→symptom present (merge_tcm_symptom.py:243-261)
                if (c // 12 + k) % 2 == 0:
                    sm = symptoms[(c * 13 + k) % len(symptoms)]
                    yield row(f"{s}呈现{sm}。", role, tool)
                # T25 tcm↔mm symptom mapping, both statement directions
                # (merge_tcm_symptom.py:213-239); w9==2 plants BOTH
                # directions of one pair -> the union dedup yields ONE edge
                w9 = (c // 12 + k) % 3
                smx = symptoms[(c * 19 + k) % len(symptoms)]
                mm = _MMS_POOL[(c * 5 + k) % len(_MMS_POOL)]
                if w9 == 0:
                    yield row(f"{smx}对应{mm}。", role, tool)
                elif w9 == 1:
                    yield row(f"{mm}溯源{smx}。", role, tool)
                else:
                    yield row(f"{smx}对应{mm}。", role, tool)
                    yield row(f"{mm}溯源{smx}。", "assistant")
            elif kind == 6:
                h = herbs[(c * 3 + k + 1) % len(herbs)]
                d = diseases[(c * 5 + k + 1) % len(diseases)]
                yield row(f"久服{h}，恐{h}可致{d}。", role, tool)
                d1 = diseases[(c * 2 + k) % len(diseases)]
                d2 = diseases[(c * 2 + k + 5) % len(diseases)]
                if d1 != d2:
                    yield row(f"{d1}属于{d2}。", role, tool)
                    if c % 19 == 0 and k == 1:
                        yield row(f"{d2}属于{d1}。", "assistant")  # bidirectional -> both dropped
                # T17 disease resemble (extract_disease.py:303-317): killed
                # when the pair survives in published is_a, either direction
                w3 = (c // 12 + k) % 4
                if w3 == 0 and d1 != d2:
                    yield row(f"{d1}相类{d2}。", role, tool)   # same-dir kill
                elif w3 == 1 and d1 != d2:
                    yield row(f"{d2}相类{d1}。", role, tool)   # reverse-dir kill
                elif w3 == 2:
                    dA = diseases[(c * 7 + k + 2) % len(diseases)]
                    dB = diseases[(c * 7 + k + 9) % len(diseases)]
                    if dA != dB:
                        yield row(f"{dA}相类{dB}。", role, tool)  # plain
                # T22 disease→symptom present + T23 pathway→disease
                # (extract_disease.py:240-267, :335-347). The disease
                # side presents a MODERN-medicine symptom — the
                # reference's disease2mm_symptom.csv targets TMMS ids
                w6 = (c // 12 + k) % 3
                if w6 == 0:
                    mm6 = _MMS_POOL[(c * 17 + k) % len(_MMS_POOL)]
                    yield row(f"{d1}呈现{mm6}。", role, tool)
                elif w6 == 1:
                    pw = _PWS[(c * 3 + k) % len(_PWS)]
                    yield row(f"{pw}引动{d2}。", role, tool)
            elif kind == 7:
                near = _NEARMISS[(c + k) % len(_NEARMISS)]
                yield row(
                    f"昔人言：{near}非药也（０．５克不可信），勿用。", role, tool
                )
            elif kind == 9:
                # T11 gene↔gene wheel + T14 anatomy express. The kill/
                # mutual cases span separate turns, so the de-conflict is
                # corpus-wide set algebra, not clause-local parsing.
                nt = len(_TGT_POOL)
                ga = _TGT_POOL[(c * 7 + k) % nt]
                gb = _TGT_POOL[(c * 7 + k + 2 + c % 5) % nt]
                if ga == gb:
                    gb = _TGT_POOL[(c * 7 + k + 1) % nt]
                v = (c + k) % 6
                if v == 0:
                    yield row(f"{ga}调控{gb}。", role, tool)
                elif v == 1:
                    yield row(f"{ga}共变{gb}。", role, tool)
                elif v == 2:
                    yield row(f"{ga}相互作用{gb}。", role, tool)
                elif v == 3:
                    # directional kill: regulate claims the assoc pair
                    yield row(f"{ga}调控{gb}。", role, tool)
                    yield row(f"{ga}相互作用{gb}。", role, tool)
                elif v == 4:
                    # reverse-direction kill: covary (b,a) kills assoc (a,b)
                    yield row(f"{gb}共变{ga}。", role, tool)
                    yield row(f"{ga}相互作用{gb}。", role, tool)
                else:
                    # mutual associate -> ONE canonical (subj<obj) edge
                    yield row(f"{ga}相互作用{gb}。", role, tool)
                    yield row(f"{gb}相互作用{ga}。", "assistant")
                loc = _ANAT_POOL[(c * 3 + k) % len(_ANAT_POOL)]
                yield row(f"{loc}表达{ga}。", role, tool)
                # T14b anatomy up/down-regulate wheel. kind==9 pins
                # c ≡ 9-2k (mod 12), which makes any (a·c+b·k) % 3 wheel
                # with b ≡ 2a (mod 3) CONSTANT on these blocks (e.g. the
                # first attempt (5c+k)%3 ≡ 0 always) — c//12 walks freely,
                # so this wheel hits all three residues
                w2 = (c // 12 + k) % 3
                if w2 == 0:
                    yield row(f"{loc}富集{gb}。", role, tool)
                elif w2 == 1:
                    yield row(f"{loc}缺失{gb}。", role, tool)
            elif kind == 10:
                # T13 disease→gene wheel with the assoc-loses conflict line
                d10 = diseases[(c * 7 + k) % len(diseases)]
                g10 = _TGT_POOL[(c * 5 + k) % len(_TGT_POOL)]
                u = (c * 3 + k) % 4
                if u == 0:
                    yield row(f"{d10}升高{g10}。", role, tool)
                elif u == 1:
                    yield row(f"{d10}降低{g10}。", role, tool)
                elif u == 2:
                    yield row(f"{d10}关联{g10}。", role, tool)
                else:
                    yield row(f"{d10}关联{g10}，且升高{g10}。", role, tool)
            elif kind == 11:
                # T12 gene→pathway/GO wheel (multi-marker union predicates)
                g12 = _TGT_POOL[(c * 11 + k) % len(_TGT_POOL)]
                w = (c + k) % 6
                if w == 0:
                    yield row(f"{g12}参与{_PWS[(c + k) % len(_PWS)]}。", role, tool)
                elif w == 1:
                    yield row(f"{g12}参与{_BPS[(c + k) % len(_BPS)]}。", role, tool)
                elif w == 2:
                    yield row(f"{g12}驱动{_BPS[(c * 3 + k) % len(_BPS)]}。", role, tool)
                elif w == 3:
                    yield row(f"{g12}定位于{_CCS[(c + k) % len(_CCS)]}。", role, tool)
                elif w == 4:
                    yield row(f"{g12}活跃于{_CCS[(c * 3 + k) % len(_CCS)]}。", role, tool)
                else:
                    yield row(f"{g12}介导{_MFS[(c + k) % len(_MFS)]}。", role, tool)
            else:  # kind == 8: derived-entity statements (T7/T8)
                h = herbs[(c * 7 + k) % len(herbs)]
                ni, nt = len(_ING_POOL), len(_TGT_POOL)
                ing1 = _ING_POOL[(c * 5 + k) % ni]
                ing2 = _ING_POOL[(c * 5 + k + 3 + c % 7) % ni]
                if ing1 == ing2:
                    ing2 = _ING_POOL[(c * 5 + k + 1) % ni]
                yield row(f"{h}含有{ing1}、{ing2}。", role, tool, pad_prefix=True)
                # T10: ingredient→pharm-class, both statement directions
                npc = len(PHARM_CLASS_VOCAB)
                pcls = PHARM_CLASS_VOCAB[(c * 7 + k) % npc][0]
                if (c + k) % 3 == 0:
                    yield row(f"{ing1}归为{pcls}。", role, tool)
                elif (c + k) % 3 == 1:
                    yield row(f"{pcls}包括{ing2}。", role, tool)
                tg = _TGT_POOL[(c * 3 + k) % nt]
                v = (c + k) % 7
                if v == 0:
                    yield row(f"{ing1}上调{tg}。", role, tool)
                elif v == 1:
                    yield row(f"{ing1}下调{tg}。", role, tool)
                elif v == 2:
                    yield row(f"{ing1}作用于{tg}。", role, tool)
                elif v == 3:
                    # up∩down conflict: both directional edges die, pair
                    # moves to associate (reference extract_target.py:365-372)
                    yield row(f"{ing1}上调{tg}，亦下调{tg}。", role, tool)
                elif v == 4:
                    # assoc∩up priority: the generic associate edge loses
                    # (reference extract_target.py:404-417)
                    yield row(f"{ing1}作用于{tg}，且上调{tg}。", role, tool)
                elif v == 5:
                    # T15 plain bind (extract_target.py:303-308)
                    yield row(f"{ing1}绑定{tg}。", role, tool)
                else:
                    # assoc∩bind priority: associate loses to bind
                    # (extract_target.py:405-411 final subtracts bind)
                    yield row(f"{ing1}作用于{tg}，且绑定{tg}。", role, tool)
                # T18/T19 ingredient interact + ingredient resemble
                # (extract_ingredient.py:320-391): mutual pairs collapse to
                # one canonical subj<obj edge
                w4 = (c // 12 + k) % 4
                if w4 == 0:
                    yield row(f"{ing1}协同{ing2}。", role, tool)
                elif w4 == 1:
                    yield row(f"{ing1}协同{ing2}。", role, tool)
                    yield row(f"{ing2}协同{ing1}。", "assistant")  # mutual
                elif w4 == 2:
                    yield row(f"{ing1}相类{ing2}。", role, tool)
                else:
                    yield row(f"{ing1}相类{ing2}。", role, tool)
                    yield row(f"{ing2}相类{ing1}。", "assistant")  # mutual
                # T24: ingredient→pathway/GO quad wheel
                # (extract_ingredient.py:550-676). w7==3 plants the SAME
                # (ingredient, bioprocess) pair through two statement kinds
                # (参与 ASSOCIATES + 增进 INCREASES) — the published edge set
                # is their union, so exactly one edge survives the dedup.
                w7 = (c // 12 + k) % 6
                bp = _BPS[(c * 5 + k) % len(_BPS)]
                bp2 = _BPS[(c * 5 + k + 3) % len(_BPS)]
                cc1 = _CCS[(c * 5 + k) % len(_CCS)]
                cc2 = _CCS[(c * 5 + k + 2) % len(_CCS)]
                mf1 = _MFS[(c * 5 + k) % len(_MFS)]
                mf2 = _MFS[(c * 5 + k + 1) % len(_MFS)]
                if w7 == 0:
                    pw8 = _PWS[(c * 7 + k) % len(_PWS)]
                    yield row(f"{ing1}参与{pw8}。", role, tool)
                elif w7 == 1:
                    yield row(f"{ing1}参与{bp}。", role, tool)
                elif w7 == 2:
                    yield row(f"{ing1}增进{bp}。{ing1}削减{bp2}。", role, tool)
                elif w7 == 3:
                    yield row(f"{ing1}参与{bp}。", role, tool)
                    yield row(f"{ing1}增进{bp}。", "assistant")  # union dedup
                elif w7 == 4:
                    yield row(f"{ing1}定位于{cc1}。{ing1}增进{cc2}。", role, tool)
                else:
                    yield row(f"{ing1}介导{mf1}。{ing1}削减{mf2}。", role, tool)
                # T16: ingredient→side-effect certainty wheel
                se = _SES[(c * 5 + k) % len(_SES)]
                u2 = (c + k * 7) % 3
                if u2 == 0:
                    yield row(f"{ing1}必致{se}。", role, tool)
                elif u2 == 1:
                    yield row(f"{ing1}或致{se}。", role, tool)
                else:
                    # both certainty sets claim the pair -> BOTH publish
                    # (no de-conflict in the reference)
                    yield row(f"{ing1}必致{se}。{ing1}或致{se}。", role, tool)
                # T9: ingredient→disease statement with the three-way
                # conflict wheel (treat / induce / contraindicate)
                d9 = diseases[(c * 11 + k) % len(diseases)]
                u = (c * 3 + k) % 5
                if u == 0:
                    yield row(f"{ing2}能治{d9}。", role, tool)
                elif u == 1:
                    yield row(f"{ing2}能致{d9}。", role, tool)
                elif u == 2:
                    yield row(f"{ing2}忌用于{d9}。", role, tool)
                elif u == 3:
                    # treats∩induces conflict: BOTH edges drop
                    yield row(f"{ing2}能治{d9}，然亦能致{d9}。", role, tool)
                else:
                    # induces + contraindicates, no treats: both survive
                    yield row(f"{ing2}能致{d9}，故忌用于{d9}。", role, tool)
        # degree-cap formula: formulas[1] accumulates >=50 distinct symptoms
        if c % 17 == 0:
            f = formulas[1]
            lo = (c // 17) * 8
            names = [symptoms[(lo + j) % len(symptoms)] for j in range(8)]
            yield row(f"{f}主治{'，'.join(names)}。", "assistant")
        # ~2% duplicated (conv_id, turn_idx): later ts + reserved entities.
        if c % 5 == 0:
            dup_t = 1 + (c % max(1, t - 1))
            yield {
                "conv_id": conv_id,
                "turn_idx": dup_t,
                "role": "assistant",
                "text": f"{res['formula'][0]}：{res['herb'][0]}九钱、{res['herb'][1]}一两。"
                        f"{res['herb'][2]}可治{res['disease'][0]}。",
                "tool": None,
                "ts": _BASE_TS + timedelta(seconds=c * 3600 + dup_t * 10 + 100000),
            }


def generate_pandas(n_conversations: int = 200, conv_offset: int = 0):
    """Transcripts as a pandas DataFrame in shuffled row order."""
    import pandas as pd

    rows = sorted(
        generate_turns(n_conversations, conv_offset),
        key=lambda r: ((r["turn_idx"] * 2654435761 + len(r["text"]) * 97
                        + int(r["conv_id"][5:])) % 104729,
                       r["conv_id"], r["turn_idx"], str(r["ts"])),
    )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def write_parquet(path: str, n_conversations: int, chunk: int = 20000) -> None:
    """Chunked parquet writer for bench-scale corpora (millions of turns).

    Writes a DIRECTORY of part files (one per chunk) so the Spark scan
    parallelizes from the first stage — a single monolithic file would make
    the initial decode a one-task serial bottleneck at any core count.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    done = 0
    part = 0
    while done < n_conversations:
        n = min(chunk, n_conversations - done)
        pdf = generate_pandas(n, conv_offset=done)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(tmp, f"part-{part:05d}.parquet"),
        )
        done += n
        part += 1
    os.replace(tmp, path)  # atomic publish: partial generations never seen


def spark_transcripts(spark, n_conversations: int = 200):
    """Transcripts as a Spark DataFrame (small/medium scales)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    return spark.createDataFrame(generate_pandas(n_conversations), schema=schema)
