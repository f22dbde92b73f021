"""Deterministic synthetic gazetteers (entity dictionaries).

Modeled on the reference's entity sources (FIXTURES.md F2):
  - herb records  ~ CPMCP/SymMap herb tables (reference:
    processed_code/extract_herb.py:84-109 + alias files :415-443)
  - formulas      ~ prescription tables (extract_prescription.py:19-76)
  - symptoms      ~ tcm_symptom (merge_tcm_symptom.py:20-57)
  - syndromes     ~ symmap syndrome (extract_syndrome.py:16-24)
  - diseases      ~ CPMCP disease (extract_disease.py:21-60)

Each gazetteer is a RECORD table: multiple records may describe the same
real-world entity, tied together by shared `;`-joined IDs or shared names —
exactly the multi-ID merge input of `merge_database_by_id`
(reference: merge_utility.py:166-231). Canonicalization (connected
components) folds records into entities; that happens in the pipeline (and
in the oracle), NOT here.

Everything is seed-free and arithmetic-deterministic: same tables on every
call, every machine, every Python version.

Skew: the hot herb 甘草 (licorice) gets the largest alias group and is
planted in ≥30% of prescription lines by the transcript generator — the
甘草-scale skew case named in BASELINE.json.
"""

from __future__ import annotations

from dataclasses import dataclass, field

HOT_HERB = "甘草"

# ---------------------------------------------------------------- herbs ----
HERB_NAMES: list[str] = [
    "甘草", "人参", "黄芪", "当归", "白术", "茯苓", "川芎", "白芍", "赤芍",
    "熟地黄", "生地黄", "陈皮", "半夏", "生姜", "大枣", "桂枝", "麻黄", "杏仁",
    "石膏", "知母", "黄连", "黄芩", "黄柏", "栀子", "连翘", "金银花", "薄荷",
    "荆芥", "防风", "羌活", "独活", "柴胡", "升麻", "葛根", "桔梗", "枳实",
    "厚朴", "木香", "砂仁", "藿香", "苍术", "泽泻", "猪苓", "车前子", "滑石",
    "竹叶", "天花粉", "麦冬", "天冬", "五味子", "山茱萸", "山药", "枸杞子",
    "菊花", "桑叶", "蝉蜕", "牛蒡子", "川贝母", "浙贝母", "瓜蒌", "桑白皮",
    "大黄", "芒硝", "火麻仁", "附子", "干姜", "肉桂", "吴茱萸", "小茴香",
    "丁香", "花椒", "红花", "桃仁", "丹参", "益母草", "牛膝", "鸡血藤",
    "乳香", "没药", "蒲黄", "三七", "白及", "仙鹤草", "艾叶", "阿胶", "龙骨",
    "牡蛎", "酸枣仁", "远志", "石菖蒲", "天麻", "钩藤", "地龙", "全蝎",
    "蜈蚣", "白僵蚕", "玄参", "牡丹皮", "地骨皮", "青蒿",
]

# alias groups: canonical name -> extra alias names (separate gazetteer
# records sharing an ID, so canonicalization must merge them). 甘草 has the
# largest group (hot entity).
HERB_ALIASES: dict[str, list[str]] = {
    "甘草": ["国老", "甜草根", "粉草", "乌拉尔甘草"],
    "人参": ["棒槌", "黄参"],
    "当归": ["干归"],
    "金银花": ["忍冬花", "双花"],
    "大黄": ["将军"],
    "白术": ["于术"],
    "茯苓": ["云苓"],
    "麦冬": ["麦门冬"],
    "天冬": ["天门冬"],
    "牛膝": ["怀牛膝"],
    "丹参": ["紫丹参"],
    "石膏": ["生石膏"],
    "黄连": ["川连"],
    "陈皮": ["广陈皮"],
    "肉桂": ["玉桂"],
    "三七": ["田七"],
    "艾叶": ["蕲艾"],
    "天麻": ["定风草"],
    "全蝎": ["全虫"],
    "地龙": ["蚯蚓干"],
}

# ------------------------------------------------------------- formulas ----
FORMULA_NAMES: list[str] = [
    "四君子汤", "四物汤", "六味地黄丸", "补中益气汤", "小柴胡汤", "大承气汤",
    "桂枝汤", "麻黄汤", "银翘散", "白虎汤", "理中丸", "逍遥散", "血府逐瘀汤",
    "天麻钩藤饮", "酸枣仁汤", "二陈汤", "平胃散", "藿香正气散", "五苓散",
    "真武汤", "归脾汤", "生脉散", "玉屏风散", "川芎茶调散", "杏苏散",
    "桑菊饮", "清营汤", "犀角地黄汤", "导赤散", "龙胆泻肝汤", "泻白散",
    "清胃散", "芍药汤", "白头翁汤", "青蒿鳖甲汤", "温脾汤", "十枣汤",
]
_FORMULA_PREFIX = ["安神", "清心", "固本", "培元", "益寿", "延年", "宁肺",
                   "和胃", "健脾", "养肝", "滋肾", "润燥", "解郁", "化瘀"]
_FORMULA_SUFFIX = ["汤", "丸", "散", "饮"]

# formula aliases (e.g. 丸/汤 dual forms recorded as separate records)
FORMULA_ALIASES: dict[str, list[str]] = {
    "六味地黄丸": ["地黄丸"],
    "藿香正气散": ["藿香正气汤"],
    "逍遥散": ["逍遥丸"],
    "理中丸": ["理中汤"],
}

# ------------------------------------------------------------- symptoms ----
SYMPTOM_NAMES: list[str] = [
    "头痛", "发热", "恶寒", "咳嗽", "咽痛", "口渴", "鼻塞", "流涕", "喘息",
    "胸闷", "心悸", "失眠", "多梦", "健忘", "眩晕", "耳鸣", "目赤", "口苦",
    "口干", "恶心", "呕吐", "腹痛", "腹胀", "泄泻", "便秘", "食欲不振",
    "乏力", "自汗", "盗汗", "水肿", "腰痛", "关节痛", "肢冷", "面色苍白",
    "面红", "烦躁", "抽搐", "黄疸", "小便不利", "尿频", "遗精", "月经不调",
    "痛经", "崩漏", "带下", "瘙痒", "皮疹", "疮疡", "麻木", "消瘦", "嗳气",
    "呃逆", "吞酸", "胁痛", "身重", "畏光", "流泪", "齿衄", "鼻衄", "咯血",
    "便血", "尿血", "紫癜", "脱发", "爪甲不荣", "唇裂", "舌燥", "声嘶",
]
_SYMPTOM_PART = ["颈项", "肩背", "肘臂", "手腕", "指节", "髋股", "膝胫",
                 "足跟", "脊柱", "眉棱", "颞侧", "枕后", "少腹", "脘腹"]
_SYMPTOM_KIND = ["疼痛", "酸胀", "拘急", "重着"]

SYMPTOM_ALIASES: dict[str, list[str]] = {
    "眩晕": ["头晕"],
    "失眠": ["不寐症状"],
    "乏力": ["神疲"],
    "泄泻": ["腹泻"],
    "发热": ["身热"],
    "恶寒": ["怕冷"],
}

# ------------------------------------------------------------ syndromes ----
SYNDROME_NAMES: list[str] = [
    "气虚证", "血虚证", "阴虚证", "阳虚证", "气滞证", "血瘀证", "痰湿证",
    "湿热证", "风寒证", "风热证", "心火亢盛证", "肝郁气滞证", "脾虚湿困证",
    "肾阳不足证", "肺燥津伤证", "胃寒证", "寒湿困脾证", "表虚证", "里热炽盛证",
    "亡阳证", "心脾两虚证", "肝肾阴虚证", "脾肾阳虚证", "气血两虚证",
]
SYNDROME_ALIASES: dict[str, list[str]] = {
    "气虚证": ["气虚之证"],
    "血瘀证": ["瘀血证"],
}

# ------------------------------------------------------------- diseases ----
DISEASE_NAMES: list[str] = [
    "感冒", "消渴", "痢疾", "疟疾", "肺痨", "中风", "胸痹", "胃痞", "积聚",
    "臌胀", "癃闭", "石淋", "痹证", "痿证", "痫病", "郁病", "不寐", "奔豚",
    "霍乱", "破伤风", "瘰疬", "瘿病", "疝气", "痔疮", "脱肛", "肠痈",
    "乳癖", "湿疮", "瘾疹", "白疕", "斑秃", "骨痨", "历节", "脚气",
    "肺痈", "肺胀", "哮病", "肥气", "息贲", "伏梁",
]
DISEASE_ALIASES: dict[str, list[str]] = {
    "消渴": ["消渴病"],
    "感冒": ["伤风"],
    "中风": ["卒中"],
}


# ---------------------------------------------------------- ingredients ----
# Chemical-constituent entities (reference: extract_ingredient.py:210-218
# concatenates CPMCP/SymMap/TCMBank/PharMeBINet ingredient tables and
# assigns TMIN%05d surrogate ids; multi-source records merge by shared ids).
# Names are public compound names chosen substring-free vs every other
# gazetteer name (asserted by tests), so AC scans stay oracle-predictable.
INGREDIENT_NAMES: list[str] = [
    "槲皮素", "山奈酚", "木犀草素", "绿原酸", "齐墩果酸", "熊果酸", "芦丁",
    "青藤碱", "灯盏花素", "穿心莲内酯", "水飞蓟宾", "延胡索乙素", "秦皮甲素",
    "橙皮苷", "苦参碱", "小檗碱",
]
INGREDIENT_ALIASES: dict[str, list[str]] = {
    "槲皮素": ["栎精"],
    "芦丁": ["芸香苷"],
    "熊果酸": ["乌索酸"],
}

# -------------------------------------------------------------- targets ----
# Gene/protein target entities (reference: extract_target.py:195-204
# concatenates the per-source gene tables and assigns TMGE%05d ids).
# Latin symbols are stored lowercase (text_norm lowercases transcripts).
TARGET_NAMES: list[str] = [
    "tp53", "egfr", "vegfa", "akt1", "stat3", "mapk1", "jak2", "nos2",
    "casp3", "bcl2", "nfkb1", "mtor", "tnfa", "ptgs2", "hmox1", "sirt1",
    "ace2",
]
TARGET_ALIASES: dict[str, list[str]] = {
    "tp53": ["trp53"],
    "stat3": ["aprf"],
    "ptgs2": ["cox2"],
}

# -------------------------------------------------------------- anatomy ----
# Anatomic-site entities (reference: extract_other_entities.py:276-324
# merges PrimeKG + PharMeBINet anatomy tables by shared UBERON id groups
# and assigns TMAT%05d ids). A CC-canonicalized gazetteer family — records
# merge via shared external ids exactly like the reference's
# merge_database_by_id_group — DISTINCT from the fixed locus table
# (merge_tcm_symptom.py:92-98), which stays the symptom-name-containment
# vocabulary. Modern anatomical structures, substring-free vs every other
# gazetteer name (asserted by tests).
ANATOMY_NAMES: list[str] = [
    "海马体", "垂体", "甲状腺", "肾上腺", "胸腺", "骨髓", "脊髓",
    "淋巴结", "主动脉", "支气管", "视网膜", "角膜", "膈肌", "胰岛",
]
ANATOMY_ALIASES: dict[str, list[str]] = {
    "海马体": ["海马回"],
    "主动脉": ["大动脉"],
    "视网膜": ["眼底膜"],
}

# ----------------------------------------------------------- mm symptoms ---
# Modern-medicine symptom entities (reference: extract_mm_symmptom.py
# merges SymMap/CPMCP/PharMeBINet phenotype rows by MeSH_id then HPO_id
# groups and assigns TMMS%05d ids). Western clinical terms, disjoint from
# the tcm_symptom vocabulary.
MM_SYMPTOM_NAMES: list[str] = [
    "发绀", "晕厥", "谵妄", "构音障碍", "吞咽困难", "心动过速",
    "低血压", "恶病质", "共济失调", "震颤", "瞳孔散大", "呼吸急促",
]
MM_SYMPTOM_ALIASES: dict[str, list[str]] = {
    "发绀": ["紫绀"],
    "晕厥": ["昏厥"],
    "震颤": ["颤抖"],
}


def _synth(pool_a: list[str], pool_b: list[str], n: int) -> list[str]:
    """Deterministic synthetic names: cross product walk, no randomness."""
    out = []
    i = 0
    while len(out) < n:
        a = pool_a[i % len(pool_a)]
        b = pool_b[(i * 7 + i // len(pool_a)) % len(pool_b)]
        name = a + b
        if name not in out:
            out.append(name)
        i += 1
    return out


def all_formula_names() -> list[str]:
    extra = _synth(_FORMULA_PREFIX, _FORMULA_SUFFIX, 44)
    return FORMULA_NAMES + extra


def all_symptom_names() -> list[str]:
    extra = _synth(_SYMPTOM_PART, _SYMPTOM_KIND, 54)
    return SYMPTOM_NAMES + extra


@dataclass
class GazetteerRecord:
    record_id: str
    names: list[str]          # `;`-joined in the table form
    symmap_id: str | None     # may be `;`-multi
    extdb_id: str | None


@dataclass
class Gazetteers:
    """Record-level gazetteer tables + the ground-truth name lists."""
    herb: list[GazetteerRecord] = field(default_factory=list)
    formula: list[GazetteerRecord] = field(default_factory=list)
    symptom: list[GazetteerRecord] = field(default_factory=list)
    syndrome: list[GazetteerRecord] = field(default_factory=list)
    disease: list[GazetteerRecord] = field(default_factory=list)
    ingredient: list[GazetteerRecord] = field(default_factory=list)
    target: list[GazetteerRecord] = field(default_factory=list)
    anatomy: list[GazetteerRecord] = field(default_factory=list)
    mm_symptom: list[GazetteerRecord] = field(default_factory=list)

    def tables(self) -> dict[str, list[GazetteerRecord]]:
        return {
            "herb": self.herb, "formula": self.formula, "symptom": self.symptom,
            "syndrome": self.syndrome, "disease": self.disease,
            "ingredient": self.ingredient, "target": self.target,
            "anatomy": self.anatomy, "mm_symptom": self.mm_symptom,
        }


def _build_records(
    prefix: str, names: list[str], aliases: dict[str, list[str]]
) -> list[GazetteerRecord]:
    """One record per canonical name; alias names become EXTRA records that
    share the symmap_id (merge via ID) or, every third group, share a name
    token (merge via name) — both merge paths of merge_database_by_id.
    """
    records: list[GazetteerRecord] = []
    rid = 0
    for i, name in enumerate(names):
        sm = f"SM{prefix}{i:05d}"
        ext = f"XD{prefix}{i:05d}" if i % 2 == 0 else None
        records.append(GazetteerRecord(f"{prefix}{rid:05d}", [name], sm, ext))
        rid += 1
        for j, alias in enumerate(aliases.get(name, [])):
            if j % 3 == 2:
                # merge via shared name (the alias record also lists the
                # canonical name) — exercises name-keyed CC edges
                records.append(
                    GazetteerRecord(f"{prefix}{rid:05d}", [alias, name], None, None)
                )
            elif j % 3 == 1 and ext is not None:
                # chain merge: record shares extdb_id only -> A-B via sm,
                # B-C via ext (transitive component)
                records.append(
                    GazetteerRecord(f"{prefix}{rid:05d}", [alias], None, ext)
                )
            else:
                # merge via shared symmap id (possibly ;-multi)
                records.append(
                    GazetteerRecord(
                        f"{prefix}{rid:05d}", [alias], f"{sm};SA{prefix}{rid:05d}", None
                    )
                )
            rid += 1
    return records


def build_gazetteers() -> Gazetteers:
    return Gazetteers(
        herb=_build_records("HB", HERB_NAMES, HERB_ALIASES),
        formula=_build_records("PR", all_formula_names(), FORMULA_ALIASES),
        symptom=_build_records("TS", all_symptom_names(), SYMPTOM_ALIASES),
        syndrome=_build_records("SY", SYNDROME_NAMES, SYNDROME_ALIASES),
        disease=_build_records("DI", DISEASE_NAMES, DISEASE_ALIASES),
        ingredient=_build_records("IN", INGREDIENT_NAMES, INGREDIENT_ALIASES),
        target=_build_records("GE", TARGET_NAMES, TARGET_ALIASES),
        anatomy=_build_records("AT", ANATOMY_NAMES, ANATOMY_ALIASES),
        mm_symptom=_build_records("MS", MM_SYMPTOM_NAMES, MM_SYMPTOM_ALIASES),
    )


# canonical-ID prefixes per entity type (reference scheme §1.3:
# extract_herb.py:447-449 TMHB, extract_prescription.py:113-115 TMPRE,
# merge_tcm_symptom.py:83-85 TMTS, extract_syndrome.py:24 TMSY,
# extract_ingredient.py:217-218 TMIN, extract_target.py:203-204 TMGE,
# extract_other_entities.py:321-323 TMAT, extract_mm_symmptom.py:129-131
# TMMS)
CANON_PREFIX = {
    "herb": "TMHB", "formula": "TMPRE", "symptom": "TMTS",
    "syndrome": "TMSY", "disease": "TMDIS",
    "ingredient": "TMIN", "target": "TMGE",
    "anatomy": "TMAT", "mm_symptom": "TMMS",
}


def records_to_rows(records: list[GazetteerRecord]) -> list[dict]:
    """Table form: names `;`-joined (the reference's multi-value encoding)."""
    return [
        {
            "record_id": r.record_id,
            "names": ";".join(r.names),
            "symmap_id": r.symmap_id,
            "extdb_id": r.extdb_id,
        }
        for r in records
    ]
