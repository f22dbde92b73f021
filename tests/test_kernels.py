"""Unit tests for the pure string kernels (SURVEY.md §5.2 item 3)."""

import math

import pandas as pd
import pytest

from tcmkg.kernels.cn_numerals import parse_cn_number
from tcmkg.kernels.dose import (
    clean_dose,
    dose_to_amount,
    filter_unit,
    parse_dose_string,
)
from tcmkg.kernels.matcher import (
    AhoCorasick,
    extract_herb_dose_pairs,
    probe_herb,
    split_prescription_tokens,
)
from tcmkg.kernels.normalize import clean_series, str_clean, string_q2b, text_norm


# ----------------------------------------------------------- CN numerals ---
@pytest.mark.parametrize(
    "s,v",
    [
        ("3", 3.0), ("1.5", 1.5), ("0.25", 0.25),
        ("一", 1), ("二", 2), ("两", 2), ("九", 9),
        ("十", 10), ("十二", 12), ("二十", 20), ("二十三", 23),
        ("三百", 300), ("一百五十", 150), ("三百零五", 305),
        ("一千二百", 1200), ("一万", 10000),
        ("三点五", 3.5),
    ],
)
def test_cn_numbers(s, v):
    assert parse_cn_number(s) == pytest.approx(v)


def test_cn_number_rejects():
    for bad in ["", "abc", "钱", "半夏"]:
        with pytest.raises(ValueError):
            parse_cn_number(bad)


# ------------------------------------------------------------- normalize ---
def test_q2b_cases():
    # reference semantics: extract_ingredient.py:19-43
    assert string_q2b("ＡＢＣ１２３") == "ABC123"
    assert string_q2b("（甘草）") == "(甘草)"
    assert string_q2b("　") == " "
    assert str_clean("Ｘ － Ｙ") == "x-y"
    assert str_clean("a〔b〕") == "a(b("
    assert text_norm("３克，：") == "3克,:"


def test_clean_series_matches_scalar():
    vals = ["ＡＢ—ＣＤ", "x － y", "〔t〕", "甘草３克"]
    ser = clean_series(pd.Series(vals))
    assert list(ser) == [str_clean(v) for v in vals]


# ------------------------------------------------------------------ dose ---
@pytest.mark.parametrize(
    "dose,amount,unit",
    [
        ("三钱", 3 * 3.125, "g"),
        ("一两", 31.25, "g"),
        ("二钱半", 2 * 3.125 + 0.5 * 3.125, "g"),
        ("半两", 0.5 * 31.25, "g"),
        ("半钱", 0.5 * 3.125, "g"),
        ("9g", 9.0, "g"),
        ("1.5克", 1.5, "g"),
        ("五分", 5 * 0.3125, "g"),
        ("3-5钱", 4 * 3.125, "g"),
        # 至-range quirk: reference reuses the previous segment's numeral
        # (process_dose_unit.py:164-172) -> (1钱 + 1钱)/2
        ("一钱至二钱", 3.125, "g"),
        # 至 NOT in the last segment: reference resets half=0 per iteration
        # (process_dose_unit.py:159), so no halving -> 1两 + 1两 + 3钱
        ("一两至二两三钱", 31.25 + 31.25 + 3 * 3.125, "g"),
        # 至 IS the last segment after another unit: halving applies
        ("三钱一两至二两", (3 * 3.125 + 31.25 + 31.25) / 2, "g"),
        ("十二铢", 12 * 1.3, "g"),
        ("一斤", 500.0, "g"),
        ("6mg", 0.006, "g"),
        ("七厘", 7 * 0.03125, "g"),
        ("一两半", 31.25 + 15.625, "g"),
        ("三合", 60.0, "ml"),
        ("三升", 600.0, "ml"),
        ("2两", 62.5, "g"),
    ],
)
def test_dose_amounts(dose, amount, unit):
    a, u = parse_dose_string(dose)
    assert u == unit
    assert a == pytest.approx(amount)


def test_dose_filters_and_corrections():
    assert filter_unit("三枚") is None          # unit not whitelisted
    assert filter_unit("二钱匕") is None        # blacklisted
    assert filter_unit("一字") is None
    assert filter_unit("5厘米") is None
    assert clean_dose("两半") == "一两半"       # manual correction table
    assert clean_dose("小3克") == "3克"
    assert clean_dose("3～5钱") == "3-5钱"
    assert parse_dose_string(None) == (None, None)
    assert parse_dose_string("若干") == (None, None)


def test_dose_unit_conflict_is_null():
    assert dose_to_amount("一两3ml") == (None, None)


# --------------------------------------------------------------- matcher ---
def test_token_split_matches_reference_grammar():
    # extract_prescription_herb_relation.py:24-27 incl. the [^五]加 branch
    assert split_prescription_tokens("甘草三钱、人参（去皮）一两") == [
        "甘草三钱", "人参一两",
    ]
    assert split_prescription_tokens("丹皮加甘草") == ["丹", "甘草"]
    assert split_prescription_tokens("五加皮三钱") == ["五加皮三钱"]
    assert split_prescription_tokens("甘草 人参，白术。各等分") == [
        "甘草", "人参", "白术",
    ]
    assert split_prescription_tokens("黄芪（注释缺") == ["黄芪"]


def test_herb_dose_pairs():
    pairs = extract_herb_dose_pairs("甘草三钱、人参、三钱白术")
    # token whose dose starts at offset 0 is dropped (reference :34-37)
    assert pairs == [("甘草", "三钱"), ("人参", None)]
    assert extract_herb_dose_pairs("半夏3g") == [("半夏", "3g")]
    # 克 is NOT in the reference's dose-mention unit class
    # (extract_prescription_herb_relation.py:31-33) — token keeps full text
    assert extract_herb_dose_pairs("半夏3克") == [("半夏3克", None)]


def test_probe_two_stage():
    hmap = {"甘草": "H1", "白术": "H2", "川芎": "H3", "人参": "H4"}
    assert probe_herb("甘草", hmap) == "H1"
    assert probe_herb("炒白术", hmap) == "H2"      # decoration stripped
    assert probe_herb("川芎", hmap) == "H3"        # exact beats decoration strip
    assert probe_herb("人参末", hmap) == "H4"      # suffix stripped
    assert probe_herb("未知药", hmap) is None
    assert probe_herb("", hmap) is None


def test_aho_corasick():
    ac = AhoCorasick(["口渴", "头痛", "痛", "不渴"])
    assert ac.find_set("患者头痛而口渴") == {"头痛", "痛", "口渴"}
    assert ac.find_set("口不渴") == {"不渴"}
    assert ac.find_set("平安无事") == set()
    # overlapping + positions
    assert (0, "头痛") in ac.find_all("头痛")
    ac2 = AhoCorasick(["aa", "aaa"])
    assert ac2.find_set("aaaa") == {"aa", "aaa"}


def test_weight_isclose_semantics():
    # merge_utility.py:151 rel_tol analogue used in merge tests
    assert math.isclose(10.0, 11.0, rel_tol=0.2)


def test_dose_edge_cases():
    # 至 with no preceding segment is undefined in the reference (NameError);
    # we contract it to null
    assert dose_to_amount("至二钱") == (None, None)
    assert parse_dose_string("") == (None, None)
    # trailing 半 adds half of the LAST unit
    a, u = parse_dose_string("一两二钱半")
    assert u == "g" and a == pytest.approx(31.25 + 2 * 3.125 + 0.5 * 3.125)
    # range + unit conversion
    a, u = parse_dose_string("1-3斤")
    assert u == "g" and a == pytest.approx(2 * 500)


# --------------------------------------------------- dose differential ---
def _dose_model(dose: str):
    """Independent test-local model of the reference's conversion loop
    (process_dose_unit.py:100-173), deliberately structured differently
    from kernels/dose.py (zip over segment pairs, explicit last-segment
    至 flag) so kernel bugs can't hide in a shared implementation — the
    shared-kernel parity gate was blind to exactly this (round-1 ADVICE)."""
    import re

    from tcmkg.kernels.cn_numerals import parse_cn_number
    from tcmkg.kernels.dose import G_UNITS, ML_UNITS, UNIT_TIMES

    half_loc = dose.find("半")
    parts = [p for p in re.split("(分|两|钱|kg|g|mg|厘|毫|铢|公斤|斤|千克|克|合|ml|斗|升)", dose) if p]
    if half_loc == 0:
        if len(parts) != 2:
            return None, None
        u = parts[1]
        return 0.5 * UNIT_TIMES[u], "g" if u in G_UNITS else "ml"
    cns, units = parts[::2], parts[1::2]
    if not units or len(cns) < len(units):
        return None, None
    kinds = {("g" if u in G_UNITS else "ml" if u in ML_UNITS else "?") for u in units}
    if kinds == {"g"}:
        out_unit = "g"
    elif kinds == {"ml"}:
        out_unit = "ml"
    else:
        return None, None
    total, prev, last_zhi = 0.0, None, False
    for cn, u in zip(cns, units):
        if "-" in cn:
            lo, hi = cn.split("-", 1)
            try:
                val = (parse_cn_number(lo) + parse_cn_number(hi)) / 2
            except ValueError:
                return None, None
            prev = val
        elif "至" in cn:
            if prev is None:
                return None, None
            val = prev
        else:
            try:
                val = parse_cn_number(cn)
            except ValueError:
                return None, None
            prev = val
        total += UNIT_TIMES[u] * val
        last_zhi = "至" in cn
    if half_loc > 0:
        total += UNIT_TIMES[units[-1]] * 0.5
    if last_zhi:
        total /= 2
    return total, out_unit


def test_dose_differential_fuzz():
    """Exhaustive-ish differential: composed dose strings (CN/ASCII
    numerals x g-units x optional 至 segments x trailing 半) must agree
    between the kernel and the independent model."""
    import itertools

    from tcmkg.kernels.dose import dose_to_amount

    numerals = ["一", "三", "十二", "2", "0.5", "3-5"]
    units = ["钱", "两", "分", "克"]
    segs = [n + u for n, u in itertools.product(numerals, units)]
    cases = []
    for s1 in segs:
        cases.append(s1)
        cases.append(s1 + "半")
        for s2 in segs[::4]:
            cases.append(s1 + s2)
            cases.append(s1 + "至" + s2)          # 至 mid/last segment
            cases.append(s1 + "至" + s2 + "三分")  # 至 NOT last
    assert len(cases) > 400
    for dose in cases:
        got = dose_to_amount(dose)
        want = _dose_model(dose)
        if want[0] is None:
            assert got == (None, None), dose
        else:
            assert got[1] == want[1], dose
            assert got[0] == pytest.approx(want[0]), dose


# --------------------------------------------------------------------------
# Differential fuzz for the token/probe kernels: an INDEPENDENT test-local
# model of the reference's prescription loop, so a shared-kernel bug cannot
# hide (the same blind-spot closure the dose fuzz above provides).
# Reference semantics modeled: extract_prescription_herb_relation.py:24-37
# (paren/noise strip, [^五]加 split, token-level dose peel) and :69-91
# (two-stage dictionary probe with decoration stripping).
def _split_model(text):
    import re as _re

    s = _re.sub(r"（[^）]*）|\([^)]*\)", "", text)
    s = _re.sub(r"（.*|\(.*", "", s)
    s = _re.sub(
        "各等分|不拘多少|辅料为|少许|若干|制成|减半|等分|不以多少|倍用|不拘分两|不限多少", "", s
    )
    # ASCII ',' is this repo's documented Q2B-normalization variant
    return [t for t in _re.split(r"[、，。,\s]|[^五]加", s) if t]


def _pairs_model(text):
    import re as _re

    dose_re = _re.compile(
        r"([0-9\.一二三四五六七八九十百半\-\/]+"
        r"[瓶钱分两公斤厘合握枚条个粒颗升gml对片朵株丸具茎字张铢]+)+[半]*"
    )
    out = []
    for tok in _split_model(text):
        m = dose_re.search(tok)
        if m and tok[: m.start()]:
            out.append((tok[: m.start()], m.group()))
        elif m is None:
            out.append((tok, None))
    return out


def _probe_model(herb, herb_map):
    import re as _re

    herb = herb.strip()
    m = _re.search(r"^[一-龥]+(?<![（(])", herb)
    if not m:
        return None
    sub = m.group()
    if sub in herb_map:
        return herb_map[sub]
    m2 = _re.search(r"(?![川吴姜干炒煨醋熟制炙真])[一-龥]+(?<![粉末屑梢汁])", sub)
    if not m2:
        return None
    return herb_map.get(m2.group())


def test_probe_token_differential_fuzz():
    """Composed prescription lines (decorated herbs x doses x separators x
    parentheticals x noise phrases x the 加-split quirk) must tokenize,
    dose-peel, and probe identically between the repo kernels and the
    independent model."""
    import itertools

    from tcmkg.kernels.matcher import extract_herb_dose_pairs, probe_herb

    herb_map = {
        "甘草": "H1", "人参": "H2", "黄连": "H3", "白术": "H4",
        "炙甘草": "H5", "五加皮": "H6", "大枣": "H7",
    }
    herbs = [
        "甘草", "人参", "黄连", "白术", "五加皮", "大枣",
        "川黄连",          # stage-2: strip decoration prefix
        "炙甘草",          # stage-1 hit on the decorated form itself
        "白术粉",          # material suffix (stage-2 lookbehind)
        "姜人参末",        # prefix AND suffix decoration
        "真甘草",          # decoration char with no dict entry for the rest
        "abc人参",         # non-CJK prefix: stage-1 regex must skip it
        "（注）甘草",      # paren char in front (lookbehind case)
        "",
    ]
    doses = ["三钱", "9g", "半两", "1.5-2两", "2钱半", "不拘多少", ""]
    seps = ["、", "，", "。", " ", ",", "再加", "五加", "（水煎服）", "(aside)", "（dangling"]
    noise = ["", "各等分", "若干"]

    lines, n = [], 0
    for h1, d1, sep, h2, d2, nz in itertools.product(
        herbs[:8], doses, seps, herbs[4:], doses[::3], noise
    ):
        n += 1
        if n % 17:  # deterministic thinning to ~700 cases
            continue
        lines.append(f"{h1}{d1}{sep}{h2}{d2}{nz}")
    assert len(lines) > 480

    for line in lines:
        assert extract_herb_dose_pairs(line) == _pairs_model(line), line

    toks = {t for line in lines for t, _ in _pairs_model(line)} | set(herbs)
    assert len(toks) > 20
    for tok in sorted(toks):
        assert probe_herb(tok, herb_map) == _probe_model(tok, herb_map), tok


def test_aho_corasick_property_fuzz():
    """Property-based differential: AhoCorasick.find_set must equal the
    naive `pattern in text` scan (the reference's membership semantics,
    add_more_prescription_symptom_map.py:22-28) for arbitrary pattern sets
    and texts over a small CJK+ASCII alphabet (overlaps, nesting, and
    shared prefixes/suffixes all arise at this alphabet size)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tcmkg.kernels.matcher import AhoCorasick

    alphabet = "甘草参黄xy"

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.text(alphabet=alphabet, min_size=1, max_size=4),
                 min_size=1, max_size=8),
        st.text(alphabet=alphabet, max_size=30),
    )
    def check(patterns, text):
        ac = AhoCorasick(patterns)
        assert ac.find_set(text) == {p for p in patterns if p and p in text}

    check()


def test_aho_corasick_find_all_offsets():
    """find_all returns every (start, pattern) occurrence incl. overlaps."""
    from tcmkg.kernels.matcher import AhoCorasick

    ac = AhoCorasick(["aa", "aaa", "b"])
    got = sorted(ac.find_all("aaab"))
    assert got == [(0, "aa"), (0, "aaa"), (1, "aa"), (3, "b")]


def test_text_norm_idempotent_property():
    """Q2B + cleanup normalization is idempotent: applying it twice equals
    once, for arbitrary strings mixing full-width, CJK, ASCII, and the
    dash/bracket cleanup targets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tcmkg.kernels.normalize import text_norm

    alphabet = "ＡＢｃｄ１２３ 　ab12甘草，。：:（）()[]－—-~～\t"

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(s):
        once = text_norm(s)
        assert text_norm(once) == once

    check()


def test_cn_numeral_differential():
    """parse_cn_number vs an independent positional model over composed
    numerals (digits x units x hundreds x literal digit runs x 点
    decimals) — exact agreement on values AND on what raises."""
    from tcmkg.kernels.cn_numerals import parse_cn_number

    D = {"一": 1, "二": 2, "三": 3, "四": 4, "五": 5, "六": 6, "七": 7,
         "八": 8, "九": 9}

    def model(s):
        # independent model for the composed shapes below (not the kernel's
        # positional loop): digits, X十, 十X, X十Y, X百[rest], W点F
        if "点" in s:
            whole, _, frac = s.partition("点")
            if not frac or any(ch not in D for ch in frac):
                raise ValueError(s)
            base = model(whole) if whole else 0.0
            return base + sum(D[ch] * 10.0 ** -(i + 1) for i, ch in enumerate(frac))
        if s in D:
            return float(D[s])
        if s == "十":
            return 10.0
        if "百" in s:
            a, _, rest = s.partition("百")
            return D[a] * 100.0 + (model(rest) if rest else 0.0)
        if s.startswith("十"):
            return 10.0 + D[s[1:]]
        if s.endswith("十"):
            return D[s[:-1]] * 10.0
        if "十" in s:
            a, _, b = s.partition("十")
            return D[a] * 10.0 + D[b]
        if all(ch in D for ch in s):          # literal digit run: 一九 = 19
            return float("".join(str(D[ch]) for ch in s))
        raise ValueError(s)

    singles = list(D) + ["十"]
    cases = list(singles)
    for a in D:
        cases += [a + "十", "十" + a]
        cases += [a + "十" + b for b in list(D)[:4]]
        cases += [a + "百", a + "百" + "二十三", a + "点" + "五"]
    cases += ["一百", "一百二十三", "二点五", "点五", "一九", "三点一四",
              "二十三点五"]
    assert len(cases) > 60
    for s_ in cases:
        want = model(s_)
        assert parse_cn_number(s_) == pytest.approx(want), s_
    for bad in ["", "abc", "点", "五点", "甘草", "一点草"]:
        with pytest.raises(ValueError):
            parse_cn_number(bad)
    for bad in ["点", "五点", "一点草"]:  # shapes the model also covers
        with pytest.raises(ValueError):
            model(bad)
