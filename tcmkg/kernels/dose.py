"""Dose-string grammar: extraction, unit filtering, gram/ml conversion.

Reimplements (from scratch, against observed behavior) the reference's dose
handling so that our Spark pipeline and the plain-Python oracle agree:

  - dose mention regex + herb-token splitting
      reference: processed_code/extract_prescription_herb_relation.py:24-37
  - manual correction replacements + 小/大/中 stripping + ～→- etc.
      reference: processed_code/process_dose_unit.py:24-57
  - unit whitelist / blacklist
      reference: processed_code/process_dose_unit.py:66-69
  - CN-numeral parse + unit→g/ml conversion incl. 半 (leading/trailing),
    ranges "a-b" (mean) and 至 segments
      reference: processed_code/process_dose_unit.py:100-173

NOTE on 至 ("up to"): the reference's loop does NOT re-parse the numeral of
a 至 segment — it reuses the previous segment's parsed value, and because it
resets ``half = 0`` at the top of every loop iteration, the final ``/ (half
+ 1)`` halves the total ONLY when the LAST segment contains 至
(process_dose_unit.py:159-172). Faithfulness to the emitted triples requires
reproducing exactly that, so we do. A 至 segment with no preceding segment
is undefined there (NameError); we return null instead.

All functions are pure; the Spark pipeline calls them inside Arrow batches.
"""

from __future__ import annotations

import re

from .cn_numerals import parse_cn_number

# dose mention inside a herb token (see extract_prescription_herb_relation.py:31-33)
DOSE_RE = re.compile(
    r"([0-9\.一二三四五六七八九十百半\-\/]+"
    r"[瓶钱分两公斤厘合握枚条个粒颗升gml对片朵株丸具茎字张铢]+)+[半]*"
)

# herb-token splitting of a prescription line (…:27). ASCII "," added because
# our pipeline Q2B-normalizes text BEFORE parsing (，→,), which the reference
# does not need to (its corpus is raw full-width).
TOKEN_SPLIT_RE = re.compile(r"[、，。,\s]|[^五]加")
PAREN_RE = re.compile(r"（[^）]*）|\([^)]*\)")
DANGLING_PAREN_RE = re.compile(r"（.*|\(.*")
NOISE_RE = re.compile(
    "各等分|不拘多少|辅料为|少许|若干|制成|减半|等分|不以多少|倍用|不拘分两|不限多少"
)

# unit whitelist / blacklist (process_dose_unit.py:66-69)
UNIT_WHITELIST_RE = re.compile("分|两|钱|kg|g|mg|厘|毫|铢|公斤|斤|千克|克|合|ml|斗|升")
UNIT_BLACKLIST_RE = re.compile("钱匕|分盏|字|厘米")
UNIT_SPLIT_RE = re.compile("(分|两|钱|kg|g|mg|厘|毫|铢|公斤|斤|千克|克|合|ml|斗|升)")

# unit → grams (or ml for volumes) multipliers (process_dose_unit.py:81-99)
UNIT_TIMES: dict[str, float] = {
    "两": 31.25, "钱": 3.125, "铢": 1.3, "分": 0.3125, "厘": 0.03125,
    "毫": 0.003125, "斤": 500, "合": 20, "斗": 2000, "升": 200,
    "g": 1, "ml": 1, "kg": 1000, "克": 1, "千克": 1000, "mg": 0.001, "公斤": 1000,
}
G_UNITS = {"分", "两", "钱", "厘", "斤", "克", "千克", "公斤", "mg", "g", "kg", "毫", "铢"}
ML_UNITS = {"ml", "斗", "升", "合"}

# manual corrections (process_dose_unit.py:24-57). The reference loads a
# curated word list; we keep the replacement *mechanism* with a small list —
# tokens in CORRECTION_NULL_WORDS become null doses.
CORRECTION_NULL_WORDS = frozenset({"减半", "不拘多少", "若干", "少许", "各适量", "切"})
CORRECTION_MAP = {
    "两半": "一两半", "钱半": "一钱半", "斤半": "一斤半", "分半": "一分半",
    "9两半12两半": "9.5-12.5两", "2两钱": "2两",
}


def clean_dose(dose: str | None) -> str | None:
    """Manual corrections + 小/大/中 strip + ～→- + 至X半 fixes."""
    if dose is None:
        return None
    if dose in CORRECTION_NULL_WORDS:
        return None
    dose = CORRECTION_MAP.get(dose, dose)
    for ch in "小大中":
        dose = dose.replace(ch, "")
    dose = dose.replace("～", "-")
    dose = dose.replace("至钱半", "至1钱半")
    dose = dose.replace("至两半", "至1两半")
    return dose


def filter_unit(dose: str | None) -> str | None:
    """Whitelist/blacklist unit filter; non-conforming doses become null."""
    if dose is None:
        return None
    if UNIT_WHITELIST_RE.search(dose) is not None and UNIT_BLACKLIST_RE.search(dose) is None:
        return dose
    return None


def dose_to_amount(dose: str | None) -> tuple[float | None, str | None]:
    """Convert a (cleaned, unit-filtered) dose string → (amount, unit g|ml).

    Returns (None, None) on any grammar violation instead of raising.
    """
    if dose is None:
        return None, None
    try:
        half_loc = dose.find("半")
        parts = [p for p in UNIT_SPLIT_RE.split(dose) if p]
        if half_loc == 0:
            if len(parts) != 2:
                return None, None
            unit = parts[1]
            amt = 0.5 * UNIT_TIMES[unit]
            return amt, ("g" if unit in G_UNITS else "ml" if unit in ML_UNITS else None)
        cn_list = parts[::2]
        unit_list = parts[1::2]
        if not unit_list or len(cn_list) < len(unit_list):
            return None, None
        g_unit, ml_unit = True, True
        for unit in unit_list:
            if unit in G_UNITS and g_unit:
                ml_unit = False
            elif unit in ML_UNITS and ml_unit:
                g_unit = False
            else:
                return None, None  # unit conflict
        out_unit = "ml" if ml_unit else "g"
        overall = 0.0
        half = 0
        an: float | None = None
        for i, unit in enumerate(unit_list):
            half = 0  # reference resets per segment: only the LAST 至 halves
            cn = cn_list[i]
            if "-" in cn:
                lo, hi = cn.split("-", 1)
                an = (parse_cn_number(lo) + parse_cn_number(hi)) / 2
            elif "至" in cn:
                # faithful quirk: reuse previous `an`, set half flag (see module doc)
                if an is None:
                    return None, None
                half = 1
            else:
                an = parse_cn_number(cn)
            overall += UNIT_TIMES[unit] * an
        if half_loc > 0:
            overall += UNIT_TIMES[unit_list[-1]] * 0.5
        overall /= half + 1
        return overall, out_unit
    except (ValueError, KeyError, ZeroDivisionError):
        return None, None


def parse_dose_string(dose: str | None) -> tuple[float | None, str | None]:
    """clean → unit-filter → convert, in one call."""
    return dose_to_amount(filter_unit(clean_dose(dose)))
