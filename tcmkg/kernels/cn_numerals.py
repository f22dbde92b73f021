"""Chinese-numeral → float parser.

The reference pipeline converts dose numerals with the public `cn2an`
library in "smart" mode (reference: processed_code/process_dose_unit.py:163-168).
That library is not available in this image, so this is a small from-scratch
parser covering the numeral grammar that actually occurs in dose strings:

  - plain arabic ("3", "1.5", "0.25")
  - simple CJK digit runs ("一二五" -> positional: rare, not needed for doses)
  - positional CJK numerals with 十/百/千 ("十二"=12, "二十"=20, "三百零五"=305)
  - 两 as the digit 2 when used as a numeral (dose strings use 两 as a UNIT,
    so the dose splitter never feeds it here, but mirroring cn2an keeps the
    kernel general)
  - mixed arabic+CJK like "3十" are NOT produced by the dose grammar and
    raise ValueError (matching cn2an smart-mode failures -> caller nulls).

Pure function; vectorized by mapping over Arrow batches in the dose kernel.
"""

from __future__ import annotations

_DIGITS = {
    "零": 0, "一": 1, "二": 2, "两": 2, "三": 3, "四": 4,
    "五": 5, "六": 6, "七": 7, "八": 8, "九": 9,
}
_UNITS = {"十": 10, "百": 100, "千": 1000, "万": 10000}


def parse_cn_number(s: str) -> float:
    """Parse an arabic or Chinese numeral string to float. Raises ValueError."""
    s = s.strip()
    if not s:
        raise ValueError("empty numeral")
    # pure arabic (incl. decimals)
    try:
        return float(s)
    except ValueError:
        pass
    if any(ch not in _DIGITS and ch not in _UNITS and ch != "点" for ch in s):
        raise ValueError(f"not a numeral: {s!r}")
    # decimal part via 点
    if "点" in s:
        whole, _, frac = s.partition("点")
        if not frac:
            # bare 点 AND trailing-点 forms ('五点') are malformed — a
            # truncated decimal must null out, not silently parse as an int
            raise ValueError(f"empty fractional part: {s!r}")
        base = parse_cn_number(whole) if whole else 0.0
        scale = 0.1
        val = 0.0
        for ch in frac:
            if ch not in _DIGITS:
                raise ValueError(f"bad decimal: {s!r}")
            val += _DIGITS[ch] * scale
            scale /= 10
        return base + val
    # positional grammar
    total = 0.0
    section = 0.0  # accumulates below 万
    digit: float | None = None
    for ch in s:
        if ch in _DIGITS:
            if digit is not None:
                # two digits in a row -> literal digit run ("一九" = 19)
                digit = digit * 10 + _DIGITS[ch]
            else:
                digit = float(_DIGITS[ch])
        else:
            unit = _UNITS[ch]
            if unit == 10000:
                section = (section + (digit if digit is not None else 0.0)) * unit
                total += section
                section = 0.0
            else:
                d = digit if digit is not None else 1.0  # "十二" -> 1*10+2
                section += d * unit
            digit = None
    total += section + (digit if digit is not None else 0.0)
    return total
