"""String canonicalization kernels.

Semantics mirror the reference's name-normalization pass
(reference: processed_code/extract_ingredient.py:19-43 — `Q2B`, `stringQ2B`,
`str_clean`): full-width → half-width folding, bracket unification, dash
unification, whitespace-around-dash removal, lowercasing.

Two forms are provided:
  - `str_clean(s)`       pure-Python single string (oracle + unit tests)
  - `clean_series(ser)`  vectorized pandas (used inside Arrow batches)
  - `clean_col(col)`     pure Spark SQL expression (JVM-side, codegen'd) —
                         the hot path; no Python involved.
"""

from __future__ import annotations

import re

import pandas as pd

# full-width ASCII block (0xFF01-0xFF5E) -> ASCII, plus ideographic space
_FW = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　"
_HW = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F)) + " "
_Q2B_TABLE = str.maketrans(_FW, _HW)

_DASH_RE = re.compile(r"(?<![一-龥])[一‐−–—―→‑]")
_DASH_SPACE_RE = re.compile(r"\s*-\s*")


def string_q2b(s: str) -> str:
    """Full-width → half-width folding (printable ASCII range only)."""
    return s.translate(_Q2B_TABLE)


def str_clean(s: str) -> str:
    """Lowercase + Q2B + bracket/dash unification (single string)."""
    s = s.lower()
    s = string_q2b(s)
    s = s.replace("〔", "(").replace("〕", "(")
    s = _DASH_RE.sub("-", s)
    s = _DASH_SPACE_RE.sub("-", s)
    return s


def clean_series(ser: pd.Series) -> pd.Series:
    """Vectorized str_clean over a pandas Series (nulls pass through)."""
    out = ser.str.lower().str.translate(_Q2B_TABLE)
    out = out.str.replace("〔", "(", regex=False).str.replace("〕", "(", regex=False)
    out = out.str.replace(_DASH_RE, "-", regex=True)
    out = out.str.replace(_DASH_SPACE_RE, "-", regex=True)
    return out


# Full-width chars the transcript templates can emit. The fixture generator
# is constrained to this subset so that the JVM column path (translate on a
# literal map) and the pure-Python oracle path (full-block translate) agree.
_FW_SUBSET = "（），：；．０１２３４５６７８９　〔〕"
_HW_SUBSET = "(),:;.0123456789 (("


def text_norm(s: str) -> str:
    """Normalization applied to transcript text before mention detection:
    full-width folding + lowercase. (No dash folding — that is name-level
    cleaning; the reference likewise never dash-folds prescription text.)
    """
    return string_q2b(s).lower()


def text_norm_col(col):
    """`text_norm` as a native Spark Column (whole-stage codegen)."""
    from pyspark.sql import functions as F

    return F.lower(F.translate(col, _FW_SUBSET, _HW_SUBSET))


def clean_col(col):
    """str_clean as a native Spark Column expression (whole-stage codegen).

    `translate` handles the fixed full-width map; `regexp_replace` the dashes.
    Only the full-width chars that can occur in our corpora are mapped (the
    complete 0xFF01-0xFF5E block would make an unwieldy literal; gazetteer
    text is pre-cleaned with the pandas kernel at build time, so this column
    path only needs the chars the transcript templates can emit).
    """
    from pyspark.sql import functions as F

    fw = "（），：；．０１２３４５６７８９　〔〕"
    hw = "(),:;.0123456789 (("
    out = F.lower(col)
    out = F.translate(out, fw, hw)
    out = F.regexp_replace(out, r"(?<![一-龥])[一‐−–—―→‑]", "-")
    out = F.regexp_replace(out, r"\s*-\s*", "-")
    return out
