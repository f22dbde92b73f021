"""Vocabulary standardization + property tokenization (SURVEY.md §2.2
P2/P4/P10/P13) as native Spark expressions.

Reference sites:
  P2  case normalization: IDs upper, text lower (extract_herb.py:46-50)
  P4  sequential typo/synonym fixes (extract_herb.py:11-43) — order matters,
      so a fold of regexp_replace calls
  P10 surrogate-ID synthesis "SMHB{:05d}" (merge_tcm_symptom.py:36-38)
  P13 property-string -> categorical arrays via fixed vocabularies
      (extract_herb.py:196-280)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# P4: the reference's property-vocabulary fix list (extract_herb.py:11-43
# semantics — sequential, order-sensitive replacements)
PROPERTY_FIXES: list[tuple[str, str]] = [
    ("poisonous", "toxic"),
    ("calm", "neutral"),
    ("slightly", "slight"),
    ("litte", "little"),
    ("coldness", "cold"),
    ("warmness", "warm"),
]


def standardize_vocab(col: Column, fixes: list[tuple[str, str]] = PROPERTY_FIXES) -> Column:
    out = F.lower(col)
    for pat, rep in fixes:
        out = F.regexp_replace(out, pat, rep)
    return out


def case_normalize(df: DataFrame, id_suffix: str = "_id") -> DataFrame:
    """P2: upper-case id columns, lower-case everything else (string cols)."""
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if field.dataType.typeName() == "string":
            c = F.upper(c) if field.name.endswith(id_suffix) else F.lower(c)
        cols.append(c.alias(field.name))
    return df.select(*cols)


def surrogate_id(prefix: str, rank_col: str, width: int = 5) -> Column:
    """P10: 'TMHB%05d'-style id synthesis from a stable rank."""
    return F.format_string(f"{prefix}%0{width}d", F.col(rank_col).cast("int"))


def tokenize_against_vocab(col: Column, vocab: list[str]) -> Column:
    """P13: property string -> array of the vocabulary terms it contains
    (order = vocabulary order; the reference's dict-driven tokenizer)."""
    terms = F.array(*[F.lit(v) for v in vocab])
    return F.filter(terms, lambda t: F.contains(col, t))
