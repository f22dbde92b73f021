"""Column-level merge/fold semantics (SURVEY.md §2.4 A1/A2).

The reference folds duplicate records cell-by-cell with `merge_two_value`
(merge_utility.py:120-156): strings/lists -> set-union of `;`-tokens;
numerics -> must agree within rel_tol=0.2, keep first non-null. These
builders express the same semantics as native aggregation expressions, so a
group fold is ONE shuffle with map-side partial aggregation — no per-row
Python, no iterrows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fold_multivalue(col: str) -> Column:
    """Set-union of `;`-joined tokens across the group, emitted sorted for
    determinism (the reference's set() makes its order arbitrary; sorted is
    the canonical representative of the same set)."""
    return F.array_join(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.transform(F.split(F.col(col), ";"), lambda x: F.trim(x)))
                )
            )
        ),
        ";",
    ).alias(col)


def fold_numeric(col: str) -> Column:
    """First non-null numeric of the group (reference keeps v1;
    merge_utility.py:152-156)."""
    return F.first(F.col(col), ignorenulls=True).alias(col)


def agreement_from_bounds(mn: Column, mx: Column, rel_tol: float = 0.2) -> Column:
    """A2 closeness on precomputed group bounds: all values in [mn, mx]
    agree within rel_tol iff the bounds do. min/max are map-side combinable,
    so this makes the check exact even over partial aggregates."""
    return (mx - mn) <= rel_tol * F.greatest(F.abs(mx), F.abs(mn))


def numeric_agreement(col: str, rel_tol: float = 0.2) -> Column:
    """A2's closeness assert (merge_utility.py:151), as data not a crash:
    true iff all non-null values in the group agree within rel_tol. Emit to
    a quality-metrics table instead of raising."""
    mx, mn = F.max(F.col(col)), F.min(F.col(col))
    return (
        F.when(F.count(F.col(col)) <= 1, F.lit(True))
        .otherwise(agreement_from_bounds(mn, mx, rel_tol))
        .alias(f"{col}_agrees")
    )


def group_merge(
    df: DataFrame,
    key: str,
    multivalue_cols: list[str],
    numeric_cols: list[str] | None = None,
    check_tolerance: bool = False,
) -> DataFrame:
    """A1 `merge_database_by_id_group` (merge_utility.py:234-260) as a
    single groupBy: rows sharing `key` fold into one row. Null keys pass
    through unmerged (the reference only groups notnull keys)."""
    numeric_cols = numeric_cols or []
    aggs = [fold_multivalue(c) for c in multivalue_cols]
    aggs += [fold_numeric(c) for c in numeric_cols]
    if check_tolerance:
        aggs += [numeric_agreement(c) for c in numeric_cols]
    merged = df.filter(F.col(key).isNotNull()).groupBy(key).agg(*aggs)
    passthrough = df.filter(F.col(key).isNull()).select(key, *multivalue_cols, *numeric_cols)
    if check_tolerance:
        for c in numeric_cols:
            passthrough = passthrough.withColumn(f"{c}_agrees", F.lit(True))
    return merged.unionByName(passthrough)
