"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full KG-construction pipeline (stable turn
                ordering → mention detection → entity linking → CC
                canonicalization → conflict rules → dose weighting) over a
                deterministic transcriptization of the sf0.001 events table.
queries()     — one entry per implemented operator (SURVEY.md §2 + the
                training-data ops); see tcmkg/contract/.
oracle_sql()  — exact DuckDB SQL per query. KG oracles regenerate expected
                triples from the same arithmetic derivation, with canonical
                IDs computed by an independent pure-Python union-find.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG triple extraction at sf0.001; driver checks rows>0."""
    from tcmkg.contract.kg import _pipeline, transcriptize

    sf_dir = "/root/testdata/sf0.001"
    pipe = _pipeline(spark)
    return pipe.triples(transcriptize(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tcmkg.contract import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from tcmkg.contract import all_oracles

    return all_oracles()
