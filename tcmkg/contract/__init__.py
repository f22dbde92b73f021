"""Driver-contract queries: Spark callables + DuckDB oracle SQL.

Two families:
  kg.py       the KG pipeline run over a deterministic "transcriptization"
              of the driver's events table. The Spark side runs the REAL
              pipeline (window ordering, mention kernel, CC canonicalization,
              weighting); the DuckDB oracle regenerates expected triples from
              the same arithmetic derivation plus canonical-ID constants
              computed by the pure-Python union-find — a genuine differential
              test of the distributed dataflow.
  generic.py  SURVEY.md §2 operator demonstrations + training-data ops
              (dedup, minhash, text stats, ANN) over the TPC-H-ish tables,
              each with an exact ANSI-SQL oracle.
"""

from .kg import KG_QUERIES, KG_ORACLES
from .generic import GENERIC_QUERIES, GENERIC_ORACLES


def all_queries():
    q = {}
    q.update(KG_QUERIES)
    q.update(GENERIC_QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(KG_ORACLES)
    o.update(GENERIC_ORACLES)
    return o
