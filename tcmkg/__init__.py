"""tcmkg — a PySpark-native TCM knowledge-graph construction engine.

Brand-new implementation (NOT a port) of the capabilities of the reference
repo AI-HPC-Research-Team/TCM_knowledge_graph: triple extraction from
multi-turn transcripts, gazetteer mention detection, entity linking,
connected-components canonicalization, conflict resolution, and graph
materialization — expressed Spark-first (DataFrame/SQL + Arrow pandas UDFs).

Layout:
  kernels/   pure-Python + vectorized kernels (CN numerals, Q2B, dose grammar,
             Aho-Corasick) shared by the Spark pipeline and the plain-Python
             oracle so parity is testable.
  fixtures/  deterministic synthetic gazetteers + transcripts (seeded).
  oracle/    reference-faithful plain-Python extractor (the P/R gate).
  pipeline/  the Spark stages (ingest, mentions, linking, doses,
             canonicalize, conflicts, materialize) + checkpoint manifest.
  ops/       generic large-scale data ops (dedup, similarity, text stats).
"""

__version__ = "0.1.0"
