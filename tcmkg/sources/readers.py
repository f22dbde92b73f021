"""Source connectors (SURVEY.md §2.1 S1-S6).

The reference ingests six heterogeneous databases with per-row Python
(json.load loops, pd.read_csv/read_table/read_excel). Spark-first versions:

  S1 json_tree     glob a directory tree entity/<id>/<rel>.json where the
                   entity id is encoded in the PATH
                   (reference: extract_herb.py:84-87, extract_disease.py:21-26)
                   -> spark.read.json(recursiveFileLookup) + input_file_name()
  S2 json_envelope single JSON per entity with {"data": {...}} envelopes
                   (extract_target.py:23-27) -> read.json + select("data.*")
  S3 csv           extract_prescription.py:19-24 -> spark.read.csv
  S4 tsv           PharMeBINet nodes/edges at 3.4M-edge scale
                   (extract_ingredient.py:323) -> csv(sep='\\t')
  S5 excel         SymMap xlsx (extract_herb.py:57-58). No native Spark
                   reader: pandas engine when installed, else the built-in
                   stdlib ECMA-376 parser (sources/xlsx.py); small
                   dimension inputs go pandas->Spark either way.
  S6 resource      word lists / locus maps -> small broadcast DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_tree(
    spark: SparkSession,
    root: str,
    id_pattern: str = r".*/([^/]+)/[^/]+\.json$",
    schema=None,
) -> DataFrame:
    """S1: JSON-tree scan with the entity id recovered from the file path.

    One distributed read — no driver-side glob loop. `input_file_name()` +
    `regexp_extract` replace the reference's per-file json.load loop.
    """
    reader = spark.read.option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(root)
    return df.withColumn(
        "path_id", F.regexp_extract(F.input_file_name(), id_pattern, 1)
    )


def read_json_envelope(spark: SparkSession, path: str, envelope: str = "data") -> DataFrame:
    """S2: unwrap {"<envelope>": {...}} documents."""
    df = spark.read.option("multiLine", "true").json(path)
    if envelope in df.columns:
        return df.select(F.col(envelope + ".*"))
    return df


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "false")
    return r.csv(path)


def read_tsv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read.option("header", "true").option("sep", "\t")
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """S5: Excel is a small dimension-table format (reference:
    extract_herb.py:57-58, merge_tcm_symptom.py:20-22 read SymMap xlsx).
    Prefer pandas' reader when an xlsx engine is installed; otherwise fall
    back to the built-in stdlib-only ECMA-376 parser (sources/xlsx.py),
    which covers the simple-table shape these dimension files have."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError:
        from .xlsx import read_xlsx

        pdf = read_xlsx(path, sheet=sheet)
    # nullable extension dtypes: empty cells arrive as SQL NULLs, not NaN
    return spark.createDataFrame(pdf.convert_dtypes())


def normalize_nulls(df: DataFrame, tokens: tuple[str, ...] = ("None", "NaN", "-", "/", "")) -> DataFrame:
    """P5: map the reference's null soup to real SQL NULLs
    (extract_herb.py:130, merge_tcm_symptom.py:56-57)."""
    return df.na.replace(list(tokens), None)
