import pytest


@pytest.fixture(scope="session")
def spark():
    from tcmkg.session import get_spark

    s = get_spark("tcmkg-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def gazetteers():
    from tcmkg.fixtures.gazetteers import build_gazetteers

    return build_gazetteers()


@pytest.fixture(scope="session")
def transcripts_pdf():
    from tcmkg.fixtures.transcripts import generate_pandas

    return generate_pandas(300)


@pytest.fixture(scope="session")
def golden_triples(gazetteers, transcripts_pdf):
    from tcmkg.oracle.extractor import OracleExtractor

    return OracleExtractor(gazetteers).extract(transcripts_pdf.to_dict("records"))


@pytest.fixture(scope="session")
def pipeline(spark, gazetteers):
    from tcmkg.pipeline.runner import KGPipeline

    return KGPipeline(spark, gazetteers)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    return spark.createDataFrame(transcripts_pdf, schema=schema)
