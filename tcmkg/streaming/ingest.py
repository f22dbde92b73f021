"""Structured-Streaming ingestion for incremental KG construction.

The reference is pure batch (SURVEY.md §2.8) and the batch pipeline with
checkpoint resume covers its semantics. This module adds the streaming-
arrival shape a production transcript feed has:

  stream_transcripts   readStream over a parquet landing directory (swap
                       format for kafka on a real feed; schema fixed)
  streaming_turn_stats watermarked sliding-window per-conversation turn
                       counts (late data handled by the watermark)
  incremental_mentions foreachBatch: every micro-batch runs the SAME batch
                       mention kernel and lands partial-aggregate mention
                       rows under an epoch_id-keyed subdirectory. Because
                       the kernel emits map-side partials and
                       assemble_triples is a pure reduce, triples over the
                       union of landed partials equal a batch run over all
                       data seen so far. foreachBatch alone is only
                       at-least-once (a crash after the write but before
                       the checkpoint commit replays the epoch); the
                       epoch-keyed OVERWRITE makes the replay idempotent —
                       the re-run replaces its own directory instead of
                       appending duplicates — which yields exactly-once
                       *output* end to end.

Carry-forward caveat: T2b lines ("亦主治…") need the conversation's earlier
turns; micro-batches see only new rows. `incremental_mentions` therefore
resolves anchors within each micro-batch only — feeds that split
conversations across batches should land whole conversations per file (the
typical log-rotation unit) or fall back to the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_transcripts(spark: SparkSession, landing_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(landing_dir)
    )


def streaming_turn_stats(stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Per (event-time window, conv) turn counts with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("w_start"), "conv_id", "n_turns")
    )


def mention_sink(pipe, out_dir: str):
    """foreachBatch function: land this epoch's mention partials at
    `{out_dir}/epoch=<epoch_id>` with OVERWRITE. Replaying an epoch (crash
    between write and checkpoint commit) replaces its own directory —
    idempotent, so downstream reads see each epoch exactly once. Readers
    `spark.read.parquet(out_dir)` get an `epoch` partition column for free
    (lineage: which micro-batch produced which partials)."""

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        mentions = pipe.mentions(batch_df)
        mentions.write.mode("overwrite").parquet(f"{out_dir}/epoch={int(epoch_id)}")

    return per_batch


def incremental_mentions(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pipeline=None,
):
    """Start a stream landing mention partials per micro-batch."""
    from ..pipeline.runner import KGPipeline

    pipe = pipeline or KGPipeline(spark)
    stream = stream_transcripts(spark, landing_dir)

    return (
        stream.writeStream.foreachBatch(mention_sink(pipe, out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
