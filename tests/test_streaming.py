"""Structured-Streaming ingestion tests (memory sink + availableNow)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def landing(tmp_path, transcripts_pdf):
    """Two parquet 'arrivals', whole conversations per file."""
    d = tmp_path / "landing"
    d.mkdir()
    convs = sorted(transcripts_pdf.conv_id.unique())
    half = set(convs[: len(convs) // 2])
    a = transcripts_pdf[transcripts_pdf.conv_id.isin(half)]
    b = transcripts_pdf[~transcripts_pdf.conv_id.isin(half)]
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    a.to_parquet(d / "batch_a.parquet", **kw)
    b.to_parquet(d / "batch_b.parquet", **kw)
    return str(d)


def test_streaming_turn_stats(spark, landing):
    from tcmkg.streaming.ingest import stream_transcripts, streaming_turn_stats

    stats = streaming_turn_stats(stream_transcripts(spark, landing))
    q = (
        stats.writeStream.outputMode("append").format("memory")
        .queryName("turn_stats").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # append mode only emits watermark-closed windows; check the totals of
    # what was emitted against a batch recount of the same windows
    got = spark.sql("SELECT sum(n_turns) AS n FROM turn_stats").collect()[0]["n"]
    assert got is not None and got > 0
    batch = spark.read.parquet(landing)
    emitted = spark.sql("SELECT DISTINCT w_start FROM turn_stats")
    per_window = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "conv_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
        .join(emitted, "w_start", "left_semi")
    )
    want = per_window.agg(F.sum("n")).collect()[0][0]
    assert got == want


def test_incremental_mentions_equal_batch(spark, tmp_path, landing, pipeline, golden_triples):
    """foreachBatch-appended mention partials -> assemble_triples must equal
    the batch pipeline (and the oracle) over all data seen."""
    from tcmkg.pipeline.triples import assemble_triples
    from tcmkg.streaming.ingest import incremental_mentions

    out = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_mentions(spark, landing, out, ckpt, pipeline=pipeline)
    q.awaitTermination(240)

    mentions = spark.read.parquet(out)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in assemble_triples(mentions).collect()
    }
    want = {(s, p, o) for s, p, o, _ in golden_triples}
    assert got == want

    # restart with same checkpoint: no new files -> no duplicate appends
    q2 = incremental_mentions(spark, landing, out, ckpt, pipeline=pipeline)
    q2.awaitTermination(120)
    got2 = {
        (r["subj"], r["pred"], r["obj"])
        for r in assemble_triples(spark.read.parquet(out)).collect()
    }
    assert got2 == got


def test_epoch_replay_is_idempotent(spark, tmp_path, transcripts_df, pipeline):
    """Mid-epoch failure semantics: foreachBatch may re-run an epoch whose
    write completed but whose checkpoint commit did not. Replaying the same
    epoch_id must not duplicate partials (n/amt_sum inflation would skew
    formula_contains_herb weights)."""
    from tcmkg.streaming.ingest import mention_sink

    out = str(tmp_path / "m")
    sink = mention_sink(pipeline, out)
    batch = transcripts_df
    sink(batch, 7)
    once = spark.read.parquet(out).groupBy().sum("n").collect()[0][0]
    assert once and once > 0
    sink(batch, 7)  # replayed epoch (crash-recovery path)
    twice = spark.read.parquet(out).groupBy().sum("n").collect()[0][0]
    assert once == twice
    # a genuinely new epoch still lands
    sink(batch, 8)
    assert spark.read.parquet(out).groupBy().sum("n").collect()[0][0] == 2 * once


def test_stateful_carry_forward_across_batches(
    spark, tmp_path, transcripts_pdf, pipeline, golden_triples
):
    """The applyInPandasWithState path must reproduce the batch triples even
    when every conversation is SPLIT across micro-batches (each file = one
    micro-batch, oldest first): a carry-forward line whose anchor arrived
    in an earlier micro-batch still resolves from state."""
    import os
    import time

    from tcmkg.pipeline.triples import assemble_triples
    from tcmkg.streaming.ingest import incremental_triples_stateful

    # upstream-dedup'd, per-conversation ordered input (the feed contract)
    pdf = transcripts_pdf.sort_values(["conv_id", "turn_idx", "ts", "text"])
    pdf = pdf.drop_duplicates(["conv_id", "turn_idx"])

    d = tmp_path / "landing"
    d.mkdir()
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    # chunk i holds the i-th third of EVERY conversation's turns
    rank = pdf.groupby("conv_id")["turn_idx"].rank(method="first")
    size = pdf.groupby("conv_id")["turn_idx"].transform("count")
    third = ((rank - 1) * 3 // size).astype(int)
    for i in range(3):
        p = d / f"chunk_{i}.parquet"
        pdf[third == i].to_parquet(p, **kw)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        time.sleep(0.01)

    out = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_triples_stateful(
        spark, str(d), out, ckpt, pipeline=pipeline, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in assemble_triples(spark.read.parquet(out)).collect()
    }
    want = {(s, p, o) for s, p, o, _ in golden_triples}
    assert got == want

    # weights too: the dose partials must sum identically to batch
    from pyspark.sql import functions as F

    rnd = lambda w: None if w is None else round(w, 9)
    stream_w = {
        (r["subj"], r["obj"]): rnd(r["weight"])
        for r in assemble_triples(spark.read.parquet(out))
        .filter(F.col("pred") == "formula_contains_herb").collect()
    }
    batch_w = {
        (s, o): rnd(w)
        for s, p, o, w in golden_triples
        if p == "formula_contains_herb"
    }
    assert stream_w == batch_w


def test_stream_dedup_turns(spark, tmp_path, transcripts_pdf):
    """Duplicate (conv_id, turn_idx) arrivals — within one file AND across
    micro-batches inside the watermark — surface exactly once; state stays
    bounded by the watermark (dropDuplicatesWithinWatermark)."""
    import os

    from tcmkg.streaming.ingest import stream_dedup_turns, stream_transcripts

    d = tmp_path / "dup_landing"
    d.mkdir()
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    base = transcripts_pdf.head(200).copy()
    base["tool"] = base["tool"].astype("string")  # all-None col writes INT32 otherwise
    dup_half = base.head(100)
    f0, f1 = d / "a.parquet", d / "b.parquet"
    import pandas as pd

    pd.concat([base, dup_half]).to_parquet(f0, **kw)   # in-file duplicates
    dup_half.to_parquet(f1, **kw)                       # cross-batch duplicates
    os.utime(f0, (1_700_000_000, 1_700_000_000))
    os.utime(f1, (1_700_000_060, 1_700_000_060))

    deduped = stream_dedup_turns(stream_transcripts(spark, str(d), max_files_per_trigger=1))
    q = (
        deduped.writeStream.outputMode("append").format("memory")
        .queryName("dedup_turns").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT conv_id, turn_idx, count(*) AS n FROM dedup_turns GROUP BY 1, 2"
    ).collect()
    assert len(got) == len(base)                 # every original key present
    assert all(r["n"] == 1 for r in got)         # and exactly once
