"""Round-5 tests: scale-safe banding defaults, signature-index banding
validation, and the other round-5 surface."""

import pytest
from pyspark.sql import functions as F


def test_banding_defaults_are_scale_safe():
    """The library defaults MUST be the measured web-scale regime (b=6,
    r=2) on every entry point — the round-4 stress showed the r=1 default
    produced 100x the candidate pairs (86.97M vs 0.87M on 500k realistic
    docs, BENCH/BASELINE.md §stress 2)."""
    import inspect

    from tcmkg.ops.dedup import (
        minhash_signatures,
        near_dedup,
        near_dedup_incremental,
    )
    from tcmkg.ops.prepare import prepare_corpus

    for fn in (minhash_signatures, near_dedup, near_dedup_incremental,
               prepare_corpus):
        p = inspect.signature(fn).parameters
        assert p["n_bands"].default == 6, fn.__name__
        assert p["rows_per_band"].default == 2, fn.__name__


def test_cli_banding_defaults_are_scale_safe():
    """The CLI (the entry point a user actually types) must default to the
    safe regime too, not just the Python API."""
    from unittest import mock

    import tcmkg.__main__ as m

    captured = []
    with mock.patch.object(m, "cmd_dedup", captured.append), \
         mock.patch.object(m, "cmd_prepare", captured.append):
        m.main(["dedup", "--input", "x", "--output", "y"])
        m.main(["prepare", "--input", "x", "--output", "y"])
    assert len(captured) == 2
    for args in captured:
        assert args.n_bands == 6 and args.rows_per_band == 2


def test_signature_index_roundtrip_and_mismatch(spark, tmp_path):
    """write_signature_index records the banding in the store manifest;
    read_signature_index returns it; near_dedup_incremental raises on a
    banding mismatch instead of silently missing every cross-boundary
    duplicate (the failure ADVICE r4 flagged)."""
    from tcmkg.ops.dedup import (
        near_dedup_incremental,
        read_signature_index,
        write_signature_index,
    )
    from tcmkg.pipeline.checkpoints import CheckpointStore

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "completely different words here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    store = CheckpointStore(str(tmp_path / "ck"))
    write_signature_index(store, seen, "sigs", "doc_id", "text",
                          n_bands=4, rows_per_band=1)
    sigs, banding = read_signature_index(store, spark, "sigs")
    assert banding == (4, 1)
    assert set(sigs.columns) == {"id", "band", "sig"}

    # recorded banding != call banding -> hard error, no Spark job needed
    with pytest.raises(ValueError, match="banding"):
        near_dedup_incremental(seen, new, "doc_id", "text",
                               seen_sigs=sigs, seen_banding=banding)

    # matching banding passes end-to-end
    out = near_dedup_incremental(
        seen, new, "doc_id", "text", n_bands=4, rows_per_band=1,
        seen_sigs=sigs, seen_banding=banding,
    )
    got = {r["removed_doc"]: r["keep_doc"] for r in out["removals"].collect()}
    assert got == {100: 1}
    out["unpersist"]()


def test_signature_index_cardinality_fallback(spark):
    """Without a recorded banding, the band-cardinality scan catches an
    n_bands mismatch (the detectable half of the mismatch space)."""
    from tcmkg.ops.dedup import minhash_signatures, near_dedup_incremental

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, "alpha beta epsilon")],
                                "doc_id long, text string")
    sigs4 = minhash_signatures(seen, "doc_id", "text", n_bands=4, rows_per_band=1)
    with pytest.raises(ValueError, match="bands 0..3"):
        near_dedup_incremental(seen, new, "doc_id", "text",
                               n_bands=6, rows_per_band=2, seen_sigs=sigs4)
