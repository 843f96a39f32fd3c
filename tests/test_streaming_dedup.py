"""Streaming dedup goldens: deterministic micro-batches (one parquet file
per trigger), exact expected kept rows — duplicates dropped ACROSS
micro-batch boundaries with watermark-bounded state."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.streaming import drop_duplicates_stream, exact_dedup_stream

# texts are pure functions of a key k; ids encode (batch, position) so the
# first occurrence of every key is also its minimum id
BATCHES = [
    [(k, k) for k in range(10)],                      # keys 0..9   (ids 0..9)
    [(20 + i, 5 + i) for i in range(10)],             # keys 5..14  (5..9 dup)
    [(40 + i, k) for i, k in enumerate((0, 1, 15))],  # 0,1 dup; 15 new
]
BASE_TS = 1_700_000_000


def _write_batches(spark, src: str, mangle: bool = False) -> None:
    for b, rows in enumerate(BATCHES):
        data = []
        for i, k in rows:
            text = f"document body {k}"
            if mangle and b > 0:
                # same content after whiteSpace-collapse normalization
                text = f"  Document   BODY {k} "
            data.append((i, text, BASE_TS + b * 60 + i))
        spark.createDataFrame(
            data, "id long, text string, ts long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts"))).coalesce(1).write.mode(
            "append"
        ).parquet(src)


def _stream(spark, src: str):
    return (
        spark.readStream.schema("id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _run_to_memory(dedup_df, name: str):
    q = (
        dedup_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


# expected: first (= min-id) occurrence of each distinct key survives
EXPECT_IDS = sorted(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]          # batch 0: all first occurrences
    + [25, 26, 27, 28, 29]                  # batch 1: keys 10..14 only
    + [42]                                  # batch 2: key 15 only
)


def test_drop_duplicates_stream_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    out = drop_duplicates_stream(
        _stream(spark, src), ["text"], event_time_col="ts", delay="1 hour"
    )
    _run_to_memory(out, "dd_golden")
    got = sorted(r.id for r in spark.sql("SELECT id FROM dd_golden").collect())
    assert got == EXPECT_IDS


def test_exact_dedup_stream_normalizes_content(spark, tmp_path):
    """Re-occurrences differ in case/whitespace only — the md5 content
    hash (same as batch exact_duplicates) must still match and drop
    them, so batch backfill and streaming tail agree."""
    src = str(tmp_path / "src")
    _write_batches(spark, src, mangle=True)
    out = exact_dedup_stream(
        _stream(spark, src), "text", event_time_col="ts", delay="1 hour"
    )
    _run_to_memory(out, "ed_golden")
    got = sorted(r.id for r in spark.sql("SELECT id FROM ed_golden").collect())
    assert got == EXPECT_IDS
    # the helper hash column must not leak into the output schema
    assert sorted(spark.table("ed_golden").columns) == ["id", "text", "ts"]


def test_drop_duplicates_stream_unbounded_optin(spark, tmp_path):
    """No event-time column → plain dropDuplicates (explicitly unbounded
    state); same kept set on this fixture."""
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    out = drop_duplicates_stream(_stream(spark, src), ["text"])
    _run_to_memory(out, "ddu_golden")
    got = sorted(r.id for r in spark.sql("SELECT id FROM ddu_golden").collect())
    assert got == EXPECT_IDS
