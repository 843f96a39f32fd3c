"""Streaming incremental statistics golden test: per-micro-batch sketch
rows appended by foreachBatch must roll up (metadata-only) to EXACTLY the
batch profile of the union of everything streamed — including the HLL
distinct estimate, exact at these cardinalities."""

from pyspark.sql import functions as F

from xmlschema_spark.operators import stats
from xmlschema_spark.streaming import live_profile, streaming_partition_sketches

BATCHES = [list(range(0, 40)), list(range(40, 80)), list(range(80, 120))]


def _row(i: int) -> tuple:
    return (i, f"p{i % 2}", i % 13, f"label_{i % 7}", float(i) if i % 5 else None)


SCHEMA = "id long, part string, small long, label string, score double"


def test_streaming_sketches_roll_up_to_batch_profile(spark, tmp_path):
    src = str(tmp_path / "src")
    for ids in BATCHES:
        spark.createDataFrame([_row(i) for i in ids], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_partition_sketches(
        stream,
        stats_path=str(tmp_path / "stats"),
        checkpoint_path=str(tmp_path / "ckpt"),
        columns=["id", "small", "label", "score"],
        scope_col="part",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # one sketch row per (partition, micro-batch): 2 parts x 3 batches
    raw = spark.read.parquet(str(tmp_path / "stats"))
    assert raw.count() == 6
    assert raw.select("batch_id").distinct().count() == 3

    live = {r.column: r for r in live_profile(spark, str(tmp_path / "stats")).collect()}
    whole = spark.createDataFrame([_row(i) for i in range(120)], SCHEMA)
    direct = {
        r.column: r
        for r in stats.profile(
            whole, ["id", "small", "label", "score"], exact_distinct=True
        ).collect()
    }
    for c in ["id", "small", "label", "score"]:
        l, d = live[c], direct[c]
        assert (l.n_rows, l.n_nulls, l.min_value, l.max_value, l.n_distinct) == (
            d.n_rows, d.n_nulls, d.min_value, d.max_value, d.n_distinct
        ), c
