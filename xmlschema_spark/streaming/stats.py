"""Continuously-maintained table statistics for streaming ingestion.

Batch analog: ``operators.stats.partition_sketches`` + ``merge_sketches``
(the Iceberg partition-statistics model). Here each micro-batch appends
one metrics row per (partition, batch) — typed counts/min/max plus a
mergeable DataSketches HLL sketch per column — and the live table profile
at ANY moment is a metadata-only rollup of everything appended so far.
Correct because every merged quantity is associative-commutative (sums,
min/max, HLL union), so the (partition x batch) row granularity merges
exactly like per-partition rows would.

This is the streaming completion of the north star's "per-partition
lineage + metrics rows": a table fed by ``readStream`` keeps its stats
fresh without ever rescanning history — the reference's single-pass
``iterparse`` bookkeeping (resources.py:544-590), made durable and
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmlschema_spark.operators import stats as stats_ops


def streaming_partition_sketches(
    stream_df: DataFrame,
    stats_path: str,
    checkpoint_path: str,
    columns: list[str] | None = None,
    scope_col: str = "part",
    lg_k: int = 12,
    trigger_seconds: int | None = None,
):
    """Start a query that appends per-(partition, micro-batch) sketch rows
    to ``stats_path``. Exactly-once via the streaming checkpoint: a
    replayed batch re-appends under the same batch_id, and downstream
    consumers dedupe on (scope, batch_id) — :func:`live_profile` does.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            stats_ops.partition_sketches(batch_df, columns, scope_col, lg_k)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(stats_path)
        )

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(process_batch)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def live_profile(spark: SparkSession, stats_path: str) -> DataFrame:
    """The current table-level profile from the appended sketch rows —
    metadata-only; the streamed data itself is never re-read. Duplicate
    (scope, batch_id) rows from foreachBatch replays are dropped before
    merging so replayed batches don't double-count."""
    rows = spark.read.parquet(stats_path).dropDuplicates(["scope", "batch_id"])
    return stats_ops.merge_sketches(rows.drop("batch_id"))
