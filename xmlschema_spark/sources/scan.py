"""Scan-parallelism guard for unsplittable inputs.

Spark splits parquet scans by file and row group; a file written as ONE
row group (common from single-process writers — pandas/duckdb exports,
small dimension extracts) yields exactly one task no matter how many
bytes or executor cores there are, so every CPU-dense projection over it
(regex facets, interval parses, wide rule suites) runs single-threaded.
``spark.sql.files.maxPartitionBytes`` cannot help: the reader cannot
split below a row group.

The production remedy is a bounded round-robin ``repartition`` applied
ONLY when the scan's split count is far below the session's parallelism —
a multi-file 100 TB table never triggers it (its scans already carry
thousands of splits), while a 2 MB single-row-group file pays one tiny
shuffle to light up every core. The guard reads the PLANNED partition
count (file listing only, no job)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` up to the session default
    parallelism iff its planned scan has fewer than
    ``default_parallelism / min_factor`` partitions. No-op (returns
    ``df`` unchanged, no shuffle in the plan) otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
