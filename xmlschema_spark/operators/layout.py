"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 10^12 rows the fastest validation pass is the one that never reads
the irrelevant files: Iceberg/parquet keep per-file min/max statistics,
and a scan with a predicate on (say) ``fmt`` and ``w`` can skip a file
only if the file's value RANGES are narrow. Writing data ordered by a
single column makes that column's ranges narrow and every other
column's ranges full-width; interleaving the bits of several columns
(a Z-order / Morton curve) makes ALL of them moderately narrow, which
is the layout a multi-predicate validation workload wants.

No reference analog (the reference validates documents in the order
given); this is the Spark-side twin of Iceberg's ``rewrite_data_files
(strategy => 'sort', sort_order => 'zorder(...)')``.

Everything here is pure Catalyst bit arithmetic — no UDF, no shuffle
beyond the one range-repartition the re-layout inherently needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column — column i's bit j lands at output bit ``j·ncols + i``, so
    nearby (c1, c2, …) tuples get nearby keys along the space-filling
    curve. Inputs must already be NON-NEGATIVE integers below
    ``2**bits`` (quantize/rank first — e.g. ``F.floor(col)`` buckets or
    an ``ntile`` rank); values are masked to ``bits`` bits, NULLs
    produce a NULL key (sorted last by ``zorder_layout``).

    Pure bit arithmetic (``ncols·bits`` shift/mask/or terms in ONE
    whole-stage-codegen projection), identically computable by any
    engine with ``<< & |`` — the driver query's oracle replays it in
    DuckDB verbatim."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if not cs:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or bits * len(cs) > 63:
        raise ValueError(
            f"bits*ncols must fit a signed 64-bit key, got {bits}*{len(cs)}"
        )
    key = None
    for i, c in enumerate(cs):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            term = F.shiftleft(
                F.shiftrightunsigned(masked, j).bitwiseAND(F.lit(1)),
                j * len(cs) + i,
            )
            key = term if key is None else key.bitwiseOR(term)
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    num_files: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Re-layout ``df`` along the Z-order curve of ``cols``: compute the
    Morton key, range-repartition on it (one pass — Spark's
    ``RangePartitioner`` samples the key to pick balanced split points,
    so skewed key regions still yield even files), and sort within each
    partition. Write the result with any sink; each output file then
    covers a narrow min/max range of EVERY interleaved column, which is
    what makes Iceberg/parquet file skipping effective for
    multi-predicate scans. ``num_files=None`` keeps the session's
    shuffle parallelism. The key column is kept (``key_col``) so callers
    can audit locality (see :func:`layout_span_report`); drop it before
    writing if undesired."""
    keyed = df.withColumn(key_col, zorder_key(*cols, bits=bits))
    parted = (
        keyed.repartitionByRange(num_files, key_col)
        if num_files is not None
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col)


def layout_span_report(
    df: DataFrame,
    cols: list[str],
    key_col: str,
    buckets: int = 16,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Locality audit for a layout key: split the key-ordered rows into
    ``buckets`` equal-count buckets (file stand-ins) and report each
    bucket's per-column min/max span. Narrow spans ⇒ effective file
    skipping; comparing the report for a Z-order key vs an unsorted or
    single-column layout quantifies what the re-layout buys BEFORE
    rewriting 100 TB. Output: (bucket, n, <col>_min/<col>_max …), one
    row per bucket.

    The bucket index is ``floor((rank−1)·buckets / total)`` where rank
    is the row's position in the total order (``key_col``,
    ``tiebreak_col``) — deterministic and engine-agnostic (unlike
    ``ntile``, whose remainder placement is implementation-defined), so
    the driver oracle replays it exactly. ``tiebreak_col`` must make the
    order total (a unique id) whenever key values repeat.

    The global rank is computed DISTRIBUTED, never with a window over
    one partition: range-repartition on the order columns (equal keys
    co-locate, partition ranges are globally ordered), count rows per
    partition (a partition-count-sized collect), and add each
    partition's cumulative offset to its LOCAL row_number — the
    standard two-phase global sort-rank. Cost: one range shuffle + one
    tiny count job + one per-partition window + one hash agg. The
    shuffled table is persisted for the duration of the call and the
    (≤ ``buckets``-row) report materialized eagerly before release —
    call ``.unpersist()`` on the RETURNED DataFrame when done (same
    contract as :func:`~.dedup.jaccard_pairs`)."""
    order = [F.col(key_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    # pin the range-partition id as a COLUMN of the persisted table:
    # spark_partition_id() is evaluation-point-sensitive (the window
    # below introduces its own exchange, after which a fresh call would
    # return the post-shuffle id), so it must be materialized exactly
    # once, here, against the cached range partitioning.
    parted = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sizes = sorted(
        (r["__pid"], r["__n"])
        for r in parted.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("__n")
        ).collect()
    )
    total = sum(n for _, n in sizes)
    if total == 0:
        parted.unpersist()
        return df.groupBy(F.lit(0).cast("int").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"),
            *[a for c in cols for a in (F.min(c).alias(f"{c}_min"),
                                        F.max(c).alias(f"{c}_max"))],
        ).limit(0)
    offsets, acc = {}, 0
    for p, n in sizes:
        offsets[p] = acc
        acc += n
    offset = F.element_at(
        F.create_map(*[F.lit(x) for p, o in offsets.items() for x in (p, o)]),
        F.col("__pid"),
    )
    local_rn = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order)
    )
    bucket = F.floor((offset + local_rn - 1) * buckets / F.lit(total))
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    report = (
        parted.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(*aggs)
        .persist()
    )
    report.count()  # materialize so the shuffled table can be released
    parted.unpersist()
    return report
