"""Streaming identity constraints: referential integrity per micro-batch
and watermark-windowed duplicate-key detection.

The streaming face of ``operators/identity.py`` — the reference evaluates
identity constraints DURING its one-pass lazy scan (identities checked as
subtrees stream by, /root/reference/xmlschema/validators/schema.py:991-1008);
at Spark scale the one-pass scan is a Structured Streaming query and the
two identity families map to two canonical streaming shapes:

- **keyref (referential)** → ``foreachBatch``: every micro-batch of fact
  rows runs the SAME batch operator (``identity.keyref_orphans`` — shared
  code, so the streaming tail and a batch backfill agree on what an
  orphan is by construction) against a PK snapshot refreshed per batch
  via a caller-supplied provider. The PK side is a dimension
  (broadcast-sized in the usual case); per-batch refresh is the
  stream-static-join semantics users actually want — a fact row is an
  orphan iff its key is missing NOW, not at query start.
- **unique/key (duplicates)** → one watermark-bounded windowed
  aggregation keyed on (window, key tuple): state per open window is one
  row per distinct key tuple seen in it, expiring with the watermark —
  bounded by (ingest rate × horizon), never corpus size. Emits the batch
  operator's one-row-per-duplicated-VALUE shape per closed window
  (XSD unique semantics: a violation per value, identities.py:198-221),
  and NULL-containing tuples are absent tuples, never duplicates
  (identities.py:128-151) — the same tuple semantics as
  ``identity.duplicate_values``, agreement pytest-proven.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschema_spark.operators.identity import keyref_orphans


def keyref_orphans_foreach_batch(
    fk_columns: list[str],
    pk_provider: Callable[[], DataFrame],
    pk_columns: list[str],
    sink: Callable[[DataFrame, int], None],
    broadcast_pk: bool | None = True,
):
    """Build the ``writeStream.foreachBatch`` callable for per-micro-batch
    referential-integrity checking: each batch's orphan fk rows (computed
    by the batch ``identity.keyref_orphans`` — broadcast left-anti against
    the CURRENT PK snapshot) are stamped with ``batch_id`` and handed to
    ``sink(orphans_df, batch_id)``.

    ``pk_provider`` is called once per micro-batch and returns the current
    key table (e.g. ``lambda: spark.read.parquet(pk_path)`` — a dimension
    refreshed between batches is re-read, which static stream-static joins
    would not do). ``sink`` decides what a violation costs: append to an
    error table, raise to fail the stream, update metrics.

    Usage::

        q = (fact_stream.writeStream
             .foreachBatch(keyref_orphans_foreach_batch(
                 ["o_custkey"], lambda: spark.read.parquet(dim), ["c_custkey"],
                 lambda orphans, bid: orphans.write.mode("append").parquet(out)))
             .start())

    Field-cardinality validation happens NOW (parse_refer semantics,
    identities.py:274-275), not on the first batch."""
    if len(fk_columns) != len(pk_columns):
        raise ValueError(
            f"field cardinality mismatch: {fk_columns} vs {pk_columns} "
            "(cf. identities.py:274-275)"
        )

    def _check(batch_df: DataFrame, batch_id: int) -> None:
        pk_df = pk_provider()
        orphans = keyref_orphans(
            batch_df, fk_columns, pk_df, pk_columns, broadcast_pk=broadcast_pk
        ).withColumn("batch_id", F.lit(batch_id))
        sink(orphans, batch_id)

    return _check


def duplicate_keys_stream(
    stream_df: DataFrame,
    columns: list[str],
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    scope_col: str | None = None,
) -> DataFrame:
    """Streaming DataFrame (append mode) of duplicated key VALUES per
    closed event-time window: ``window_start, window_end, [scope_col,]
    *columns, dup_count`` with ``dup_count >= 2`` — the watermark-bounded
    form of ``identity.duplicate_values``.

    Same tuple semantics as the batch operator (pytest-proven identical
    on shared data): NULL-containing tuples are absent tuples and never
    count, and the output is one row per duplicated VALUE, not per row.
    The windowed scope is the streaming trade: "duplicate within the
    horizon" (two occurrences of one key in different closed windows are
    NOT flagged — run the batch operator over the sink for table-scope
    uniqueness; the reference's table-scope xs:ID has no bounded-state
    streaming form at 10^12 keys).

    Plan: the null-tuple filter is a stateless pre-projection, then ONE
    watermarked windowed aggregation (map-side partial combine, state =
    one count per (window, key tuple) until the watermark closes the
    window), then a stateless ``>= 2`` filter on the closed-window rows."""
    if not columns:
        raise ValueError("columns must name at least one column")
    keys = [F.col(c) for c in columns]
    tuples = stream_df
    for c in keys:
        tuples = tuples.filter(c.isNotNull())
    group = ([F.col(scope_col)] if scope_col else []) + keys
    agg = (
        tuples.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("__w"), *group)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    return agg.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *([F.col(scope_col)] if scope_col else []),
        *[F.col(c) for c in columns],
        "dup_count",
    )
