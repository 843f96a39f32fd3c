"""Streaming deduplication: cross-micro-batch duplicate suppression with
watermark-bounded state.

The batch dedup operators (operators/dedup.py) answer "which docs in this
corpus are duplicates"; a continuously-ingested table asks the streaming
form: "drop rows whose key was already seen", across micro-batch
boundaries. That is built-in stateful streaming — `dropDuplicates` keeps
one state-store row per distinct key — and the scale question is purely
about STATE GROWTH:

- unbounded `dropDuplicates(keys)` state never expires: at 10^12 rows the
  state store IS the key set. Only sane when the key space is small.
- `dropDuplicatesWithinWatermark(keys)` (the default here) expires state
  once the event-time watermark passes a key's last occurrence: state is
  bounded by (ingest rate x watermark horizon) regardless of total volume.
  Re-occurrences beyond the horizon are re-admitted — the documented
  trade, same as any TTL'd dedup cache. For long horizons use the RocksDB
  state store (spark.sql.streaming.stateStore.providerClass) so state
  spills off-heap.

Keys should be FIXED-WIDTH: `exact_dedup_stream` hashes the normalized
content to md5 JVM-side (the same content_hash as batch
`exact_duplicates`, so batch backfill and streaming ingest drop the same
rows) — 16 bytes of state key per doc instead of the document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschema_spark.operators.dedup import normalize_text


def drop_duplicates_stream(
    stream_df: DataFrame,
    keys: list[str],
    event_time_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame with duplicate-keyed rows dropped across
    micro-batches.

    With ``event_time_col`` (recommended): watermark-bounded state via
    ``dropDuplicatesWithinWatermark`` — a duplicate arriving within
    ``delay`` of the first occurrence is dropped; state for keys older
    than the watermark is evicted. Without it: unbounded
    ``dropDuplicates`` state (explicit opt-in to forever-growing state).
    """
    if event_time_col is not None:
        return stream_df.withWatermark(
            event_time_col, delay
        ).dropDuplicatesWithinWatermark(keys)
    return stream_df.dropDuplicates(keys)


def exact_dedup_stream(
    stream_df: DataFrame,
    text_col: str,
    event_time_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming analog of :func:`~xmlschema_spark.operators.dedup.
    drop_exact_duplicates`: drop rows whose normalized content was already
    ingested. The dedup key is ``md5(normalize_text(text_col))`` — the
    SAME content hash as the batch operator, computed JVM-side, so a
    batch-deduped backfill and the streaming tail agree on what counts as
    a duplicate; state per doc is the 16-byte hash, not the text."""
    hashed = stream_df.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    )
    return drop_duplicates_stream(
        hashed, ["content_hash"], event_time_col, delay
    ).drop("content_hash")
