"""Streaming sessionization: event-time session windows with watermark.

The streaming face of ``operators.curation.sessionize/session_stats`` —
Structured Streaming's native ``session_window`` merges events closer
than the gap into one growing window per user, and the watermark closes
(and emits) a session once event time has moved ``watermark`` past its
end. ONE stateful aggregation; state per user is bounded by the open
sessions inside the watermark horizon, so a 10^12-event stream holds
state proportional to concurrently-active users, not history.

Boundary semantics MATCH the batch operator exactly: ``session_window``
ranges merge when adjacent (next event at or before last_event + gap),
so an event arriving EXACTLY ``gap`` after the previous one stays in
the same session — the same rule as batch ``sessionize``'s strict ``>``
gap test (new session only when the gap EXCEEDS the threshold).
Verified at the exact boundary in tests/test_streaming_golden.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming DataFrame of one row per CLOSED session (append mode):
    ``(user, session_start, n_events, duration_sec)`` — the same rollup
    shape as :func:`~xmlschema_spark.operators.curation.session_stats`,
    emitted incrementally once the watermark passes the session's end.
    Sessions still open (or whose gap horizon the watermark has not yet
    cleared) stay in state and are NOT emitted."""
    sw = F.session_window(F.col(ts_col), gap)
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw.alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("__first"),
            F.max(ts_col).alias("__last"),
        )
    )
    dur_us = F.unix_micros(F.col("__last")) - F.unix_micros(F.col("__first"))
    return agg.select(
        F.col(user_col),
        F.date_format(F.col("__first"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events"),
        F.floor(dur_us / 1_000_000).alias("duration_sec"),
    )
