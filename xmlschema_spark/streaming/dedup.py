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

from xmlschema_spark.operators.dedup import (
    band_hash_array,
    minhash_signature,
    normalize_text,
    shingles,
)


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


def near_dedup_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    event_time_col: str,
    delay: str = "10 minutes",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 5,
    hash_family: str = "xxhash64",
    emit_window: str = "1 minute",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression: a doc is dropped when ANY of
    its minhash LSH band hashes was already seen within the watermark
    horizon — the continuous-ingest form of
    :func:`~xmlschema_spark.operators.dedup.minhash_lsh_candidates`'s
    "≥ 1 shared band" candidate rule (reference analog: the lazy
    iterparse one-pass mode, resources.py:544-590 — incremental
    processing as a first-class citizen).

    How it distributes (two chained stateful operators, append mode —
    supported since Spark 3.5's multi-stateful-operator pipelines):

    1. the signature + banding projection is the SAME pure-column
       expression the batch operator uses (``band_hash_array`` over
       ``minhash_signature`` — shared code, so batch backfill and the
       streaming tail agree on what a collision is), evaluated JVM-side;
    2. ``posexplode`` to (band, band_hash) rows and
       ``dropDuplicatesWithinWatermark`` keyed on them: state is one row
       per occupied band bucket, expiring at the horizon — bounded by
       (ingest rate × ``delay``), never by corpus size; the 8-byte
       band hash is the state key, not the document;
    3. a doc survives iff it won ALL ``bands`` of its buckets (all its
       exploded rows survive the dedup): a windowed
       count-equals-``bands`` aggregation keyed on (window, doc). Band
       rows of one doc share one event time, so ``emit_window`` only
       controls append-mode emission latency, never correctness.

    Tie semantics within ONE micro-batch: each bucket independently
    keeps one arbitrary claimant, so two same-batch docs sharing a band
    can never BOTH survive, but if they share ≥ 2 bands and the bucket
    winners split, BOTH may be suppressed (over-suppression of a pair
    that near-dedup wanted thinned to one anyway — never
    under-suppression, and never affecting cross-batch behavior, which
    is exact: a doc colliding with any bucket occupied by an earlier
    batch within the horizon is always dropped). Claimed buckets stay
    occupied even when the claimant itself was suppressed — matching the
    batch pipeline, where a suppressed doc's signature still generates
    candidate edges (transitive clusters keep one representative).

    Emission semantics (append mode): a novel doc is emitted once the
    watermark passes its ``emit_window`` — the standard completeness/
    latency trade of watermarked aggregation. Docs dropped as near-dups
    simply never appear.

    Returns (id_col, window_start, n_bands_won) — join back to the
    payload downstream by id if the full row is needed (carrying multi-KB
    text through two stateful operators would put the document, not the
    hash, in the state store).
    """
    wm = stream_df.withWatermark(event_time_col, delay)
    # materialize shingles once, then the k lanes (same two-step shape as
    # the batch operator: inlining shingles into every lane re-evaluates
    # the split/slice chain num_hashes times per row)
    sigs = wm.select(
        F.col(id_col),
        F.col(event_time_col),
        shingles(F.col(text_col), shingle_k).alias("__sh"),
    ).select(
        F.col(id_col),
        F.col(event_time_col),
        band_hash_array(
            minhash_signature(F.col("__sh"), num_hashes, hash_family),
            num_hashes,
            bands,
            hash_family,
        ).alias("__bands"),
    )
    banded = sigs.select(
        id_col,
        event_time_col,
        F.posexplode("__bands").alias("band", "band_hash"),
    )
    survivors = banded.dropDuplicatesWithinWatermark(["band", "band_hash"])
    return (
        survivors.groupBy(F.window(event_time_col, emit_window), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("n_bands_won"))
        .filter(F.col("n_bands_won") == bands)
        .select(
            id_col,
            F.col("window.start").alias("window_start"),
            "n_bands_won",
        )
    )
