"""Streaming NEAR-dedup goldens (streaming/dedup.py near_dedup_stream):
deterministic micro-batches, exact expected kept docs, and batch ↔
streaming agreement — the expected candidate structure is derived from
the BATCH minhash LSH operator over the same corpus, so the streaming
suppression provably drops exactly the docs the batch pipeline pairs."""

from pyspark.sql import functions as F

from xmlschema_spark.operators.dedup import minhash_lsh_candidates
from xmlschema_spark.streaming import near_dedup_stream

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
OTHER = "completely different content about compilers registers and memory allocation"
OTHER_B = "a third unrelated subject entirely ocean currents and tidal patterns worldwide"
OTHER_C = "fourth text on gardening soil compost seedlings and careful seasonal pruning"

PARAMS = dict(num_hashes=32, bands=16, shingle_k=4)
T0 = 1_700_000_000


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, "id long, text string, ts long").withColumn(
        "ts", F.timestamp_seconds(F.col("ts"))
    ).coalesce(1).write.mode("append").parquet(src)


def _stream(spark, src):
    return (
        spark.readStream.schema("id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _run(out, name):
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_batch_candidate_structure_of_fixture(spark):
    """Pin the fixture's candidate graph via the BATCH operator: exactly
    (1,3) [one-word change -> shared bands] and (2,5) [exact copy]."""
    docs = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, NEAR), (4, OTHER_B), (5, OTHER), (6, OTHER_C)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, "text", "doc_id", **PARAMS)
    got = sorted((r.id_a, r.id_b) for r in pairs.collect())
    assert got == [(1, 3), (2, 5)]


def test_near_dedup_stream_drops_across_batches(spark, tmp_path):
    """Cross-batch suppression: the near-dup (3) and the exact copy (5)
    arriving in LATER batches are dropped; novel docs survive."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, BASE, T0), (2, OTHER, T0 + 1)])
    _write_batch(spark, src, [(3, NEAR, T0 + 60), (4, OTHER_B, T0 + 61)])
    _write_batch(spark, src, [(5, OTHER, T0 + 120), (6, OTHER_C, T0 + 121)])
    # flush batch far in the future so append mode emits every window
    _write_batch(spark, src, [(99, "flush marker row", T0 + 7200)])

    out = near_dedup_stream(
        _stream(spark, src), "text", "id", "ts", delay="30 minutes", **PARAMS
    )
    _run(out, "nd_golden")
    got = sorted(
        r.id for r in spark.sql("SELECT id FROM nd_golden").collect() if r.id < 90
    )
    assert got == [1, 2, 4, 6]
    won = {r.id: r.n_bands_won for r in spark.sql("SELECT * FROM nd_golden").collect()}
    assert all(v == PARAMS["bands"] for v in won.values())


def test_near_dedup_stream_state_expires_beyond_horizon(spark, tmp_path):
    """A near-dup arriving AFTER the watermark horizon is re-admitted —
    the documented TTL trade that keeps state bounded by
    (ingest rate x horizon) instead of corpus size."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, BASE, T0)])
    # unrelated doc 3 h later advances the watermark past T0 + delay;
    # eviction happens at the END of the batch that RUNS with the
    # advanced watermark, so one more spacer batch must execute before
    # doc 1's bucket state is actually gone
    _write_batch(spark, src, [(2, OTHER, T0 + 3 * 3600)])
    _write_batch(spark, src, [(4, OTHER_B, T0 + 3 * 3600 + 30)])
    _write_batch(spark, src, [(7, NEAR, T0 + 3 * 3600 + 60)])
    _write_batch(spark, src, [(99, "flush marker row", T0 + 10 * 3600)])

    out = near_dedup_stream(
        _stream(spark, src), "text", "id", "ts", delay="1 hour", **PARAMS
    )
    _run(out, "nd_expiry")
    got = sorted(
        r.id for r in spark.sql("SELECT id FROM nd_expiry").collect() if r.id < 90
    )
    assert got == [1, 2, 4, 7]  # 7 kept: doc 1's buckets expired


def test_near_dedup_stream_same_batch_pair_never_both_survive(spark, tmp_path):
    """Same-batch tie semantics: of two near-dups in ONE micro-batch, at
    most one survives (the documented guarantee; with a single source
    partition the first wins all buckets deterministically)."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, BASE, T0), (2, NEAR, T0 + 1), (3, OTHER, T0 + 2)])
    _write_batch(spark, src, [(99, "flush marker row", T0 + 7200)])

    out = near_dedup_stream(
        _stream(spark, src), "text", "id", "ts", delay="30 minutes", **PARAMS
    )
    _run(out, "nd_samebatch")
    got = sorted(
        r.id for r in spark.sql("SELECT id FROM nd_samebatch").collect() if r.id < 90
    )
    assert 3 in got and not ({1, 2} <= set(got))
