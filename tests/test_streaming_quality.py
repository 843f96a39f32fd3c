"""Streaming quality monitor GOLDEN tests: deterministic micro-batches
(one parquet file per trigger), exact expected per-window completeness/
volume rows derived independently in plain Python, plus batch↔streaming
agreement with operators.checks.completeness on the same data."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators import checks
from xmlschema_spark.streaming import quality_monitor_stream

# three micro-batches of 30 rows; every field a pure function of i.
# batch k's event times all land in tumbling minute-window k, and the
# watermark (advanced batch-over-batch by maxFilesPerTrigger=1) releases
# windows 0 and 1 in append mode.
BATCHES = [list(range(0, 30)), list(range(30, 60)), list(range(60, 90))]
BASE = 1_700_000_040


def _row(i):
    return (
        i,
        None if i % 5 == 0 else f"s{i}",      # s null when i % 5 == 0
        None if i % 3 == 0 else float(i),     # v null when i % 3 == 0
        BASE + (i // 30) * 60 + (i % 30),
    )


def _write_batches(spark, src):
    for ids in BATCHES:
        spark.createDataFrame(
            [_row(i) for i in ids], "id long, s string, v double, ts long"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts"))).coalesce(1).write.mode(
            "append"
        ).parquet(src)


def _stream(spark, src):
    return (
        spark.readStream.schema("id long, s string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _expected(k):
    ids = BATCHES[k]
    n = len(ids)
    nn_s = sum(1 for i in ids if i % 5 == 0)
    nn_v = sum(1 for i in ids if i % 3 == 0)
    return {
        ("s",): (n, nn_s, nn_s / n),
        ("v",): (n, nn_v, nn_v / n),
    }


def test_quality_monitor_golden_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)

    qm = quality_monitor_stream(
        _stream(spark, src), "ts", ["s", "v"],
        window="1 minute", watermark="0 seconds",
        max_null_frac=0.25, min_rows=25,
    )
    q = (
        qm.writeStream.outputMode("append")
        .format("memory")
        .queryName("qm_golden")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM qm_golden").collect()
    # append mode with a 0s watermark releases windows 0 and 1 (the last
    # window stays open), 2 columns each
    assert len(rows) == 4
    got = {}
    for r in rows:
        k = (r.window_start.timestamp() - BASE) // 60
        got[(int(k), r.column)] = (
            r.n_rows, r.n_null, r.null_frac, r.is_incomplete, r.is_low_volume
        )
    for k in (0, 1):
        exp = _expected(k)
        for col in ("s", "v"):
            n, nn, frac = exp[(col,)]
            assert got[(k, col)] == (n, nn, frac, frac > 0.25, n < 25), (k, col)
    # the fixture is non-vacuous on BOTH verdicts: v (every 3rd null,
    # frac ≈ 0.33) trips is_incomplete, s (every 5th) does not
    assert got[(0, "v")][3] is True and got[(0, "s")][3] is False


def test_quality_monitor_agrees_with_batch_completeness(spark, tmp_path):
    """Streaming per-window rows == batch checks.completeness grouped by
    the same tumbling window, on the released windows."""
    src = str(tmp_path / "src")
    _write_batches(spark, src)

    qm = quality_monitor_stream(
        _stream(spark, src), "ts", ["s", "v"],
        window="1 minute", watermark="0 seconds", max_null_frac=0.25,
    )
    q = (
        qm.writeStream.outputMode("append")
        .format("memory")
        .queryName("qm_agree")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.window_start, r.column): (r.n_rows, r.n_null, r.null_frac, r.is_incomplete)
        for r in spark.sql("SELECT * FROM qm_agree").collect()
    }

    batch = (
        spark.read.parquet(src)
        .withColumn("w", F.window("ts", "1 minute"))
        .withColumn("window_start", F.col("w.start"))
    )
    want = {
        (r["window_start"], r["column"]): (
            r["n_rows"], r["n_null"], r["null_frac"], r["is_incomplete"]
        )
        for r in checks.completeness(
            batch.select("window_start", "s", "v"), ["window_start"],
            ["s", "v"], max_null_frac=0.25,
        ).collect()
        if (r["window_start"], "s") in got or (r["window_start"], "v") in got
    }
    want = {k: v for k, v in want.items() if k in got}
    assert got == want and len(got) == 4


def test_quality_monitor_bad_params(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    st = _stream(spark, src)
    with pytest.raises(ValueError):
        quality_monitor_stream(st, "ts", [])
    with pytest.raises(ValueError):
        quality_monitor_stream(st, "ts", ["s"], max_null_frac=1.0)
    with pytest.raises(ValueError):
        quality_monitor_stream(st, "ts", ["s"], min_rows=-1)


def test_quality_monitor_distinctness_golden(spark, tmp_path):
    """distinct_rsd adds HLL cardinality to the SAME stateful agg: per
    closed window, n_distinct (exact at these small cardinalities — HLL++
    stays in its sparse-exact regime) and the live is_constant verdict."""
    src = str(tmp_path / "src2")
    for ids in BATCHES:
        spark.createDataFrame(
            [(i, None if i % 5 == 0 else f"s{i}", "k", BASE + (i // 30) * 60 + (i % 30))
             for i in ids],
            "id long, s string, c string, ts long",
        ).withColumn("ts", F.timestamp_seconds(F.col("ts"))).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    qm = quality_monitor_stream(
        spark.readStream.schema("id long, s string, c string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "ts", ["s", "c"],
        window="1 minute", watermark="0 seconds", distinct_rsd=0.05,
    )
    q = (
        qm.writeStream.outputMode("append")
        .format("memory")
        .queryName("qm_distinct")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM qm_distinct").collect()
    assert len(rows) == 4  # windows 0 and 1 closed, 2 columns each
    got = {(r["window_start"], r["column"]): r for r in rows}
    for (ws, col), r in got.items():
        if col == "s":
            assert r["n_distinct"] == 24 and not r["is_constant"], r  # 30 - 6 nulls, all unique
        else:
            assert r["n_distinct"] == 1 and r["is_constant"], r


def test_quality_monitor_distinctness_agrees_with_batch(spark, tmp_path):
    """The streaming HLL estimate must equal batch
    checks.distinctness(exact=False) at the same rsd over the same
    windows — shared estimator, so tail and backfill agree."""
    src = str(tmp_path / "src3")
    _write_batches(spark, src)

    qm = quality_monitor_stream(
        _stream(spark, src), "ts", ["s", "v"],
        window="1 minute", watermark="0 seconds", distinct_rsd=0.05,
    )
    q = (
        qm.writeStream.outputMode("append")
        .format("memory")
        .queryName("qm_agree")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = {
        (r["window_start"], r["column"]): r["n_distinct"]
        for r in spark.sql("SELECT * FROM qm_agree").collect()
    }

    batch = spark.read.parquet(src).withColumn(
        "w", F.window(F.col("ts"), "1 minute").getField("start")
    )
    batch_rows = {
        (r["w"], r["column"]): r["n_distinct"]
        for r in checks.distinctness(
            batch, ["w"], ["s", "v"], exact=False, rsd=0.05
        ).collect()
    }
    assert stream_rows  # closed windows only
    for k, v in stream_rows.items():
        assert batch_rows[k] == v, k


def test_quality_monitor_bad_distinct_rsd(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        quality_monitor_stream(df, "timestamp", ["value"], distinct_rsd=1.5)
