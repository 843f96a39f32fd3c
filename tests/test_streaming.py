"""Streaming validation: rate/memory-source micro-batch tests."""

import time

import pytest

from pyspark.sql import functions as F

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.rules import Rule, RuleSet
from xmlschema_spark.streaming import streaming_row_violations, validate_stream


def _engine():
    rs = RuleSet(
        [
            Rule("v_max", "max", "value", {"value": 5}),
            Rule("id_unique", "unique", "", {"columns": ["value"]}),
        ]
    )
    return ValidationEngine(rs, id_col="value", partition_col="pt")


def test_streaming_row_violations_is_streaming(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(F.col("value"), (F.col("value") % 2).cast("string").alias("pt"))
    )
    v = streaming_row_violations(_engine(), stream)
    assert v.isStreaming
    assert set(v.columns) == {
        "run_id", "partition_id", "rule_id", "row_id", "column", "value", "reason", "severity"
    }


def test_validate_stream_foreachbatch(spark, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(F.col("value"), (F.col("value") % 2).cast("string").alias("pt"))
    )
    q = validate_stream(_engine(), stream, sink, ckpt)
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            time.sleep(2)
            try:
                n = spark.read.parquet(sink).count()
            except Exception:
                continue
            if n > 0:
                break
        assert n > 0, "no violations written by the streaming query"
        out = spark.read.parquet(sink)
        # every value > 5 violates v_max; rate source is unique so the
        # per-batch unique rule contributes nothing
        assert out.filter(F.col("rule_id") == "v_max").count() > 0
        assert out.filter(F.col("rule_id") == "id_unique").count() == 0
    finally:
        q.stop()


def test_windowed_verdicts_emit_after_watermark(spark):
    """Event-time windowed verdict aggregation with late-data handling:
    rows emit once the watermark passes the window end."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
        .select(
            F.col("timestamp"), F.col("value"),
            (F.col("value") % 2).cast("string").alias("pt"),
        )
    )
    from xmlschema_spark.streaming.validate import windowed_verdicts

    eng = ValidationEngine(
        RuleSet([Rule("v_max", "max", "value", {"value": 100})]),
        id_col="value", partition_col="pt",
    )
    wv = windowed_verdicts(eng, stream, "timestamp", window="5 seconds", watermark="5 seconds")
    assert wv.isStreaming
    q = wv.writeStream.outputMode("append").format("memory").queryName("wv_t").start()
    try:
        deadline = time.time() + 120
        rows = []
        # poll until a FAIL window lands (under suite load the first
        # emitted batch can race the poll), bounded by the deadline
        while time.time() < deadline and not any(r.status == "FAIL" for r in rows):
            time.sleep(5)
            rows = spark.sql("SELECT * FROM wv_t").collect()
        assert rows, "no windowed verdicts emitted before deadline"
        by_part = {r.partition_id: r for r in rows}
        # values 0..~ : everything above 100 violates; early windows FAIL
        assert any(r.status == "FAIL" for r in rows)
        assert all(r.rows_checked >= r.violation_count for r in rows)
        assert set(by_part) <= {"0", "1"}
    finally:
        q.stop()


def test_cumulative_verdicts_stateful(spark):
    """applyInPandasWithState: running per-partition totals grow across
    micro-batches and never reset."""
    from xmlschema_spark.streaming.stateful import cumulative_verdicts

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "300").load()
        .select(F.col("value"), (F.col("value") % 2).cast("string").alias("pt"))
    )
    eng = ValidationEngine(
        RuleSet([Rule("v_max", "max", "value", {"value": 50})]),
        id_col="value", partition_col="pt",
    )
    cv = cumulative_verdicts(eng, stream)
    assert cv.isStreaming
    q = cv.writeStream.outputMode("update").format("memory").queryName("cv_t").start()
    try:
        deadline = time.time() + 90
        snapshots = []
        while time.time() < deadline:
            time.sleep(6)
            rows = spark.sql(
                "SELECT partition_id, max(rows_checked) rc, max(violation_count) vc "
                "FROM cv_t GROUP BY partition_id"
            ).collect()
            if rows:
                snapshots.append({r.partition_id: (r.rc, r.vc) for r in rows})
            if len(snapshots) >= 2 and snapshots[-1] != snapshots[0]:
                break
        assert len(snapshots) >= 2, "no stateful output observed"
        first, last = snapshots[0], snapshots[-1]
        # running totals are monotone per partition
        for p in first:
            assert last.get(p, (0, 0)) >= first[p]
        assert any(v[1] > 0 for v in last.values())  # values > 50 violate
    finally:
        q.stop()


def test_windowed_psi_streaming(spark, tmp_path):
    """Shifted stream vs uniform reference: windowed PSI flags the shift.
    Driven with a file source (deterministic event times) + memory sink."""
    import math

    from xmlschema_spark.operators.drift import reference_histogram
    from xmlschema_spark.streaming import windowed_psi

    # batch reference: uniform over [0, 100)
    ref = spark.range(10_000).select((F.col("id") % 100).cast("double").alias("v"))
    reference = reference_histogram(ref, "v", bins=10)
    assert abs(sum(reference[2]) - 1.0) < 1e-9

    # stream input: everything concentrated in the top decile → high PSI
    src = str(tmp_path / "src")
    spark.range(2_000).select(
        # minute-aligned base so all 60 offsets land in ONE tumbling window
        F.timestamp_seconds(F.lit(1_699_999_980) + F.col("id") % 60).alias("ts"),
        (95.0 + (F.col("id") % 5)).alias("v"),
    ).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
    out = windowed_psi(stream, "v", "ts", reference, window_duration="1 minute")
    q = (
        out.writeStream.format("memory").queryName("psi_out")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from psi_out").collect()
        assert len(rows) == 1
        assert rows[0]["n"] == 2_000
        # analytic PSI for all-mass-in-one-bucket vs uniform 0.1 each
        p = [1e-6] * 9 + [1.0 + 1e-6]
        want = sum(
            (pi - 0.1 - 1e-6) * (math.log(pi) - math.log(0.1 + 1e-6)) for pi in p
        )
        assert abs(rows[0]["psi"] - want) < 1e-6
    finally:
        q.stop()


def test_windowed_divergence_streaming(spark, tmp_path):
    """chi2 + jsd streaming drift vs uniform reference, asserted against
    the analytic all-mass-in-one-bucket values (same smoothing as the
    batch operator)."""
    import math

    from xmlschema_spark.operators.drift import reference_histogram
    from xmlschema_spark.streaming import windowed_divergence

    ref = spark.range(10_000).select((F.col("id") % 100).cast("double").alias("v"))
    reference = reference_histogram(ref, "v", bins=10)

    src = str(tmp_path / "src_div")
    spark.range(2_000).select(
        F.timestamp_seconds(F.lit(1_699_999_980) + F.col("id") % 60).alias("ts"),
        (95.0 + (F.col("id") % 5)).alias("v"),
    ).write.parquet(src)

    eps = 1e-6
    p = [eps] * 9 + [1.0 + eps]
    q = [0.1 + eps] * 10
    want_chi2 = 2_000 * sum((pi - qi) ** 2 / qi for pi, qi in zip(p, q))
    want_jsd = sum(
        0.5 * pi * math.log(pi / ((pi + qi) / 2)) + 0.5 * qi * math.log(qi / ((pi + qi) / 2))
        for pi, qi in zip(p, q)
    )

    for metric, want, rel in (("chi2", want_chi2, 1e-9), ("jsd", want_jsd, 1e-9)):
        stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
        out = windowed_divergence(stream, "v", "ts", reference, metric=metric,
                                  window_duration="1 minute")
        q_ = (
            out.writeStream.format("memory").queryName(f"div_{metric}")
            .outputMode("complete").start()
        )
        try:
            q_.processAllAvailable()
            rows = spark.sql(f"select * from div_{metric}").collect()
            assert len(rows) == 1 and rows[0]["n"] == 2_000
            assert rows[0][metric] == pytest.approx(want, rel=rel)
        finally:
            q_.stop()


def test_windowed_divergence_rejects_unknown_metric(spark):
    from xmlschema_spark.streaming import windowed_divergence

    with pytest.raises(ValueError):
        windowed_divergence(None, "v", "ts", (0.0, 1.0, [0.5, 0.5]), metric="tv")
