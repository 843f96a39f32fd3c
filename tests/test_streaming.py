"""Streaming validation: rate/memory-source micro-batch tests."""

import time

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
