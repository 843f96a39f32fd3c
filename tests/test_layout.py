"""Z-order layout: Morton key correctness, re-layout locality, span audit."""

import pyspark.sql.functions as F
import pytest

from xmlschema_spark.operators import layout


def _morton(vals, bits):
    out = 0
    for i, v in enumerate(vals):
        v &= (1 << bits) - 1
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(i, (i * 37) % 1024, (i * 101) % 1024) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.z
        for r in df.withColumn("z", layout.zorder_key("x", "y", bits=10)).collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton([x, y], 10), (i, x, y)


def test_zorder_key_three_columns_and_masking(spark):
    df = spark.createDataFrame([(1, 5, 3, 7)], "id long, a long, b long, c long")
    z = df.select(layout.zorder_key("a", "b", "c", bits=2).alias("z")).first().z
    # a=01, b=11, c=11 (masked to 2 bits): bit layout j*3+i
    assert z == _morton([5, 3, 7], 2)


def test_zorder_key_null_propagates(spark):
    df = spark.createDataFrame([(None, 3)], "x long, y long")
    assert df.select(layout.zorder_key("x", "y", bits=4).alias("z")).first().z is None


def test_zorder_key_validation():
    with pytest.raises(ValueError):
        layout.zorder_key(bits=8)
    with pytest.raises(ValueError):
        layout.zorder_key("a", "b", bits=32)  # 64 bits > signed range


def test_zorder_layout_sorted_within_partitions(spark):
    rows = [(i, (i * 37) % 64, (i * 101) % 64) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = layout.zorder_layout(df, ["x", "y"], bits=6, num_files=4)
    def _check(it):
        keys = [r["__zkey"] for r in it]
        assert keys == sorted(keys)
        return iter([(len(keys),)])
    sizes = out.rdd.mapPartitions(_check).collect()
    assert sum(s[0] for s in sizes) == 500


def test_zorder_spans_beat_single_column_sort(spark):
    """The point of the curve: z-order narrows BOTH dimensions' spans,
    single-column sort narrows one and leaves the other full-width."""
    rows = [(i, i % 64, (i * 7 + i // 64) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    z = df.withColumn("k", layout.zorder_key("x", "y", bits=6))
    zrep = layout.layout_span_report(z, ["x", "y"], "k", buckets=16,
                                     tiebreak_col="id")
    zrows = zrep.collect()
    zrep.unpersist()

    s = df.withColumn("k", F.col("x").cast("long"))
    srep = layout.layout_span_report(s, ["x", "y"], "k", buckets=16,
                                     tiebreak_col="id")
    srows = srep.collect()
    srep.unpersist()

    def avg_span(rep, c):
        return sum(r[f"{c}_max"] - r[f"{c}_min"] for r in rep) / len(rep)

    # single-column sort: x razor-thin, y full-width (~63)
    assert avg_span(srows, "y") > 55
    # z-order: both dimensions well below full width
    assert avg_span(zrows, "x") < 40
    assert avg_span(zrows, "y") < 40
    assert sum(r.n for r in zrows) == 4096
    assert len(zrows) == 16


def test_span_report_bucket_arithmetic_exact(spark):
    """Bucket index = floor((rank-1)*buckets/total) over the (key, tie)
    total order — checked row-for-row against a python computation."""
    rows = [(i, (i * 13) % 5) for i in range(23)]  # repeated keys
    df = spark.createDataFrame(rows, "id long, k long")
    rep = layout.layout_span_report(df, ["id"], "k", buckets=4, tiebreak_col="id")
    got = sorted((r.bucket, r.n, r.id_min, r.id_max) for r in rep.collect())
    rep.unpersist()

    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    buckets = {}
    for rank, (i, _k) in enumerate(ordered):
        buckets.setdefault(rank * 4 // 23, []).append(i)
    expect = sorted(
        (b, len(ids), min(ids), max(ids)) for b, ids in buckets.items()
    )
    assert got == expect


def test_span_report_empty_input(spark):
    df = spark.createDataFrame([], "id long, k long")
    rep = layout.layout_span_report(df, ["id"], "k", buckets=4, tiebreak_col="id")
    assert rep.collect() == []
