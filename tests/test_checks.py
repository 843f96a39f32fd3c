"""Dataset-shape quality checks (operators/checks.py) and the zero-decode
image header validation (operators/multimodal.py header_check)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.functions import codec
from xmlschema_spark.operators import checks, multimodal


def _ts(day, h=0, m=0, s=0, us=0):
    return dt.datetime(2024, 1, day, h, m, s, us)


# ---------------------------------------------------------------------------
# fd_violations
# ---------------------------------------------------------------------------

def test_fd_violations_finds_multi_valued_groups(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("a", 1, "x"),   # duplicate row, same value — NOT a violation
            ("b", 2, "x"),
            ("b", 2, "y"),   # b -> {x, y}
            ("c", 3, None),  # null dependent ignored by count(distinct)
            ("c", 3, "z"),
        ],
        "k string, n int, v string",
    )
    out = {
        r["k"]: (r["n_values"], r["min_value"], r["max_value"])
        for r in checks.fd_violations(df, ["k"], "v").collect()
    }
    assert out == {"b": (2, "x", "y")}


def test_fd_violations_multi_column_determinant(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 2, 30)], "k string, n int, v int"
    )
    rows = checks.fd_violations(df, ["k", "n"], "v").collect()
    assert [(r["k"], r["n"], r["n_values"]) for r in rows] == [("a", 2, 2)]


def test_fd_violations_validates_args(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="at least one column"):
        checks.fd_violations(df, [], "v")
    with pytest.raises(ValueError, match="itself a determinant"):
        checks.fd_violations(df, ["v"], "v")


# ---------------------------------------------------------------------------
# time_gaps
# ---------------------------------------------------------------------------

def _gap_fixture(spark):
    rows = [
        # user u1: a within-day gap (Jan 1, 01:00 -> 09:00), a midnight-
        # straddling gap (Jan 1 23:00 -> Jan 2 08:00), and a sub-threshold
        # pair (Jan 2 08:00 -> 09:00)
        ("u1", _ts(1, 1)), ("u1", _ts(1, 9)), ("u1", _ts(1, 23)),
        ("u1", _ts(2, 8)), ("u1", _ts(2, 9)),
        # user u2: an empty calendar day in between (Jan 1 -> Jan 3)
        ("u2", _ts(1, 12)), ("u2", _ts(3, 12)),
        # user u3: single event — no gap
        ("u3", _ts(1, 5)),
        # user u4: gap that straddles the threshold by exactly 1 µs
        ("u4", _ts(4, 0, 0, 0, 0)), ("u4", _ts(4, 6, 0, 0, 1)),
        # user u5: gap of exactly the threshold — NOT a gap (strict >)
        ("u5", _ts(5, 0)), ("u5", _ts(5, 6)),
    ]
    return spark.createDataFrame(rows, "user string, ts timestamp")


def test_time_gaps_single_window_golden(spark):
    out = checks.time_gaps(_gap_fixture(spark), "user", "ts", 6 * 3600)
    got = sorted((r["user"], r["gap_us"]) for r in out.collect())
    assert got == [
        ("u1", 8 * 3600 * 1_000_000),   # Jan 1 01:00 -> 09:00
        ("u1", 9 * 3600 * 1_000_000),   # Jan 1 23:00 -> Jan 2 08:00
        ("u1", 14 * 3600 * 1_000_000),  # Jan 1 09:00 -> 23:00
        ("u2", 48 * 3600 * 1_000_000),
        ("u4", 6 * 3600 * 1_000_000 + 1),
    ]


def test_time_gaps_split_equals_single_window(spark):
    df = _gap_fixture(spark)
    single = sorted(map(tuple, checks.time_gaps(df, "user", "ts", 6 * 3600).collect()))
    for unit in ("day", "hour"):
        split = sorted(
            map(tuple, checks.time_gaps(df, "user", "ts", 6 * 3600, split_by=unit).collect())
        )
        assert split == single, unit


def test_time_gaps_validates_args(spark):
    df = _gap_fixture(spark)
    with pytest.raises(ValueError, match="min_gap_sec"):
        checks.time_gaps(df, "user", "ts", 0)


# ---------------------------------------------------------------------------
# volume_anomaly
# ---------------------------------------------------------------------------

def test_volume_anomaly_flags_outlier_partition(spark):
    # five groups: counts 10, 10, 10, 11, 100 -> median 10, MAD 0 except
    # deviations {0,0,0,1,90}: MAD = median(|n-10|) = median(0,0,0,1,90) = 0
    rows = (
        [("g1", i) for i in range(10)]
        + [("g2", i) for i in range(10)]
        + [("g3", i) for i in range(10)]
        + [("g4", i) for i in range(11)]
        + [("g5", i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "g string, x int")
    out = {r["g"]: r for r in checks.volume_anomaly(df, ["g"], k=3.0).collect()}
    assert out["g1"]["med_n"] == 10.0 and out["g1"]["mad_n"] == 0.0
    # MAD 0: any deviation flags
    assert not out["g1"]["is_anomaly"] and not out["g2"]["is_anomaly"]
    assert out["g4"]["is_anomaly"] and out["g5"]["is_anomaly"]


def test_volume_anomaly_interpolated_median(spark):
    # four groups: counts 1, 2, 3, 4 -> median 2.5 (interpolated),
    # deviations {1.5, .5, .5, 1.5} -> MAD 1.0; k=1 flags the extremes
    rows = [("a", 0)] + [("b", i) for i in range(2)] + \
           [("c", i) for i in range(3)] + [("d", i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, x int")
    out = {r["g"]: r for r in checks.volume_anomaly(df, ["g"], k=1.0).collect()}
    assert out["a"]["med_n"] == 2.5 and out["a"]["mad_n"] == 1.0
    assert out["a"]["is_anomaly"] and out["d"]["is_anomaly"]
    assert not out["b"]["is_anomaly"] and not out["c"]["is_anomaly"]


def test_volume_anomaly_approx_mode_smoke(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "g string, x int")
    out = checks.volume_anomaly(df, ["g"], k=3.0, exact=False).collect()
    assert {r["g"]: r["n_rows"] for r in out} == {"a": 2, "b": 1}


def test_volume_anomaly_validates_args(spark):
    df = spark.createDataFrame([("a", 1)], "g string, x int")
    with pytest.raises(ValueError, match="group_cols"):
        checks.volume_anomaly(df, [], k=3.0)
    with pytest.raises(ValueError, match="k must"):
        checks.volume_anomaly(df, ["g"], k=0)


# ---------------------------------------------------------------------------
# header_check (pure-Catalyst container-header validation)
# ---------------------------------------------------------------------------

def _img_rows():
    import numpy as np

    px = np.zeros((3, 5, 3), dtype=np.uint8)
    good = codec.encode_image(px, "png")          # header: XPNG w=5 h=3
    other = codec.encode_image(px, "jpeg")        # header: XJPG
    return [
        ("ok", good, 5, 3, "png", "p0"),
        ("wrong_fmt", other, 5, 3, "png", "p0"),     # declared png, header jpeg
        ("wrong_w", good, 6, 3, "png", "p0"),        # declared w != header w
        ("wrong_h", good, 5, 9, "png", "p1"),        # declared h != header h
        ("short", good[:7], 5, 3, "png", "p1"),      # truncated below 12 bytes
        ("alien", b"GIF8" + b"\x00" * 8, 5, 3, "png", "p1"),  # unknown magic
        ("null_bytes", None, 5, 3, "png", "p1"),     # not_null's job, skipped
        ("null_meta", good, None, None, None, "p1"),  # null declared: skipped
    ]


def test_header_fields_roundtrip(spark):
    df = spark.createDataFrame(
        _img_rows(), "image_id string, bytes binary, w int, h int, fmt string, part string"
    )
    hf = multimodal.header_fields(F.col("bytes"))
    row = {
        r["image_id"]: r
        for r in df.select("image_id", *[v.alias(k) for k, v in hf.items()]).collect()
    }
    assert (row["ok"]["header_fmt"], row["ok"]["header_w"], row["ok"]["header_h"]) == ("png", 5, 3)
    assert row["wrong_fmt"]["header_fmt"] == "jpeg"
    assert row["alien"]["header_fmt"] is None
    assert row["null_bytes"]["header_fmt"] is None


def test_header_check_violations(spark):
    df = spark.createDataFrame(
        _img_rows(), "image_id string, bytes binary, w int, h int, fmt string, part string"
    )
    out = multimodal.header_check(df, part_col="part")
    got = sorted((r["row_id"], r["rule_id"], r["partition_id"]) for r in out.collect())
    assert got == [
        ("alien", "header_magic", "p1"),
        ("short", "header_short", "p1"),
        ("wrong_fmt", "header_fmt_match", "p0"),
        ("wrong_h", "header_h_match", "p1"),
        ("wrong_w", "header_w_match", "p0"),
    ]
    assert all(r["severity"] == "error" for r in out.collect())


def test_header_consistent_rule_kind_through_engine(spark):
    """The registered ``header_consistent`` kind: header validation as a
    declarative ruleset entry, flowing through the engine's normal
    violation/verdict path with facet NULL semantics."""
    from xmlschema_spark.engine import ValidationEngine
    from xmlschema_spark.rules import Rule, RuleSet

    df = spark.createDataFrame(
        _img_rows(), "image_id string, bytes binary, w int, h int, fmt string, part string"
    )
    rules = RuleSet(
        [
            Rule("hdr_all", "header_consistent", "bytes"),
            Rule("hdr_w", "header_consistent", "bytes", {"check": "w"}),
        ]
    )
    eng = ValidationEngine(rules, id_col="image_id", partition_col="part")
    res = eng.validate(df, run_id="hdr", with_stats=False)
    got = sorted(
        (r["rule_id"], r["row_id"]) for r in res.violations.collect()
    )
    # hdr_all fires on every header defect; null bytes / null metadata pass
    assert got == [
        ("hdr_all", "alien"),
        ("hdr_all", "short"),
        ("hdr_all", "wrong_fmt"),
        ("hdr_all", "wrong_h"),
        ("hdr_all", "wrong_w"),
        ("hdr_w", "wrong_w"),
    ]


def test_header_consistent_rejects_bad_check(spark):
    from xmlschema_spark.compiler import compile_row_rule
    from xmlschema_spark.rules import Rule, RuleCompileError

    with pytest.raises(RuleCompileError, match="header_consistent check"):
        compile_row_rule(Rule("bad", "header_consistent", "bytes", {"check": "nope"}))


def test_header_check_is_pure_catalyst(spark):
    """No Python evaluation and no shuffle: the plan is scan + project +
    generate, all inside whole-stage codegen."""
    df = spark.createDataFrame(
        _img_rows(), "image_id string, bytes binary, w int, h int, fmt string, part string"
    )
    plan = multimodal.header_check(df, part_col="part")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas", "PythonUDF"):
        assert marker not in plan
