"""xs:duration / dayTimeDuration / yearMonthDuration (round-2 verdict
item #8): lexical-space checks (builtins.py:243-248,507-518 analog) and
pure-Catalyst decode to Spark interval types, after which the ordinary
range facets apply (interval columns are class 'temporal')."""

import datetime

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.compiler import compile_row_rule
from xmlschema_spark.functions.durations import (
    parse_daytime_duration,
    parse_yearmonth_duration,
)
from xmlschema_spark.rules import Rule, RuleCompileError, RuleSet

VALID_ANY = ["P1Y", "P1M", "P1D", "PT1H", "PT1M", "PT1.5S", "P1Y2M3DT4H5M6S",
             "-P1D", "P1M2DT3H", "PT0S"]
INVALID_ANY = ["P", "PT", "P1S", "PT1D", "1D", "P-1D", "P1.5D", "p1d", "P1Y2M "]
DAYTIME_ONLY = ["P2D", "PT26H", "-PT30.5S", "P1DT2H3M4.5S"]
YEARMONTH_ONLY = ["P1Y", "P1Y2M", "-P3M"]


@pytest.fixture(scope="module")
def dur_df(spark):
    vals = VALID_ANY + INVALID_ANY + [None]
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")


def _passing(df, rule):
    return {r.s for r in df.filter(compile_row_rule(rule)).filter("s is not null").collect()}


def test_duration_lexical_any(dur_df):
    assert _passing(dur_df, Rule("a", "duration", "s")) == set(VALID_ANY)


def test_duration_lexical_variants(spark):
    df = spark.createDataFrame(
        [(v,) for v in DAYTIME_ONLY + YEARMONTH_ONLY + ["P1Y2M3DT4H"]], "s string"
    )
    dt = _passing(df, Rule("a", "duration", "s", {"variant": "dayTime"}))
    ym = _passing(df, Rule("b", "duration", "s", {"variant": "yearMonth"}))
    assert dt == set(DAYTIME_ONLY)
    assert ym == set(YEARMONTH_ONLY)


def test_duration_bad_variant():
    with pytest.raises(RuleCompileError, match="variant"):
        compile_row_rule(Rule("a", "duration", "s", {"variant": "weeks"}))


def test_parse_daytime_values(spark):
    df = spark.createDataFrame(
        [("P1DT2H",), ("PT90M",), ("-PT30.5S",), ("P1Y",), ("junk",), (None,)],
        "s string",
    )
    got = {
        r.s: r.iv
        for r in df.withColumn("iv", parse_daytime_duration(F.col("s"))).collect()
    }
    assert got["P1DT2H"] == datetime.timedelta(days=1, hours=2)
    assert got["PT90M"] == datetime.timedelta(minutes=90)
    assert got["-PT30.5S"] == -datetime.timedelta(seconds=30.5)
    assert got["P1Y"] is None and got["junk"] is None and got[None] is None


def test_parse_yearmonth_values(spark):
    df = spark.createDataFrame([("P1Y2M",), ("-P3M",), ("P1D",)], "s string")
    # PySpark can't deserialize YearMonthIntervalType values — compare the
    # canonical string form (the comparison itself stays JVM-side anyway)
    got = {
        r.s: r.iv
        for r in df.withColumn(
            "iv", parse_yearmonth_duration(F.col("s")).cast("string")
        ).collect()
    }
    assert got["P1Y2M"] == "INTERVAL '1-2' YEAR TO MONTH"
    assert got["-P3M"] == "INTERVAL '-0-3' YEAR TO MONTH"
    assert got["P1D"] is None


def test_range_facets_on_decoded_interval(spark):
    """min/max facets work on the decoded DayTimeIntervalType column —
    the value-space comparison the reference does on Duration objects."""
    df = spark.createDataFrame(
        [(1, "PT5M"), (2, "PT2H"), (3, "P3D"), (4, "junk"), (5, None)], "i int, s string"
    ).withColumn("iv", parse_daytime_duration(F.col("s")))
    rs = RuleSet(
        [
            Rule("iv_min", "min", "iv", {"value": datetime.timedelta(minutes=10)}),
            Rule("iv_max", "max", "iv", {"value": datetime.timedelta(days=2)}),
        ]
    )
    rs.validate_against_schema(df.schema)  # interval dtype → temporal class
    fail_min = {r.i for r in df.filter(~compile_row_rule(rs.rules[0])).collect()}
    fail_max = {r.i for r in df.filter(~compile_row_rule(rs.rules[1])).collect()}
    assert fail_min == {1} and fail_max == {3}  # NULL iv passes (4, 5)
