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


def test_duration_encode_roundtrip(spark):
    """encode(parse(x)) is canonical and parse(encode(iv)) == iv — the
    decode → validate → encode round trip for durations (iter_encode
    analog)."""
    from xmlschema_spark.encode import canonical_lexical

    df = spark.createDataFrame(
        [("P1DT2H",), ("PT90M",), ("-PT30.5S",), ("P3D",), ("PT0S",),
         ("P1DT0.25S",), (None,)],
        "s string",
    ).withColumn("iv", parse_daytime_duration(F.col("s")))
    enc = df.withColumn("lex", canonical_lexical(F.col("iv"), "dayTimeDuration"))
    enc = enc.withColumn("iv2", parse_daytime_duration(F.col("lex")))
    rows = enc.collect()
    got = {r.s: (r.lex, r.iv, r.iv2) for r in rows}
    assert got["P1DT2H"][0] == "P1DT2H"
    assert got["PT90M"][0] == "PT1H30M"  # canonical: minutes carried into hours
    assert got["-PT30.5S"][0] == "-PT30.5S"
    assert got["PT0S"][0] == "PT0S"
    assert got["P1DT0.25S"][0] == "P1DT0.25S"
    assert got[None][0] is None
    for s, (lex, iv, iv2) in got.items():
        assert iv == iv2, f"round-trip broke for {s}: {lex}"


def test_yearmonth_encode(spark):
    from xmlschema_spark.encode import canonical_lexical
    from xmlschema_spark.functions.durations import parse_yearmonth_duration

    df = spark.createDataFrame(
        [("P1Y2M",), ("-P3M",), ("P24M",), ("P0Y",)], "s string"
    ).withColumn(
        "lex",
        canonical_lexical(parse_yearmonth_duration(F.col("s")), "yearMonthDuration"),
    )
    got = {r.s: r.lex for r in df.collect()}
    assert got == {"P1Y2M": "P1Y2M", "-P3M": "-P3M", "P24M": "P2Y", "P0Y": "P0M"}


def test_daytime_roundtrip_property(spark):
    """Property: for any (sign, d, h, m, s·μs) the constructed lexical
    parses to the expected timedelta and re-encodes canonically to a form
    that parses back to the SAME interval (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xmlschema_spark.encode import canonical_lexical

    cases = []

    @settings(max_examples=60, deadline=None)
    @given(
        sign=st.sampled_from(["", "-"]),
        d=st.integers(0, 400),
        h=st.integers(0, 30),
        m=st.integers(0, 70),
        us=st.integers(0, 10**6 * 80),
    )
    def collect(sign, d, h, m, us):
        lex = f"{sign}P{d}DT{h}H{m}M{us / 10**6}S"
        want = (-1 if sign else 1) * datetime.timedelta(
            days=d, hours=h, minutes=m, microseconds=us
        )
        cases.append((lex, want))

    collect()
    df = spark.createDataFrame(cases, "lex string, want interval day to second")
    out = df.withColumn("iv", parse_daytime_duration(F.col("lex"))).withColumn(
        "iv2",
        parse_daytime_duration(
            canonical_lexical(F.col("iv"), "dayTimeDuration")
        ),
    )
    bad = out.filter(
        ~(F.col("iv") == F.col("want")) | ~(F.col("iv2") == F.col("iv"))
    ).count()
    assert bad == 0


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
