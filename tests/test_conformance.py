"""Schema conformance, normalization, report formatters, whitespace facet,
and the custom-rule-kind extension registry."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.normalize import normalize_table
from xmlschema_spark.operators.schema_check import check_schema_conformance
from xmlschema_spark.report import format_report
from xmlschema_spark.rules import (
    CUSTOM_ROW_KINDS,
    Rule,
    RuleCompileError,
    RuleSet,
    register_rule_kind,
)

EXPECTED = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("caption", T.StringType(), True),
    ]
)


def test_schema_conformance_policies():
    actual = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("w", T.LongType(), True),      # widenable mismatch? int->bigint is widening, bigint actual vs int expected is NOT
            T.StructField("extra", T.DoubleType(), True),
        ]
    )
    strict = check_schema_conformance(actual, EXPECTED, "strict")
    kinds = {(v["kind"], v["column"]): v["severity"] for v in strict}
    assert kinds[("missing_optional", "caption")] == "warning"
    assert kinds[("unexpected_column", "extra")] == "error"
    assert ("type_mismatch", "w") in kinds

    lax = check_schema_conformance(actual, EXPECTED, "lax")
    assert {v["severity"] for v in lax if v["kind"] == "unexpected_column"} == {"warning"}

    skip = check_schema_conformance(actual, EXPECTED, "skip")
    assert not any(v["kind"] == "unexpected_column" for v in skip)

    with pytest.raises(ValueError):
        check_schema_conformance(actual, EXPECTED, "yolo")


def test_schema_conformance_widening_is_warning():
    actual = T.StructType([T.StructField("w", T.IntegerType(), True)])
    expected = T.StructType([T.StructField("w", T.LongType(), True)])
    (v,) = check_schema_conformance(actual, expected, "skip")
    assert v["kind"] == "type_mismatch" and v["severity"] == "warning"


def test_normalize_table(spark):
    df = spark.createDataFrame(
        [("  a\t b  ", None, "12"), ("x", "y", "zz")],
        "s string, d string, n string",
    )
    out = normalize_table(
        df,
        whitespace={"s": "collapse"},
        defaults={"d": "dflt"},
        casts={"n": "int"},
    ).collect()
    assert out[0].s == "a b" and out[0].d == "dflt" and out[0].n == 12
    assert out[1].n is None  # invalid lexical form → try_cast null


def test_whitespace_rule_kind(spark):
    df = spark.createDataFrame(
        [("ok", "a b"), ("bad", " a  b ")], "image_id string, s string"
    ).withColumn("part", F.lit("p"))
    rs = RuleSet([Rule("ws", "whitespace", "s", {"mode": "collapse"})])
    res = ValidationEngine(rs).validate(df, with_stats=False)
    rows = res.violations.collect()
    assert [r.row_id for r in rows] == ["bad"]
    assert "whiteSpace-collapse" in rows[0].reason


def test_finite_rule_kind(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", float("nan")), ("c", float("inf")), ("d", None)],
        "image_id string, v double",
    ).withColumn("part", F.lit("p"))
    rs = RuleSet([Rule("fin", "finite", "v")])
    res = ValidationEngine(rs).validate(df, with_stats=False)
    got = sorted(r.row_id for r in res.violations.collect())
    assert got == ["b", "c"]  # NULL passes (presence is not_null's job)


def test_normalize_renames_substitution_group_analog(spark):
    df = spark.createDataFrame([("x", 1)], "img_identifier string, w int")
    out = normalize_table(df, renames={"img_identifier": "image_id"})
    assert out.columns == ["image_id", "w"]
    with pytest.raises(ValueError, match="already present"):
        normalize_table(
            spark.createDataFrame([("x", "y")], "a string, image_id string"),
            renames={"a": "image_id"},
        )


def test_type_union_first_match(spark):
    """XsdUnion analog: valid iff any member type decodes (simple_types.py:887-898)."""
    df = spark.createDataFrame(
        [("a", "42"), ("b", "2020-03-01"), ("c", "nope"), ("d", None)],
        "image_id string, v string",
    ).withColumn("part", F.lit("p"))
    rs = RuleSet([Rule("u", "type_union", "v", {"types": ["int", "date"]})])
    res = ValidationEngine(rs).validate(df, with_stats=False)
    assert [r.row_id for r in res.violations.collect()] == ["c"]


def test_list_items_rule(spark):
    """XsdList analog: whitespace-separated items each valid (simple_types.py:726-732)."""
    df = spark.createDataFrame(
        [("a", "1 2 3"), ("b", "4 x 6"), ("c", "7"), ("d", "1 2 3 4 5 6")],
        "image_id string, v string",
    ).withColumn("part", F.lit("p"))
    rs = RuleSet(
        [Rule("l", "list_items", "v",
              {"item_type": "int", "min_items": 2, "max_items": 5})]
    )
    res = ValidationEngine(rs).validate(df, with_stats=False)
    got = sorted(r.row_id for r in res.violations.collect())
    assert got == ["b", "c", "d"]  # bad item / too few / too many


def test_custom_rule_kind_registry(spark):
    register_rule_kind(
        "even",
        lambda rule: (F.col(rule.column) % 2 == 0) | F.col(rule.column).isNull(),
        lambda rule: f"{rule.column} must be even",
    )
    try:
        df = spark.createDataFrame(
            [("a", 2), ("b", 3)], "image_id string, v int"
        ).withColumn("part", F.lit("p"))
        rs = RuleSet([Rule("even_v", "even", "v")])
        res = ValidationEngine(rs).validate(df, with_stats=False)
        rows = res.violations.collect()
        assert [r.row_id for r in rows] == ["b"]
        assert rows[0].reason == "v must be even"
        with pytest.raises(RuleCompileError):
            register_rule_kind("min", lambda r: None)  # can't shadow builtin
    finally:
        CUSTOM_ROW_KINDS.pop("even", None)


def test_report_formatters(spark):
    df = spark.createDataFrame(
        [("a", 200), ("b", 300), ("c", 5)], "image_id string, v int"
    ).withColumn("part", F.lit("p0"))
    rs = RuleSet([Rule("v_max", "max", "v", {"value": 100})])
    res = ValidationEngine(rs).validate(df, with_stats=False)

    flat = format_report(res.violations, "flat").collect()
    assert len(flat) == 2 and all('"rule_id":"v_max"' in r.report for r in flat)

    by_rule = format_report(res.violations, "by_rule").collect()
    assert len(by_rule) == 1
    assert by_rule[0].n_violations == 2 and by_rule[0].sample_rows == ["a", "b"]

    by_part = format_report(res.violations, "by_partition").collect()
    assert len(by_part) == 1 and '"v_max":2' in by_part[0].report

    with pytest.raises(ValueError):
        format_report(res.violations, "nope")
