"""Rule-table compile-time validation (analog of the reference's
schema-parse error tests, tests/test_schemas.py)."""

import pytest
from pyspark.sql import types as T

from xmlschema_spark.rules import Rule, RuleCompileError, RuleSet

SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


def test_unknown_kind_rejected():
    with pytest.raises(RuleCompileError):
        Rule("r", "frobnicate", "w")


def test_duplicate_rule_id_rejected():
    with pytest.raises(RuleCompileError, match="duplicate"):
        RuleSet([Rule("r1", "not_null", "w"), Rule("r1", "max", "w", {"value": 5})])


def test_facet_applicability():
    # pattern on numeric column = inapplicable facet (builtins.py:39-61 analog)
    rs = RuleSet([Rule("r1", "pattern", "w", {"patterns": ["a"]})])
    with pytest.raises(RuleCompileError, match="not applicable"):
        rs.validate_against_schema(SCHEMA)
    # fraction_digits on string = inapplicable
    rs = RuleSet([Rule("r2", "fraction_digits", "caption", {"value": 2})])
    with pytest.raises(RuleCompileError, match="not applicable"):
        rs.validate_against_schema(SCHEMA)
    # length on binary = fine (facets.py:165-172)
    RuleSet([Rule("r3", "max_length", "bytes", {"value": 10})]).validate_against_schema(SCHEMA)
    # occurs on array = fine
    RuleSet([Rule("r4", "occurs", "tags", {"min": 1, "max": 5})]).validate_against_schema(SCHEMA)


def test_unknown_column_rejected():
    rs = RuleSet([Rule("r1", "not_null", "nope")])
    with pytest.raises(RuleCompileError, match="not in schema"):
        rs.validate_against_schema(SCHEMA)


def test_min_max_consistency():
    # min > max is a schema error (simple_types.py:199-228 analog)
    rs = RuleSet(
        [
            Rule("r1", "min", "w", {"value": 10}),
            Rule("r2", "max", "w", {"value": 5}),
        ]
    )
    with pytest.raises(RuleCompileError, match="min"):
        rs.validate_against_schema(SCHEMA)


def test_json_roundtrip():
    rs = RuleSet(
        [
            Rule("a", "min", "w", {"value": 1}),
            Rule("b", "unique", "", {"columns": ["image_id"]}, scope="table"),
        ]
    )
    rs2 = RuleSet.from_json(rs.to_json())
    assert [r.rule_id for r in rs2] == ["a", "b"]
    assert rs2.rules[1].params["columns"] == ["image_id"]


def test_kind_partitions():
    rs = RuleSet(
        [
            Rule("a", "min", "w", {"value": 1}),
            Rule("b", "unique", "", {"columns": ["image_id"]}),
            Rule("c", "decode_image", "bytes"),
        ]
    )
    assert [r.rule_id for r in rs.row_rules] == ["a"]
    assert [r.rule_id for r in rs.set_rules] == ["b"]
    assert [r.rule_id for r in rs.dataset_rules] == ["c"]


def _rs(*rules):
    return RuleSet(list(rules))


def test_restriction_accepts_narrowing():
    base = _rs(
        Rule("b1", "min", "x", {"value": 0}),
        Rule("b2", "max", "x", {"value": 100}),
        Rule("b3", "enumeration", "lang", {"values": ["en", "de", "fr"]}),
        Rule("b4", "min_length", "s", {"value": 2}),
        Rule("b5", "pattern", "s", {"patterns": ["[a-z]+"]}),
    )
    derived = _rs(
        Rule("d1", "min_exclusive", "x", {"value": 0}),   # tightens [0 → (0
        Rule("d2", "max", "x", {"value": 50}),
        Rule("d3", "enumeration", "lang", {"values": ["en", "de"]}),
        Rule("d4", "min_length", "s", {"value": 5}),
        Rule("d5", "pattern", "s", {"patterns": ["[a-z]+"]}),  # inherited, kept
        Rule("d6", "max_length", "s", {"value": 99}),      # added facet: fine
    )
    derived.check_restriction_of(base)  # should not raise


def test_restriction_rejects_widening():
    import pytest

    base = _rs(
        Rule("b1", "min", "x", {"value": 10}),
        Rule("b2", "enumeration", "lang", {"values": ["en"]}),
        Rule("b3", "not_null", "s", {}),
        Rule("b4", "occurs", "w", {"min": 1, "max": 5}),
        Rule("b5", "fixed", "lang", {"value": "en"}),
        Rule("b6", "length", "code", {"value": 3}),
    )
    derived = _rs(
        Rule("d1", "min", "x", {"value": 5}),              # widens lower bound
        Rule("d2", "enumeration", "lang", {"values": ["en", "xx"]}),  # adds value
        # not_null dropped — required became optional
        Rule("d4", "occurs", "w", {"min": 0, "max": 9}),   # widens both ways
        Rule("d5", "fixed", "lang", {"value": "de"}),      # altered fixed
        Rule("d6", "length", "code", {"value": 4}),        # altered exact length
    )
    with pytest.raises(RuleCompileError) as e:
        derived.check_restriction_of(base)
    msg = str(e.value)
    for frag in (
        "lower bound",
        "adds values ['xx']",
        "cannot become optional",
        "occurs [0, 9] widens",
        "fixed value must be kept",
        "exact base length",
    ):
        assert frag in msg, f"missing {frag!r} in:\n{msg}"


def test_restriction_rejects_dropped_inherited_facet():
    import pytest

    base = _rs(Rule("b1", "pattern", "s", {"patterns": ["[a-z]+"]}))
    with pytest.raises(RuleCompileError, match="must reappear"):
        _rs(Rule("d1", "min_length", "s", {"value": 1})).check_restriction_of(base)
