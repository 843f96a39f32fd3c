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


# ------------------------------------------------- rule-table META-validation


def test_meta_ruleset_accepts_all_bundled_rulesets(spark):
    from xmlschema_spark.sources.rules_loader import (
        default_image_ruleset,
        meta_ruleset,
        validate_rules_document,
    )

    for rs in (default_image_ruleset(), meta_ruleset()):  # self-hosting
        res = validate_rules_document(spark, rs)
        assert res.violations.count() == 0
        verdicts = res.verdicts.collect()
        assert [v.status for v in verdicts] == ["PASS"]


def test_meta_ruleset_flags_malformed_document(spark, tmp_path):
    import json as _json

    from xmlschema_spark.sources.rules_loader import validate_rules_document

    doc = [
        {"rule_id": "ok_rule", "kind": "not_null", "column": "x"},
        {"rule_id": "ok_rule", "kind": "max", "column": "y",
         "params": {"value": 3}},                       # duplicate rule_id
        {"rule_id": "bad kind!", "kind": "frobnicate", "column": "x"},
        {"rule_id": "bad_sev", "kind": "not_null", "column": "x",
         "severity": "fatal"},
        {"rule_id": "set_with_col", "kind": "unique", "column": "x",
         "params": {"columns": ["x"]}},
        {"rule_id": "row_no_col", "kind": "pattern"},
        {"rule_id": "set_no_columns", "kind": "key",
         "params": {"other": 1}},
    ]
    p = tmp_path / "bad_rules.json"
    p.write_text(_json.dumps(doc))
    res = validate_rules_document(spark, str(p))
    got = {(r.rule_id, r.row_id) for r in res.violations.collect()}
    assert ("meta_id_unique", "ok_rule") in got
    assert ("meta_kind_known", "bad kind!") in got
    assert ("meta_id_pattern", "bad kind!") in got
    assert ("meta_severity_enum", "bad_sev") in got
    assert ("meta_set_kind_no_column", "set_with_col") in got
    assert ("meta_row_kind_has_column", "row_no_col") in got
    assert ("meta_set_kind_has_columns_param", "set_no_columns") in got
    # the well-formed rule contributes no violations
    assert not any(row == "ok_rule" and rid != "meta_id_unique"
                   for rid, row in got)
    # row-scope defects fail the __rules__ partition verdict; the
    # duplicate-id key constraint fails the __table__ verdict
    statuses = {v.partition_id: v.status for v in res.verdicts.collect()}
    assert statuses == {"__rules__": "FAIL", "__table__": "FAIL"}


def test_meta_ruleset_counts_registered_custom_kinds(spark):
    from xmlschema_spark import rules as rules_mod
    from xmlschema_spark.sources.rules_loader import meta_ruleset

    name = "meta_test_custom_kind"
    rules_mod.register_rule_kind(name, lambda r: None)
    try:
        meta = meta_ruleset()
        kind_rule = next(r for r in meta if r.rule_id == "meta_kind_known")
        assert name in kind_rule.params["values"]
    finally:
        rules_mod.CUSTOM_ROW_KINDS.pop(name, None)
