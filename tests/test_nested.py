"""Nested-data rules (round-2 verdict item #3): SURVEY §1.2 maps the
reference's complex types to StructType / ArrayType(StructType)
(converters.py:264-288). These tests prove facets actually apply to
struct fields (dotted paths) and to array elements (``each=True``,
optional ``field`` drill-in) — not just that name resolution "probably
works"."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.compiler import compile_row_rule
from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.rules import Rule, RuleCompileError, RuleSet


@pytest.fixture(scope="module")
def nested_df(spark):
    df = spark.createDataFrame(
        [
            (1, ("en", 200), ["alpha", "beta"], None),
            (2, ("de", 90), ["x", "elephantine"], None),  # meta.n < 100; short word
            (3, (None, None), None, None),  # null struct fields, null array
            (4, ("fr", 150), ["ok", None, "fine"], None),  # null element
        ],
        "id int, meta struct<lang:string,n:int>, words array<string>, pad string",
    )
    return df.withColumn(
        "chunks",
        F.transform(
            F.coalesce(F.col("words"), F.array()),
            lambda w: F.struct(w.alias("w"), F.length(w).alias("len")),
        ),
    )


def _failing_ids(df, rule):
    ok = compile_row_rule(rule)
    return {r.id for r in df.filter(~ok).select("id").collect()}


# ------------------------------------------------------------ struct fields


def test_struct_field_min(nested_df):
    r = Rule("n_min", "min", "meta.n", {"value": 100})
    # NULL field (row 3) passes — value-space facet semantics
    assert _failing_ids(nested_df, r) == {2}


def test_struct_field_not_null(nested_df):
    r = Rule("lang_req", "not_null", "meta.lang")
    assert _failing_ids(nested_df, r) == {3}


def test_struct_field_enumeration_and_pattern(nested_df):
    assert _failing_ids(
        nested_df, Rule("lang_enum", "enumeration", "meta.lang", {"values": ["en", "de"]})
    ) == {4}
    assert _failing_ids(
        nested_df, Rule("lang_pat", "pattern", "meta.lang", {"patterns": ["[a-z]{2}"]})
    ) == set()


# ------------------------------------------------------------ array elements


def test_each_min_length(nested_df):
    r = Rule("w_len", "min_length", "words", {"value": 2, "each": True})
    # row 2 has 'x'; row 3 NULL array passes; row 4's NULL element passes
    assert _failing_ids(nested_df, r) == {2}


def test_each_not_null_element(nested_df):
    """not_null with each=True is the nillable-item analog: a NULL
    *element* fails, a NULL array still passes."""
    r = Rule("w_req", "not_null", "words", {"each": True})
    assert _failing_ids(nested_df, r) == {4}


def test_each_with_field(nested_df):
    r = Rule("chunk_len", "min", "chunks", {"value": 2, "each": True, "field": "len"})
    assert _failing_ids(nested_df, r) == {2}


def test_each_pattern_java_lane(nested_df):
    r = Rule("w_pat", "pattern", "words", {"patterns": ["[a-z]+"], "each": True})
    assert _failing_ids(nested_df, r) == set()


def test_each_gate_combination(nested_df):
    """Gated each-rule: fires only where the row-level gate holds."""
    r = Rule(
        "w_len_en", "min_length", "words",
        {"value": 2, "each": True}, gate="meta.lang = 'de'",
    )
    assert _failing_ids(nested_df, r) == {2}
    r2 = Rule(
        "w_len_fr", "min_length", "words",
        {"value": 2, "each": True}, gate="meta.lang = 'en'",
    )
    assert _failing_ids(nested_df, r2) == set()


def test_each_no_explode(nested_df):
    """each=True compiles to forall — ONE codegen expression, no Generate
    (explode) node, so a 10^12-row table never blows up row counts."""
    ok = compile_row_rule(Rule("w_len", "min_length", "words", {"value": 2, "each": True}))
    plan = nested_df.filter(~ok)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "forall" in plan.lower()


# ------------------------------------------------------ compile-time checks


def test_schema_check_resolves_nested_paths(spark, nested_df):
    rs = RuleSet(
        [
            Rule("a", "min", "meta.n", {"value": 1}),
            Rule("b", "max_length", "words", {"value": 20, "each": True}),
            Rule("c", "min", "chunks", {"value": 0, "each": True, "field": "len"}),
        ]
    )
    rs.validate_against_schema(nested_df.schema)  # must not raise


def test_schema_check_rejects_missing_struct_field(nested_df):
    rs = RuleSet([Rule("a", "min", "meta.nope", {"value": 1})])
    with pytest.raises(RuleCompileError, match="nope"):
        rs.validate_against_schema(nested_df.schema)


def test_schema_check_rejects_each_on_non_array(nested_df):
    rs = RuleSet([Rule("a", "min_length", "pad", {"value": 1, "each": True})])
    with pytest.raises(RuleCompileError, match="array"):
        rs.validate_against_schema(nested_df.schema)


def test_schema_check_applicability_on_element_type(nested_df):
    """Facet applicability (builtins.py:39-61 analog) is checked against
    the ELEMENT type for each=True rules: pattern on array<struct> without
    a string field is rejected."""
    rs = RuleSet([Rule("a", "pattern", "chunks", {"patterns": ["x"], "each": True, "field": "len"})])
    with pytest.raises(RuleCompileError, match="not applicable"):
        rs.validate_against_schema(nested_df.schema)


def test_each_rejects_udf_fallback_pattern():
    """Patterns needing the Python-re fallback cannot run inside forall —
    must fail at COMPILE time with a clear message, not at plan time."""
    r = Rule("a", "pattern", "words", {"patterns": ["[\\I]+"], "each": True})
    with pytest.raises(RuleCompileError, match="fallback"):
        compile_row_rule(r)


def test_each_rejects_assertion_sql():
    with pytest.raises(RuleCompileError, match="each"):
        compile_row_rule(Rule("a", "assertion_sql", "words", {"sql": "1=1", "each": True}))


# ------------------------------------------------------ engine integration


def test_engine_violations_on_nested(spark, nested_df):
    rs = RuleSet(
        [
            Rule("n_min", "min", "meta.n", {"value": 100}),
            Rule("w_len", "min_length", "words", {"value": 2, "each": True}),
        ]
    )
    eng = ValidationEngine(rs, id_col="id")
    v = eng.row_violations(nested_df.withColumn("part", F.lit("p0")), run_id="r")
    got = {(r.rule_id, r.row_id) for r in v.collect()}
    assert got == {("n_min", "2"), ("w_len", "2")}
    reasons = {r.rule_id: r.reason for r in v.collect()}
    assert "[each element]" in reasons["w_len"]


def test_consistency_separates_each_from_array_facets():
    """min_length(each element) and max_length(array size) on the same
    column are DIFFERENT value spaces — the facet-consistency check must
    not merge them into one group (would falsely raise minLength >
    maxLength here)."""
    RuleSet(
        [
            Rule("w_each", "min_length", "words", {"value": 5, "each": True}),
            Rule("w_size", "max_length", "words", {"value": 3}),
        ]
    )._check_consistency()  # must not raise
