"""End-to-end engine tests on the synthetic image table — the analog of
the reference's manifest-driven golden tests (tests/test_factory.py:116-193:
fixture + expected error count)."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.rules import Rule, RuleSet
from xmlschema_spark.sources.images import generate_images_df
from xmlschema_spark.sources.rules_loader import default_image_ruleset

N = 200


@pytest.fixture(scope="module")
def clean_df(spark):
    df = generate_images_df(spark, N, seed=7)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def dirty_df(spark):
    # disjoint injected families: 10 null, 10 bad dims, 10 bad fmt,
    # 10 corrupt, 10 dup ids, 10 hot phash, 10 long captions, 10 bad ids
    df = generate_images_df(
        spark, N, seed=7,
        null_frac=0.05, bad_dims_frac=0.05, bad_fmt_frac=0.05,
        corrupt_frac=0.05, dup_id_frac=0.05, hot_phash_frac=0.05,
        long_caption_frac=0.05, bad_id_frac=0.05,
    )
    df.cache().count()
    return df


def test_clean_table_all_pass(spark, clean_df):
    rs = default_image_ruleset()
    rs.validate_against_schema(clean_df.schema)
    res = ValidationEngine(rs).validate(clean_df, run_id="clean")
    errors = res.violations.filter(F.col("severity") == "error")
    assert errors.count() == 0
    verdicts = {r.partition_id: r.status for r in res.verdicts.collect()}
    assert all(v == "PASS" for v in verdicts.values())


def test_dirty_table_expected_counts(spark, dirty_df):
    """Golden error counts per rule — the `--errors N` manifest analog."""
    res = ValidationEngine(default_image_ruleset()).validate(dirty_df, run_id="dirty")
    by_rule = {
        r.rule_id: r.n
        for r in res.violations.groupBy("rule_id").agg(F.count("*").alias("n")).collect()
    }
    # 10 rows have caption+fmt nulled
    assert by_rule.get("fmt_not_null") == 10
    # fmt enum: 10 'tiff' rows; the 10 null-fmt rows pass (facet null semantics)
    assert by_rule.get("fmt_enum") == 10
    assert by_rule.get("caption_len") == 10  # 600-char captions
    assert by_rule.get("id_pattern") == 10  # "BAD ID n"
    # duplicate semantics: ONE violation per duplicated VALUE (identities.py:217-221)
    assert by_rule.get("id_unique") == 1
    assert by_rule.get("phash_unique") == 1
    # decode rule: corrupt(10) + bad_dims(10) + null-fmt(10, declared fmt
    # NULL != container fmt) + bad_fmt(10, declared 'tiff' != container) = 40
    assert by_rule.get("decode") == 40
    # phash: the 10 hot-phash rows carry a forged sentinel hash that does
    # not match their pixels; corrupt rows can't decode (excluded here)
    assert by_rule.get("phash_ok") == 10


def test_verdict_partition_scope(spark, dirty_df):
    res = ValidationEngine(default_image_ruleset()).validate(dirty_df, run_id="v")
    verdicts = {r.partition_id: r for r in res.verdicts.collect()}
    assert "__table__" in verdicts  # table-scoped unique violations
    failed = [p for p, r in verdicts.items() if r.status == "FAIL"]
    assert len(failed) > 0
    total_viol = sum(r.violation_count for r in verdicts.values())
    errors = res.violations.filter(F.col("severity") == "error").count()
    assert total_viol == errors


def test_strict_mode_single_error(spark, dirty_df):
    res = ValidationEngine(default_image_ruleset()).validate(
        dirty_df, run_id="s", mode="strict"
    )
    assert res.violations.count() == 1


def test_strict_failfast_skips_decode(spark, dirty_df, monkeypatch):
    """strict = fail-fast at the first yield (xsdbase.py:698-701): with a
    row-rule violation present, the dataset branch (the expensive Arrow
    decode pass) must not even be PLAN-BUILT — asserted by making its
    entry point explode."""
    from xmlschema_spark import engine as engine_mod

    def _boom(*a, **k):
        raise AssertionError("decode_check must not run in strict mode "
                             "when a row-rule violation exists")

    monkeypatch.setattr(engine_mod.mm_ops, "decode_check", _boom)
    res = ValidationEngine(default_image_ruleset()).validate(
        dirty_df, run_id="ff", mode="strict", with_stats=False
    )
    assert res.violations.count() == 1
    res.unpersist()


def test_strict_falls_through_to_dataset(spark):
    """strict on data whose ONLY problem is a decode failure: the row and
    set branches come back clean, so the dataset branch runs and yields
    exactly one violation."""
    df = generate_images_df(spark, 60, seed=3, corrupt_frac=0.1, distributed=False)
    res = ValidationEngine(default_image_ruleset()).validate(
        df, run_id="ffd", mode="strict", with_stats=False
    )
    rows = res.violations.collect()
    assert len(rows) == 1 and rows[0].rule_id == "decode"
    res.unpersist()


def test_psvi_validity_triple(spark, dirty_df, clean_df):
    """PSVI attributes (xsdbase.py:62-92): skip ⇒ attempted 'none' /
    validity 'notKnown' (NOT a silent clean PASS); lax clean ⇒ 'full' /
    'valid'; strict stopped early ⇒ 'partial' and unviolated partitions
    are 'notKnown'."""
    eng = ValidationEngine(default_image_ruleset())
    skip = eng.validate(dirty_df, run_id="pv_s", mode="skip")
    for r in skip.verdicts.collect():
        assert (r.validation_attempted, r.validity) == ("none", "notKnown")

    lax = eng.validate(clean_df, run_id="pv_l", with_stats=False)
    for r in lax.verdicts.collect():
        assert (r.validation_attempted, r.validity) == ("full", "valid")
    lax.unpersist()

    strict = eng.validate(dirty_df, run_id="pv_f", mode="strict", with_stats=False)
    rows = strict.verdicts.collect()
    assert all(r.validation_attempted == "partial" for r in rows)
    assert {r.validity for r in rows} <= {"invalid", "notKnown"}
    assert sum(r.validity == "invalid" for r in rows) == 1
    strict.unpersist()


def test_skip_mode_no_checks(spark, dirty_df):
    res = ValidationEngine(default_image_ruleset()).validate(
        dirty_df, run_id="k", mode="skip"
    )
    assert res.violations.count() == 0
    assert res.stats is not None
    stats = {r.column: r for r in res.stats.collect()}
    assert stats["caption"].n_nulls == 10
    assert stats["image_id"].n_rows == N


def test_gated_rule_cta_analog(spark, clean_df):
    """Rules gated on fmt (XsdAlternative analog, elements.py:778-792)."""
    rs = RuleSet(
        [
            Rule("png_only_w", "max", "w", {"value": 0}, gate="fmt = 'png'"),
        ]
    )
    res = ValidationEngine(rs).validate(clean_df, run_id="g", with_stats=False)
    viols = res.violations.collect()
    n_png = clean_df.filter("fmt = 'png'").count()
    assert len(viols) == n_png  # every png fails w<=0; other fmts untouched
    assert all("[where fmt = 'png']" in v.reason for v in viols)


def test_assertion_and_null_semantics(spark):
    pdf_rows = [
        ("a", 2, 10),
        ("b", None, 10),  # null w: facet passes, assertion fails (null → false)
        ("c", 200, 10),
    ]
    df = spark.createDataFrame(pdf_rows, "image_id string, w int, h int").withColumn(
        "part", F.lit("p0")
    )
    rs = RuleSet(
        [
            Rule("w_max", "max", "w", {"value": 100}),
            Rule("area", "assertion_sql", "", {"sql": "w * h < 500"}),
        ]
    )
    res = ValidationEngine(rs).validate(df, run_id="n", with_stats=False)
    got = {(v.rule_id, v.row_id) for v in res.violations.collect()}
    assert got == {("w_max", "c"), ("area", "b"), ("area", "c")}
