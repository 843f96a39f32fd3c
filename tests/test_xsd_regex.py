"""XSD→Java regex translation (analog of tests/test_regex.py in the
reference, which tests XSD→Python translation)."""

import pytest

from xmlschema_spark.functions.xsd_regex import (
    XsdRegexError,
    xsd_patterns_to_java,
    xsd_to_java_regex,
)


def test_anchoring():
    assert xsd_to_java_regex("abc") == "^(?:abc)$"


def test_caret_dollar_are_literals():
    # XSD has no anchors: ^ and $ match themselves
    assert xsd_to_java_regex("a^b$c") == r"^(?:a\^b\$c)$"


def test_name_shorthands():
    out = xsd_to_java_regex(r"\i\c*")
    assert out.startswith("^(?:[")
    assert "A-Z_a-z" in out


def test_class_subtraction():
    out = xsd_to_java_regex(r"[a-z-[aeiou]]+")
    assert "&&[^aeiou]" in out


def test_unicode_block():
    out = xsd_to_java_regex(r"\p{IsBasicLatin}+")
    assert r"\p{InBasicLatin}+" in out


def test_multiple_patterns_alternation():
    out = xsd_patterns_to_java([r"\d{5}", r"\d{5}-\d{4}"])
    assert out.startswith("^(?:") and out.endswith(")$") and "|" in out


def test_untranslatable_raises():
    with pytest.raises(XsdRegexError):
        xsd_to_java_regex(r"[\I]")


def test_java_compatibility_via_python_re():
    # translated output (for these cases) is also valid Python regex —
    # spot-check semantics
    import re

    rex = re.compile(xsd_to_java_regex(r"img_[0-9a-f]{1,32}"))
    assert rex.match("img_00ff")
    assert not rex.match("ximg_00ff")
    assert not rex.match("img_00ff ")


# ---- Java-regex semantics via Spark rlike (class subtraction uses &&,
# ---- which Python re lacks — must be exercised JVM-side)

def test_spark_multi_pattern_any_match(spark):
    """N patterns = match at least one (facets.py:621-624), anchored."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("12345",), ("12345-6789",), ("1234",), ("abcde",), ("12345 ",)], "v string"
    )
    jre = xsd_patterns_to_java([r"\d{5}", r"\d{5}-\d{4}"])
    got = sorted(r.v for r in df.filter(F.col("v").rlike(jre)).collect())
    assert got == ["12345", "12345-6789"]


def test_spark_class_subtraction_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("bcdfg",), ("bacon",), ("xyz",)], "v string")
    jre = xsd_to_java_regex(r"[a-z-[aeiou]]+")
    got = sorted(r.v for r in df.filter(F.col("v").rlike(jre)).collect())
    assert got == ["bcdfg", "xyz"]  # 'bacon' contains vowels


def test_spark_name_shorthand_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("valid_name",), ("_x9",), ("9bad",), ("has space",)], "v string"
    )
    jre = xsd_to_java_regex(r"\i\c*")
    got = sorted(r.v for r in df.filter(F.col("v").rlike(jre)).collect())
    assert got == ["_x9", "valid_name"]  # digit start / space rejected


def test_spark_unicode_block_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("abc",), ("café",)], "v string")
    jre = xsd_to_java_regex(r"\p{IsBasicLatin}+")
    got = [r.v for r in df.filter(F.col("v").rlike(jre)).collect()]
    assert got == ["abc"]  # é is Latin-1 Supplement, outside BasicLatin


def test_spark_full_xml_name_ranges(spark):
    """\\i/\\c carry the FULL XML 1.0 NameStartChar/NameChar ranges
    (reference regex.py:38-45): Greek, Cyrillic, CJK, and astral-plane
    names are legal; digit/space/hyphen starts are not."""
    from pyspark.sql import functions as F

    names = [
        ("Ωμέγα", True), ("доклад_1", True), ("漢字テスト", True),
        ("\U00010000x", True), ("a:b:c", True),  # ':' is a name char
        ("9bad", False), ("has space", False), ("-lead", False),
    ]
    df = spark.createDataFrame([(v,) for v, _ in names], "v string")
    jre = xsd_to_java_regex(r"\i\c*")
    got = {r.v: r.m for r in df.select("v", F.col("v").rlike(jre).alias("m")).collect()}
    assert [got[v] for v, _ in names] == [e for _, e in names]
    # Python fallback lane agrees on every case
    import re

    from xmlschema_spark.functions.xsd_regex import xsd_to_python_regex

    pre = xsd_to_python_regex(r"\i\c*")
    assert [bool(re.fullmatch(pre, v)) for v, _ in names] == [e for _, e in names]


def test_qname_rule_full_ranges(spark):
    """The compiled qname kind accepts non-Latin NCNames and rejects
    multi-colon / digit-start forms."""
    from pyspark.sql import functions as F

    from xmlschema_spark.compiler import compile_row_rule
    from xmlschema_spark.rules import Rule

    cases = [
        ("Ωμέγα", True), ("ns:項目", True), ("доклад", True),
        ("a:b:c", False), ("9bad", False), (":lead", False),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v string")
    ok = compile_row_rule(Rule("q", "qname", "v", {}))
    got = {r.v: r.ok for r in df.select("v", ok.alias("ok")).collect()}
    assert [got[v] for v, _ in cases] == [e for _, e in cases]


def test_python_fallback_translation():
    """Python-re lane: constructs the Java lane rejects (in-class \\I/\\C)
    plus the shared dialect, via lookahead composition."""
    import re

    from xmlschema_spark.functions.xsd_regex import (
        XsdRegexError,
        xsd_patterns_to_python,
        xsd_to_python_regex,
    )

    # in-class complement: only NON-name-start chars
    p = xsd_patterns_to_python([r"[\I]+"])
    assert re.fullmatch(p, "!!??") and not re.fullmatch(p, "ab")
    # subtraction without && support: consonants only
    p2 = xsd_to_python_regex(r"[a-z-[aeiou]]+")
    assert re.fullmatch(p2, "xyz") and not re.fullmatch(p2, "bacon")
    # negated class containing a complement == the class itself
    p3 = xsd_to_python_regex(r"[^\I]+")
    assert re.fullmatch(p3, "Abc") and not re.fullmatch(p3, "a c")
    # \p has no Python-re form — must raise (the Java lane owns it)
    with pytest.raises(XsdRegexError):
        xsd_to_python_regex(r"\p{IsBasicLatin}+")
    # ^ and $ are literals in the XSD dialect
    p4 = xsd_to_python_regex(r"a^b$")
    assert re.fullmatch(p4, "a^b$")
