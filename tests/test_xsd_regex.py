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
