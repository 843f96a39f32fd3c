"""Encode direction: typed values → canonical XSD lexical forms.

The reference's encode side (``iter_encode``/``from_json``,
/root/reference/xmlschema/validators/schema.py:1111-1180 and
groups.py:697-819) walks typed Python data back into lexical XML via the
``python_to_*`` encoders (builtins.py:169-217). Here the analog is a set
of Catalyst expressions producing the canonical lexical form per XSD
type, so a validated typed table can be serialized back to the lexical
space it was decoded from — completing the decode → validate → encode
round trip (round-trip equality is property-tested: ``try_cast`` of the
canonical form re-decodes to the original value).

Scope (deliberate v1, SURVEY §3.3): scalar simple types. Canonical rules:

- ``boolean`` → ``true``/``false`` (python_to_boolean lowercases,
  builtins.py:169-170; '1'/'0' are valid lexical but not canonical)
- ``decimal`` → trailing fractional zeros stripped, bare trailing ``.``
  dropped (``12.30`` → ``12.3``, ``45.00`` → ``45``)
- ``float``/``double`` → special values use XSD names ``NaN``, ``INF``,
  ``-INF``; finite values keep Spark's shortest-roundtrip repr
  (documented simplification: XSD canonical mantissa-E-exponent form is
  not reproduced, but the emitted form is valid lexical space and
  round-trips exactly)
- ``dateTime`` → ``yyyy-MM-dd'T'HH:mm:ss'Z'`` (UTC session timezone,
  second precision)
- ``date`` → ``yyyy-MM-dd``
- integers / ``string`` → plain cast

Everything is JVM-side codegen — no UDFs in the encode path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"byte", "short", "int", "integer", "long", "bigint"}


def canonical_lexical(col: Column, xsd_type: str) -> Column:
    """Canonical lexical string for ``col`` interpreted as ``xsd_type``.
    NULL stays NULL (absent value, not a lexical form)."""
    t = xsd_type.lower()
    if t == "boolean":
        return F.when(col.isNull(), F.lit(None).cast("string")).when(
            col.cast("boolean"), F.lit("true")
        ).otherwise(F.lit("false"))
    if t == "decimal":
        s = col.cast("string")
        no_frac_zeros = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
        return F.regexp_replace(no_frac_zeros, r"\.$", "")
    if t in ("float", "double"):
        c = col.cast("double")
        return (
            F.when(F.isnan(c), F.lit("NaN"))
            .when(c == float("inf"), F.lit("INF"))
            .when(c == float("-inf"), F.lit("-INF"))
            .otherwise(c.cast("string"))
        )
    if t in ("datetime", "timestamp"):
        return F.when(
            col.isNull(), F.lit(None).cast("string")
        ).otherwise(F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    if t == "date":
        return F.when(
            col.isNull(), F.lit(None).cast("string")
        ).otherwise(F.date_format(col, "yyyy-MM-dd"))
    if t in ("daytimeduration", "duration"):
        return _encode_daytime_duration(col)
    if t == "yearmonthduration":
        return _encode_yearmonth_duration(col)
    if t in _INT_TYPES or t == "string":
        return col.cast("string")
    raise ValueError(f"no canonical encoder for xsd type {xsd_type!r}")


def _encode_daytime_duration(col: Column) -> Column:
    """DayTimeIntervalType → canonical ``xs:dayTimeDuration`` lexical form
    (XSD Part 2 §3.3.x canonical mapping: zero components omitted, ``PT0S``
    for zero, fraction-second trailing zeros stripped). Inverse of
    ``functions.durations.parse_daytime_duration``; round-trip is
    property-tested. Pure arithmetic — no UDF."""
    neg = col < F.expr("INTERVAL '0' SECOND")
    d = F.abs(F.extract(F.lit("DAY"), col))
    h = F.abs(F.extract(F.lit("HOUR"), col))
    m = F.abs(F.extract(F.lit("MINUTE"), col))
    s = F.abs(F.extract(F.lit("SECOND"), col))  # decimal(8,6), fraction kept
    s_str = F.regexp_replace(
        F.regexp_replace(s.cast("string"), r"(\.\d*?)0+$", r"$1"),
        r"\.$", "",
    )
    time_part = F.concat(
        F.when(h > 0, F.concat(h.cast("string"), F.lit("H"))).otherwise(F.lit("")),
        F.when(m > 0, F.concat(m.cast("string"), F.lit("M"))).otherwise(F.lit("")),
        F.when(s > 0, F.concat(s_str, F.lit("S"))).otherwise(F.lit("")),
    )
    body = F.concat(
        F.when(d > 0, F.concat(d.cast("string"), F.lit("D"))).otherwise(F.lit("")),
        F.when(F.length(time_part) > 0, F.concat(F.lit("T"), time_part)).otherwise(F.lit("")),
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when(neg, F.lit("-")).otherwise(F.lit("")),
            F.lit("P"),
            F.when(F.length(body) > 0, body).otherwise(F.lit("T0S")),
        )
    )


def _encode_yearmonth_duration(col: Column) -> Column:
    """YearMonthIntervalType → canonical ``xs:yearMonthDuration`` (``P0M``
    for zero; zero components omitted)."""
    neg = col < F.expr("INTERVAL '0' MONTH")
    y = F.abs(F.extract(F.lit("YEAR"), col))
    m = F.abs(F.extract(F.lit("MONTH"), col))
    body = F.concat(
        F.when(y > 0, F.concat(y.cast("string"), F.lit("Y"))).otherwise(F.lit("")),
        F.when(m > 0, F.concat(m.cast("string"), F.lit("M"))).otherwise(F.lit("")),
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when(neg, F.lit("-")).otherwise(F.lit("")),
            F.lit("P"),
            F.when(F.length(body) > 0, body).otherwise(F.lit("0M")),
        )
    )


def encode_columns(df: DataFrame, mapping: dict[str, str], suffix: str = "__lex") -> DataFrame:
    """Add a canonical-lexical string column per (column → xsd_type) entry,
    named ``<col><suffix>`` — one projection, fused by codegen."""
    out = df
    for col_name, xsd_type in mapping.items():
        out = out.withColumn(
            f"{col_name}{suffix}", canonical_lexical(F.col(col_name), xsd_type)
        )
    return out
