"""XSD duration types → Spark interval types.

The reference decodes ``xs:duration`` / ``xs:dayTimeDuration`` /
``xs:yearMonthDuration`` lexical forms (ISO-8601 ``-?PnYnMnDTnHnMnS``)
via elementpath's Duration.fromstring
(/root/reference/xmlschema/validators/builtins.py:243-248,507-518) and
compares values in the value space. Spark's native interval casts accept
only the ANSI ``d hh:mm:ss`` forms, so this module supplies:

- the XSD lexical-space regexes (Java-dialect, pure ``rlike``) for the
  three duration types — the grammar from XML Schema Part 2 §3.2.6: at
  least one component, and a ``T`` must be followed by at least one time
  component;
- pure-Catalyst decoders to ``DayTimeIntervalType`` /
  ``YearMonthIntervalType`` (``regexp_extract`` + ``make_dt_interval`` /
  ``make_ym_interval``), NULL where the lexical form is invalid — the
  ``to_python`` analog, after which the ordinary range facets apply
  (interval columns are class ``temporal`` in rules._dtype_class).

Everything is codegen-able; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = "[0-9]+"
_SEC = "[0-9]+(?:\\.[0-9]+)?"
# time part: hours[minutes[seconds]] | minutes[seconds] | seconds
_TIME = f"(?:{_NUM}H(?:{_NUM}M)?(?:{_SEC}S)?|{_NUM}M(?:{_SEC}S)?|{_SEC}S)"
# date part: years[months[days]] | months[days] | days
_DATE = f"(?:{_NUM}Y(?:{_NUM}M)?(?:{_NUM}D)?|{_NUM}M(?:{_NUM}D)?|{_NUM}D)"

#: full xs:duration lexical space (unanchored; callers wrap in ^...$)
DURATION_RE = f"-?P(?:{_DATE}(?:T{_TIME})?|T{_TIME})"
#: xs:dayTimeDuration — no year/month components (builtins.py:507-512)
DAYTIME_DURATION_RE = f"-?P(?:{_NUM}D(?:T{_TIME})?|T{_TIME})"
#: xs:yearMonthDuration — only year/month components (builtins.py:513-518)
YEARMONTH_DURATION_RE = f"-?P(?:{_NUM}Y(?:{_NUM}M)?|{_NUM}M)"

DURATION_VARIANTS = {
    "any": DURATION_RE,
    "dayTime": DAYTIME_DURATION_RE,
    "yearMonth": YEARMONTH_DURATION_RE,
}


def _part(col: Column, pattern: str, cast: str = "int") -> Column:
    """Extract one duration component as a number; absent → 0."""
    return F.coalesce(F.regexp_extract(col, pattern, 1).try_cast(cast), F.lit(0))


def _sign(col: Column) -> Column:
    return F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1))


def parse_daytime_duration(col: Column) -> Column:
    """``xs:dayTimeDuration`` lexical → ``DayTimeIntervalType``; NULL when
    the string is not in the dayTime lexical space (decode-failure analog
    of XMLSchemaDecodeError, simple_types.py:529-534)."""
    d = _part(col, "([0-9]+)D")
    h = _part(col, "([0-9]+)H")
    # minutes only after T (M before T would be months — excluded by the
    # lexical check anyway, but keep the extraction unambiguous)
    m = _part(col, "T(?:[0-9]+H)?([0-9]+)M")
    s = _part(col, "([0-9]+(?:\\.[0-9]+)?)S", cast="decimal(18,6)")
    iv = F.make_dt_interval(d, h, m, s) * _sign(col)
    return F.when(col.rlike(f"^{DAYTIME_DURATION_RE}$"), iv)


def parse_yearmonth_duration(col: Column) -> Column:
    """``xs:yearMonthDuration`` lexical → ``YearMonthIntervalType``."""
    y = _part(col, "([0-9]+)Y")
    m = _part(col, "([0-9]+)M")
    iv = F.make_ym_interval(y, m) * _sign(col)
    return F.when(col.rlike(f"^{YEARMONTH_DURATION_RE}$"), iv)
