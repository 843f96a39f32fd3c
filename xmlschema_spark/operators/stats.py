"""Per-column statistics profile — one wide aggregation, single pass.

North-star requirement (BASELINE.json): per-column null rate, min/max,
distinct estimate (HLL), value histograms. The analog in the reference is
its Counter-based occurrence bookkeeping (models.py:299, identities.py:199,
schema.py:989) — generalized to dataset statistics.

Everything is ONE ``df.agg(...)`` with 4–5 expressions per column, so
Catalyst computes all columns' stats in a single scan with partial
aggregation executor-side. The long-format reshape afterwards is driver
work over a 1-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _string_prefix_ordinal(col):
    """Order-preserving 7-byte UTF-8 prefix of a string as decimal(17,0):
    hex() gives the byte string (hex-digit order == byte order),
    right-zero-padded to fixed width so shorter strings sort first,
    conv() to a number whose aggregation buffer is a compact long."""
    return F.conv(F.rpad(F.substring(F.hex(col), 1, 14), 14, "0"), 16, 10).cast(
        "decimal(17,0)"
    )


def _string_prefix_decode(col):
    """Inverse presentation of :func:`_string_prefix_ordinal` — the
    readable prefix, zero-pad bytes stripped.

    The 7-byte prefix may split a multi-byte UTF-8 character, and on
    Spark 4.x ``decode(..., 'UTF-8')`` raises MALFORMED_CHARACTER_CODING
    on malformed input. So instead: raw binary→string cast (no
    validation), ``make_valid_utf8`` turns any dangling partial sequence
    into U+FFFD, and the trailing U+FFFD(s)/NUL padding are stripped —
    yielding a clean, complete-character prefix of the true min/max."""
    raw = F.unhex(F.lpad(F.hex(col.cast("bigint")), 14, "0")).cast("string")
    return F.regexp_replace(F.make_valid_utf8(raw), "[\u0000\uFFFD]+$", "")


def _bq(name: str) -> str:
    """Backtick-quote an identifier for selectExpr (escapes embedded
    backticks), so column names with spaces/hyphens/keywords parse."""
    return "`" + name.replace("`", "``") + "`"


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    scope_col: str | None = None,
    string_minmax: str = "exact",
) -> DataFrame:
    """Long-format stats: (scope?, column, n_rows, n_nulls, null_rate,
    min_value, max_value, n_distinct).

    ``exact_distinct`` uses count(distinct) — for oracle comparison at
    small scale; default is approx_count_distinct (HLL, one pass, no extra
    shuffle per column) for the 10^12-row path. min/max are cast to string
    so heterogeneous columns stack into one long table (binary columns get
    length-based min/max instead of value min/max).

    ``string_minmax``: ``"exact"`` (default — full-string min/max, the
    DuckDB-oracle semantics; a variable-width agg buffer demotes the
    aggregation to SortAggregate, fine at profile-a-sample scale) or
    ``"prefix"`` (order-preserving 7-byte prefixes via a compact-long
    buffer — keeps the agg a streaming HashAggregate; the 10^12-row
    setting, and what ``validate_one_pass`` uses for its fused stats).
    """
    if string_minmax not in ("exact", "prefix"):
        raise ValueError(f"string_minmax must be 'exact' or 'prefix', got {string_minmax!r}")
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    aggs = []
    for c in columns:
        col = F.col(c)
        target = F.length(col) if types[c] == "binary" else col
        if types[c] == "string" and string_minmax == "prefix":
            lo = _string_prefix_decode(F.min(_string_prefix_ordinal(col)))
            hi = _string_prefix_decode(F.max(_string_prefix_ordinal(col)))
        else:
            lo = F.min(target).cast("string")
            hi = F.max(target).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            lo.alias(f"{c}__min"),
            hi.alias(f"{c}__max"),
            (
                F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
            ).alias(f"{c}__distinct"),
        ]
    group = [scope_col] if scope_col else []
    wide = df.groupBy(*group).agg(*aggs)

    # unpivot to long format via stack — still one underlying aggregation
    stack_items = ", ".join(
        f"'{c}', {_bq(c + '__n')}, {_bq(c + '__nulls')}, {_bq(c + '__min')}, "
        f"{_bq(c + '__max')}, {_bq(c + '__distinct')}"
        for c in columns
    )
    stacked = wide.selectExpr(
        *[_bq(g) for g in group],
        f"stack({len(columns)}, {stack_items}) as "
        "(column, n_rows, n_nulls, min_value, max_value, n_distinct)",
    )
    return stacked.withColumn(
        "null_rate",
        F.when(F.col("n_rows") > 0, F.col("n_nulls") / F.col("n_rows")).otherwise(0.0),
    ).select(
        *group, "column", "n_rows", "n_nulls", "null_rate",
        "min_value", "max_value", "n_distinct",
    )


def quantiles(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = False,
    scope_col: str | None = None,
) -> DataFrame:
    """Long-format quantile profile: (scope?, column, p, value).

    Like :func:`profile`, everything is ONE ``df.agg(...)`` — all columns'
    quantiles in a single scan with partial aggregation. ``exact=True``
    uses Spark's exact interpolating ``percentile`` (same linear
    interpolation as ANSI/DuckDB ``quantile_cont`` — the oracle path;
    requires a full sort buffer per column, small-scale only). The default
    is ``percentile_approx`` (one-pass KLL-style sketch, bounded memory —
    the 10^12-row path)."""
    p_arr = F.array(*[F.lit(float(p)) for p in probs])
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        q = F.percentile(col, p_arr) if exact else F.percentile_approx(col, p_arr, 10_000)
        aggs.append(q.alias(f"{c}__q"))
    group = [scope_col] if scope_col else []
    wide = df.groupBy(*group).agg(*aggs)

    # 1-row (per scope) reshape: stack columns, then posexplode the prob
    # array — still the single underlying aggregation, no re-scan
    stack_items = ", ".join(f"'{c}', {_bq(c + '__q')}" for c in columns)
    stacked = wide.selectExpr(
        *[_bq(g) for g in group], f"stack({len(columns)}, {stack_items}) as (column, qs)"
    )
    return stacked.select(
        *group,
        "column",
        F.posexplode("qs").alias("pos", "value"),
    ).select(
        *group,
        "column",
        F.element_at(p_arr, F.col("pos") + 1).alias("p"),
        "value",
    )


def value_histogram(df: DataFrame, column: str, scope_col: str | None = None) -> DataFrame:
    """Exact value histogram for a low-cardinality column (e.g. ``fmt``):
    (scope?, value, n). groupBy → two-phase hash agg; fine for enum-like
    columns at any scale since output cardinality is bounded."""
    group = ([F.col(scope_col)] if scope_col else []) + [
        F.col(column).alias("value")
    ]
    return df.groupBy(*group).agg(F.count(F.lit(1)).alias("n"))
