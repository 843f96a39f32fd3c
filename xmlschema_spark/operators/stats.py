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


# ------------------------------------------------------------- HLL sketches
#
# The north star asks for "distinct via HLL" over Iceberg partitions with
# per-partition metrics rows. approx_count_distinct (profile() above) is
# HLL++ but its buffer is consumed by the aggregation — the sketch itself
# is not materializable or mergeable across runs. The functions below use
# Spark's Apache DataSketches integration (hll_sketch_agg / hll_union_agg,
# Spark >= 3.5) to make per-partition sketches DURABLE: a checkpointed run
# writes one typed stats row + one binary sketch per (partition, column),
# and the table-level profile — including the global distinct estimate —
# is a rollup over those rows with NO rescan of the data. That is the
# Iceberg partition-statistics model: partition metrics are written once
# at commit time, table stats are metadata-only merges, and a resumed or
# incremental run only sketches the partitions it actually processed.


def partition_sketches(
    df: DataFrame,
    columns: list[str] | None = None,
    scope_col: str = "part",
    lg_k: int = 12,
) -> DataFrame:
    """Per-``scope_col`` WIDE stats row: for each column c —
    ``c__n``, ``c__nulls``, ``c__min``/``c__max`` (original type; binary
    columns use length), ``c__sketch`` (DataSketches HLL, binary).

    One groupBy(scope) aggregation — a single scan with partial aggs, same
    plan shape as :func:`profile`. Types are PRESERVED (wide, not stacked)
    so the merge step can take true typed min/max instead of lexicographic
    string min/max, which would be wrong for numerics ("10" < "9").

    ``lg_k=12`` = 4096 buckets ≈ 1.6 kB per sketch, <2% relative error —
    per-partition metrics stay metadata-sized even with thousands of
    partitions x dozens of columns."""
    if columns is None:
        columns = [f.name for f in df.schema.fields if f.name != scope_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = []
    for c in columns:
        col = F.col(c)
        target = F.length(col) if types[c] == "binary" else col
        # hll_sketch_agg accepts int/long/string/binary buckets; cast other
        # types through string for a stable lexical identity
        sk_in = col if types[c] in ("int", "bigint", "string", "binary") else col.cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(target).alias(f"{c}__min"),
            F.max(target).alias(f"{c}__max"),
            F.hll_sketch_agg(sk_in, lg_k).alias(f"{c}__sketch"),
        ]
    return df.groupBy(F.col(scope_col).alias("scope")).agg(*aggs)


def merge_sketches(sketches: DataFrame) -> DataFrame:
    """Roll a :func:`partition_sketches` table (possibly read back from a
    checkpoint, possibly the union of several incremental runs) up to the
    table-level long-format profile: (column, n_rows, n_nulls, null_rate,
    min_value, max_value, n_distinct).

    Metadata-only: the input is one row per partition, so this aggregation
    touches kilobytes regardless of how many data rows the sketches
    summarize. ``hll_union_agg`` merges sketches exactly (HLL union is
    lossless w.r.t. the individual sketches); min/max/sums are trivially
    mergeable. The scan of the underlying data happened once, at sketch
    time — the 10^12-row table is NOT re-read."""
    cols = sorted({n.rsplit("__", 1)[0] for n in sketches.columns if "__" in n})
    aggs = []
    for c in cols:
        aggs += [
            F.sum(f"{c}__n").alias(f"{c}__n"),
            F.sum(f"{c}__nulls").alias(f"{c}__nulls"),
            F.min(f"{c}__min").cast("string").alias(f"{c}__min"),
            F.max(f"{c}__max").cast("string").alias(f"{c}__max"),
            F.hll_sketch_estimate(F.hll_union_agg(f"{c}__sketch", True)).alias(
                f"{c}__distinct"
            ),
        ]
    wide = sketches.agg(*aggs)
    stack_items = ", ".join(
        f"'{c}', {_bq(c + '__n')}, {_bq(c + '__nulls')}, {_bq(c + '__min')}, "
        f"{_bq(c + '__max')}, {_bq(c + '__distinct')}"
        for c in cols
    )
    stacked = wide.selectExpr(
        f"stack({len(cols)}, {stack_items}) as "
        "(column, n_rows, n_nulls, min_value, max_value, n_distinct)"
    )
    return stacked.withColumn(
        "null_rate",
        F.when(F.col("n_rows") > 0, F.col("n_nulls") / F.col("n_rows")).otherwise(0.0),
    ).select(
        "column", "n_rows", "n_nulls", "null_rate",
        "min_value", "max_value", "n_distinct",
    )


# ---------------------------------------------------------------------------
# skew detection — heavy hitters feeding the salting decision
# ---------------------------------------------------------------------------

def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float = 0.01,
    rows_per_bucket: int | None = None,
) -> DataFrame:
    """Keys holding at least ``min_share`` of the table's rows — the
    skew detector that DRIVES the salting decision the north rule
    mandates for hot ``fmt``/``phash`` keys (identity.duplicate_values'
    ``salt_buckets`` and the AQE skew-join knobs want to know WHICH keys
    are hot and HOW hot before anyone picks a salt factor).

    Plan shape: one groupBy(key).count() — Catalyst partial-aggregates
    map-side, so the exchange carries one row per distinct key per task,
    never raw rows; the grand total is a second metadata-sized agg over
    the counts, broadcast back (BroadcastNestedLoopJoin over exactly one
    row). The table is scanned ONCE: at runtime AQE's ReuseExchange
    feeds the total branch from the per-key counts shuffle instead of
    re-reading the source (verified in the executed plan, PLANS.md). No
    window-over-everything: ``sum(count) OVER ()`` would drag every
    distinct key into a single partition, which dies when the key
    cardinality is itself huge (phash at 10^12 rows).

    With ``rows_per_bucket`` set, adds ``salt_buckets`` =
    ceil(n_rows / rows_per_bucket): the salt factor that splits the key's
    rows into roughly bucket-sized slices for the two-phase salted
    aggregation (identity.py's unique checks) — the "detect, then salt"
    loop in one place.

    The reference's analog is its occurrence Counters (identities.py:199,
    schema.py:989) — here the counter itself is the product, because at
    scale the *distribution* of the counter is what decides the physical
    plan.
    """
    if not (0.0 < min_share <= 1.0):
        raise ValueError(f"min_share must be in (0,1], got {min_share}")
    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    out = (
        counts.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("__total"), 6))
        .filter(F.col("n_rows") * 1.0 / F.col("__total") >= min_share)
        .drop("__total")
    )
    if rows_per_bucket is not None:
        if rows_per_bucket <= 0:
            raise ValueError(f"rows_per_bucket must be > 0, got {rows_per_bucket}")
        out = out.withColumn(
            "salt_buckets",
            F.greatest(F.lit(1), F.ceil(F.col("n_rows") / F.lit(rows_per_bucket))),
        )
    return out
