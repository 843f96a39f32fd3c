"""Temporal enrichment: the as-of join.

Joins each fact row to the LATEST dimension snapshot at-or-before the
fact's timestamp — how slowly-changing metadata (user tier, schema
version, model checkpoint, exchange rate) attaches to an event/image
stream without storing it denormalized. Spark has no native ASOF JOIN
(DuckDB/Pandas do), but the semantics decompose exactly onto Spark
primitives two different ways, picked by dimension size:

- ``broadcast`` (default): turn each snapshot into a validity interval
  [snap_ts, next snap_ts) with one ``lead()`` window over the (small)
  dimension, broadcast it, and join facts with an equi-key + range
  condition — a BroadcastHashJoin on the key whose range predicate is
  evaluated on the hash-bucket matches. The fact side NEVER shuffles;
  at 10^12 facts this is the only acceptable plan whenever the
  dimension fits in a broadcast (snapshots of per-user/per-source
  metadata are MBs, not TBs).
- ``union``: when the dimension itself is huge (e.g. per-key config
  history comparable to the fact count), tag both sides, union them,
  and run ONE window per key ordered by (ts, tag) carrying
  ``last(snapshot_struct, ignorenulls=True)`` — each fact row picks up
  the most recent WHOLE snapshot that sorted before it (the struct
  wrapper keeps null payload fields and tied-row picks atomic). One shuffle+sort of
  facts+dims on the key; linear, spill-safe, no join explosion. Hot
  keys are the usual window-skew envelope (pre-split by (key, day)
  upstream, like curation.sessionize documents).

Both strategies implement identical semantics (ties: a snapshot AT the
fact timestamp matches — ``>=``; facts before every snapshot get NULLs,
i.e. a LEFT as-of join) and are cross-checked in tests; the driver
query is certified against DuckDB's native ASOF LEFT JOIN.

No reference analog (the reference validates point-in-time documents);
this is the dimension-attachment step a production validation run needs
when rules themselves are versioned (rule set active AT ingest time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key_cols: list[str] | str,
    fact_ts: str,
    dim_ts: str,
    strategy: str = "broadcast",
) -> DataFrame:
    """As-of LEFT join: every ``facts`` row gains the payload columns of
    the latest ``dims`` snapshot with ``dim_ts <= fact_ts`` for the same
    key (NULLs when no snapshot precedes the fact). Payload = every dims
    column except the keys and ``dim_ts``; ``dim_ts`` itself is kept so
    callers can see which snapshot matched. Column-name collisions
    between fact and dim payloads must be resolved by the caller
    (rename before joining) — the output keeps both sides' names.

    ``strategy``: ``"broadcast"`` (interval join, fact side never
    shuffles — default, for broadcastable dims) or ``"union"`` (single
    window over the unioned stream — for dims too large to broadcast).
    See the module docstring for the scale trade-off.

    NULL payload values behave identically on both paths: the union
    path carries each snapshot as one struct, so ``last(ignorenulls)``
    selects whole dim rows atomically — a NULL field rides inside the
    winning snapshot's (non-null) struct instead of falling through to
    an older snapshot.

    Duplicate snapshots — two dim rows sharing the same ``(key,
    dim_ts)`` — resolve DETERMINISTICALLY and identically on both
    paths, even when tied rows contain NULL payload fields: the winner
    is the whole row with the greatest ``xxhash64(dim_ts, *payload)``
    (an arbitrary but stable total order over the tied rows' contents;
    never a column-wise mix of two tied rows). Exact full-row
    duplicates are therefore harmless; distinct payloads at one
    timestamp get a content-stable pick rather than a
    partitioning-dependent one.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in dims.columns if c not in keys and c != dim_ts]
    # stable tiebreak among snapshots sharing (key, dim_ts): hash of the
    # row contents, so both strategies — and any partitioning — agree
    tie = F.xxhash64(F.col(dim_ts), *[F.col(c) for c in payload])
    if strategy == "broadcast":
        # ties sort by content hash: every tied row except the max-tie
        # one gets an EMPTY interval (its lead() is the same dim_ts), so
        # exactly the max-tie snapshot is visible to facts
        w = Window.partitionBy(*keys).orderBy(F.col(dim_ts), tie)
        # string-qualified aliases, not DataFrame[col] references: dims
        # are often DERIVED from the fact table (snapshot rollups), and
        # shared-lineage column objects misresolve in a self-join — the
        # alias names are unambiguous regardless of lineage
        f = facts.alias("__asof_f")
        d = dims.withColumn("__valid_to", F.lead(dim_ts).over(w)).alias("__asof_d")
        cond = None
        for k in keys:
            c = F.col(f"__asof_f.{k}") == F.col(f"__asof_d.{k}")
            cond = c if cond is None else cond & c
        fts = F.col(f"__asof_f.{fact_ts}")
        cond = cond & (fts >= F.col(f"__asof_d.{dim_ts}")) & (
            F.col("__asof_d.__valid_to").isNull()
            | (fts < F.col("__asof_d.__valid_to"))
        )
        return f.join(F.broadcast(d), cond, "left").select(
            *[F.col(f"__asof_f.{c}") for c in facts.columns],
            F.col(f"__asof_d.{dim_ts}").alias(dim_ts),
            *[F.col(f"__asof_d.{c}").alias(c) for c in payload],
        )
    if strategy == "union":
        # tag 0 = dim, 1 = fact: at equal ts the dim sorts FIRST, so a
        # snapshot taken exactly at the fact timestamp is visible to it
        # (the `>=` tie rule, matching the broadcast path and DuckDB).
        #
        # The whole snapshot travels as ONE struct: last(ignorenulls)
        # over a struct picks an entire dim row atomically, so a NULL in
        # a payload column is carried exactly like the broadcast path
        # (never falls through to an older snapshot, never mixes columns
        # from two tied rows) — a non-null struct wraps null fields.
        fact_cols = facts.columns
        d_side = dims.select(
            *[
                F.col(k) if k in keys else F.lit(None).cast(facts.schema[k].dataType).alias(k)
                for k in fact_cols
            ],
            F.struct(
                F.col(dim_ts).alias("__dts"), *[F.col(c) for c in payload]
            ).alias("__snap"),
            F.lit(0).alias("__tag"),
            F.col(dim_ts).alias("__ts"),
            tie.alias("__tie"),
        )
        f_side = facts.select(
            *[F.col(c) for c in fact_cols],
            F.lit(None).cast(d_side.schema["__snap"].dataType).alias("__snap"),
            F.lit(1).alias("__tag"),
            F.col(fact_ts).alias("__ts"),
            F.lit(0).cast("long").alias("__tie"),
        )
        # __tie orders only tied dim rows (facts all carry 0 and sort
        # after dims at equal ts via __tag): among tied snapshots the
        # max-tie row sorts LAST, so last(ignorenulls) picks it — the
        # same winner the broadcast path keeps
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__tag", "__tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = f_side.unionByName(d_side).withColumn(
            "__snap", F.last("__snap", ignorenulls=True).over(w)
        )
        return (
            filled.filter(F.col("__tag") == 1)
            .select(
                *fact_cols,
                F.col("__snap.__dts").alias(dim_ts),
                *[F.col(f"__snap.{c}").alias(c) for c in payload],
            )
        )
    raise ValueError(f"strategy must be 'broadcast' or 'union', got {strategy!r}")
