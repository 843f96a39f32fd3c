"""As-of join (operators/temporal.py): both strategies, tie semantics,
left-join NULLs, plan shape."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, 10, "2024-01-05"),
        (2, 10, "2024-01-01"),  # exactly at the first snapshot: tie -> matches
        (3, 10, "2024-01-15"),
        (4, 20, "2024-01-03"),  # before user 20's only snapshot -> NULL
        (5, 30, "2024-01-10"),  # user with no snapshots at all -> NULL
        (6, 10, "2024-01-10"),  # exactly at the second snapshot: tie -> silver
    ]
    return (
        spark.createDataFrame(rows, "event_id long, user_id long, d string")
        .select("event_id", "user_id", F.to_timestamp("d").alias("ts"))
    )


@pytest.fixture(scope="module")
def dims(spark):
    rows = [
        (10, "2024-01-01", "bronze"),
        (10, "2024-01-10", "silver"),
        (20, "2024-01-05", "gold"),
    ]
    return (
        spark.createDataFrame(rows, "user_id long, d string, tier string")
        .select("user_id", F.to_timestamp("d").alias("snap_ts"), "tier")
    )


EXPECTED = {1: "bronze", 2: "bronze", 3: "silver", 4: None, 5: None, 6: "silver"}


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_semantics(spark, facts, dims, strategy):
    out = asof_join(facts, dims, "user_id", "ts", "snap_ts", strategy=strategy)
    got = {r.event_id: r.tier for r in out.collect()}
    assert got == EXPECTED
    # the matched snapshot timestamp is surfaced
    snap = {r.event_id: r.snap_ts for r in out.collect()}
    assert snap[3] is not None and snap[4] is None


def test_asof_strategies_agree_on_dense_fixture(spark):
    # 40 users x 50 events, 3 snapshots each — no hand-computed oracle,
    # the two independent implementations must agree row-for-row
    ev = (
        spark.range(2000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 40).alias("user_id"),
            F.to_timestamp(
                F.concat(F.lit("2024-01-"), F.lpad(((F.col("id") * 7) % 28 + 1).cast("string"), 2, "0"))
            ).alias("ts"),
        )
    )
    dims = (
        spark.range(40)
        .select(F.col("id").alias("user_id"))
        .select(
            "user_id",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i"),
        )
        .select(
            "user_id",
            F.to_timestamp(
                F.concat(F.lit("2024-01-"), F.lpad((F.col("user_id") % 5 + F.col("i") * 9 + 1).cast("string"), 2, "0"))
            ).alias("snap_ts"),
            F.concat(F.lit("v"), ((F.col("user_id") + F.col("i")) % 3).cast("string")).alias("ver"),
        )
    )
    a = asof_join(ev, dims, "user_id", "ts", "snap_ts", strategy="broadcast")
    b = asof_join(ev, dims, "user_id", "ts", "snap_ts", strategy="union")
    rows_a = sorted((r.event_id, r.ver, r.snap_ts) for r in a.collect())
    rows_b = sorted((r.event_id, r.ver, r.snap_ts) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) == 2000


def test_asof_broadcast_plan_never_shuffles_facts(spark, facts, dims):
    out = asof_join(facts, dims, "user_id", "ts", "snap_ts", strategy="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_bad_strategy(spark, facts, dims):
    with pytest.raises(ValueError):
        asof_join(facts, dims, "user_id", "ts", "snap_ts", strategy="sortmerge")


def test_asof_dims_derived_from_facts(spark):
    # dims built FROM the fact table (snapshot rollup) — the shared-lineage
    # self-join case that column-object references misresolve; the alias-based
    # join must keep fact keys non-null and match correctly
    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("user_id"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"))
        ).alias("ts"),
    )
    dims = ev.select("user_id").distinct().select(
        "user_id",
        F.to_timestamp(F.lit("2024-01-15")).alias("snap_ts"),
        F.lit("mid").alias("tag"),
    )
    out = asof_join(ev, dims, "user_id", "ts", "snap_ts").collect()
    assert all(r.user_id is not None for r in out)
    for r in out:
        if r.ts.day >= 15:
            assert r.tag == "mid"
        else:
            assert r.tag is None


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_duplicate_snapshot_deterministic(spark, facts, strategy):
    # two snapshots share (user_id, snap_ts) with different payloads —
    # the winner must be content-stable (max xxhash64 of the row) and
    # IDENTICAL across strategies, partitionings, and repeated runs
    rows = [
        (10, "2024-01-01", "bronze"),
        (10, "2024-01-01", "copper"),  # duplicate timestamp, different tier
        (10, "2024-01-10", "silver"),
    ]
    dup_dims = (
        spark.createDataFrame(rows, "user_id long, d string, tier string")
        .select("user_id", F.to_timestamp("d").alias("snap_ts"), "tier")
    )
    expected_t0 = (
        dup_dims.filter(F.col("snap_ts") == "2024-01-01")
        .select("tier", F.xxhash64("snap_ts", "tier").alias("h"))
        .orderBy(F.col("h").desc())
        .first()
        .tier
    )
    for reps in range(2):  # repeated runs agree
        for parts in (1, 7):  # partitioning-independent
            out = asof_join(
                facts.repartition(parts),
                dup_dims.repartition(parts),
                "user_id",
                "ts",
                "snap_ts",
                strategy=strategy,
            )
            got = {r.event_id: r.tier for r in out.collect()}
            assert got == {
                1: expected_t0,
                2: expected_t0,
                3: "silver",
                4: None,
                5: None,
                6: "silver",
            }


def test_asof_exact_duplicate_rows_harmless(spark, facts, dims):
    # full-row duplicates (same payload) must not change the result
    doubled = dims.unionByName(dims)
    for strategy in ("broadcast", "union"):
        out = asof_join(facts, doubled, "user_id", "ts", "snap_ts", strategy=strategy)
        assert {r.event_id: r.tier for r in out.collect()} == EXPECTED


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_empty_dims_all_null(spark, facts, strategy):
    dims = spark.createDataFrame([], "user_id long, snap_ts timestamp, tier string")
    out = asof_join(facts, dims, "user_id", "ts", "snap_ts", strategy=strategy).collect()
    assert len(out) == 6 and all(r.tier is None for r in out)


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_null_payload_carried_not_fallthrough(spark, strategy):
    """A NULL payload field in the winning snapshot is CARRIED (the
    broadcast semantics) — the union path must not fall through to an
    older snapshot's value for that column."""
    facts = spark.createDataFrame(
        [(1, 10, "2024-01-05")], "fid long, user long, fts string"
    ).withColumn("fts", F.to_timestamp("fts"))
    dims = spark.createDataFrame(
        [(10, "2024-01-01", "gold", "eu"), (10, "2024-01-03", None, "us")],
        "user long, dts string, tier string, region string",
    ).withColumn("dts", F.to_timestamp("dts"))
    (row,) = asof_join(facts, dims, "user", "fts", "dts", strategy=strategy).collect()
    assert row["tier"] is None and row["region"] == "us"


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_tied_snapshot_with_null_field_atomic(spark, strategy):
    """Tied snapshots where one row has a NULL payload field: both paths
    pick ONE whole row (the max content hash) — never a column-wise mix
    of the tied rows, and both strategies agree."""
    facts = spark.createDataFrame(
        [(1, 10, "2024-01-05")], "fid long, user long, fts string"
    ).withColumn("fts", F.to_timestamp("fts"))
    dims = spark.createDataFrame(
        [(10, "2024-01-01", None, "eu"), (10, "2024-01-01", "gold", "us")],
        "user long, dts string, tier string, region string",
    ).withColumn("dts", F.to_timestamp("dts"))
    (row,) = asof_join(facts, dims, "user", "fts", "dts", strategy=strategy).collect()
    # whichever tied row wins, the (tier, region) pair must be one of the
    # two real rows, and both strategies must return the same pair
    assert (row["tier"], row["region"]) in {(None, "eu"), ("gold", "us")}
    (other,) = asof_join(
        facts, dims, "user", "fts", "dts",
        strategy="union" if strategy == "broadcast" else "broadcast",
    ).collect()
    assert (row["tier"], row["region"]) == (other["tier"], other["region"])
