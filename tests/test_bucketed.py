"""Bucketed co-located joins: plan must show bucketed scans, a sort-merge
join, and NO Exchange — plus result parity with the broadcast path."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators.identity import keyref_orphans
from xmlschema_spark.sources.bucketed import colocated_keyref_orphans, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # tables land in the session's spark-warehouse dir (gitignored)
    fk = spark.range(0, 5000).select(
        F.concat(F.lit("row"), F.col("id")).alias("rid"),
        (F.col("id") % 700).alias("ref_key"),
    )
    pk = spark.range(0, 500).select(F.col("id").alias("ref_key"))
    write_bucketed(fk, "fk_bucketed", ["ref_key"], n_buckets=8)
    write_bucketed(pk, "pk_bucketed", ["ref_key"], n_buckets=8)
    yield fk, pk
    spark.sql("DROP TABLE IF EXISTS fk_bucketed")
    spark.sql("DROP TABLE IF EXISTS pk_bucketed")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orphans = colocated_keyref_orphans(spark, "fk_bucketed", "pk_bucketed", ["ref_key"])
        plan = orphans._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # ref_key 500..699 have no PK → 5000 * 200/700 rows
        assert orphans.count() == sum(1 for i in range(5000) if i % 700 >= 500)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_matches_broadcast_path(spark, bucketed_tables):
    fk, pk = bucketed_tables
    colocated = colocated_keyref_orphans(spark, "fk_bucketed", "pk_bucketed", ["ref_key"])
    broadcast = keyref_orphans(fk, ["ref_key"], pk, ["ref_key"], broadcast_pk=True)
    assert sorted(r.rid for r in colocated.collect()) == sorted(
        r.rid for r in broadcast.collect()
    )
