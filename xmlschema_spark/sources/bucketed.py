"""Bucketed-table helpers: shuffle-free co-located joins.

At 10^12 rows the keyref anti-join's shuffle of the fact side is the
dominant cost when the PK side is too big to broadcast. Writing both
sides bucketed on the join key (the Iceberg ``bucket(N, key)`` partition
transform analog — here the Spark catalog's bucketBy, same planner
effect) makes the join a per-bucket merge with NO Exchange on either
side: each task reads matching bucket files directly.

Plan proof: tests/test_bucketed.py asserts the executed plan contains a
SortMergeJoin over `Bucketed: true` scans and no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by ``keys``.
    Bucket count must match across tables that will join co-located."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def colocated_keyref_orphans(
    spark: SparkSession,
    fk_table: str,
    pk_table: str,
    keys: list[str],
) -> DataFrame:
    """Referential-integrity anti-join between two tables bucketed on the
    same keys with the same bucket count: zero-shuffle per-bucket merge.

    (For the broadcast-able PK case use operators.identity.keyref_orphans;
    this is the path for PK sides too large to broadcast.)
    """
    fk = spark.table(fk_table)
    pk = spark.table(pk_table).select(*keys)
    for c in keys:
        fk = fk.filter(fk[c].isNotNull())
    return fk.join(pk, on=keys, how="left_anti")
