"""Identity constraints at scale: xs:unique / xs:key / xs:keyref.

Reference semantics (/root/reference/xmlschema/validators/identities.py):

- unique/key count selected field tuples with a Counter and report one
  violation **per duplicated value**, not per row (identities.py:198-221).
- key additionally requires every field non-null (identities.py:140-141).
- keyref builds the referenced key set and reports each tuple not found
  in it ("Key not found", identities.py:290-318).
- Scope: the reference checks within the declaring element's subtree
  (elements.py:546-551); our scopes are 'partition' and 'table'.

Spark mapping: hash aggregation with automatic partial (map-side) combine,
plus an explicit salted two-phase variant for hot keys, and a left-anti
join (broadcast when the PK side is small) for keyref. AQE skew handling
is enabled in session.py for the sort-merge fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_values(
    df: DataFrame,
    columns: list[str],
    scope_col: str | None = None,
    salt_partitions: int = 0,
) -> DataFrame:
    """Values of ``columns`` appearing more than once → one row per
    duplicated value: (scope?, *columns, dup_count).

    XSD unique semantics: tuples containing a NULL field are *absent*
    tuples, never duplicates (get_fields returns None for empties,
    identities.py:128-151) — so null-containing tuples are filtered out.

    ``salt_partitions`` > 0 forces an explicit two-phase aggregation:
    phase 1 groups by (key, salt) — salt = current scan partition — so a
    pathologically hot key is pre-reduced before the shuffle; phase 2
    re-aggregates by key. With salt=0 we rely on Catalyst's partial hash
    aggregation, which performs the same map-side combine; the explicit
    form exists because at 10^12 rows a hot phash (e.g. a sentinel value)
    can still overflow a single partial-agg hash map.
    """
    keys = [F.col(c) for c in columns]
    group = ([F.col(scope_col)] if scope_col else []) + keys
    tuples = df.filter(
        F.greatest(*[c.isNotNull() for c in keys]) if len(keys) > 1 else keys[0].isNotNull()
    )
    # all fields must be present to form a tuple
    for c in keys:
        tuples = tuples.filter(c.isNotNull())

    if salt_partitions > 0:
        salt = F.pmod(F.spark_partition_id(), F.lit(salt_partitions)).alias("__salt")
        partial = tuples.groupBy(*group, salt).agg(F.count(F.lit(1)).alias("__c"))
        counts = partial.groupBy(*group).agg(F.sum("__c").alias("dup_count"))
    else:
        counts = tuples.groupBy(*group).agg(F.count(F.lit(1)).alias("dup_count"))
    return counts.filter(F.col("dup_count") > 1)


def key_null_rows(df: DataFrame, columns: list[str], id_col: str) -> DataFrame:
    """xs:key requires all fields non-null (identities.py:140-141):
    rows with any null key field → (id, null_columns)."""
    any_null = None
    for c in columns:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    nulls = F.array_compact(
        F.array(*[F.when(F.col(c).isNull(), F.lit(c)) for c in columns])
    )
    return df.filter(any_null).select(
        F.col(id_col).alias("row_id"), nulls.alias("null_columns")
    )


def keyref_orphans(
    fk_df: DataFrame,
    fk_columns: list[str],
    pk_df: DataFrame,
    pk_columns: list[str],
    broadcast_pk: bool | None = None,
) -> DataFrame:
    """Referential integrity: fk tuples with no matching pk tuple
    ("Key not found", identities.py:298-318) → the orphan fk rows.

    Field cardinality must match (parse_refer check, identities.py:274-275).
    NULL-containing fk tuples are absent tuples → not orphans.
    ``broadcast_pk`` None = let Catalyst/AQE decide; True forces a
    broadcast (dimension-sized PK sides); False forces shuffle join
    (AQE skew-join splits hot fk keys).
    """
    if len(fk_columns) != len(pk_columns):
        raise ValueError(
            f"field cardinality mismatch: {fk_columns} vs {pk_columns} "
            "(cf. identities.py:274-275)"
        )
    pk_keys = pk_df.select(
        *[F.col(p).alias(f) for f, p in zip(fk_columns, pk_columns)]
    ).dropDuplicates(fk_columns)
    if broadcast_pk:
        pk_keys = F.broadcast(pk_keys)
    fk = fk_df
    for c in fk_columns:
        fk = fk.filter(F.col(c).isNotNull())
    return fk.join(pk_keys, on=fk_columns, how="left_anti")
