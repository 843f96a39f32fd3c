"""Durable mergeable per-partition HLL sketches (the Iceberg
partition-statistics model): partition_sketches + merge_sketches must
reproduce profile()'s exact stats, the union of incremental sketch runs
must equal the one-shot sketch of the whole table, and a checkpointed run
must persist metrics rows that survive resume."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.checkpoint import CheckpointedRun
from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.operators import stats
from xmlschema_spark.rules import Rule, RuleSet
from xmlschema_spark.sources.images import generate_images_df


@pytest.fixture(scope="module")
def tbl(spark):
    df = spark.createDataFrame(
        [
            (i, f"p{i % 4}", i % 7, f"val_{i % 13}", float(i) if i % 5 else None)
            for i in range(400)
        ],
        "id bigint, part string, small int, label string, score double",
    )
    return df.cache()


def test_merge_equals_direct_profile(tbl):
    """Rolled-up sketches == the one-pass exact profile on every exact
    stat. The merged HLL distinct estimate is exact up to ~200 uniques
    (measured: the union gadget's dense conversion starts costing
    accuracy above that; direct un-merged sketches stay exact further) —
    so: exact assertion for the low-cardinality columns, tight relative
    bound for the 320/400-unique ones."""
    merged = {
        r.column: r
        for r in stats.merge_sketches(
            stats.partition_sketches(tbl, ["id", "small", "label", "score"], "part")
        ).collect()
    }
    direct = {
        r.column: r
        for r in stats.profile(
            tbl, ["id", "small", "label", "score"], exact_distinct=True
        ).collect()
    }
    for c in ["id", "small", "label", "score"]:
        m, d = merged[c], direct[c]
        assert (m.n_rows, m.n_nulls, m.min_value, m.max_value) == (
            d.n_rows, d.n_nulls, d.min_value, d.max_value
        ), c
        assert m.null_rate == pytest.approx(d.null_rate), c
        if d.n_distinct <= 200:
            assert m.n_distinct == d.n_distinct, c
        else:
            assert m.n_distinct == pytest.approx(d.n_distinct, rel=0.02), c


def test_incremental_union_equals_one_shot(tbl):
    """Sketching two disjoint partition subsets in separate passes and
    merging the UNION of the rows equals sketching everything at once —
    the property that makes resumed/incremental runs sound."""
    a = stats.partition_sketches(tbl.filter(F.col("part") < "p2"), ["id", "label"], "part")
    b = stats.partition_sketches(tbl.filter(F.col("part") >= "p2"), ["id", "label"], "part")
    inc = {r.column: r for r in stats.merge_sketches(a.unionByName(b)).collect()}
    one = {
        r.column: r
        for r in stats.merge_sketches(
            stats.partition_sketches(tbl, ["id", "label"], "part")
        ).collect()
    }
    # label (13 uniques): sketches stay sparse → union is order-insensitive
    # and the incremental result is bit-identical to the one-shot. id (400
    # uniques): the union gadget's dense conversion is merge-ORDER-sensitive,
    # so the estimates may differ by a hair between groupings — every exact
    # stat still matches, and both estimates sit within the HLL error bound.
    assert inc["label"].asDict() == one["label"].asDict()
    i, o = inc["id"], one["id"]
    assert (i.n_rows, i.n_nulls, i.min_value, i.max_value) == (
        o.n_rows, o.n_nulls, o.min_value, o.max_value
    )
    assert i.n_distinct == pytest.approx(400, rel=0.02)
    assert o.n_distinct == pytest.approx(400, rel=0.02)


def test_checkpoint_persists_mergeable_stats(spark, tmp_path):
    """with_stats=True writes per-partition metrics rows; a killed-and-
    resumed run completes them; the rollup equals the direct profile."""
    df = generate_images_df(spark, 120, seed=11, distributed=False).cache()
    rules = RuleSet([Rule("id_not_null", "not_null", "image_id")])
    eng = ValidationEngine(rules, id_col="image_id", partition_col="part")

    ck = CheckpointedRun(eng, str(tmp_path), "r1")
    with pytest.raises(RuntimeError, match="injected failure"):
        ck.run(df, batch_size=2, fail_after_batches=2, with_stats=True)
    done_before = set(
        r.partition_id for r in ck.partition_stats(spark).select("partition_id").distinct().collect()
    )
    assert 0 < len(done_before) < 8  # partial coverage persisted

    ck.run(df, batch_size=2, with_stats=True)  # resume
    merged = {r.column: r for r in ck.stats_profile(spark).collect()}
    direct = {
        r.column: r
        for r in stats.profile(
            df, [c for c in df.columns if c != "part"], exact_distinct=True
        ).collect()
    }
    assert set(merged) == set(direct)
    for c, m in merged.items():
        d = direct[c]
        assert (m.n_rows, m.n_nulls) == (d.n_rows, d.n_nulls), c
        assert m.min_value == d.min_value and m.max_value == d.max_value, c
        assert m.n_distinct == d.n_distinct, c  # exact at 120 rows
    df.unpersist()
