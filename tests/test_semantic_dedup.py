"""SemDeDup (similarity.semantic_dedup): cluster-then-dedup-within-cell.

Golden semantics on hand-built vectors (cells and near-dup structure
chosen so assignments and drops are unambiguous), kmeans-vs-seed plan
parity, the hot-cell guard, and edge cases. Reference analog: xs:unique
scoped to a parent element (identities.py:198-221) — decompose into
scopes, then check uniqueness within each.
"""

import math

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators.similarity import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v array<float>")


def _unit(x, y):
    n = math.hypot(x, y)
    return [x / n, y / n]


def test_within_cell_lower_id_wins(spark):
    """Two tight groups near orthogonal axes: seeds = ids 1 and 2, every
    row joins its axis cell, and within each cell everything above the
    threshold collapses onto the lowest id."""
    rows = [
        (1, _unit(1.0, 0.0)),       # seed centroid 1 (x-axis cell)
        (2, _unit(0.0, 1.0)),       # seed centroid 2 (y-axis cell)
        (3, _unit(1.0, 0.05)),      # x cell, cos(3,1) ~ 0.9988 -> dup of 1
        (4, _unit(0.05, 1.0)),      # y cell, dup of 2
        (5, _unit(0.08, 1.0)),      # y cell, dup of 2 (min id, not 4)
    ]
    out = semantic_dedup(
        _df(spark, rows), "id", "v",
        threshold=0.99, n_clusters=2, centroid_mode="seed",
    ).collect()
    got = {r.id: (r.cid, r.dup_of, r.keep) for r in out}
    assert got == {
        1: (1, None, True),
        2: (2, None, True),
        3: (1, 1, False),
        4: (2, 2, False),
        5: (2, 2, False),
    }


def test_cross_cell_pairs_not_considered(spark):
    """SemDeDup semantics: near-identical vectors in DIFFERENT cells are
    both kept — the cell is the candidate generator (this is the
    documented recall trade vs global near-dup)."""
    rows = [
        (1, _unit(1.0, 0.0)),
        (2, _unit(0.0, 1.0)),
        # 45-degree pair: one lands in each cell (ties impossible: .71/.70)
        (3, _unit(1.0, 0.99)),
        (4, _unit(0.99, 1.0)),
    ]
    out = semantic_dedup(
        _df(spark, rows), "id", "v",
        threshold=0.9, n_clusters=2, centroid_mode="seed",
    ).collect()
    got = {r.id: (r.cid, r.keep) for r in out}
    # 3 is nearer x (cid 1), 4 nearer y (cid 2); cos(3,4) ~ 0.9999 but
    # they never meet
    assert got[3] == (1, True) and got[4] == (2, True)
    assert all(r.keep for r in out)


def test_threshold_boundary(spark):
    rows = [
        (1, _unit(1.0, 0.0)),
        (2, _unit(1.0, 1.0)),  # cos to id 1 = 0.7071...
    ]
    df = _df(spark, rows)
    below = semantic_dedup(df, "id", "v", threshold=0.71,
                           n_clusters=1, centroid_mode="seed").collect()
    assert all(r.keep for r in below)
    above = semantic_dedup(df, "id", "v", threshold=0.70,
                           n_clusters=1, centroid_mode="seed").collect()
    got = {r.id: r.dup_of for r in above}
    assert got == {1: None, 2: 1}


def test_hot_cell_guard_keeps_members(spark):
    """Cells above max_cluster_size are excluded from pairing: members
    keep=True (coverage drop is explicit, not a crash or a quadratic)."""
    rows = [(i, _unit(1.0, 0.001 * i)) for i in range(1, 6)]
    out = semantic_dedup(
        _df(spark, rows), "id", "v",
        threshold=0.5, n_clusters=1, centroid_mode="seed",
        max_cluster_size=2,
    ).collect()
    assert len(out) == 5 and all(r.keep for r in out)


def test_null_and_zero_vectors_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0]), (4, [1.0, 0.0])],
        "id long, v array<float>",
    )
    out = semantic_dedup(df, "id", "v", threshold=0.9,
                         n_clusters=2, centroid_mode="seed").collect()
    assert {r.id for r in out} == {1, 4}
    got = {r.id: r.dup_of for r in out}
    assert got == {1: None, 4: 1}


def test_kmeans_mode_same_shape(spark):
    """Production kmeans mode runs the identical plan (assignment +
    within-cell pairing) — on two well-separated tight groups the keep
    sets agree with seed mode regardless of learned centroid values."""
    rows = [
        # ids 1 and 2 lead each group so seed mode's first-two-ids
        # centroids also span both groups
        (1, _unit(1.0, 0.0)), (2, _unit(0.0, 1.0)),
        (3, _unit(1.0, 0.02)), (4, _unit(1.0, 0.04)),
        (10, _unit(0.02, 1.0)),
    ]
    df = _df(spark, rows)
    km = semantic_dedup(df, "id", "v", threshold=0.99, n_clusters=2,
                        centroid_mode="kmeans").collect()
    sd = semantic_dedup(df, "id", "v", threshold=0.99, n_clusters=2,
                        centroid_mode="seed").collect()
    assert {r.id for r in km if r.keep} == {r.id for r in sd if r.keep} == {1, 2}


def test_empty_and_bad_params(spark):
    empty = spark.createDataFrame([], "id long, v array<float>")
    assert semantic_dedup(empty, "id", "v", centroid_mode="seed").count() == 0
    with pytest.raises(ValueError, match="centroid_mode"):
        semantic_dedup(empty, "id", "v", centroid_mode="voronoi")
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(empty, "id", "v", threshold=0.0)


def test_fewer_rows_than_clusters(spark):
    rows = [(1, _unit(1.0, 0.0)), (2, _unit(0.0, 1.0))]
    out = semantic_dedup(_df(spark, rows), "id", "v", threshold=0.99,
                         n_clusters=16, centroid_mode="seed").collect()
    assert len(out) == 2 and all(r.keep for r in out)


def test_seed_mode_zero_vector_does_not_shrink_centroid_set(spark):
    """A zero-norm vector among the first n_clusters ids must be skipped
    and BACKFILLED by the next non-zero row (the oracle's
    list_sum(x*x) > 0 gate) — not silently shrink the seed set to k-1."""
    rows = [
        (1, [0.0, 0.0]),          # zero vector at the lowest id
        (2, _unit(1, 0)),         # seed 0
        (3, _unit(0, 1)),         # seed 1 (the backfill)
        (4, _unit(1, 0.02)),      # x-axis cell
        (5, _unit(0.02, 1)),      # y-axis cell
    ]
    out = semantic_dedup(
        _df(spark, rows), "id", "v",
        threshold=0.99, n_clusters=2, centroid_mode="seed",
    )
    got = {r["id"]: r["cid"] for r in out.collect()}
    out.unpersist()
    # zero vector has no unit form -> excluded from the result entirely
    assert 1 not in got
    # both seed cells exist: 4 clusters with 2, 5 clusters with 3
    assert got[4] == got[2] and got[5] == got[3]
    assert got[2] != got[3]
