"""connected_components / drop_near_duplicates — pairs → clusters →
keep-list (the step that turns candidate generators into a keep/drop
decision). Reference analog: the ID/IDREF identity graph
(identities.py:198-221) generalized from exact keys to similarity edges.
"""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators import dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a string, id_b string")


def test_components_basic(spark):
    # two components: {a,b,c} (chain) and {x,y}; pairs in arbitrary order
    pairs = _pairs(spark, [("b", "c"), ("a", "b"), ("y", "x")])
    got = {
        (r.node, r.component)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"),
    }


def test_components_chain_needs_propagation(spark):
    # a straight 8-node chain: the worst diameter case for min-label
    # propagation — exercises multiple rounds and the convergence stop
    chain = [(f"n{i}", f"n{i+1}") for i in range(7)]
    comps = dedup.connected_components(_pairs(spark, chain)).collect()
    assert len(comps) == 8
    assert {r.component for r in comps} == {"n0"}


def test_components_transitive_across_generators_shape(spark):
    # labels reachable only through a hub: {h, l1..l4} all collapse to h's
    # min even though leaves never pair with each other directly
    star = [("hub", f"leaf{i}") for i in range(4)] + [("aaa", "hub")]
    comps = dedup.connected_components(_pairs(spark, star)).collect()
    assert {r.component for r in comps} == {"aaa"}
    assert len(comps) == 6


def test_components_max_iterations_cap(spark):
    # with max_iterations=1 a long chain cannot fully converge — the cap
    # must still return a row per node (bounded work, partial labels)
    chain = [(f"n{i}", f"n{i+1}") for i in range(7)]
    comps = dedup.connected_components(
        _pairs(spark, chain), max_iterations=1
    ).collect()
    assert len(comps) == 8
    assert len({r.component for r in comps}) > 1  # genuinely not converged


def test_drop_near_duplicates_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t1"), ("x", "t2"), ("y", "t2"),
         ("solo", "t3")],
        "doc_id string, text string",
    )
    pairs = _pairs(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    kept = sorted(
        r.doc_id
        for r in dedup.drop_near_duplicates(docs, pairs, "doc_id").collect()
    )
    assert kept == ["a", "solo", "x"]


def test_components_match_duckdb_transitive_closure(spark):
    """Property-style cross-check on a pseudo-random graph: min-label
    propagation must equal a driver-side union-find ground truth."""
    import random

    rng = random.Random(7)
    nodes = [f"d{i:03d}" for i in range(60)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(45)]

    parent = {n: n for n in nodes}

    def find(n):
        while parent[n] != n:
            parent[n] = parent[parent[n]]
            n = parent[n]
        return n

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    in_graph = {u for e in edges for u in e}
    want = {}
    for n in in_graph:
        root = find(n)
        want.setdefault(root, set()).add(n)
    # canonical label = min member of each ground-truth component
    expect = {
        n: min(members) for members in want.values() for n in members
    }

    got = {
        r.node: r.component
        for r in dedup.connected_components(_pairs(spark, edges)).collect()
    }
    assert got == expect
