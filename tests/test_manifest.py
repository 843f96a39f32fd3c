"""Manifest-driven golden tests — the engine's analog of the reference's
``testfiles`` manifest + generated test classes
(/root/reference/xmlschema/tests/test_factory.py:116-193; error-count
assertion tests/__init__.py:171-197).

Each fixtures.tsv line names a synthetic-table variant (generator kwargs)
and the exact ERROR-severity violation count expected per rule under the
default image rule suite. Any rule not listed must produce zero errors."""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.sources.images import generate_images_df
from xmlschema_spark.sources.rules_loader import default_image_ruleset

N, SEED = 200, 7


def _load_manifest():
    rows = []
    for line in (Path(__file__).parent / "fixtures.tsv").read_text().splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        name, gen_kwargs, expected = line.split("\t")
        rows.append((name, json.loads(gen_kwargs), json.loads(expected)))
    return rows


MANIFEST = _load_manifest()


@pytest.mark.parametrize("name,gen_kwargs,expected", MANIFEST, ids=[m[0] for m in MANIFEST])
def test_manifest_fixture(spark, name, gen_kwargs, expected):
    df = generate_images_df(spark, N, seed=SEED, distributed=False, **gen_kwargs)
    res = ValidationEngine(default_image_ruleset()).validate(
        df, run_id=name, with_stats=False
    )
    by_rule = {
        r.rule_id: r.n
        for r in res.violations.filter(F.col("severity") == "error")
        .groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_rule == expected, f"{name}: got {by_rule}, expected {expected}"

    if name == "pattern_violations":
        # golden ROWS, not just counts: the bad_id family rewrites ids to
        # "BAD ID <i>" for the first 10 indices — exactly those must violate
        got_rows = sorted(
            r.row_id for r in res.violations.filter(F.col("rule_id") == "id_pattern").collect()
        )
        assert got_rows == sorted(f"BAD ID {i}" for i in range(10))
    res.unpersist()
