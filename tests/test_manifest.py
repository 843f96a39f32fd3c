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
        parts = line.split("\t")
        name, gen_kwargs, expected = parts[0], parts[1], parts[2]
        warnings = parts[3] if len(parts) > 3 else "{}"
        rows.append(
            (name, json.loads(gen_kwargs), json.loads(expected), json.loads(warnings))
        )
    return rows


MANIFEST = _load_manifest()


@pytest.mark.parametrize(
    "name,gen_kwargs,expected,expected_warn", MANIFEST, ids=[m[0] for m in MANIFEST]
)
def test_manifest_fixture(spark, name, gen_kwargs, expected, expected_warn):
    df = generate_images_df(spark, N, seed=SEED, distributed=False, **gen_kwargs)
    res = ValidationEngine(default_image_ruleset()).validate(
        df, run_id=name, with_stats=False
    )
    counts = {
        (r.severity, r.rule_id): r.n
        for r in res.violations.groupBy("severity", "rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_rule = {rid: n for (sev, rid), n in counts.items() if sev == "error"}
    by_warn = {rid: n for (sev, rid), n in counts.items() if sev == "warning"}
    assert by_rule == expected, f"{name}: got {by_rule}, expected {expected}"
    # warnings are asserted only for the rules the manifest lists: an int
    # means an exact count (deterministic rules like phash_unique); a
    # string names a partition that MUST be flagged (w_drift — at n=200 a
    # 25-row partition can exceed the PSI threshold by sampling noise, so
    # exact counts are not stable, but the deliberately shifted partition
    # must always be caught)
    for rid, want in expected_warn.items():
        if isinstance(want, str):
            flagged = {
                r.partition_id
                for r in res.violations.filter(
                    (F.col("severity") == "warning") & (F.col("rule_id") == rid)
                ).collect()
            }
            assert want in flagged, f"{name}: {rid} did not flag {want} (got {flagged})"
        else:
            assert by_warn.get(rid) == want, (
                f"{name}: warning {rid} = {by_warn.get(rid)}, expected {want}"
            )

    if name == "pattern_violations":
        # golden ROWS, not just counts: the bad_id family rewrites ids to
        # "BAD ID <i>" for the first 10 indices — exactly those must violate
        got_rows = sorted(
            r.row_id for r in res.violations.filter(F.col("rule_id") == "id_pattern").collect()
        )
        assert got_rows == sorted(f"BAD ID {i}" for i in range(10))
    res.unpersist()
