"""Engine-level keyref (secondary-table referential integrity) and the
spark-submit CLI entry point."""

import json

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.rules import Rule, RuleSet
from xmlschema_spark.sources.images import generate_images_df


def test_engine_keyref_with_secondary(spark):
    """FIXTURES.md §3: captions_i18n.image_id must reference images —
    orphans become 'key not found' violations (identities.py:298-318)."""
    images = generate_images_df(spark, 50, seed=3, distributed=False)
    ids = [r.image_id for r in images.select("image_id").limit(3).collect()]
    captions = spark.createDataFrame(
        [(ids[0], "en", "ok"), (ids[1], "de", "ok"),
         ("img_beef000000000000", "fr", "orphan"),
         (None, "es", "null fk is an absent tuple, not an orphan")],
        "image_id string, lang string, caption string",
    ).withColumn("part", F.lit("p0"))
    rs = RuleSet(
        [Rule("fk_images", "keyref", "",
              {"columns": ["image_id"], "refer_table": "images"})]
    )
    eng = ValidationEngine(rs, id_col="image_id", partition_col="part")
    res = eng.validate(captions, run_id="fk", secondary={"images": images},
                       with_stats=False)
    rows = res.violations.collect()
    res.unpersist()
    assert len(rows) == 1
    assert rows[0].row_id == "img_beef000000000000"
    assert "key not found in images" in rows[0].reason


def test_engine_keyref_missing_secondary_raises(spark):
    df = generate_images_df(spark, 10, seed=3, distributed=False)
    rs = RuleSet(
        [Rule("fk", "keyref", "", {"columns": ["image_id"], "refer_table": "reg"})]
    )
    with pytest.raises(ValueError, match="secondary"):
        ValidationEngine(rs).validate(df, with_stats=False)


def test_cli_synthetic_run(spark, tmp_path, capsys):
    from xmlschema_spark.cli import main

    rc = main([
        "--synthetic", "80", "--output", str(tmp_path), "--run-id", "clirun",
    ])
    # synthetic table injects corrupt/bad-fmt rows → some partitions FAIL
    assert rc == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "clirun" and out["failed"] > 0
    v = spark.read.parquet(str(tmp_path / "clirun" / "violations"))
    assert v.count() > 0


def test_cli_resume_mode(spark, tmp_path, capsys):
    from xmlschema_spark.cli import main

    rc1 = main([
        "--synthetic", "80", "--output", str(tmp_path), "--run-id", "r2",
        "--resume", "--batch-size", "3",
    ])
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # re-entry is a no-op on DONE partitions and produces the same summary
    rc2 = main([
        "--synthetic", "80", "--output", str(tmp_path), "--run-id", "r2",
        "--resume", "--batch-size", "3",
    ])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc1 == rc2 and out1 == out2


def test_cli_restriction_check(tmp_path, capsys):
    import json as _json

    import pytest

    from xmlschema_spark.cli import main
    from xmlschema_spark.rules import Rule, RuleCompileError, RuleSet

    base = tmp_path / "base.json"
    good = tmp_path / "good.json"
    bad = tmp_path / "bad.json"
    base.write_text(RuleSet([Rule("r1", "min", "w", {"value": 8})]).to_json())
    good.write_text(RuleSet([Rule("r1", "min", "w", {"value": 16})]).to_json())
    bad.write_text(RuleSet([Rule("r1", "min", "w", {"value": 4})]).to_json())

    rc = main(["--rules", str(good), "--restricts", str(base)])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out)["ok"] is True

    with pytest.raises(RuleCompileError, match="widens"):
        main(["--rules", str(bad), "--restricts", str(base)])
