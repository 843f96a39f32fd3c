"""Round-4 additions: the committed image row-rules fixture, the
driver-certified image_suite_rowrules / sessions_split_events queries,
and the certification-window composition contract."""

from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parents[1]


def test_rowrules_fixture_matches_generator():
    """The committed fixture parquet must be value-identical to the
    deterministic generator at the pinned parameters — the fixture file
    cannot drift from the code that documents it."""
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    from make_image_fixture import OUT, build_table

    assert OUT.exists(), "run scripts/make_image_fixture.py"
    committed = pq.read_table(OUT)
    regenerated = build_table()
    assert committed.schema == regenerated.schema
    assert committed.num_rows == regenerated.num_rows == 400
    assert committed.equals(regenerated)


def test_rowrules_fixture_has_every_family():
    """Sanity: each injected row-rule violation family is present (12
    rows per family at frac 0.03 x n=400)."""
    t = pq.read_table(REPO / "fixtures" / "images_rowrules.parquet").to_pandas()
    assert (t["fmt"].isna()).sum() == 12  # null family
    assert (t["fmt"] == "tiff").sum() == 12  # bad_fmt
    assert (t["image_id"] == "img_d0d0d0d0d0d0d0d0").sum() == 12  # dup_id
    assert (t["phash"] == 4242424242).sum() == 12  # hot_phash
    assert (t["caption"].str.len() > 512).sum() == 12  # long_caption
    assert t["image_id"].str.startswith("BAD ").sum() == 12  # bad_id
    assert (~t["created_at"].str.endswith("Z")).sum() == 12  # bad_tz
    assert (t["animated"] == "yes").sum() == 12  # bad_bool
    assert t["tag"].str.startswith("1").sum() == 12  # bad_qname
    assert (t["icc_hex"].str.len() % 2 == 1).sum() == 12  # bad_hex
    assert t["exif_b64"].str.endswith("%").sum() == 12  # bad_b64
    assert t["flags"].str.contains("BAD!", regex=False).sum() == 12  # bad_list
    assert (~t["retention"].str.startswith("P")).sum() == 12  # bad_duration


def test_image_suite_rowrules_counts(spark):
    """The row-rule subset flags exactly the injected families: every
    per-rule count is the seeded 12, and the two table-scope rules
    collapse their 12 duplicate rows to ONE duplicated-value row each."""
    import __spark_entry__ as entry

    out = entry.q_image_suite_rowrules(spark, "unused")
    by_rule = {
        r.rule_id: r.n
        for r in out.groupBy("rule_id").count().withColumnRenamed("count", "n").collect()
    }
    assert by_rule == {
        "fmt_not_null": 12,
        "fmt_enum": 12,
        "caption_len": 12,
        "id_pattern": 12,
        "created_tz": 12,
        "animated_bool": 12,
        "tag_qname": 12,
        "icc_hex_ok": 12,
        "exif_b64_ok": 12,
        "flags_list": 12,
        "retention_dur": 12,
        "id_unique": 1,
        "phash_unique": 1,
    }
    sev = {r.rule_id: r.severity for r in out.select("rule_id", "severity").distinct().collect()}
    assert sev["phash_unique"] == "warning" and sev["id_unique"] == "error"


def test_certification_window_composition():
    """The driver's correctness gate checks the FIRST 50 queries()
    entries. Contract: at most one rows-only entry in the window, and
    every oracle-eligible round-4 addition inside it."""
    import __spark_entry__ as entry

    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    window = qs[:50]
    no_oracle = [q for q in window if q not in oracles]
    assert no_oracle == [], no_oracle
    assert "image_suite_rowrules" in window
    assert "sessions_split_events" in window
    assert "dup_spans_docs" in window
    assert "semantic_dedup_embeddings" in window
    assert "header_check_images" in window
    assert "fd_violations_lineitem" in window
    assert "time_gaps_events" in window
    assert "snapshot_diff_orders" in window
    # round-5 additions (freshness_events / completeness_events demoted:
    # their verdicts stay covered in-window by quality_suite_events)
    assert "wav_header_check_audio" in window
    assert "gif_header_check_videos" in window
    assert "lang_trigram_docs" in window
    assert "lm3_score_docs" in window
    assert "freshness_events" not in window
    assert "completeness_events" not in window
    assert "volume_anomaly_events" not in window
    assert "near_dedup_keep_docs" not in window
    assert "seq_regressions_events" in window
    assert "vector_checks_embeddings" in window
    assert "benford_orders" in window
    assert "distinctness_events" in window
    assert "corr_drift_lineitem" in window
    assert "quality_suite_events" in window
    assert "paired_alignment_embeddings" in window
    assert "lm_score_docs" in window
    assert "entropy_docs" in window
    assert "keyref_coverage_orders" in window
    # past-window entries must all have been driver-certified before
    # (image/pandas-UDF queries and the xxhash64 fingerprint excepted:
    # rows-only by necessity, each with an oracle-certified sibling)
    rows_only_ok = {"image_suite_verdicts", "image_decode_stats",
                    "image_features", "fingerprint_docs",
                    "audio_decode_stats", "video_frames_stats"}
    past = [q for q in qs[50:] if q not in oracles and q not in rows_only_ok]
    assert past == [], past


@pytest.mark.parametrize("unit", ["day", "hour"])
def test_sessions_split_query_agrees_with_single_window(spark, unit):
    """Driver-level agreement on real fixture data (sf0.001): the split
    scale path must produce the identical session rollup."""
    from xmlschema_spark.operators import curation as cur

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/events.parquet")
    a = cur.session_stats(df, "user_id", "ts", 1800, "event_id").collect()
    b = cur.session_stats(df, "user_id", "ts", 1800, "event_id", split_by=unit).collect()
    key = lambda r: (r.user_id, r.session_idx)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({key(r) for r in a}) == len(a)


# -------------------------------------------------- w1 (Wasserstein) drift


def test_divergence_w1_matches_numpy(spark):
    """w1 against a hand-rolled numpy computation of the binned
    earth-mover formula: sum |cumsum(p - q)| * bin_width, UNsmoothed."""
    import numpy as np

    from xmlschema_spark.operators import drift

    rows = [("stable", float(i % 50)) for i in range(200)]
    rows += [("shifted", 40.0 + (i % 10)) for i in range(100)]
    rows.append(("allnull", None))
    df = spark.createDataFrame(rows, "part string, v double")
    got = {r.part: r.w1 for r in drift.divergence(df, "v", "part", metric="w1").collect()}

    vals = df.collect()
    lo, hi, bins = 0.0, 49.0, 10
    def hist(vs):
        c = np.zeros(bins)
        for v in vs:
            c[min(max(int((v - lo) / (hi - lo) * bins), 0), bins - 1)] += 1
        return c
    all_v = [r.v for r in vals if r.v is not None]
    q = hist(all_v) / len(all_v)
    for part in ("stable", "shifted"):
        pv = [r.v for r in vals if r.part == part and r.v is not None]
        p = hist(pv) / len(pv)
        expect = float(np.sum(np.abs(np.cumsum(p - q))) * ((hi - lo) / bins))
        assert got[part] == pytest.approx(expect, rel=1e-9)
    # w1 is in the units of v: the shifted partition's mass sits tens of
    # units from the mix, the stable one's within a few
    assert got["shifted"] > got["stable"]
    assert got["shifted"] > 5.0
    # all-null partition = full transport distance vs reference (> 0,
    # unlike chi2's zero-sample zero: there IS no matching distribution)
    assert got["allnull"] > 0.0


def test_divergence_w1_zero_for_identical_distribution(spark):
    from xmlschema_spark.operators import drift

    rows = [(p, float(i % 20)) for p in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "part string, v double")
    got = {r.part: r.w1 for r in drift.divergence(df, "v", "part", metric="w1").collect()}
    assert got["a"] == pytest.approx(0.0, abs=1e-12)
    assert got["b"] == pytest.approx(0.0, abs=1e-12)
