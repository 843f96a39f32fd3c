"""Benchmark harness — one JSON line to stdout.

Runs the headline operator queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), plus the full image
constraint-suite throughput (the BASELINE.json metric: validated
images/sec) on a deterministic synthetic image table.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "images_per_sec": ...}

Execution is forced with a noop-format write so every column of every
plan is actually computed (a bare count() would let Catalyst prune the
expensive projections).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry
from xmlschema_spark.session import get_spark
from xmlschema_spark.sources.images import generate_images_df

BENCH_QUERIES = [
    "row_violations_orders",      # wide single-pass facet projection
    "violation_counts_lineitem",  # facet pass + agg
    "verdicts_lineitem",          # full validate + verdict assembly
    "one_pass_verdicts_lineitem", # single-scan verdict path
    "unique_dups_salted",         # two-phase salted uniqueness agg
    "unique_dups_scoped",         # partition-scoped uniqueness
    "keyref_orphans",             # broadcast left-anti referential join
    "stats_profile_customer",     # single-pass wide stats agg
    "sketch_rollup_customer",     # per-partition HLL sketches + metadata-only rollup
    "quantiles_customer",         # single-agg quantile profile
    "psi_drift_events",           # SQL-only drift
    "ks_drift_events",            # applyInPandas drift
    "ks_exact_events",            # pure-Catalyst exact KS (counts + window cumsums)
    "exact_dedup_docs",           # hash-groupBy dedup
    "dedup_keep_docs",            # keep-representative dedup (window top-1)
    "dup_spans_docs",             # duplicated substring spans (gram agg + islands)
    "minhash_pairs_docs",         # minhash LSH band join
    "simhash_dups_docs",          # JVM-side simhash bit-votes + pigeonhole join
    "jaccard_pairs_docs",         # inverted-index exact jaccard
    "cosine_topk_embeddings",     # brute-force ANN baseline
    "ivf_topk_embeddings",        # IVF inverted-list ANN (scale path)
    "semantic_dedup_embeddings",  # SemDeDup: cell assign + within-cell dedup
    # lsh_topk_embeddings stays out of the bench: the oracle-certified
    # config is deliberately exhaustive (2 planes x 32 bands = full
    # recall), so its cost is not representative of a production config
    "token_counts_docs",          # JVM-side text analysis
    "quality_docs",               # quality scoring
    "nested_rules_docs",          # struct-field + forall array-element facets
    "duration_events",            # duration lexical + interval range facets
    "pricing_summary",            # general wide aggregation
    "top_orders_per_segment",     # broadcast join + top-k window
    "repetition_docs",            # explode + two-level partial agg (Gopher rules)
    "pii_docs",                   # regex detect + redact, codegen-only
    "decontam_docs",              # broadcast eval-shingle contamination join
    "sessions_events",            # per-user gap sessionization window
    "heavy_hitters_events",       # skew detector (single-scan via exchange reuse)
    "phash_near_dups",            # pigeonhole-blocked hamming self-join (8-byte sigs)
    "fd_violations_lineitem",     # functional-dependency audit (two-phase distinct agg)
    "time_gaps_events",           # silent-period detection, hot-scope split path
    "volume_anomaly_events",      # robust volume verdicts (median ± k·MAD)
    "freshness_events",           # per-partition ingest-liveness verdicts
    "header_check_images",        # zero-decode container-header validation
    "benford_orders",             # first-digit conformance (bounded grouped count)
    "vector_checks_embeddings",   # vector facet pass, pure HOF projections
    "snapshot_diff_orders",       # one full-outer join cross-snapshot reconciliation
    "seq_regressions_events",     # late-arrival audit, split-window scale path
    "completeness_events",        # per-partition null-rate verdicts (one wide agg)
    "distinctness_events",        # per-partition cardinality verdicts (Expand-collapse distinct)
    "corr_drift_lineitem",        # cross-column Pearson drift (one-pass co-moment sums)
    "quality_suite_events",       # ONE-PASS quality suite (4 verdict families, 1 scan)
    "paired_alignment_embeddings", # cross-modal pair alignment (map-only cosine)
    "lm_score_docs",              # bigram LM scoring (vocab-dim join + per-doc avg)
    "lm3_score_docs",             # interpolated trigram LM (4 broadcast model dims)
    "entropy_docs",               # token entropy (two-level partial agg)
    "lang_trigram_docs",          # char-trigram lang ID (broadcast profile + argmax)
    "wav_header_check_audio",     # zero-decode RIFF/WAVE header validation
    "gif_header_check_videos",    # zero-decode GIF header validation
    "keyref_coverage_orders",     # referential-coverage verdicts (BHJ + one agg)
]

# sized so the timed suite runs for several seconds after the Arrow-native
# decode speedups (20k images finished in ~1-2s at local[32] — too short a
# window on a drifting shared VM)
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "50000"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # FAIR job scheduling (fixed at context creation): the image-suite
    # phase below submits four independent outputs concurrently; FAIR keeps
    # the tiny set-level jobs from queueing behind the decode stage. The
    # serial per-query timings above are unaffected (one job at a time).
    spark = get_spark("bench", cores=cpus, extra_conf={"spark.scheduler.mode": "FAIR"})

    qs = dict(entry.queries())
    # the production xxhash64 near-dup variants stay benched although they
    # left the queries() registry (their md5 siblings carry the oracle
    # certification; the xxhash path is what runs at scale)
    qs["minhash_pairs_docs"] = entry.q_minhash_pairs_docs
    qs["simhash_dups_docs"] = entry.q_simhash_dups_docs

    # untimed warm-up: JVM/codegen compile, parquet footer reads, Python
    # worker pool spin-up — so per-query numbers reflect steady state
    from pyspark.sql import functions as F

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf's signature inference rejects
    _warm = F.pandas_udf(lambda s: s * 1.0, "double")

    spark.range(0, 10_000, 1, 64).select(_warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()
    _force(qs["pricing_summary"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    entry.release_shared_caches()

    # --- headline: full constraint-suite pass over the image+caption table,
    # in the production throughput shape proven out in BENCH.md: the
    # suite's four independent outputs (single-scan one-pass verdicts with
    # every row facet + Arrow decode/PSNR/phash + per-column stats;
    # uniqueness on image_id; salted uniqueness on phash; per-partition PSI
    # drift) submitted CONCURRENTLY with default task sizing — the
    # scheduler fills decode-UDF Arrow/Python stalls with JVM-only tasks
    # from the sibling jobs (measured ~75% faster at local[32] than
    # task.cpus=2 serial; see BENCH.md). AQE is toggled off for this
    # fixed-shape phase only: its per-stage driver replanning adds serial
    # latency and buys nothing when stage shapes are static.
    from xmlschema_spark.benchsuite import make_run_suite

    # 256 partitions = several task waves per slot at local[32]: decode
    # task times vary ~4x with image area, and few-wave schedules turn
    # that variance into idle-slot tails (see BENCH.md)
    df = generate_images_df(
        spark, N_IMAGES, seed=99, n_parts=256,
        null_frac=0.02, bad_dims_frac=0.02, corrupt_frac=0.02, dup_id_frac=0.02,
        min_side=64, max_side=96,  # production-like payloads: decode-bound
    )
    df = df.cache()
    df.count()  # materialize input outside the timed window
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # the suite shape (job set, FAIR pools, stage-scoped decode sizing via
    # coalesce(cores/2) — measured ~40% faster than full-slot decode at 8
    # cores AND the config that clears the >=0.8 scaling bar) is shared
    # with both scaling harnesses: xmlschema_spark/benchsuite.py
    run_suite = make_run_suite(spark, df, int(cpus), decode_half=True)

    run_suite()  # untimed plan-compile warm-up (same run_id → same plans)
    t0 = time.time()
    run_suite()
    suite_sec = time.time() - t0
    timings["image_constraint_suite"] = round(suite_sec, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    df.unpersist()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation+pipeline operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "images_per_sec": round(N_IMAGES / suite_sec, 1),
                "n_images": N_IMAGES,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
