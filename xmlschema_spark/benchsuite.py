"""The production-shape benchmark suite shared by both scaling harnesses.

``scripts/scaling_bench.py`` (persistent in-process pinned JVMs) and
``scripts/submit_scaling.py`` (``spark-submit --py-files`` packaged jobs)
both run THIS code, so their throughput numbers are directly comparable:
any efficiency difference between them is attributable to the launch
path, not the workload. Living inside the package, it ships in the
``--py-files`` zip like everything else.

The suite is the full default image constraint suite in its production
throughput shape:

- ``validate_one_pass``: every row facet + Arrow-native zero-copy decode /
  PSNR / phash invariant + per-column stats — ONE scan + ONE partial-agg
  shuffle (semantics proven equal to the multi-job ``validate()`` in
  ``tests/test_one_pass.py`` and by the DuckDB oracle);
- the set-level rules that inherently own their shuffles: uniqueness on
  ``image_id`` and salted uniqueness on ``phash``;
- the per-partition PSI drift check.

The four outputs are INDEPENDENT, so they are submitted concurrently
(standard multi-job Spark practice), each in its OWN fair-scheduler pool:
FAIR mode shares slots between pools, while jobs sharing one pool still
queue FIFO within it — under FIFO the later-submitted tiny jobs would
starve behind the long decode stage, an Amdahl tail the 4N level pays for
4x as dearly.
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def prepare_input(
    spark: SparkSession, n: int, *, min_side: int = 64, max_side: int = 128
) -> DataFrame:
    """Deterministic synthetic image+caption input, cached before timing.

    256 input partitions = 8 task waves at 32 slots (vs 2 waves at 64
    parts): per-task decode times vary ~4x with image area, and a 2-wave
    schedule turns that variance into an idle-slot tail at exactly the 4N
    level. 2-4+ waves per slot is the standard sizing rule; the per-task
    overhead it adds at N is negligible."""
    from xmlschema_spark.sources.images import generate_images_df

    df = generate_images_df(
        spark, n, seed=1234, n_parts=256,
        null_frac=0.02, bad_dims_frac=0.02, corrupt_frac=0.02, dup_id_frac=0.02,
        min_side=min_side, max_side=max_side,
    )
    df = df.cache()
    df.count()  # materialize input before timing
    return df


def make_run_suite(
    spark: SparkSession, df: DataFrame, cores: int, decode_half: bool
) -> Callable[[], None]:
    """Build the timed suite callable over a prepared (cached) input.

    ``decode_half``: stage-scoped footprint matching (local-mode
    substitute for a ``task.cpus=2`` stage-level resource profile, which
    local mode does not support): ``coalesce(cores/2)`` — a narrow
    dependency, NO shuffle — caps the fused scan+decode+partial-agg stage
    at cores/2 concurrent tasks, so its true thread footprint (JVM task
    thread + Arrow Python worker per task) equals the core count, while
    the sibling JVM-only jobs keep full slot parallelism over the
    256-partition cache."""
    from xmlschema_spark.engine import ValidationEngine
    from xmlschema_spark.operators import drift as drift_ops
    from xmlschema_spark.operators import identity as id_ops
    from xmlschema_spark.sources.rules_loader import default_image_ruleset

    eng = ValidationEngine(default_image_ruleset())

    jobs = [
        lambda: id_ops.duplicate_values(df, ["image_id"])
        .write.format("noop").mode("overwrite").save(),
        lambda: id_ops.duplicate_values(df, ["phash"], salt_partitions=16)
        .write.format("noop").mode("overwrite").save(),
        lambda: drift_ops.psi(df, "w", "part", bins=10)
        .write.format("noop").mode("overwrite").save(),
        lambda: eng.validate_one_pass(
            df.coalesce(max(1, cores // 2)) if decode_half else df,
            run_id="scale", with_stats=True)
        .write.format("noop").mode("overwrite").save(),
    ]

    def in_pool(i: int, job: Callable[[], None]) -> None:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", "suite%d" % i)
        try:
            job()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    def run_suite() -> None:
        # tiny set-level jobs submitted first, the long decode job last
        with ThreadPoolExecutor(4) as ex:
            for f in [ex.submit(in_pool, i, j) for i, j in enumerate(jobs)]:
                f.result()

    return run_suite


def serve(run_suite: Callable[[], None], cmd_path: str | None = None) -> None:
    """Command-driven sampling loop shared by both harness children.

    One untimed warm-up spins up the Python worker pool (pandas/numpy
    import per core) and JIT/codegen-compiles every plan in the suite —
    cluster provisioning + first-query compile cost, not steady-state
    throughput. Timed samples reuse the same run_id so plans are
    identical. The orchestrator alternates RUN requests between the two
    parallelism levels; between requests the child idles.

    Command channel: ``cmd_path=None`` reads RUN/EXIT lines from stdin
    (the in-process harness launches a plain ``python`` child, whose
    stdin the orchestrator owns). Under ``spark-submit`` stdin does NOT
    work — Spark's PythonRunner pipes the Python driver's stdout up to
    the JVM's, but never forwards the JVM's stdin down — so the packaged
    harness passes a ``cmd_path`` file instead, which this loop polls for
    appended commands. Responses go to stdout in both modes."""
    run_suite()
    print("READY", flush=True)

    def commands():
        if cmd_path is None:
            yield from (line.strip() for line in sys.stdin)
            return
        seen = 0
        while True:
            try:
                lines = open(cmd_path).read().splitlines()
            except FileNotFoundError:
                lines = []
            if len(lines) <= seen:
                time.sleep(0.2)
                continue
            for line in lines[seen:]:
                yield line.strip()
            seen = len(lines)

    for cmd in commands():
        if cmd == "RUN":
            t0 = time.time()
            run_suite()
            print("SAMPLE %.3f" % (time.time() - t0), flush=True)
        elif cmd == "EXIT":
            break
