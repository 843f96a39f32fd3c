"""spark-submit app: one parallelism level of the packaged scaling proof.

Launched by ``scripts/submit_scaling.py`` as

    taskset -c 0-<cores-1> spark-submit --master local[<cores>] \
        --driver-memory 48g --py-files xmlschema_spark.zip \
        scripts/submit_child.py --cores <cores> --n <images> [...]

with the working directory set to an empty scratch dir, so the
``xmlschema_spark`` package is importable ONLY from the shipped zip —
this is the literal "ships as a spark-submit --py-files job" clause of
the north rule, exercised rather than claimed. ``taskset`` on the
launcher plays the role of ``sched_setaffinity`` in the in-process
harness: spark-submit starts the JVM before any user Python runs, so the
mask must be applied from outside; every JVM pool and forked Python
worker inherits it.

The measured workload is byte-for-byte the same as
``scripts/scaling_bench.py``'s — both import it from
``xmlschema_spark.benchsuite`` (see that module for the suite shape and
FAIR-pool rationale) and speak the same RUN / SAMPLE
protocol, so the orchestrator can alternate samples between levels
within the same host-drift windows. Commands arrive via a polled file
(--cmd-file) because spark-submit's PythonRunner forwards the Python
driver's stdout up to the JVM but never forwards JVM stdin down.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--min-side", type=int, default=64)
    ap.add_argument("--max-side", type=int, default=128)
    ap.add_argument("--decode-half", action="store_true")
    ap.add_argument("--task-cpus", type=int, default=1)
    ap.add_argument("--cmd-file", required=True,
                    help="command file polled for RUN/EXIT lines (stdin is "
                         "NOT forwarded through spark-submit's PythonRunner)")
    args = ap.parse_args()

    # identical measurement conf to scaling_bench.py's child: AQE off for
    # the fixed-shape suite (its serial driver replanning distorts the
    # parallelism comparison; production keeps it on), FAIR scheduling so
    # the four outputs share slots, shuffle partitions sized by data
    # volume (64 at both levels), not cluster size.
    conf = {"spark.sql.adaptive.enabled": "false",
            "spark.scheduler.mode": "FAIR"}
    if args.task_cpus > 1:
        conf["spark.task.cpus"] = str(args.task_cpus)

    from xmlschema_spark.session import get_spark

    # under spark-submit the master is already local[cores] from the
    # launcher; get_spark sets the same value, plus the session defaults
    # (Arrow batch caps etc.) shared with every other harness.
    spark = get_spark("submit-scaling", cores=args.cores,
                      shuffle_partitions=64, extra_conf=conf)

    from xmlschema_spark.benchsuite import make_run_suite, prepare_input, serve

    df = prepare_input(spark, args.n, min_side=args.min_side,
                       max_side=args.max_side)
    serve(make_run_suite(spark, df, args.cores, args.decode_half),
          cmd_path=args.cmd_file)
    spark.stop()


if __name__ == "__main__":
    main()
