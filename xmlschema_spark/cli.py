"""spark-submit entry point: ``spark-submit --py-files xmlschema_spark.zip
-m`` style job runner (north rule: the engine ships as a spark-submit job).

Usage (cluster):

    zip -r xmlschema_spark.zip xmlschema_spark
    spark-submit --py-files xmlschema_spark.zip \
        --master <cluster> xmlschema_spark/cli.py \
        --input  <path-or-iceberg-table> \
        --rules  rules.json \
        --output /sinks/validation \
        --run-id run42 [--resume] [--mode lax] [--id-col image_id] \
        [--partition-col part]

Local smoke (synthetic input):

    python -m xmlschema_spark.cli --synthetic 5000 --output /tmp/val

Reads the input (parquet path or ``format:identifier``, e.g.
``iceberg:db.images``), compiles the rule table, and either runs a single
``validate()`` pass or a checkpointed partition-batched run (``--resume``
re-enters an interrupted run exactly — per-partition state lives under
``<output>/<run-id>/state.jsonl``).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.sql import SparkSession


def _load_input(spark: SparkSession, spec: str):
    if ":" in spec and not spec.startswith(("/", ".", "file:")):
        fmt, ident = spec.split(":", 1)
        if fmt == "iceberg":
            return spark.read.format("iceberg").load(ident)
        return spark.read.format(fmt).load(ident)
    return spark.read.parquet(spec)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="xmlschema_spark", description=__doc__)
    p.add_argument("--input", help="parquet path or format:identifier")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic images instead of --input")
    p.add_argument("--rules", help="rules JSON path (default: image suite)")
    p.add_argument("--output", help="sink directory (required unless --restricts)")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--mode", default="lax", choices=["strict", "lax", "skip"])
    p.add_argument("--id-col", default="image_id")
    p.add_argument("--partition-col", default="part")
    p.add_argument("--resume", action="store_true",
                   help="checkpointed partition-batched run (re-entrant)")
    p.add_argument("--batch-size", type=int, default=8,
                   help="partitions per batch in --resume mode")
    p.add_argument("--sink-format", default="parquet",
                   choices=["parquet", "iceberg"],
                   help="in --resume mode: parquet directory sinks (default) "
                        "or Iceberg tables — --output is then a catalog "
                        "namespace (e.g. ice.db) and --state-dir is required "
                        "for the local state.jsonl")
    p.add_argument("--state-dir",
                   help="state.jsonl location when --sink-format iceberg")
    p.add_argument("--partition-stats", action="store_true",
                   help="in --resume mode, also persist durable mergeable "
                        "per-partition HLL metrics rows (Iceberg "
                        "partition-statistics analog)")
    p.add_argument("--restricts", metavar="BASE_RULES_JSON",
                   help="assert --rules is a valid derivation-by-restriction "
                        "of this base rule set, then exit (no Spark job)")
    p.add_argument("--check-rules", metavar="RULES_JSON",
                   help="validate a rules document against the bundled "
                        "meta-ruleset (rules for rule tables — the "
                        "meta-schema analog), print violations, and exit")
    args = p.parse_args(argv)

    if args.check_rules:
        from xmlschema_spark.session import get_spark
        from xmlschema_spark.sources.rules_loader import validate_rules_document
        spark = SparkSession.getActiveSession() or get_spark("xmlschema_spark_cli")
        res = validate_rules_document(spark, args.check_rules)
        viols = [
            {"rule_id": r.rule_id, "offending_rule": r.row_id, "reason": r.reason}
            for r in res.violations.collect()
        ]
        print(json.dumps({"rules_document": args.check_rules,
                          "ok": not viols, "violations": viols}))
        return 1 if viols else 0

    if args.restricts:
        from xmlschema_spark.sources.rules_loader import load_rules_json
        if not args.rules:
            p.error("--restricts requires --rules")
        load_rules_json(args.rules).check_restriction_of(load_rules_json(args.restricts))
        print(json.dumps({"restriction_of": args.restricts, "ok": True}))
        return 0
    if not args.output:
        p.error("--output is required")

    # under spark-submit a session already exists; standalone, build one
    from xmlschema_spark.session import get_spark
    spark = SparkSession.getActiveSession() or get_spark("xmlschema_spark_cli")

    from xmlschema_spark.engine import ValidationEngine
    from xmlschema_spark.sources.rules_loader import default_image_ruleset, load_rules_json

    ruleset = load_rules_json(args.rules) if args.rules else default_image_ruleset()

    if args.synthetic:
        from xmlschema_spark.sources.images import generate_images_df
        df = generate_images_df(spark, args.synthetic, seed=42,
                                corrupt_frac=0.02, bad_fmt_frac=0.02)
    elif args.input:
        df = _load_input(spark, args.input)
    else:
        p.error("one of --input / --synthetic is required")

    ruleset.validate_against_schema(df.schema)
    engine = ValidationEngine(ruleset, id_col=args.id_col, partition_col=args.partition_col)

    if args.resume:
        from xmlschema_spark.checkpoint import CheckpointedRun
        run = CheckpointedRun(engine, args.output, args.run_id,
                              sink_format=args.sink_format,
                              state_dir=args.state_dir)
        run.run(df, batch_size=args.batch_size, with_stats=args.partition_stats)
        run.finish(df)
        verdicts = run.verdicts(spark)
        summary = {r.partition_id: r.status for r in verdicts.collect()}
    else:
        res = engine.validate(df, run_id=args.run_id, mode=args.mode)
        out = Path(args.output) / args.run_id
        res.violations.write.mode("overwrite").parquet(str(out / "violations"))
        res.verdicts.write.mode("overwrite").parquet(str(out / "verdicts"))
        if res.stats is not None:
            res.stats.write.mode("overwrite").parquet(str(out / "stats"))
        summary = {r.partition_id: r.status for r in res.verdicts.collect()}

    n_fail = sum(1 for s in summary.values() if s == "FAIL")
    print(json.dumps({"run_id": args.run_id, "partitions": len(summary), "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
