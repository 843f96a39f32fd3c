"""ValidationEngine — scan → wide rule pass → violations + verdicts.

Lifecycle (the Spark re-expression of ``schema.validate()``,
/root/reference/xmlschema/validators/schema.py:946-1020, per SURVEY.md §3.2):

1. driver compiles the rule set (once — the analog of XsdGlobals.build),
2. ONE wide projection evaluates every row-level rule as a boolean column
   fused by whole-stage codegen; failing rules fold into an array of
   violation structs per row; explode → violation rows,
3. set-level rules (unique/key/keyref) run as hash aggregations /
   left-anti joins,
4. dataset-level rules (decode_image, phash_consistency, drift) run as
   pandas-UDF passes over pruned column sets,
5. verdict assembly: per-partition PASS/FAIL + counts + metrics.

Validation modes mirror XSD_VALIDATION_MODES (xsdbase.py:24,674-705):
``strict`` fail-fast (first violation only), ``lax`` collect everything,
``skip`` no checks (stats only).

Violation rows mirror XMLSchemaValidationError{validator, obj, reason,
path} (exceptions.py:182-232); verdict rows carry the PSVI validity
triple collapsed to PASS/FAIL per partition (xsdbase.py:62-92).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xmlschema_spark.compiler import compile_row_rule, violation_reason
from xmlschema_spark.operators import drift as drift_ops
from xmlschema_spark.operators import identity as id_ops
from xmlschema_spark.operators import multimodal as mm_ops
from xmlschema_spark.operators import stats as stats_ops
from xmlschema_spark.operators import text as _text_ops  # noqa: F401 —
# imported for its side effect: registers the lang_expected rule kind
# (the same pattern multimodal uses for header_consistent)
from xmlschema_spark.rules import RuleSet

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.StringType()),
        T.StructField("rule_id", T.StringType()),
        T.StructField("row_id", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("severity", T.StringType()),
    ]
)


@dataclass
class ValidationResult:
    run_id: str
    violations: DataFrame
    verdicts: DataFrame
    stats: DataFrame | None = None
    mode: str = "lax"
    extras: dict = field(default_factory=dict)

    def unpersist(self) -> None:
        """Release every DataFrame this run persisted (violations plus
        intermediates like the decode-check table). Without this, a later
        identical run would silently serve Spark's plan-matching cache."""
        for df in [self.violations, *self.extras.get("persisted", [])]:
            try:
                df.unpersist()
            except Exception:
                pass


class ValidationEngine:
    """Compiled validator for one table shape.

    ``id_col`` identifies rows in violation output (the analog of the
    error's element path); ``partition_col`` is the verdict/checkpoint
    scope (the Iceberg partition analog, cf. reference per-subtree scope
    at elements.py:546-551).
    """

    def __init__(
        self,
        ruleset: RuleSet,
        id_col: str = "image_id",
        partition_col: str = "part",
    ):
        self.ruleset = ruleset
        self.id_col = id_col
        self.partition_col = partition_col
        # compile row rules once, driver-side
        self._row_rules = ruleset.row_rules
        self._row_preds = [(r, compile_row_rule(r), violation_reason(r)) for r in self._row_rules]

    # ------------------------------------------------------------------ row

    def row_violations(self, df: DataFrame, run_id: str) -> DataFrame:
        """One scan; every rule a boolean; failures exploded to rows."""
        if not self._row_preds:
            return df.sparkSession.createDataFrame([], VIOLATION_SCHEMA)
        structs = [
            F.when(
                ~ok,
                F.struct(
                    F.lit(r.rule_id).alias("rule_id"),
                    F.lit(r.column or "").alias("column"),
                    (F.col(r.column).cast("string") if r.column else F.lit(None).cast("string")).alias("value"),
                    F.lit(reason).alias("reason"),
                    F.lit(r.severity).alias("severity"),
                ),
            )
            for r, ok, reason in self._row_preds
        ]
        # Plan-shape rules learned the hard way (each measured ~2-6x wall
        # on a computed-column rule suite like the interval parse):
        # - no filter(size(__v) > 0) before the explode: explode (not
        #   explode_outer) already emits zero rows for an empty array, and
        #   a size() pre-filter collapses into the projection, DUPLICATING
        #   the entire rule-struct array expression per row;
        # - the explode lives in the SAME select that builds the array: a
        #   separate project of __v followed by explode("__v") keeps the
        #   Generate's child materializing the full struct array alongside
        #   the generator (measured 6x slower than the inline form).
        exploded = df.select(
            F.col(self.id_col).cast("string").alias("row_id"),
            F.col(self.partition_col).cast("string").alias("partition_id"),
            F.explode(F.array_compact(F.array(*structs))).alias("v"),
        )
        return exploded.select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            F.col("v.rule_id").alias("rule_id"),
            "row_id",
            F.col("v.column").alias("column"),
            F.col("v.value").alias("value"),
            F.col("v.reason").alias("reason"),
            F.col("v.severity").alias("severity"),
        )

    # ------------------------------------------------------------------ set

    def set_violations(
        self, df: DataFrame, run_id: str, secondary: dict[str, DataFrame] | None = None
    ) -> list[DataFrame]:
        """unique / key / keyref violations, reference duplicate semantics:
        one violation per duplicated VALUE (identities.py:217-221)."""
        out: list[DataFrame] = []
        secondary = secondary or {}
        for r in self.ruleset.set_rules:
            cols = list(r.param("columns", []))
            scope = self.partition_col if r.scope == "partition" else None
            if r.kind in ("unique", "key"):
                dups = id_ops.duplicate_values(
                    df, cols, scope_col=scope,
                    salt_partitions=int(r.param("salt_partitions", 0)),
                )
                part = F.col(scope).cast("string") if scope else F.lit("__table__")
                out.append(
                    dups.select(
                        F.lit(run_id).alias("run_id"),
                        part.alias("partition_id"),
                        F.lit(r.rule_id).alias("rule_id"),
                        F.concat_ws("|", *[F.col(c).cast("string") for c in cols]).alias("row_id"),
                        F.lit(",".join(cols)).alias("column"),
                        F.concat_ws("|", *[F.col(c).cast("string") for c in cols]).alias("value"),
                        F.concat(
                            F.lit(f"duplicated value for {r.kind} constraint ({r.rule_id}): x"),
                            F.col("dup_count").cast("string"),
                        ).alias("reason"),
                        F.lit(r.severity).alias("severity"),
                    )
                )
                if r.kind == "key":
                    nulls = id_ops.key_null_rows(df, cols, self.id_col)
                    out.append(
                        nulls.select(
                            F.lit(run_id).alias("run_id"),
                            F.lit("__table__").alias("partition_id"),
                            F.lit(r.rule_id).alias("rule_id"),
                            F.col("row_id").cast("string").alias("row_id"),
                            F.concat_ws(",", "null_columns").alias("column"),
                            F.lit(None).cast("string").alias("value"),
                            F.lit("missing key field (key fields are required)").alias("reason"),
                            F.lit(r.severity).alias("severity"),
                        )
                    )
            elif r.kind in ("keyref", "idref"):
                if r.kind == "idref":
                    # IDREF → xs:ID pairing sugar (builtins.py:328-341):
                    # a same-table keyref, no secondary needed
                    ref_name = "<same table>"
                    pk_df = df
                else:
                    ref_name = r.param("refer_table")
                    pk_df = secondary.get(ref_name)
                    if pk_df is None:
                        raise ValueError(
                            f"{r.rule_id}: keyref refers to table {ref_name!r}; "
                            f"pass it via secondary={{'{ref_name}': df}}"
                        )
                orphans = id_ops.keyref_orphans(
                    df, cols, pk_df, list(r.param("refer_columns", cols)),
                    broadcast_pk=r.param("broadcast_pk"),
                )
                out.append(
                    orphans.select(
                        F.lit(run_id).alias("run_id"),
                        F.col(self.partition_col).cast("string").alias("partition_id"),
                        F.lit(r.rule_id).alias("rule_id"),
                        F.col(self.id_col).cast("string").alias("row_id"),
                        F.lit(",".join(cols)).alias("column"),
                        F.concat_ws("|", *[F.col(c).cast("string") for c in cols]).alias("value"),
                        F.lit(f"key not found in {ref_name} (keyref {r.rule_id})").alias("reason"),
                        F.lit(r.severity).alias("severity"),
                    )
                )
        return out

    # -------------------------------------------------------------- dataset

    def dataset_violations(
        self, df: DataFrame, run_id: str, persisted: list | None = None
    ) -> list[DataFrame]:
        out: list[DataFrame] = []
        persisted = persisted if persisted is not None else []
        decode_rules = [r for r in self.ruleset.dataset_rules if r.kind == "decode_image"]
        phash_rules = [r for r in self.ruleset.dataset_rules if r.kind == "phash_consistency"]
        if decode_rules or phash_rules:
            psnr_db = float((decode_rules or phash_rules)[0].param("psnr_db", 40.0))
            checks = mm_ops.decode_check(
                df,
                psnr_db=psnr_db,
                id_col=self.id_col,
                check_phash=bool(phash_rules),
                phash_max_hamming_lossy=(
                    int(phash_rules[0].param("max_hamming_lossy", 20)) if phash_rules else 20
                ),
                # the partition column rides through the UDF — joining it
                # back by id afterwards would cost a broadcast + join
                passthrough=[self.partition_col],
            ).withColumn("partition_id", F.col(self.partition_col).cast("string"))
            # decode + phash rules both filter this DF — persist so the
            # Arrow decode pass over the binary column runs exactly once.
            checks = checks.persist()
            persisted.append(checks)
            if decode_rules:
                r = decode_rules[0]
                bad = checks.filter(
                    ~F.col("decode_ok") | ~F.col("dims_match") | ~F.col("fmt_match") | ~F.col("psnr_ok")
                )
                out.append(
                    bad.select(
                        F.lit(run_id).alias("run_id"),
                        F.coalesce("partition_id", F.lit("__table__")).alias("partition_id"),
                        F.lit(r.rule_id).alias("rule_id"),
                        F.col("image_id").alias("row_id"),
                        F.lit("bytes").alias("column"),
                        F.lit(None).cast("string").alias("value"),
                        F.concat_ws(
                            "; ",
                            F.when(~F.col("decode_ok"), F.concat(F.lit("decode failed: "), F.coalesce("error", F.lit("")))),
                            F.when(F.col("decode_ok") & ~F.col("fmt_match"), F.lit("container fmt != declared fmt")),
                            F.when(F.col("decode_ok") & ~F.col("dims_match"), F.lit("decoded dims != declared (w,h)")),
                            F.when(F.col("decode_ok") & ~F.col("psnr_ok"), F.concat(F.lit("psnr below threshold: "), F.round("psnr", 2).cast("string"))),
                        ).alias("reason"),
                        F.lit(r.severity).alias("severity"),
                    )
                )
            if phash_rules:
                r = phash_rules[0]
                bad = checks.filter(F.col("decode_ok") & ~F.col("phash_match"))
                out.append(
                    bad.select(
                        F.lit(run_id).alias("run_id"),
                        F.coalesce("partition_id", F.lit("__table__")).alias("partition_id"),
                        F.lit(r.rule_id).alias("rule_id"),
                        F.col("image_id").alias("row_id"),
                        F.lit("phash").alias("column"),
                        F.lit(None).cast("string").alias("value"),
                        F.lit("stored phash != phash of decoded pixels").alias("reason"),
                        F.lit(r.severity).alias("severity"),
                    )
                )
        for r in self.ruleset.dataset_rules:
            if r.kind in ("drift_ks", "drift_psi"):
                col = r.param("column") or r.column
                threshold = float(r.param("threshold", 0.2))
                if r.kind == "drift_psi":
                    scores = drift_ops.psi(df, col, self.partition_col, bins=int(r.param("bins", 10)))
                    stat_col = "psi"
                else:
                    scores = drift_ops.ks(df, col, self.partition_col)
                    stat_col = "ks"
                bad = scores.filter(F.col(stat_col) > threshold)
                out.append(
                    bad.select(
                        F.lit(run_id).alias("run_id"),
                        F.col(self.partition_col).cast("string").alias("partition_id"),
                        F.lit(r.rule_id).alias("rule_id"),
                        F.lit(None).cast("string").alias("row_id"),
                        F.lit(col).alias("column"),
                        F.round(F.col(stat_col), 6).cast("string").alias("value"),
                        F.lit(f"{stat_col} drift above {threshold} vs reference").alias("reason"),
                        F.lit(r.severity).alias("severity"),
                    )
                )
        return out

    # ----------------------------------------------------------------- main

    def validate(
        self,
        df: DataFrame,
        run_id: str = "run0",
        mode: str = "lax",
        secondary: dict[str, DataFrame] | None = None,
        with_stats: bool = True,
    ) -> ValidationResult:
        if mode not in ("strict", "lax", "skip"):
            raise ValueError(f"bad mode {mode!r} (XSD_VALIDATION_MODES, xsdbase.py:24)")
        spark = df.sparkSession

        stats_df = None
        if with_stats or mode == "skip":
            profile_cols = [
                f.name for f in df.schema.fields if f.name != self.partition_col
            ]
            stats_df = stats_ops.profile(df, profile_cols)

        if mode == "skip":
            # skip decodes raw, checks nothing (simple_types.py:334,518-523)
            empty = spark.createDataFrame([], VIOLATION_SCHEMA)
            verdicts = self._verdicts(df, empty, run_id, attempted="none")
            return ValidationResult(run_id, empty, verdicts, stats_df, mode)

        persisted: list = []
        if mode == "strict":
            # fail-fast, like validation='strict' raising at the first
            # yield (xsdbase.py:698-701): branches are evaluated in cost
            # order — the cheap row-rule scan first, then the set-level
            # shuffles, then the dataset-level decode UDFs — and each
            # later branch is not even PLAN-BUILT unless every earlier
            # one came back clean. A lazy union + limit(1) would let
            # Spark evaluate the expensive branches before finding a row.
            branch_makers = [
                lambda: [self.row_violations(df, run_id)],
                lambda: self.set_violations(df, run_id, secondary),
                lambda: self.dataset_violations(df, run_id, persisted=persisted),
            ]
            violations = spark.createDataFrame([], VIOLATION_SCHEMA)
            for make in branch_makers:
                hit_found = False
                for branch in make():
                    # deterministic "first": min (rule_id, row_id) within the
                    # first failing branch. A rule table has no document order
                    # (the reference raises at the first error in document
                    # order, xsdbase.py:698-701), so a defined total order is
                    # the distributed analog — the same input always reports
                    # the same violation, which a bare limit(1) does not
                    # guarantee. orderBy+limit compiles to
                    # TakeOrderedAndProject (per-partition top-1, driver
                    # merge), NOT a global sort — same cost shape as limit(1).
                    hit = branch.orderBy("rule_id", "row_id").limit(1).persist()
                    if hit.take(1):
                        violations = hit
                        hit_found = True
                        break
                    hit.unpersist()
                if hit_found:
                    break
            verdicts = self._verdicts(
                df, violations, run_id,
                attempted="partial" if hit_found else "full",
            )
            return ValidationResult(
                run_id, violations, verdicts, stats_df, mode,
                extras={"persisted": persisted},
            )

        parts = [self.row_violations(df, run_id)]
        parts += self.set_violations(df, run_id, secondary)
        parts += self.dataset_violations(df, run_id, persisted=persisted)
        violations = parts[0]
        for p in parts[1:]:
            violations = violations.unionByName(p)

        # violations are consumed at least twice (caller sink + verdict
        # aggregation) — persist so the wide pass / decode UDFs / joins run
        # once. Violations are tiny relative to the input scan, so this
        # holds at 10^12-row scale where recomputing the scan would not.
        violations = violations.persist()
        verdicts = self._verdicts(df, violations, run_id)
        return ValidationResult(
            run_id, violations, verdicts, stats_df, mode,
            extras={"persisted": persisted},
        )

    # ------------------------------------------------------------- one-pass

    def validate_one_pass(
        self,
        df: DataFrame,
        run_id: str = "run0",
        with_stats: bool = True,
        stats_columns: list[str] | None = None,
        distinct_rsd: float = 0.1,
    ) -> DataFrame:
        """ONE scan + ONE small shuffle: per-partition verdicts with
        per-rule violation counts and (optionally) per-column stats.

        This is the 10^12-row execution shape (SURVEY.md §3.2 "single wide
        pass"): the full `validate()` path prices one scan per rule family
        (fine when the input is cached; ruinous on a 100 TB table). Here:

        1. if decode/phash rules exist, the Arrow decode UDF runs INSIDE
           the scan, passing every rule column through,
        2. every row rule and decode invariant becomes a 0/1 column,
        3. one ``groupBy(partition)`` with map-side partial aggregation
           emits rows_checked + per-rule counts + column stats.

        Row-level violation DETAIL rows and set-level rules (unique /
        keyref — inherently their own shuffles) remain on ``validate()``;
        verdict semantics here match it exactly (tested).

        STRING columns' ``__min``/``__max`` stats are order-preserving
        7-byte UTF-8 prefixes (exact prefixes of the true min/max): exact
        full-string min/max needs a variable-width aggregation buffer,
        which would demote this entire one-pass aggregation from a
        streaming HashAggregate to a full-sort SortAggregate. Exact string
        min/max lives in :func:`operators.stats.profile`.
        """
        decode_rules = [r for r in self.ruleset.dataset_rules if r.kind == "decode_image"]
        phash_rules = [r for r in self.ruleset.dataset_rules if r.kind == "phash_consistency"]

        src = df
        check_exprs: list = []
        decode_str_stats: dict[str, tuple[str, str, str]] = {}
        if decode_rules or phash_rules:
            # Evaluate every ROW-rule predicate JVM-side BEFORE the Arrow
            # UDF (fused into the scan by codegen) and carry only the 0/1
            # flags through — so the multi-KB ``bytes`` payload crosses
            # into Python exactly once (decode input) and NEVER comes
            # back: at 10^12 rows the Python→JVM Arrow copy of the
            # payload would otherwise double the suite's memory traffic.
            # The same thinking applies to STRING stats columns: instead
            # of round-tripping variable-width strings through Arrow, only
            # their fixed-width stats inputs cross — null flag, 7-byte
            # prefix ordinal (min/max), xxhash64 (HLL hashes its input
            # anyway, so approx_count_distinct over the hash estimates the
            # same cardinality).
            flag_cols = [f"__v{i}" for i in range(len(self._row_preds))]
            flag_exprs = [
                (~ok).cast("int").alias(fc)
                for fc, (_, ok, _reason) in zip(flag_cols, self._row_preds)
            ]
            stats_src = (
                stats_columns or [
                    f.name for f in df.schema.fields
                    if f.name not in (self.partition_col, "bytes")
                ]
            ) if with_stats else []
            derived_exprs: list = []
            for i, c in enumerate(
                c for c in stats_src
                if c != self.id_col
                and isinstance(df.schema[c].dataType, T.StringType)
            ):
                names = (f"__st{i}_null", f"__st{i}_ord", f"__st{i}_hash")
                derived_exprs += [
                    F.col(c).isNull().cast("int").alias(names[0]),
                    stats_ops._string_prefix_ordinal(F.col(c)).alias(names[1]),
                    F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c))).alias(names[2]),
                ]
                decode_str_stats[c] = names
            pre = df.select("*", *flag_exprs, *derived_exprs)
            passthrough = [self.partition_col] + flag_cols + [
                c for c in stats_src
                if c != self.id_col and c not in decode_str_stats
            ] + [n for names in decode_str_stats.values() for n in names]
            src = mm_ops.decode_check(
                pre,
                psnr_db=float((decode_rules or phash_rules)[0].param("psnr_db", 40.0)),
                id_col=self.id_col,
                check_phash=bool(phash_rules),
                passthrough=passthrough,
            )
            if self.id_col != "image_id":
                src = src.withColumnRenamed("image_id", self.id_col)
            if decode_rules:
                bad = ~(
                    F.col("decode_ok") & F.col("dims_match")
                    & F.col("fmt_match") & F.col("psnr_ok")
                )
                check_exprs.append((decode_rules[0], bad))
            if phash_rules:
                check_exprs.append(
                    (phash_rules[0], F.col("decode_ok") & ~F.col("phash_match"))
                )
            flags = [
                F.sum(F.col(fc).cast("long")).alias(r.rule_id)
                for fc, (r, _ok, _reason) in zip(flag_cols, self._row_preds)
            ]
        else:
            flags = [
                F.sum((~ok).cast("long")).alias(r.rule_id)
                for r, ok, _ in self._row_preds
            ]
        flags += [F.sum(bad.cast("long")).alias(r.rule_id) for r, bad in check_exprs]
        error_rules = [
            r.rule_id
            for r in (
                [p[0] for p in self._row_preds] + [c[0] for c in check_exprs]
            )
            if r.severity == "error"
        ]

        stat_aggs: list = []
        str_ord_cols: list[str] = []
        if with_stats:
            cols = stats_columns or [
                f.name for f in df.schema.fields
                if f.name not in (self.partition_col, "bytes")
            ]
            for c in cols:
                if c in decode_str_stats:
                    # stats inputs were materialized JVM-side before the
                    # Arrow UDF (fixed-width passthrough — see above)
                    n_null, n_ord, n_hash = decode_str_stats[c]
                    str_ord_cols.append(c)
                    stat_aggs += [
                        F.sum(F.col(n_null).cast("long")).alias(f"{c}__nulls"),
                        F.min(F.col(n_ord)).alias(f"{c}__min"),
                        F.max(F.col(n_ord)).alias(f"{c}__max"),
                        F.approx_count_distinct(n_hash, distinct_rsd).alias(f"{c}__distinct"),
                    ]
                elif isinstance(df.schema[c].dataType, T.StringType):
                    # min/max over a STRING buffer would force the WHOLE
                    # one-pass aggregation into SortAggregate (a full sort
                    # of the decode output — ruinous at 10^12 rows); the
                    # order-preserving prefix ordinal keeps it a streaming
                    # HashAggregate. Exact full-string min/max lives in
                    # stats.profile (its own agg, DuckDB-oracle-checked).
                    str_ord_cols.append(c)
                    ordinal = stats_ops._string_prefix_ordinal(F.col(c))
                    stat_aggs += [
                        F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                        F.min(ordinal).alias(f"{c}__min"),
                        F.max(ordinal).alias(f"{c}__max"),
                        F.approx_count_distinct(c, distinct_rsd).alias(f"{c}__distinct"),
                    ]
                else:
                    stat_aggs += [
                        F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                        F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                        F.max(F.col(c)).cast("string").alias(f"{c}__max"),
                        F.approx_count_distinct(c, distinct_rsd).alias(f"{c}__distinct"),
                    ]

        wide = src.groupBy(
            F.col(self.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("rows_checked"), *flags, *stat_aggs)

        rule_ids = [p[0].rule_id for p in self._row_preds] + [c[0].rule_id for c in check_exprs]
        total_errors = (
            sum(F.col(r) for r in error_rules) if error_rules else F.lit(0)
        )
        metrics = F.map_from_arrays(
            F.array(*[F.lit(r) for r in rule_ids]),
            F.array(*[F.col(r).cast("string") for r in rule_ids]),
        ) if rule_ids else F.create_map()
        def _stat_out(a: str):
            # decode string-prefix ordinals back to readable prefixes
            # (trailing zero-pad bytes stripped) after the aggregation
            base = a.rsplit("__", 1)
            if len(base) == 2 and base[1] in ("min", "max") and base[0] in str_ord_cols:
                return stats_ops._string_prefix_decode(F.col(a)).alias(a)
            return F.col(a)

        return wide.select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            F.when(total_errors > 0, F.lit("FAIL")).otherwise(F.lit("PASS")).alias("status"),
            "rows_checked",
            total_errors.cast("long").alias("violation_count"),
            metrics.alias("metrics"),
            F.lit("full").alias("validation_attempted"),
            F.when(total_errors > 0, F.lit("invalid"))
            .when(F.col("rows_checked") == 0, F.lit("notKnown"))
            .otherwise(F.lit("valid"))
            .alias("validity"),
            *[_stat_out(a) for a in
              [f.name for f in wide.schema.fields if "__" in f.name]],
        )

    def _verdicts(
        self, df: DataFrame, violations: DataFrame, run_id: str,
        attempted: str = "full",
    ) -> DataFrame:
        """Per-partition PASS/FAIL + counts + the PSVI validity triple.
        Table-scoped violations (partition_id='__table__') fail every
        partition's verdict? No — they get their own '__table__' verdict
        row, mirroring how the reference attaches errors to the scope that
        declared the constraint (elements.py:546-551).

        ``validation_attempted`` / ``validity`` mirror the PSVI attributes
        (xsdbase.py:62-92): skip mode is attempted='none' →
        validity='notKnown' (NOT a clean PASS), strict mode that stopped
        at the first hit is 'partial', and an empty scope with nothing
        checked is 'notKnown' rather than 'valid'."""
        rows = df.groupBy(
            F.col(self.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("rows_checked"))
        vcounts = violations.filter(F.col("severity") == "error").groupBy("partition_id").agg(
            F.count(F.lit(1)).alias("violation_count"),
            F.count_distinct("rule_id").alias("rules_failed"),
        )
        n_viol = F.coalesce("violation_count", F.lit(0))
        n_rows = F.coalesce("rows_checked", F.lit(0))
        if attempted == "none":
            validity = F.lit("notKnown")
        elif attempted == "partial":
            # strict stopped at the first hit: partitions with no recorded
            # violation were not fully assessed — notKnown, not valid
            validity = F.when(n_viol > 0, F.lit("invalid")).otherwise(F.lit("notKnown"))
        else:
            validity = (
                F.when(n_viol > 0, F.lit("invalid"))
                .when(n_rows == 0, F.lit("notKnown"))
                .otherwise(F.lit("valid"))
            )
        joined = rows.join(vcounts, "partition_id", "full").select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            F.when(n_viol > 0, F.lit("FAIL")).otherwise(F.lit("PASS")).alias("status"),
            n_rows.alias("rows_checked"),
            n_viol.alias("violation_count"),
            F.create_map(
                F.lit("rules_failed"),
                F.coalesce("rules_failed", F.lit(0)).cast("string"),
            ).alias("metrics"),
            F.lit(attempted).alias("validation_attempted"),
            validity.alias("validity"),
        )
        return joined
