"""Rule-table IO — the analog of the reference's schema-document loader
(include/import handling, /root/reference/xmlschema/validators/schema.py:726-902),
minus XML: rules live as JSON documents or as a Spark DataFrame matching
FIXTURES.md §1.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from xmlschema_spark.rules import Rule, RuleSet

RULES_DF_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("rule_kind", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("params", T.StringType()),  # JSON-encoded
        T.StructField("gate", T.StringType()),
        T.StructField("scope", T.StringType()),
        T.StructField("severity", T.StringType()),
    ]
)


def load_rules_json(path: str | Path) -> RuleSet:
    return RuleSet.from_json(Path(path).read_text())


def rules_to_df(spark: SparkSession, ruleset: RuleSet) -> DataFrame:
    rows = [
        (r.rule_id, r.kind, r.column, json.dumps(r.params), r.gate, r.scope, r.severity)
        for r in ruleset
    ]
    return spark.createDataFrame(rows, RULES_DF_SCHEMA)


def ruleset_from_df(df: DataFrame) -> RuleSet:
    rules = [
        Rule(
            rule_id=row.rule_id,
            kind=row.rule_kind,
            column=row.column or "",
            params=json.loads(row.params or "{}"),
            gate=row.gate,
            scope=row.scope or "row",
            severity=row.severity or "error",
        )
        for row in df.collect()  # rule tables are catalog-sized: driver-side by design
    ]
    return RuleSet(rules)


def default_image_ruleset() -> RuleSet:
    """The engine's default constraint suite for the image+caption table —
    the analog of a complete XSD for it (FIXTURES.md §2 families)."""
    R = Rule
    return RuleSet(
        [
            R("id_not_null", "not_null", "image_id"),
            R("bytes_not_null", "not_null", "bytes"),
            R("fmt_not_null", "not_null", "fmt"),
            R("id_pattern", "pattern", "image_id", {"patterns": [r"img_[0-9a-f]{1,32}"]}),
            R("fmt_enum", "enumeration", "fmt", {"values": ["png", "jpeg", "webp", "bmp"]}),
            R("w_range", "min", "w", {"value": 1}),
            R("w_max", "max", "w", {"value": 65535}),
            R("h_range", "min", "h", {"value": 1}),
            R("h_max", "max", "h", {"value": 65535}),
            R("caption_len", "max_length", "caption", {"value": 512}),
            R(
                "pixel_budget",
                "assertion_sql",
                "",
                {"sql": "w * h BETWEEN 1 AND 100000000"},
            ),
            R(
                "bytes_budget",
                "assertion_sql",
                "",
                {"sql": "length(bytes) <= w * h * 4 + 1024"},
            ),
            # metadata-column lexical rules (one per round-2 rule kind)
            R("created_tz", "explicit_timezone", "created_at", {"value": "required"}),
            R("animated_bool", "xsd_boolean", "animated"),
            R("tag_qname", "qname", "tag"),
            R("icc_hex_ok", "hex_binary", "icc_hex"),
            R("exif_b64_ok", "base64_binary", "exif_b64"),
            R(
                "flags_list",
                "list_items",
                "flags",
                {"item_pattern": "[a-z]+", "min_items": 1, "max_items": 4},
            ),
            R("retention_dur", "duration", "retention", {"variant": "dayTime"}),
            R("id_unique", "key", "", {"columns": ["image_id"]}, scope="table"),
            R(
                "phash_unique",
                "unique",
                "",
                {"columns": ["phash"], "salt_partitions": 16},
                scope="table",
                severity="warning",
            ),
            R("decode", "decode_image", "bytes", {"psnr_db": 40.0}),
            R("phash_ok", "phash_consistency", "phash", {}),
            R(
                "w_drift",
                "drift_psi",
                "w",
                {"column": "w", "threshold": 0.25, "bins": 10},
                scope="partition",
                severity="warning",
            ),
        ]
    )
