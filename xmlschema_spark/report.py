"""Violation/verdict report formatters — the converters analog.

The reference ships pluggable converters that reshape the same decoded
data into different dict conventions (XMLSchemaConverter and the Parker /
BadgerFish / Abdera / JsonML variants, converters.py:44,330+;
``to_json`` serialization documents.py:109-161). The engine's analog:
pluggable formatters reshaping the violations/verdicts DataFrames into
report rows — each returns a DataFrame so formatting stays distributed
(``to_json`` per row, no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMATTERS = {}


def register_formatter(name: str):
    def deco(fn):
        _FORMATTERS[name] = fn
        return fn
    return deco


def format_report(violations: DataFrame, style: str = "flat") -> DataFrame:
    try:
        return _FORMATTERS[style](violations)
    except KeyError:
        raise ValueError(f"unknown report style {style!r}; have {sorted(_FORMATTERS)}")


@register_formatter("flat")
def _flat(v: DataFrame) -> DataFrame:
    """One JSON object per violation row (the default converter analog)."""
    return v.select(
        "partition_id",
        F.to_json(F.struct(*[c for c in v.columns])).alias("report"),
    )


@register_formatter("by_rule")
def _by_rule(v: DataFrame) -> DataFrame:
    """Grouped like the Parker convention: one row per rule with samples.
    Top-k violation samples per rule via sort_array+slice (no driver-side
    sort; cf. SURVEY.md §2.7 violation-sample top-k)."""
    return (
        v.groupBy("rule_id", "severity")
        .agg(
            F.count(F.lit(1)).alias("n_violations"),
            F.slice(F.sort_array(F.collect_list("row_id")), 1, 10).alias("sample_rows"),
            F.first("reason").alias("reason"),
        )
    )


@register_formatter("by_partition")
def _by_partition(v: DataFrame) -> DataFrame:
    """Per-partition nested report (the BadgerFish-style nesting analog):
    partition → map of rule → count, as one JSON document per partition."""
    per = (
        v.groupBy("partition_id", "rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("partition_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("rule_id", "n"))).alias("rules"))
    )
    return per.select(
        "partition_id",
        F.to_json(F.struct("partition_id", "rules")).alias("report"),
    )
