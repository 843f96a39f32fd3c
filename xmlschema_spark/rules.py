"""Declarative rule model — the engine's analog of a compiled XSD schema.

A rule table (FIXTURES.md §1) plays the role the reference's XSD component
graph plays after ``XsdGlobals.build()``
(/root/reference/xmlschema/validators/globals_.py:398-474): a fixed,
validated catalog of constraints, compiled once on the driver and then
immutable during validation.

Rule kinds mirror SURVEY.md §1.3:

- row-level (facet analogs, validators/facets.py): ``not_null, type,
  length, min_length, max_length, min, max, min_exclusive, max_exclusive,
  total_digits, fraction_digits, pattern, enumeration, fixed, occurs,
  assertion_sql``
- set-level (identity-constraint analogs, validators/identities.py):
  ``unique, key, keyref``
- dataset-level additions (north star): ``stats_profile, drift_ks,
  drift_psi, decode_image, phash_consistency``

Compile-time checks mirror the reference's parse-time checks:
facet-applicability whitelists (builtins.py:39-61, checked at
simple_types.py:144-146) and facet-consistency (simple_types.py:134-228).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

ROW_KINDS = frozenset(
    {
        "not_null",
        "type",
        "length",
        "min_length",
        "max_length",
        "min",
        "max",
        "min_exclusive",
        "max_exclusive",
        "total_digits",
        "fraction_digits",
        "pattern",
        "enumeration",
        "fixed",
        "occurs",
        "assertion_sql",
        "whitespace",
        "finite",
        "type_union",
        "list_items",
        "explicit_timezone",
        "xsd_boolean",
        "qname",
        "hex_binary",
        "base64_binary",
    }
)
# idref = same-table keyref sugar: IDREF values must pair with an xs:ID
# column of the SAME table (builtins.py:328-341)
SET_KINDS = frozenset({"unique", "key", "keyref", "idref"})
DATASET_KINDS = frozenset(
    {"stats_profile", "drift_ks", "drift_psi", "decode_image", "phash_consistency"}
)
ALL_KINDS = ROW_KINDS | SET_KINDS | DATASET_KINDS

# Extension surface — the analog of the reference accepting plain callables
# as facet validators (builtins.py:586-599): a registered kind maps to a
# ``fn(rule) -> Column`` returning True where the row SATISFIES the rule.
CUSTOM_ROW_KINDS: dict[str, Any] = {}


def register_rule_kind(name: str, compile_fn, reason_fn=None) -> None:
    """Register a custom row-level rule kind. ``compile_fn(rule)`` must
    return a boolean Spark Column (True = row passes); ``reason_fn(rule)``
    optionally returns the violation reason string."""
    if name in ALL_KINDS:
        raise RuleCompileError(f"cannot shadow built-in rule kind {name!r}")
    CUSTOM_ROW_KINDS[name] = (compile_fn, reason_fn)

# Facet applicability per Spark dtype class — the analog of STRING_FACETS /
# DECIMAL_FACETS / etc. in /root/reference/xmlschema/validators/builtins.py:39-61.
_LENGTH_KINDS = {"length", "min_length", "max_length"}
_RANGE_KINDS = {"min", "max", "min_exclusive", "max_exclusive"}
_DIGIT_KINDS = {"total_digits", "fraction_digits"}

_APPLICABLE: dict[str, frozenset[str]] = {
    "string": frozenset(
        _LENGTH_KINDS | _RANGE_KINDS
        | {"pattern", "enumeration", "whitespace", "type_union", "list_items",
           "explicit_timezone", "xsd_boolean", "qname",
           "hex_binary", "base64_binary"}
    ),
    "binary": frozenset(_LENGTH_KINDS),
    "numeric": frozenset(_RANGE_KINDS | _DIGIT_KINDS | {"enumeration", "finite"}),
    "temporal": frozenset(_RANGE_KINDS | {"enumeration"}),
    "boolean": frozenset({"enumeration"}),
    "array": frozenset({"occurs", "length", "min_length", "max_length"}),
    "other": frozenset(),
}
_ANY_TYPE_KINDS = frozenset({"not_null", "type", "fixed", "assertion_sql"})


def _dtype_class(spark_type_name: str) -> str:
    t = spark_type_name.lower()
    if t.startswith(("decimal", "double", "float", "int", "bigint", "smallint", "tinyint", "long", "short", "byte")):
        return "numeric"
    if t in ("string", "varchar", "char"):
        return "string"
    if t == "binary":
        return "binary"
    if t.startswith(("timestamp", "date", "interval")):
        return "temporal"
    if t == "boolean":
        return "boolean"
    if t.startswith("array"):
        return "array"
    return "other"


class RuleCompileError(ValueError):
    """Rule-table validation failure (the analog of XMLSchemaParseError)."""


@dataclass(frozen=True)
class Rule:
    """One constraint. ``params`` are kind-specific:

    - range/length/digits: ``{"value": <number>}``
    - pattern: ``{"patterns": [xsd_regex, ...]}`` (any-match, facets.py:621-624)
    - enumeration: ``{"values": [...]}``
    - fixed: ``{"value": ...}``
    - occurs: ``{"min": k, "max": k|None}`` (None = unbounded)
    - assertion_sql: ``{"sql": "<boolean spark-sql expr>"}``
    - unique/key: ``{"columns": [...]}`` (key ⇒ also not-null, identities.py:140-141)
    - keyref: ``{"columns": [...], "refer_table": str, "refer_columns": [...]}``
    - drift_*: ``{"column": str, "threshold": float, "bins": int}``
    - decode_image / phash_consistency: ``{"psnr_db": 40.0}``
    """

    rule_id: str
    kind: str
    column: str = ""
    params: dict[str, Any] = field(default_factory=dict)
    gate: str | None = None  # SQL predicate; rule applies only where true (CTA analog)
    scope: str = "row"  # row | partition | table
    severity: str = "error"  # error | warning

    def __post_init__(self):
        if self.kind not in ALL_KINDS and self.kind not in CUSTOM_ROW_KINDS:
            raise RuleCompileError(f"{self.rule_id}: unknown rule kind {self.kind!r}")
        if self.severity not in ("error", "warning"):
            raise RuleCompileError(f"{self.rule_id}: bad severity {self.severity!r}")
        if self.scope not in ("row", "partition", "table"):
            raise RuleCompileError(f"{self.rule_id}: bad scope {self.scope!r}")

    def param(self, key: str, default=None):
        return self.params.get(key, default)


@dataclass
class RuleSet:
    """Validated, ordered collection of rules for one target table."""

    rules: list[Rule]

    def __post_init__(self):
        seen = set()
        for r in self.rules:
            if r.rule_id in seen:
                # UPA analog: two rules may not claim the same identity
                # (validators/models.py:186-224 checks determinism at parse).
                raise RuleCompileError(f"duplicate rule_id {r.rule_id!r}")
            seen.add(r.rule_id)

    def __iter__(self):
        return iter(self.rules)

    def __len__(self):
        return len(self.rules)

    def of_kinds(self, kinds) -> list[Rule]:
        return [r for r in self.rules if r.kind in kinds]

    @property
    def row_rules(self) -> list[Rule]:
        return self.of_kinds(ROW_KINDS | set(CUSTOM_ROW_KINDS))

    @property
    def set_rules(self) -> list[Rule]:
        return self.of_kinds(SET_KINDS)

    @property
    def dataset_rules(self) -> list[Rule]:
        return self.of_kinds(DATASET_KINDS)

    def validate_against_schema(self, schema) -> None:
        """Compile-time applicability check: rule kind × column dtype, the
        analog of the reference's admitted-facets check
        (simple_types.py:144-146). Raises RuleCompileError."""
        fields = {f.name: f.dataType.simpleString() for f in schema.fields}
        for r in self.rules:
            if r.kind in _ANY_TYPE_KINDS or r.kind in DATASET_KINDS or r.kind in CUSTOM_ROW_KINDS:
                cols = [r.column] if r.column else []
            elif r.kind in SET_KINDS:
                cols = list(r.param("columns", []))
                if not cols:
                    raise RuleCompileError(f"{r.rule_id}: {r.kind} needs params.columns")
                if r.kind == "idref":
                    # same-table reference: the ID side must exist here too
                    cols += list(r.param("refer_columns", []))
            else:
                cols = [r.column]
                if not r.column:
                    raise RuleCompileError(f"{r.rule_id}: {r.kind} needs a column")
            for c in cols:
                if c and c not in fields:
                    raise RuleCompileError(
                        f"{r.rule_id}: column {c!r} not in schema {sorted(fields)}"
                    )
            if r.kind in ROW_KINDS and r.kind not in _ANY_TYPE_KINDS and r.column:
                cls = _dtype_class(fields[r.column])
                if r.kind not in _APPLICABLE[cls]:
                    raise RuleCompileError(
                        f"{r.rule_id}: facet {r.kind!r} not applicable to "
                        f"{cls} column {r.column!r} (cf. builtins.py:39-61)"
                    )
        self._check_consistency()

    def _check_consistency(self) -> None:
        """Facet-consistency checks, analog of simple_types.py:199-228:
        min ≤ max (empty range if a bound is exclusive and lo == hi),
        minLength ≤ maxLength, exact length vs min/maxLength conflicts,
        fractionDigits ≤ totalDigits — per (column, gate) group."""
        by_target: dict[tuple, dict[str, Any]] = {}
        for r in self.rules:
            if r.kind in _RANGE_KINDS | _LENGTH_KINDS | _DIGIT_KINDS:
                by_target.setdefault((r.column, r.gate), {})[r.kind] = r.param("value")
        for (col, _gate), kinds in by_target.items():
            lo = kinds.get("min", kinds.get("min_exclusive"))
            hi = kinds.get("max", kinds.get("max_exclusive"))
            exclusive = "min_exclusive" in kinds or "max_exclusive" in kinds
            if lo is not None and hi is not None:
                if lo > hi:
                    raise RuleCompileError(f"column {col!r}: min {lo} > max {hi}")
                if exclusive and lo == hi:
                    # e.g. minExclusive == maxInclusive admits no value
                    # (simple_types.py:199-218 raises the same way)
                    raise RuleCompileError(
                        f"column {col!r}: exclusive bound makes range ({lo}, {hi}) empty"
                    )
            if (
                kinds.get("min_length") is not None
                and kinds.get("max_length") is not None
                and kinds["min_length"] > kinds["max_length"]
            ):
                raise RuleCompileError(f"column {col!r}: minLength > maxLength")
            if kinds.get("length") is not None:
                exact = kinds["length"]
                if kinds.get("min_length") is not None and exact < kinds["min_length"]:
                    raise RuleCompileError(f"column {col!r}: length {exact} < minLength")
                if kinds.get("max_length") is not None and exact > kinds["max_length"]:
                    raise RuleCompileError(f"column {col!r}: length {exact} > maxLength")
            if (
                kinds.get("total_digits") is not None
                and kinds.get("fraction_digits") is not None
                and kinds["fraction_digits"] > kinds["total_digits"]
            ):
                # fractionDigits must not exceed totalDigits
                # (facets consistency, simple_types.py:219-228)
                raise RuleCompileError(
                    f"column {col!r}: fractionDigits > totalDigits"
                )

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "rule_id": r.rule_id,
                    "kind": r.kind,
                    "column": r.column,
                    "params": r.params,
                    "gate": r.gate,
                    "scope": r.scope,
                    "severity": r.severity,
                }
                for r in self.rules
            ],
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "RuleSet":
        return cls([Rule(**d) for d in json.loads(text)])
