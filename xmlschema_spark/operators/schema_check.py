"""Dataset-schema conformance — the content-model / wildcard analog.

The reference validates element structure with a content-model automaton
(groups.py:527-640) and admits unexpected content through wildcards whose
``processContents`` ∈ {strict, lax, skip} decides whether an unmatched
item errors (wildcards.py:215-233). For tabular data, structure is the
DataFrame schema, so the whole check runs at PLAN time (SURVEY.md §2.4):

- missing expected column  → "missing element" (occurs < minOccurs)
- extra actual column      → rejected under ``strict``, reported as a
  warning under ``lax``, ignored under ``skip`` (the anyElement analog)
- dtype mismatch           → type violation (castable mismatch is a
  warning under lax — the decode chain may still cast)

Returns plain violation dicts (no executor involvement — this is the
analog of a parse-time XMLSchemaChildrenValidationError).
"""

from __future__ import annotations

from pyspark.sql import types as T

_CASTABLE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
    ("float", "double"), ("int", "double"), ("bigint", "double"),
    ("date", "timestamp"),
}


def check_schema_conformance(
    actual: T.StructType,
    expected: T.StructType,
    policy: str = "strict",
    check_order: bool = False,
) -> list[dict]:
    """Compare an actual DataFrame schema to the expected one under a
    wildcard policy. Returns violation dicts
    ``{kind, column, reason, severity}`` (empty ⇒ conformant)."""
    if policy not in ("strict", "lax", "skip"):
        raise ValueError(f"bad policy {policy!r} (processContents analog)")
    out: list[dict] = []
    act = {f.name: f for f in actual.fields}
    exp = {f.name: f for f in expected.fields}

    for name, f in exp.items():
        if name not in act:
            if f.nullable:
                # optional column (minOccurs=0): fillable downstream
                out.append({
                    "kind": "missing_optional", "column": name,
                    "reason": f"optional column {name!r} absent (minOccurs=0)",
                    "severity": "warning",
                })
            else:
                out.append({
                    "kind": "missing_column", "column": name,
                    "reason": f"required column {name!r} missing from input",
                    "severity": "error",
                })
            continue
        a, e = act[name].dataType.simpleString(), f.dataType.simpleString()
        if a != e:
            widenable = (a, e) in _CASTABLE_WIDENINGS
            out.append({
                "kind": "type_mismatch", "column": name,
                "reason": f"column {name!r} is {a}, expected {e}"
                + (" (widenable)" if widenable else ""),
                "severity": "warning" if widenable else "error",
            })

    if policy != "skip":
        for name in act:
            if name not in exp:
                out.append({
                    "kind": "unexpected_column", "column": name,
                    "reason": f"unexpected column {name!r} not in expected schema",
                    "severity": "error" if policy == "strict" else "warning",
                })

    if check_order:
        shared = [n for n in (f.name for f in expected.fields) if n in act]
        actual_order = [f.name for f in actual.fields if f.name in exp]
        if shared != actual_order:
            out.append({
                "kind": "column_order", "column": "",
                "reason": f"column order {actual_order} != expected {shared}",
                "severity": "warning",
            })
    return out
