"""XSD regular-expression dialect → Java regex (for ``regexp_like``).

The reference translates XSD regexes to *Python* regexes
(/root/reference/xmlschema/regex.py:249-357). Our predicates execute
JVM-side in Catalyst's ``RLike``, so we translate to *Java* regex instead,
applying the same dialect rules:

- **Implicit anchoring** — an XSD pattern must match the whole value
  (reference anchors with ``^(...)$``, regex.py:352-355). We wrap in
  ``^(?:...)$``.
- ``\\i`` / ``\\I`` — XML name-start chars (and complement), the FULL
  XML 1.0 (5th ed.) NameStartChar ranges — same BMP set as the reference's
  shortcut tables (regex.py:38-45) plus the spec's supplementary range.
- ``\\c`` / ``\\C`` — XML name chars (and complement), full NameChar set.
- **Character-class subtraction** ``[a-z-[aeiou]]`` → Java intersection
  with negation ``[a-z&&[^aeiou]]`` (reference expands it manually,
  regex.py:202-246; Java supports it natively).
- ``\\p{IsXxx}`` Unicode blocks → Java ``\\p{InXxx}``.

Patterns outside this subset raise ``XsdRegexError``; callers fall back to
a vectorized pandas-UDF with Python ``re`` (still Arrow-batched).
"""

from __future__ import annotations

import re

# Full XML 1.0 (5th ed.) NameStartChar / NameChar productions — the same
# BMP ranges the reference's \i/\c shortcut sets carry (regex.py:38-45).
# BMP ranges are written as \uXXXX escape TEXT (valid in both Java regex
# and Python re); the supplementary range [#x10000-#xEFFFF] must be a
# literal-codepoint range because the two dialects disagree on astral
# escapes (Java \x{...} vs Python \U...) — the reference stops at the BMP;
# we include the spec's astral range too.
_ASTRAL_NAME = "\U00010000-\U000EFFFF"
# NCName start chars: NameStartChar minus ':' (xs:NCName, QName parts)
NCNAME_START_INNER = (
    "A-Z_a-z"
    "\\u00C0-\\u00D6\\u00D8-\\u00F6\\u00F8-\\u02FF\\u0370-\\u037D\\u037F-\\u1FFF"
    "\\u200C-\\u200D\\u2070-\\u218F\\u2C00-\\u2FEF\\u3001-\\uD7FF"
    "\\uF900-\\uFDCF\\uFDF0-\\uFFFD" + _ASTRAL_NAME
)
# NCName chars: NameChar minus ':' — adds -.0-9 U+00B7 and the combining /
# extender ranges (U+0300-036F merges into U+00F8-037D)
NCNAME_CHAR_INNER = (
    # '-' escaped so the inner stays position-independent (callers prepend
    # ':' or other atoms; a bare '-' after ':' would parse as a range)
    "\\-.0-9A-Z_a-z\\u00B7"
    "\\u00C0-\\u00D6\\u00D8-\\u00F6\\u00F8-\\u037D\\u037F-\\u1FFF"
    "\\u200C-\\u200D\\u203F-\\u2040\\u2070-\\u218F\\u2C00-\\u2FEF\\u3001-\\uD7FF"
    "\\uF900-\\uFDCF\\uFDF0-\\uFFFD" + _ASTRAL_NAME
)
_I_INNER = ":" + NCNAME_START_INNER
_C_INNER = ":" + NCNAME_CHAR_INNER
I_CLASS = f"[{_I_INNER}]"
C_CLASS = f"[{_C_INNER}]"


class XsdRegexError(ValueError):
    """Pattern uses XSD constructs we cannot express in Java regex."""


def _translate_class(body: str) -> str:
    """Translate the inside of a character class, handling ``-[...]``
    subtraction (recursive per XSD grammar) and ``\\i``/``\\c`` shorthands.
    """
    out = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch == "\\" and i + 1 < n:
            nxt = body[i + 1]
            if nxt == "i":
                out.append(_I_INNER)
            elif nxt == "c":
                out.append(_C_INNER)
            elif nxt in "IC":
                raise XsdRegexError(r"\I / \C inside a class is not supported")
            else:
                out.append(body[i : i + 2])
            i += 2
            continue
        if ch == "-" and i + 1 < n and body[i + 1] == "[":
            # class subtraction: the rest must be `[...]` ending the class
            depth = 0
            j = i + 1
            while j < n:
                if body[j] == "\\":
                    j += 2
                    continue
                if body[j] == "[":
                    depth += 1
                elif body[j] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0 or j != n - 1:
                raise XsdRegexError(f"malformed class subtraction in [{body}]")
            inner = _translate_class(body[i + 2 : j].lstrip("^"))
            neg = "^" if not body[i + 2 : j].startswith("^") else ""
            out.append(f"&&[{neg}{inner}]")
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def xsd_to_java_regex(pattern: str) -> str:
    """Translate one XSD pattern to an anchored Java regex string."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "i":
                out.append(I_CLASS)
            elif nxt == "I":
                out.append(f"[^{_I_INNER}]")
            elif nxt == "c":
                out.append(C_CLASS)
            elif nxt == "C":
                out.append(f"[^{_C_INNER}]")
            elif nxt == "p" or nxt == "P":
                m = re.match(r"\\[pP]\{(Is)?([A-Za-z0-9 _-]+)\}", pattern[i:])
                if not m:
                    raise XsdRegexError(f"malformed \\p at {i} in {pattern!r}")
                name = m.group(2).replace(" ", "").replace("-", "")
                prefix = "In" if m.group(1) else ""
                out.append(f"\\{nxt}{{{prefix}{name}}}")
                i += m.end()
                continue
            else:
                out.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "[":
            depth = 0
            j = i
            while j < n:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "[":
                    depth += 1
                elif pattern[j] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise XsdRegexError(f"unterminated class in {pattern!r}")
            body = pattern[i + 1 : j]
            neg = ""
            if body.startswith("^"):
                neg, body = "^", body[1:]
            out.append(f"[{neg}{_translate_class(body)}]")
            i = j + 1
            continue
        if ch in "^$" :
            # XSD regexes have no anchors; ^/$ are literals there.
            out.append("\\" + ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return f"^(?:{''.join(out)})$"


def xsd_patterns_to_java(patterns: list[str]) -> str:
    """N XSD patterns = match at least one (facets.py:621-624) → one
    alternation, still fully anchored."""
    if len(patterns) == 1:
        return xsd_to_java_regex(patterns[0])
    # strip the per-pattern "^(?:" prefix and ")$" suffix before joining
    alts = "|".join(f"(?:{xsd_to_java_regex(p)[4:-2]})" for p in patterns)
    return f"^(?:{alts})$"


# ---------------------------------------------------------------------------
# Python-re fallback translation — for XSD constructs Java regex rejects
# (\I/\C inside a character class, most prominently). The reference
# translates the whole dialect to Python regex (regex.py:249-357); here the
# Python path is only the FALLBACK lane behind an Arrow-batched pandas UDF,
# so it favors correctness over codegen. Python ``re`` has no class
# intersection (&&), so subtraction and in-class complements compile to
# lookahead compositions on a single-character matcher.
# ---------------------------------------------------------------------------


def _parse_class_body(body: str):
    """Split a class body into (positive atoms, complement inner-classes
    from \\I/\\C, subtracted sub-body or None)."""
    pos: list[str] = []
    comps: list[str] = []
    sub: str | None = None
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "\\" and i + 1 < n:
            nxt = body[i + 1]
            if nxt == "i":
                pos.append(_I_INNER)
            elif nxt == "c":
                pos.append(_C_INNER)
            elif nxt == "I":
                comps.append(_I_INNER)
            elif nxt == "C":
                comps.append(_C_INNER)
            elif nxt in "pP":
                raise XsdRegexError(r"\p inside a class has no Python-re form")
            else:
                pos.append(body[i : i + 2])
            i += 2
            continue
        if ch == "-" and i + 1 < n and body[i + 1] == "[":
            depth, j = 0, i + 1
            while j < n:
                if body[j] == "\\":
                    j += 2
                    continue
                if body[j] == "[":
                    depth += 1
                elif body[j] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0 or j != n - 1:
                raise XsdRegexError(f"malformed class subtraction in [{body}]")
            sub = body[i + 2 : j]
            i = j + 1
            continue
        pos.append(ch)
        i += 1
    return "".join(pos), comps, sub


def _class_to_python(body: str) -> str:
    """One XSD character class (body WITHOUT the surrounding []) → a
    Python-re single-character matcher."""
    neg = body.startswith("^")
    if neg:
        body = body[1:]
    pos, comps, sub = _parse_class_body(body)
    sub_py = None  # lookahead-excluded subtracted class
    require = None  # subtracting a negated class [^X] == intersect with [X]
    if sub:
        if sub.startswith("^"):
            require = _parse_class_body(sub[1:])[0]
        else:
            sub_py = _class_to_python(sub)

    if not neg:
        alts = []
        if pos:
            alts.append(f"[{pos}]")
        alts += [f"[^{cmp_}]" for cmp_ in comps]
        if not alts:
            raise XsdRegexError(f"empty character class [{body}]")
        core = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        look = ""
        if sub_py:
            look += f"(?!{sub_py})"
        if require:
            look += f"(?=[{require}])"
        return f"(?:{look}{core})" if look else core
    # negated: char must be outside pos AND inside every comp class
    look = []
    if comps:
        core = f"[{comps[0]}]"
        look += [f"(?=[{cmp_}])" for cmp_ in comps[1:]]
        if pos:
            look.append(f"(?![{pos}])")
    else:
        core = f"[^{pos}]" if pos else "[\\s\\S]"
    if sub_py:
        look.append(f"(?!{sub_py})")
    if require:
        look.append(f"(?=[{require}])")
    return "(?:" + "".join(look) + core + ")" if look else core


def xsd_to_python_regex(pattern: str) -> str:
    """Translate one XSD pattern to an UNANCHORED Python regex string
    (callers match with ``re.fullmatch`` / ``Series.str.fullmatch``)."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "i":
                out.append(I_CLASS)
            elif nxt == "I":
                out.append(f"[^{_I_INNER}]")
            elif nxt == "c":
                out.append(C_CLASS)
            elif nxt == "C":
                out.append(f"[^{_C_INNER}]")
            elif nxt in "pP":
                raise XsdRegexError(
                    r"\p{...} has no Python-re form (Java lane handles it)"
                )
            else:
                out.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "[":
            depth, j = 0, i
            while j < n:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "[":
                    depth += 1
                elif pattern[j] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise XsdRegexError(f"unterminated class in {pattern!r}")
            out.append(_class_to_python(pattern[i + 1 : j]))
            i = j + 1
            continue
        if ch in "^$":
            out.append("\\" + ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def xsd_patterns_to_python(patterns: list[str]) -> str:
    """N XSD patterns → one Python regex string (any-match alternation,
    facets.py:621-624); compiled here once to fail fast at rule-compile
    time, returned as a string for pandas ``str.fullmatch``."""
    alts = "|".join(f"(?:{xsd_to_python_regex(p)})" for p in patterns)
    re.compile(alts)
    return alts
