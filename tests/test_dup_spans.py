"""Exact substring-span dedup (dedup.duplicate_spans / trim_duplicate_spans).

Golden semantics tests against hand-derived spans plus a pure-Python
reference for the trim fold. The span rule under test: a position is a
hit iff its k-gram occurs in >= min_docs distinct docs; hits p1 < p2
merge iff p2 - p1 <= k; spans are [min_hit, max_hit + k - 1] inclusive,
1-based (``substring`` convention, same as the DuckDB oracle).
"""

import pytest

from xmlschema_spark.operators import dedup


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.duplicate_spans(df, "text", "doc_id", **kw)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len) for r in out.collect()
    )


def test_shared_block_exact_span(spark):
    """A 26-char block shared by two docs at different offsets -> one
    span per doc covering exactly the block."""
    block = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
    rows = [
        (1, "XXXX" + block + "YYYY"),  # block at 5..30
        (2, block + "0123456789"),  # block at 1..26
    ]
    got = _spans(spark, rows, k=10)
    assert got == [(1, 5, 30, 26), (2, 1, 26, 26)]


def test_two_separate_spans_per_doc(spark):
    """Two shared blocks separated by unique filler > k apart -> two
    islands, not one."""
    a = "AAAAAAAAAA"  # 10
    b = "BBBBBBBBBB"  # 10
    rows = [
        (1, a + "uniquefiller0001xxxxx" + b),
        (2, a + "totally different middle here" + b),
    ]
    got = _spans(spark, rows, k=10)
    assert got == [
        (1, 1, 10, 10),
        (1, 32, 41, 10),
        (2, 1, 10, 10),
        (2, 40, 49, 10),
    ]


def test_within_doc_repeat_not_flagged(spark):
    """min_docs counts DISTINCT docs: a block repeated twice inside one
    doc but present nowhere else is NOT a duplicated span."""
    rows = [
        (1, "qwertyuiopasdfghjkl" * 2),
        (2, "completely unrelated content 123456"),
    ]
    assert _spans(spark, rows, k=12) == []


def test_min_docs_three(spark):
    block = "0123456789abcdef"
    rows = [(1, block + "x1"), (2, block + "y2"), (3, "zz" + block)]
    # present in 3 docs: passes min_docs=3
    got = _spans(spark, rows, k=8, min_docs=3)
    assert (1, 1, 16, 16) in got and (3, 3, 18, 16) in got
    # a pairwise-only share would be dropped at min_docs=3
    rows2 = [(1, block + "x1"), (2, block + "y2"), (3, "no share here at all")]
    assert all(d != 3 for d, *_ in _spans(spark, rows2, k=8, min_docs=3))


def test_stride_detects_long_runs(spark):
    """stride=3 with k >= 2*stride-1: a duplicated run of length k +
    stride - 1 = 12 is still caught (grid positions 1,4,7,...)."""
    run = "ABCDEFGHIJKL"  # 12 chars
    rows = [(1, run + "unique-tail-one"), (2, run + "other-tail-22")]
    got = _spans(spark, rows, k=10, stride=3)
    # position 1 gram 'ABCDEFGHIJ' is on-grid and shared
    assert any(d == 1 and s == 1 for d, s, e, n in got)
    assert any(d == 2 and s == 1 for d, s, e, n in got)


def test_short_docs_emit_nothing(spark):
    rows = [(1, "tiny"), (2, "tiny")]
    assert _spans(spark, rows, k=10) == []
    # but exactly-k docs do match
    rows = [(1, "0123456789"), (2, "0123456789")]
    assert _spans(spark, rows, k=10) == [(1, 1, 10, 10), (2, 1, 10, 10)]


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, "text", "doc_id", stride=0)
    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, "text", "doc_id", min_docs=1)


def _py_trim(text, spans):
    """Pure-Python reference for the trim fold (1-based inclusive)."""
    out, last = [], 0
    for s, e in sorted(spans):
        out.append(text[last : s - 1])
        last = e
    out.append(text[last:])
    return "".join(out)


def test_trim_matches_python_reference(spark):
    block = "abcdefghijklmnopqrstuvwxyz"
    texts = {
        1: "XXXX" + block + "YYYY",
        2: block + "0123456789",
        3: "no duplicated content here at all 777",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], ["doc_id", "text"]
    )
    spans = dedup.duplicate_spans(df, "text", "doc_id", k=10)
    span_map = {}
    for r in spans.collect():
        span_map.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    out = dedup.trim_duplicate_spans(df, spans, "text", "doc_id")
    got = {r.doc_id: r.trimmed for r in out.collect()}
    for d, text in texts.items():
        assert got[d] == _py_trim(text, span_map.get(d, [])), d
    assert got[1] == "XXXXYYYY"
    assert got[2] == "0123456789"
    assert got[3] == texts[3]  # untouched pass-through


def test_trim_span_at_both_ends(spark):
    """Spans touching position 1 and the last char trim cleanly."""
    df = spark.createDataFrame(
        [(1, "SHAREDSTART-mid1-SHAREDEND"), (2, "SHAREDSTART-mid2-SHAREDEND")],
        ["doc_id", "text"],
    )
    spans = dedup.duplicate_spans(df, "text", "doc_id", k=9)
    out = dedup.trim_duplicate_spans(df, spans, "text", "doc_id")
    got = {r.doc_id: r.trimmed for r in out.collect()}
    # shared prefix 'SHAREDSTART-mid' diverges at 'mid1'/'mid2'; derive
    # expectations from the python reference rather than eyeballing
    span_map = {}
    for r in spans.collect():
        span_map.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert got[1] == _py_trim("SHAREDSTART-mid1-SHAREDEND", span_map[1])
    assert got[2] == _py_trim("SHAREDSTART-mid2-SHAREDEND", span_map[2])


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert dedup.duplicate_spans(df, "text", "doc_id").count() == 0


def test_output_types_are_long(spark):
    df = spark.createDataFrame([(1, "0123456789"), (2, "0123456789")],
                               ["doc_id", "text"])
    out = dedup.duplicate_spans(df, "text", "doc_id", k=10)
    kinds = dict(out.dtypes)
    assert kinds["span_start"] == "bigint"
    assert kinds["span_end"] == "bigint"
    assert kinds["span_len"] == "bigint"
