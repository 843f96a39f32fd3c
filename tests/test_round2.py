"""Round-2 coverage: exclusive/length facets, reference totalDigits
semantics, explicitTimezone, strict boolean / QName lexical kinds, the
Python-re pattern fallback, the encode direction, and LSH == exact
equivalence for the certified near-dup / top-k scale paths."""

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.compiler import compile_row_rule
from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.operators import similarity
from xmlschema_spark.rules import Rule, RuleSet

SF_DIR = "/root/testdata/sf0.01"


def _violating_ids(spark, df, rules, id_col="id", partition_col="part"):
    eng = ValidationEngine(RuleSet(rules), id_col=id_col, partition_col=partition_col)
    v = eng.row_violations(df, run_id="t")
    return {(r.rule_id, r.row_id) for r in v.collect()}


def test_exclusive_and_exact_length_facets(spark):
    df = spark.createDataFrame(
        [("a", 5.0, "XY"), ("b", 0.0, "X"), ("c", 10.0, "X"), ("d", None, None)],
        "id string, v double, s string",
    ).withColumn("part", F.lit("p"))
    got = _violating_ids(
        spark, df,
        [
            Rule("gt0", "min_exclusive", "v", {"value": 0.0}),
            Rule("lt10", "max_exclusive", "v", {"value": 10.0}),
            Rule("len1", "length", "s", {"value": 1}),
        ],
    )
    # nulls pass every facet (value-space semantics, xsdbase.py:783-784)
    assert got == {("gt0", "b"), ("lt10", "c"), ("len1", "a")}


@pytest.mark.parametrize(
    "lexical,digits",
    [
        ("10.00", 2),   # '10.00'.strip('0') == '10.'  → 2  (facets.py:421-423)
        ("170.00", 3),  # '170.00'.strip('0') == '170.' → 3
        ("0.05", 2),    # '0.05'.strip('0')  == '.05'  → 2
        ("123.45", 5),
        ("45.00", 2),
    ],
)
def test_total_digits_reference_semantics(spark, lexical, digits):
    """Exact reference formula: strip '0' from both ends of the raw
    lexical form FIRST, then count digit chars — diverges from a
    remove-separators-first formula on decimals whose integer part ends
    in 0 with an all-zero fraction ('170.00' → 3, not 2)."""
    df = spark.createDataFrame([("r",)], "id string").withColumn(
        "d", F.expr(f"CAST('{lexical}' AS DECIMAL(12,2))")
    )
    tight = compile_row_rule(Rule("t", "total_digits", "d", {"value": digits - 1}))
    exact = compile_row_rule(Rule("t", "total_digits", "d", {"value": digits}))
    row = df.select(tight.alias("tight"), exact.alias("exact")).first()
    assert (row.tight, row.exact) == (False, True)


def test_explicit_timezone_facet(spark):
    df = spark.createDataFrame(
        [
            ("z", "2020-01-01T00:00:00Z"),
            ("off", "2020-01-01T00:00:00+05:30"),
            ("naive", "2020-01-01T00:00:00"),
            ("nul", None),
        ],
        "id string, dt string",
    ).withColumn("part", F.lit("p"))
    got = _violating_ids(
        spark, df,
        [
            Rule("req", "explicit_timezone", "dt", {"value": "required"}),
            Rule("proh", "explicit_timezone", "dt", {"value": "prohibited"}),
            Rule("opt", "explicit_timezone", "dt", {"value": "optional"}),
        ],
    )
    assert got == {("req", "naive"), ("proh", "z"), ("proh", "off")}


def test_xsd_boolean_and_qname_kinds(spark):
    df = spark.createDataFrame(
        [
            ("t", "true", "ns:item"),
            ("pad", "  1 ", "item_1"),
            ("up", "TRUE", "2bad"),
            ("yes", "yes", "a:b:c"),
        ],
        "id string, b string, q string",
    ).withColumn("part", F.lit("p"))
    got = _violating_ids(
        spark, df,
        [Rule("bl", "xsd_boolean", "b"), Rule("qn", "qname", "q")],
    )
    # '  1 ' collapses to '1' (valid); 'TRUE'/'yes' are outside the strict
    # lexical space {true,1,false,0} (builtins.py:160-166); QName rejects
    # a leading digit and a double colon (builtins.py:74-76)
    assert got == {("bl", "up"), ("bl", "yes"), ("qn", "up"), ("qn", "yes")}


def test_pattern_fallback_end_to_end(spark):
    """A pattern with an in-class complement (``[\\I]``) — untranslatable
    to Java regex — must validate end-to-end through ``validate()`` via
    the automatic Arrow-batched Python-re fallback."""
    df = spark.createDataFrame(
        [("sym", "!!!"), ("alpha", "abc?"), ("q", "??"), ("nul", None)],
        "id string, s string",
    ).withColumn("part", F.lit("p"))
    rs = RuleSet([Rule("sym_only", "pattern", "s", {"patterns": [r"[\I]+"]})])
    res = ValidationEngine(rs, id_col="id", partition_col="part").validate(
        df, run_id="fb", with_stats=False
    )
    assert {r.row_id for r in res.violations.collect()} == {"alpha"}
    res.unpersist()


def test_encode_canonical_roundtrip(spark):
    """Encode direction: canonical lexical forms re-decode (try_cast) to
    the original typed values — the iter_encode/iter_decode round trip."""
    from xmlschema_spark import encode as enc

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (true,  CAST('17.50' AS DECIMAL(10,2)), CAST(1.5 AS DOUBLE),
           TIMESTAMP '2020-06-01 12:34:56', DATE '2021-02-03'),
          (false, CAST('45.00' AS DECIMAL(10,2)), CAST('NaN' AS DOUBLE),
           TIMESTAMP '1999-12-31 23:59:59', DATE '1999-01-01'),
          (true,  CAST('0.05'  AS DECIMAL(10,2)), CAST('Infinity' AS DOUBLE),
           TIMESTAMP '2000-01-01 00:00:00', DATE '2000-02-29')
        AS t(b, dec, dbl, ts, d)
        """
    )
    out = df.select(
        "b", "dec", "dbl", "ts", "d",
        enc.canonical_lexical(F.col("b"), "boolean").alias("b_lex"),
        enc.canonical_lexical(F.col("dec"), "decimal").alias("dec_lex"),
        enc.canonical_lexical(F.col("dbl"), "double").alias("dbl_lex"),
        enc.canonical_lexical(F.col("ts"), "dateTime").alias("ts_lex"),
        enc.canonical_lexical(F.col("d"), "date").alias("d_lex"),
    )
    rows = out.collect()
    lex = {r.dec_lex for r in rows}
    assert lex == {"17.5", "45", "0.05"}  # canonical: no trailing zeros
    assert {r.dbl_lex for r in rows} >= {"NaN", "INF"}
    back = out.select(
        (F.col("b_lex").try_cast("boolean") == F.col("b")).alias("b_ok"),
        (F.col("dec_lex").try_cast("decimal(10,2)") == F.col("dec")).alias("dec_ok"),
        (
            (F.col("dbl_lex") == "NaN") & F.isnan("dbl")
            | (F.col("dbl_lex") == "INF") & (F.col("dbl") == float("inf"))
            | (F.col("dbl_lex").try_cast("double") == F.col("dbl"))
        ).alias("dbl_ok"),
        (F.col("ts_lex").try_cast("timestamp") == F.col("ts")).alias("ts_ok"),
        (F.col("d_lex").try_cast("date") == F.col("d")).alias("d_ok"),
    ).collect()
    for r in back:
        assert all([r.b_ok, r.dec_ok, r.dbl_ok, r.ts_ok, r.d_ok]), r


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.cache().count()
    return df


def test_lsh_near_dups_equals_exact(spark, embeddings):
    """The certified scale path: banded LSH (2 planes × 32 bands, fixed
    seed) returns EXACTLY the exact all-pairs result at threshold 0.4 on
    the sf0.01 fixture — the config the oracle-checked driver query runs."""
    lsh = similarity.embedding_near_duplicates(
        embeddings, "vec_id", "embedding", threshold=0.4,
        n_planes=2, n_bands=32, max_bucket_size=1_000_000,
    )
    u = similarity.with_normalized(
        embeddings.select(F.col("vec_id").alias("id"), "embedding"), "embedding", "u"
    )
    a, b = u.alias("a"), u.alias("b")
    exact = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.aggregate(
                F.zip_with(F.col("a.u"), F.col("b.u"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.4)
    )
    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    want = {(r.id_a, r.id_b) for r in exact.collect()}
    assert got == want and len(want) > 0


def test_lsh_topk_equals_exact(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5)
    lsh = similarity.lsh_bucketed_topk(
        embeddings, queries, "vec_id", "embedding", "vec_id",
        k=5, n_planes=2, n_bands=32,
    )
    exact = similarity.cosine_topk(
        embeddings, queries, "vec_id", "embedding", "vec_id", k=5
    )
    got = {(r.query_id, r.id, r.rank) for r in lsh.collect()}
    want = {(r.query_id, r.id, r.rank) for r in exact.collect()}
    assert got == want and len(want) == 25


def test_hex_base64_lexical_kinds(spark):
    df = spark.createDataFrame(
        [
            ("ok", "deadBEEF", "aGVsbG8="),
            ("odd", "abc", "TQ=="),
            ("bad", "xyz", "a&b"),
            ("pad", "0A1b", "  aGVs bG8=  "),  # ws stripped before b64 check
        ],
        "id string, hx string, b64 string",
    ).withColumn("part", F.lit("p"))
    got = _violating_ids(
        spark, df,
        [Rule("hx", "hex_binary", "hx"), Rule("b6", "base64_binary", "b64")],
    )
    assert got == {("hx", "odd"), ("hx", "bad"), ("b6", "bad")}


def test_idref_same_table_sugar(spark):
    """idref = same-table keyref (IDREF → xs:ID, builtins.py:328-341):
    no secondary dict required."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "zz"), ("d", None)],
        "id string, ref string",
    ).withColumn("part", F.lit("p"))
    rs = RuleSet(
        [Rule("ref_ok", "idref", "", {"columns": ["ref"], "refer_columns": ["id"]})]
    )
    rs.validate_against_schema(df.schema)
    res = ValidationEngine(rs, id_col="id", partition_col="part").validate(
        df, run_id="i", with_stats=False
    )
    rows = res.violations.collect()
    # 'zz' dangles; NULL refs pass (absent value, like the null-tuple
    # semantics of identity fields)
    assert {r.row_id for r in rows} == {"c"}
    res.unpersist()


def test_facet_consistency_extensions():
    """Extended compile-time narrowing checks (simple_types.py:199-228)."""
    with pytest.raises(Exception, match="empty"):
        RuleSet(
            [
                Rule("a", "min_exclusive", "v", {"value": 5}),
                Rule("b", "max", "v", {"value": 5}),
            ]
        )._check_consistency()
    with pytest.raises(Exception, match="fractionDigits"):
        RuleSet(
            [
                Rule("a", "total_digits", "v", {"value": 2}),
                Rule("b", "fraction_digits", "v", {"value": 3}),
            ]
        )._check_consistency()
    with pytest.raises(Exception, match="length"):
        RuleSet(
            [
                Rule("a", "length", "v", {"value": 5}),
                Rule("b", "max_length", "v", {"value": 4}),
            ]
        )._check_consistency()
    # consistent combinations pass
    RuleSet(
        [
            Rule("a", "min_exclusive", "v", {"value": 1}),
            Rule("b", "max", "v", {"value": 5}),
            Rule("c", "total_digits", "v", {"value": 4}),
            Rule("d", "fraction_digits", "v", {"value": 2}),
        ]
    )._check_consistency()
