"""The portable md5 hash family for minhash/simhash, and deterministic
strict mode.

The md5 family exists so the DuckDB oracle can replay the ENTIRE LSH
pipeline (the xxhash64 production family is not DuckDB-computable, so its
queries are rows-only checked). These tests pin the cross-engine-relevant
invariants locally: identical plan shape across families, md5-nibble bit
decoding, exact-duplicate recall, and that strict mode's "first
violation" is a deterministic minimum rather than an arbitrary row."""

import hashlib

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.operators import dedup
from xmlschema_spark.rules import Rule, RuleSet

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
    (3, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # case-only
    (4, "completely different content about spark catalyst optimizer plans"),
    (5, "completely different content about spark catalyst optimizer plan"),
    (6, ""),  # degenerate
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_minhash_finds_exact_duplicates(docs, family):
    """An exact duplicate shares every band in ANY hash family — recall of
    identical docs is family-independent."""
    pairs = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=16, bands=8, hash_family=family
    )
    got = {(r.id_a, r.id_b): r.n_shared_bands for r in pairs.collect()}
    assert got.get((1, 2)) == 8  # all bands shared
    assert got.get((1, 3)) == 8  # normalization lowercases: still identical


def test_minhash_bad_family_raises(docs):
    with pytest.raises(ValueError, match="hash_family"):
        dedup.minhash_lsh_candidates(docs, "text", "doc_id", hash_family="sha9")
    with pytest.raises(ValueError, match="hash_family"):
        dedup.simhash_signatures(docs, "text", "doc_id", hash_family="sha9")


def test_simhash_md5_signature_matches_python_reference(docs):
    """The Spark md5-family signature (conv nibble decode + 64 bit votes)
    must equal an independent Python implementation of the same spec:
    bit b of token-hash = bit (b mod 4) of hex nibble (b div 4) of
    md5(token); vote +1/-1; signature bit set iff vote sum > 0."""

    def py_simhash(text):
        votes = [0] * 64
        toks = [t for t in text.lower().split() if t]
        for tok in toks:
            h = hashlib.md5(tok.encode()).hexdigest()
            for b in range(64):
                nib = int(h[b // 4], 16)
                votes[b] += 1 if (nib >> (b % 4)) & 1 else -1
        if not toks:
            return 0
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        # two's complement into a signed 64-bit long, like Spark's LongType
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    got = {
        r.doc: r.simhash
        for r in dedup.simhash_signatures(
            docs, "text", "doc_id", hash_family="md5"
        ).collect()
    }
    want = {doc_id: py_simhash(text) for doc_id, text in DOCS}
    assert got == want


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_simhash_near_dups_find_near_identical(docs, family):
    """Docs 1/2/3 are identical after lowering → hamming 0 in any family."""
    out = dedup.simhash_near_duplicates(
        docs, "text", "doc_id", max_hamming=3, hash_family=family
    )
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert got.get((1, 2)) == 0
    assert got.get((1, 3)) == 0


def test_strict_mode_first_violation_is_deterministic(spark):
    """strict mode must report min (rule_id, row_id) of the first failing
    branch — same row every run, regardless of partitioning."""
    rows = [(i, "XX" if i % 3 == 0 else "OK", 50 if i % 7 == 0 else 500)
            for i in range(100)]
    rules = RuleSet([
        Rule("status_enum", "enumeration", "status", {"values": ["OK"]}),
        Rule("amount_min", "min", "amount", {"value": 100}),
    ])
    results = set()
    for n_parts in (1, 4, 13):
        df = spark.createDataFrame(
            rows, "id int, status string, amount int"
        ).repartition(n_parts)
        eng = ValidationEngine(rules, id_col="id", partition_col="status")
        res = eng.validate(df, run_id="r", mode="strict", with_stats=False)
        hits = res.violations.select("rule_id", "row_id").collect()
        assert len(hits) == 1
        results.add((hits[0].rule_id, hits[0].row_id))
    # min rule_id = 'amount_min'; min row_id as STRING among multiples of
    # 7 is '0' ('0' < '14' < '21' ... lexicographically)
    assert results == {("amount_min", "0")}
