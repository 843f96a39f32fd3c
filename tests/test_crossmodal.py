"""crossmodal_near_duplicates: image-phash ∪/∩ caption-minhash near-dup.

The driver-certified query (q_crossmodal_near_dups) covers policy='either'
end to end against a DuckDB oracle that replays both pipelines plus the
full-outer combine; these tests cover the policy semantics, the modality
labels, and the estimates-sharing contract on a fixture where every
combination (both / image-only / text-only / neither) is populated.
"""

import pyspark.sql.functions as F
import pytest

from xmlschema_spark.operators import dedup


CAP_A = "the quick brown fox jumps over the lazy dog again and again " * 3
CAP_B = "completely different caption about mountains lakes and rivers " * 3
CAP_C = "a third caption mentioning ships harbors and lighthouses often " * 3
CAP_D = "yet another sentence regarding deserts canyons and cacti blooming " * 3


@pytest.fixture(scope="module")
def corpus(spark):
    # (id, caption, phash):
    #   1,2  -> same caption, phash differs by 1 bit        => both
    #   3,4  -> different captions, identical phash         => image only
    #   5,6  -> same caption, phash differs by many bits    => text only
    #   7    -> singleton (unique caption, distant phash)
    rows = [
        (1, CAP_A, 0x0F0F0F0F0F0F0F0F),
        (2, CAP_A, 0x0F0F0F0F0F0F0F0E),
        (3, CAP_B, 0x1234567812345678),
        (4, CAP_C, 0x1234567812345678),
        (5, CAP_D, -0x7FF0F0F0F0F0F0F0),
        (6, CAP_D, 0x00000000FFFFFFFF),
        (7, "nothing like the others at all anywhere " * 4, 0x5A5A5A5A5A5A5A5A),
    ]
    return spark.createDataFrame(rows, "doc_id long, caption string, phash long")


def _run(corpus, policy, estimates=None):
    out = dedup.crossmodal_near_duplicates(
        corpus, "caption", "phash", "doc_id", policy=policy,
        max_hamming=3, est_threshold=0.5, shingle_k=3, estimates=estimates,
    )
    got = {(r.id_a, r.id_b): r for r in out.collect()}
    if estimates is None:
        out.unpersist()
    return got


def test_either_policy_labels_all_modalities(corpus):
    got = _run(corpus, "either")
    assert got[(1, 2)].modality == "both"
    assert got[(1, 2)].hamming == 1
    assert got[(1, 2)].est_jaccard == 1.0
    assert got[(3, 4)].modality == "image"
    assert got[(3, 4)].hamming == 0
    assert got[(3, 4)].est_jaccard is None
    assert got[(5, 6)].modality == "text"
    assert got[(5, 6)].hamming is None
    assert got[(5, 6)].est_jaccard == 1.0
    assert all(k < v for k, v in got)  # canonical id_a < id_b
    assert not any(7 in k for k in got)  # singleton pairs with nobody


def test_both_policy_is_the_intersection(corpus):
    got = _run(corpus, "both")
    assert set(got) == {(1, 2)}
    assert got[(1, 2)].modality == "both"


def test_shared_estimates_are_caller_owned(corpus):
    est = dedup.minhash_estimates(corpus, "caption", "doc_id", shingle_k=3)
    try:
        got = _run(corpus, "either", estimates=est)
        assert set(got) == {(1, 2), (3, 4), (5, 6)}
        # the shared table must still be usable (not unpersisted) after
        assert est.count() >= 2
    finally:
        est.unpersist()


def test_pairs_feed_drop_near_duplicates(corpus, spark):
    out = dedup.crossmodal_near_duplicates(
        corpus, "caption", "phash", "doc_id", policy="either",
        max_hamming=3, est_threshold=0.5, shingle_k=3,
    )
    kept = dedup.drop_near_duplicates(corpus, out, "doc_id")
    out.unpersist()
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [1, 3, 5, 7]


def test_bad_policy_raises(corpus):
    with pytest.raises(ValueError):
        dedup.crossmodal_near_duplicates(corpus, "caption", "phash", "doc_id",
                                         policy="xor")
