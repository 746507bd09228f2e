"""Scale-guard tests for the LSH dedup operators (VERDICT r1 item 5).

Pathological corpora that are quadratic without the guards:
- dd2: many byte-identical docs → every band bucket holds all of them →
  O(n²) candidate pairs unless bucket width is capped;
- dd3: a stop-word shingle shared by every doc → one posting list of length
  n → O(n²) candidates unless high-DF shingles are excluded from candidate
  generation.

Each test proves the candidate count obeys the cap bound AND that genuinely
similar pairs sharing cold shingles still surface with EXACT Jaccard
(hot-shingle contributions included in the intersection)."""

from __future__ import annotations

from liatrio_otel_collector_spark.operators.dedup import (
    minhash_candidates,
    ngram_candidates,
    ngram_jaccard_pairs,
    shingles,
)

DOC_SCHEMA = "doc_id string, text string"


def test_minhash_bucket_width_guard(spark):
    """60 identical docs: uncapped candidates = C(60,2) = 1770; with
    max_bucket_width=8 every band keeps its first 8 doc_ids, so at most
    C(8,2) = 28 distinct pairs survive."""
    docs = [(f"d{i:03d}", "alpha beta gamma delta epsilon zeta") for i in range(60)]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    uncapped = minhash_candidates(df, max_bucket_width=10**9).count()
    capped = minhash_candidates(df, max_bucket_width=8).count()
    assert uncapped == 60 * 59 // 2
    assert 0 < capped <= 28


def test_ngram_doc_freq_guard(spark):
    """60 docs sharing ONE stop shingle but otherwise unique: uncapped
    candidates = C(60,2); with max_doc_freq=10 the stop shingle generates
    nothing and the unique remainders collide with nobody."""
    docs = [
        (f"d{i:03d}", f"the common stop phrase u{i}a u{i}b u{i}c u{i}d")
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    sh = shingles(df)
    uncapped = ngram_candidates(sh, max_doc_freq=10**9).count()
    capped = ngram_candidates(sh, max_doc_freq=10).count()
    assert uncapped == 60 * 59 // 2
    assert capped == 0


def test_ngram_jaccard_exact_despite_cap(spark):
    """A true near-dup pair sharing BOTH a hot shingle and cold shingles:
    the pair is still found (cold collision) and its Jaccard counts the hot
    shingle in the intersection — the cap affects candidate generation only."""
    # 20 noise docs make "the common stop" hot (df=22 > 10)
    noise = [
        (f"n{i:03d}", f"the common stop x{i}a x{i}b x{i}c") for i in range(20)
    ]
    pair = [
        ("p001", "the common stop shared tail one two"),
        ("p002", "the common stop shared tail one three"),
    ]
    df = spark.createDataFrame(noise + pair, DOC_SCHEMA)
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=10).collect()
    }
    assert ("p001", "p002") in rows
    r = rows[("p001", "p002")]
    # p001 shingles: {the common stop, common stop shared, stop shared tail,
    # shared tail one, tail one two}; p002 ends "one three".
    # intersection = 4 (incl. the HOT "the common stop"), union = 6.
    assert r["inter"] == 4
    assert abs(r["jaccard"] - round(4 / 6, 6)) < 1e-9
    # no noise-pair candidates leaked through the hot shingle
    assert all(k == ("p001", "p002") for k in rows)
