"""Recall report for the sign-LSH ANN path (VERDICT r1 item 8).

The r1 heuristic (signs of the first 3 dims) is replaced by seeded random
integer hyperplanes (similarity.RANDOM_PLANES) plus multi-probe: the query
probes its own bucket and every bucket within Hamming distance 1.

Measured on sf0.01 embeddings (500 vecs, 20 queries, k=5), deterministic
(fixed data + fixed seed):
    single-probe (1/8 buckets):   recall 0.21   — matches theory p^3,
                                                  p = 1 - θ/π ≈ 0.57
    Hamming≤1  (4/8 buckets):     recall 0.67   — DEFAULT, target ≥ 0.60
    Hamming≤2  (7/8 buckets):     recall 0.94
At production bit widths (16-20 planes) Hamming≤1 probes n+1 of 2^n buckets
— a ~2^-12 corpus fraction — so the default generalizes to scale."""

from __future__ import annotations

from liatrio_otel_collector_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    probe_masks,
)

SF_ORACLE = "/root/testdata/sf0.01"
QIDS = tuple(range(20))
K = 5


def _pairs(df):
    return {(r["query_id"], r["cand_id"]) for r in df.collect()}


def test_multi_probe_recall_target(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = _pairs(brute_force_topk(emb, QIDS, K))
    assert len(exact) == len(QIDS) * K
    ann_default = _pairs(lsh_topk(emb, QIDS, K))  # probe_hamming=1
    recall = len(ann_default & exact) / len(exact)
    assert recall >= 0.60, f"default multi-probe recall {recall:.3f} < 0.60"
    # single-probe is strictly worse — multi-probe is load-bearing
    ann_single = _pairs(lsh_topk(emb, QIDS, K, probe_hamming=0))
    assert len(ann_single & exact) < len(ann_default & exact)
    # ANN results are always a subset of legal pairs (no self-matches)
    assert all(q != c for q, c in ann_default)


def test_probe_masks():
    assert probe_masks(3, 0) == (0,)
    assert probe_masks(3, 1) == (0, 1, 2, 4)
    assert set(probe_masks(3, 2)) == {0, 1, 2, 4, 3, 5, 6}


def test_ivf_recall_curve_by_nprobe(spark):
    """IVF-flat: recall vs the exact baseline rises monotonically with
    nprobe and is exactly 1.0 when nprobe == n_centroids (exhaustive scan) —
    the IVF twin of the LSH multi-probe curve above.

    Measured on this fixture (500 vecs, 8 sampled centroids, 20 queries):
    nprobe 1 → 0.29, 2 (default) → 0.47, 3 → 0.53, 4 → 0.70, 8 → 1.00.
    Absolute recall here is fixture-bound — with only 8 cells each probe
    adds ~12.5% of the corpus, so the curve, not the default's absolute
    value, is the meaningful property; production IVF sizes n_centroids
    ~ sqrt(N) and tunes nprobe to a recall target, probing a corpus
    fraction that SHRINKS with scale."""
    from liatrio_otel_collector_spark.operators.similarity import IVF_K, IVF_NPROBE, ivf_topk

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = _pairs(brute_force_topk(emb, QIDS, K))
    recalls = {}
    for nprobe in (1, IVF_NPROBE, IVF_K):
        got = _pairs(ivf_topk(emb, QIDS, K, nprobe=nprobe))
        recalls[nprobe] = len(got & exact) / len(exact)
    assert recalls[1] < recalls[IVF_NPROBE] < recalls[IVF_K], recalls
    assert recalls[IVF_NPROBE] >= 0.40, recalls
    assert recalls[IVF_K] == 1.0, recalls


def test_ivf_kmeans_centroids_lift_recall(spark):
    """Learned (deterministic-Lloyd) centroids vs the stride sample at EQUAL
    nprobe: the recall curve shifts up at every point, never down.

    Measured on this fixture (500 vecs, K=8, 2 Lloyd iterations, 20
    queries): nprobe 1: 0.29→0.31, 2: 0.47→0.49, 3: 0.53→0.65, 4: 0.70→0.74.
    Balanced learned cells also tighten the probe-fraction/recall tradeoff —
    the property that matters when n_centroids ~ sqrt(N) at scale."""
    from liatrio_otel_collector_spark.operators.similarity import (
        ivf_kmeans_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = _pairs(brute_force_topk(emb, QIDS, K))
    learned_cents = ivf_kmeans_centroids(emb)
    lifted = 0
    for nprobe in (1, 2, 3, 4):
        sampled = len(_pairs(ivf_topk(emb, QIDS, K, nprobe=nprobe)) & exact)
        learned = len(
            _pairs(ivf_topk(emb, QIDS, K, nprobe=nprobe, centroids=learned_cents)) & exact
        )
        assert learned >= sampled, (nprobe, learned, sampled)
        lifted += learned > sampled
    assert lifted >= 2, "k-means should strictly improve recall at several nprobe points"
