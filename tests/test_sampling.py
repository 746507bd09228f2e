"""Behavioral contract of the deterministic hash-gate downsampler
(operators/sampling.py) beyond the pl10 oracle-parity row."""

from pyspark.sql import functions as F

from liatrio_otel_collector_spark.operators.sampling import source_downsample


def _docs(spark, n=400, sources=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % sources).cast("string")).alias("source"),
    )


def test_deterministic_across_runs(spark):
    d = _docs(spark)
    a = sorted(r["doc_id"] for r in source_downsample(d, 10).collect())
    b = sorted(r["doc_id"] for r in source_downsample(d, 10).collect())
    assert a == b and len(a) > 0


def test_monotone_in_cap(spark):
    """Raising the cap only ADDS kept rows (the gate threshold grows, and
    h32 is cap-independent) — the property that makes staged curation
    reproducible when budgets move."""
    d = _docs(spark)
    kept = {
        cap: {r["doc_id"] for r in source_downsample(d, cap).collect()}
        for cap in (5, 20, 80)
    }
    assert kept[5] <= kept[20] <= kept[80]


def test_cap_at_or_above_group_size_keeps_everything(spark):
    d = _docs(spark, n=100, sources=4)  # 25 per source
    assert source_downsample(d, 25).count() == 100


def test_expected_count_near_cap(spark):
    """Kept counts are binomial(n, cap/n) per group: mean cap, sd
    sqrt(cap(1-cap/n)) — 10 per group with sd ~3; bound at 5 sd."""
    d = _docs(spark, n=4000, sources=4)  # 1000 per source
    per = (
        source_downsample(d, 10)
        .groupBy("source")
        .count()
        .collect()
    )
    assert len(per) == 4
    for r in per:
        assert 0 < r["count"] <= 10 + 16, r


def test_train_split_deterministic_and_map_only(spark):
    from liatrio_otel_collector_spark.operators.sampling import train_val_test_split
    from liatrio_otel_collector_spark.sources.tables import load_tables

    d = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    s = train_val_test_split(d)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # assignment is a pure map expression

    # growing the corpus never moves an existing doc between splits
    full = {r.doc_id: r.split for r in s.select("doc_id", "split").collect()}
    half = train_val_test_split(d.filter(F.col("doc_id") % 2 == 0))
    for r in half.select("doc_id", "split").collect():
        assert full[r.doc_id] == r.split

    # rough proportions (hash-uniform; binomial tolerance at n=500)
    from collections import Counter

    c = Counter(full.values())
    n = sum(c.values())
    assert 0.70 < c["train"] / n < 0.90
    assert c["val"] / n < 0.20 and c["test"] / n < 0.20
