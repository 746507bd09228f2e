"""Skew-handling evidence (north rule: explicit salted repartition).

The source is deliberately skewed: ~50% of rows share source='github'
(FIXTURES.md §1). Without salting, a partition-by-source shuffle puts half
the table in one task. These tests show the salt actually spreads the hot
key and that results are unaffected by it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from liatrio_otel_collector_spark.plans.pipeline import SALT_BUCKETS
from liatrio_otel_collector_spark.sources.sequences import sequences

N = 100_000


def test_source_is_skewed(spark):
    counts = {r["source"]: r["n"] for r in sequences(spark, N).groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["github"] == N // 2  # the hot key


def test_salt_spreads_hot_key(spark):
    salted = sequences(spark, N).repartition(
        32, F.col("source"), F.pmod(F.xxhash64("doc_id"), F.lit(SALT_BUCKETS))
    )
    sizes = [
        r["n"]
        for r in salted.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    # unsalted-by-source would give one partition ~N/2; salted must cap the
    # largest partition well below that (hot key split across SALT_BUCKETS)
    assert max(sizes) < N // 2 * 0.3, f"max partition {max(sizes)} too large: {sorted(sizes)[-5:]}"


def test_unsalted_baseline_is_pathological(spark):
    """Negative control: partitioning on source alone concentrates the hot
    key in a single partition — the problem the salt exists to solve."""
    plain = sequences(spark, N).repartition(32, F.col("source"))
    sizes = [
        r["n"]
        for r in plain.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(sizes) >= N // 2  # hot key all in one place
