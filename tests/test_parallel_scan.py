"""ensure_parallel_scan / needs_widening probe semantics (advice r3):
file count is a heuristic, not a partition count — multi-row-group files
split on their own, and non-file sources are already parallel."""

import os

import pandas as pd

from liatrio_otel_collector_spark.sources.tables import (
    ensure_parallel_scan,
    needs_widening,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def test_non_file_source_not_shuffled(spark):
    df = spark.range(0, 100_000)
    assert needs_widening(df) is False
    assert ensure_parallel_scan(df) is df  # no repartition node added


def test_single_row_group_file_widens(spark, tmp_path):
    p = str(tmp_path / "one_rg.parquet")
    pd.DataFrame({"x": range(10_000)}).to_parquet(p, row_group_size=10_000)
    df = spark.read.parquet(p)
    assert needs_widening(df) is True
    assert ensure_parallel_scan(df).rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )


def test_small_multi_row_group_file_still_widens(spark, tmp_path):
    """Row groups alone don't make a scan wide: Spark splits by BYTE ranges,
    so a small file is one task however many row groups it has (review
    finding r4) — the probe must still widen it."""
    n_rg = spark.sparkContext.defaultParallelism + 4
    p = str(tmp_path / "many_rg_small.parquet")
    pd.DataFrame({"x": range(100 * n_rg)}).to_parquet(p, row_group_size=100)
    df = spark.read.parquet(p)
    assert needs_widening(df) is True


def test_multi_row_group_file_with_enough_byte_ranges_trusted(spark, tmp_path):
    """When BOTH bounds (row groups AND byte ranges) reach the slot count,
    the reader splits the scan itself and the probe must not add a shuffle."""
    n_rg = spark.sparkContext.defaultParallelism + 4
    p = str(tmp_path / "many_rg.parquet")
    pd.DataFrame({"x": range(100 * n_rg)}).to_parquet(p, row_group_size=100)
    df = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # shrink the range size so this small file genuinely yields >= slots
        # byte ranges — the trusted branch under controlled conditions
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128")
        assert needs_widening(df) is False
        assert ensure_parallel_scan(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
