"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

These replace the reference's pull-scraper API plumbing (pagination, retry,
rate-limit backoff — e.g. /root/reference/receiver/githubreceiver/internal/
scraper/githubscraper/helpers.go:80-130): once the data is a table, the
scan IS the source, and Catalyst pushes filters/projections into the parquet
reader (PushedFilters / ReadSchema in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def ensure_parallel_scan(df: DataFrame) -> DataFrame:
    """Guard for expression-heavy plans over small-file inputs: a parquet
    file with one row group cannot split, so every downstream expression
    (regex chains, multi-format timestamp parses) runs on ONE core whatever
    files.maxPartitionBytes says.  When the scan has fewer input files than
    the cluster has slots, redistribute the (narrow) source rows first; at
    100 TB inputs arrive with thousands of row groups and this is a no-op.
    Same plan-free probe as operators/dedup.py::shingles (inputFiles comes
    off the logical plan, no RDD translation).

    File count is NOT partition count (advice r3): a large multi-row-group
    file splits into many scan partitions, and a non-file source reports
    inputFiles()==[] while already being parallel (range, in-memory
    frames).  So: no files -> trust the source's own plan and do nothing;
    few files -> count actual splittable units (row groups, straight off
    the parquet footers — cheap, and only ever done for a handful of files)
    and shuffle only when those genuinely undersupply the slots."""
    if needs_widening(df):
        return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df


def needs_widening(df: DataFrame) -> bool:
    """True when a file-backed scan genuinely cannot feed every slot.
    Shared probe for ensure_parallel_scan and operators/dedup.py::shingles.

    The scan's achievable parallelism is bounded BOTH by byte-range
    splitting (Spark carves files into ~maxPartitionBytes ranges — a small
    file is one range no matter how many row groups it has) AND by row-group
    boundaries (a range can only start reading at a row group — a huge
    single-row-group file is one task no matter how many ranges).  Take the
    min of the two bounds; either alone over-estimates."""
    spark = df.sparkSession
    sc = spark.sparkContext
    files = df.inputFiles()
    if not files:
        return False  # non-file source: already distributed by its own plan
    if len(files) >= sc.defaultParallelism:
        return False
    try:
        import pyarrow.parquet as pq

        row_groups = 0
        total_bytes = 0
        for f in files:
            path = f.removeprefix("file:")
            row_groups += pq.ParquetFile(path).metadata.num_row_groups
            total_bytes += os.path.getsize(path)
        max_part = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")).rstrip("b")
        )
        byte_ranges = max(1, (total_bytes + max_part - 1) // max_part)
        if min(row_groups, byte_ranges) >= sc.defaultParallelism:
            return False  # the reader already splits this scan wide enough
    except Exception:
        pass  # remote paths / non-parquet: fall through, repartition is safe
    return True
