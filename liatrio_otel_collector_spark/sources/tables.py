"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

These replace the reference's pull-scraper API plumbing (pagination, retry,
rate-limit backoff — e.g. /root/reference/receiver/githubreceiver/internal/
scraper/githubscraper/helpers.go:80-130): once the data is a table, the
scan IS the source, and Catalyst pushes filters/projections into the parquet
reader (PushedFilters / ReadSchema in .explain).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

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
    """Read one table, memoized per session.

    Each `spark.read.parquet` is a py4j round trip plus a footer read for
    schema inference (~100ms); a query that touches one table should not
    pay it ten times over, and back-to-back queries in one session (bench,
    the driver's 50-query gate) should not re-infer schemas the session
    already knows.  The cache key is (realpath, name) and lives ON the
    session object, so it dies with the session and never leaks across a
    stop/start.  Caching the DataFrame is safe: plans are immutable, and
    the driver's testdata is static for the life of a run."""
    cache = getattr(spark, "_lotc_table_cache", None)
    if cache is None:
        cache = {}
        spark._lotc_table_cache = cache
    key = (os.path.realpath(sf_dir), name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        cache[key] = df
    return df


class LazyTables(Mapping):
    """Mapping over the testdata tables that reads each parquet lazily on
    first subscript.  Queries do `load_tables(spark, sf)["events"]` — the
    eager dict comprehension made every single-table query pay ten schema
    reads (~1.3s of pure plan-construction latency, measured).  Iteration
    order and membership match the eager dict exactly."""

    __slots__ = ("_spark", "_sf_dir")

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        return load_table(self._spark, self._sf_dir, name)

    def __iter__(self):
        return iter(TABLES)

    def __len__(self) -> int:
        return len(TABLES)


def load_tables(spark: SparkSession, sf_dir: str) -> Mapping[str, DataFrame]:
    return LazyTables(spark, sf_dir)


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
