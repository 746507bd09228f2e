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
    off the logical plan, no RDD translation)."""
    sc = df.sparkSession.sparkContext
    if len(df.inputFiles()) < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
