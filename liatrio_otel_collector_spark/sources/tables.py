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
