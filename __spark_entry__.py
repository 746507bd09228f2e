"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship parse→enrich→route→aggregate pipeline over the
  tokenized-sequence table at sf0.001 scale; returns the metrics rollup.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
  the training-data ops (dedup / similarity / text analysis), each a
  DataFrame-API program over /root/testdata parquet.
- ``oracle_sql()`` — independently written DuckDB SQL twins.

Implementation lives in the package ``liatrio_otel_collector_spark``; this
file only bootstraps sys.path (the driver may import it from any cwd) and
ships the package to executors (pandas UDFs need it importable there).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _bootstrap(spark: SparkSession) -> None:
    from liatrio_otel_collector_spark.session import ship_package

    try:
        ship_package(spark)
    except Exception:
        pass  # already shipped or local importable


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full pipeline at sf0.001 scale, metrics sink."""
    _bootstrap(spark)
    from liatrio_otel_collector_spark.plans.pipeline import build_pipeline

    return build_pipeline(spark, n_rows=6000)["metrics"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from liatrio_otel_collector_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _bootstrap(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from liatrio_otel_collector_spark.entry_queries import ORACLES

    return dict(ORACLES)
