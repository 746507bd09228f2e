"""Window / ranking operators (SURVEY.md §2.5 W1–W5).

The reference never needs frame specs — ranking + min/max windows cover its
API-embedded `last:1` / `$top=1` / oldest-commit semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# W1 — duplicate step-name disambiguation (newUniqueSteps,
# trace_event_handling.go:267-296): repeated names within a job become
# `name`, `name-1`, `name-2`, … in order of occurrence.
def unique_step_names(
    steps: DataFrame,
    part_cols: tuple[str, ...] = ("job_id",),
    name_col: str = "name",
    order_cols: tuple[str, ...] = ("step_number",),
) -> DataFrame:
    w = Window.partitionBy(*part_cols, name_col).orderBy(*order_cols)
    rn = F.row_number().over(w)
    return steps.withColumn(
        "unique_name",
        F.when(rn > 1, F.concat(F.col(name_col), F.lit("-"), (rn - 1).cast("string"))).otherwise(
            F.col(name_col)
        ),
    )


# W2 — first approved review per PR (`reviews(states: APPROVED, last: 1)`,
# genqlient.graphql:198-205): rank by ts, keep rank 1.
def first_event(
    df: DataFrame,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    desc: bool = False,
) -> DataFrame:
    ordering = [F.col(c).desc() for c in order_cols] if desc else [F.col(c) for c in order_cols]
    w = Window.partitionBy(*part_cols).orderBy(*ordering)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# W4 — oldest commit per branch as the age anchor (helpers.go:330-335).
def oldest_commit(commits: DataFrame) -> DataFrame:
    w = Window.partitionBy("repo_name", "branch_name")
    return (
        commits.withColumn("_min_ts", F.min("committed_date").over(w))
        .filter(F.col("committed_date") == F.col("_min_ts"))
        .drop("_min_ts")
    )


# W5 — latest completed build per repo (`$top=1` newest, helpers.go:351-357).
def latest_per_key(df: DataFrame, key_cols: tuple[str, ...], ts_col: str) -> DataFrame:
    return df.groupBy(*key_cols).agg(F.max(ts_col).alias(f"latest_{ts_col}"))
