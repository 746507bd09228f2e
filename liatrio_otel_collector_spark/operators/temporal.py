"""Temporal operators: gap sessionization and a shuffle-once as-of join.

Neither exists in the reference collector (its windows are API-embedded
`last:1` / `$top=1` lookups — see operators/windows.py); these are the
training-data-pipeline temporal primitives layered on the same engine:
sessionization turns an event log into user sessions (curation by
interaction density), and the as-of join stamps each fact row with the
most recent dimension state at-or-before its timestamp (the slowly-
changing-dimension / point-in-time enrich every log pipeline eventually
needs).

Scale notes (the reason these are written the way they are):

* ``sessionize`` is lag + running sum over one ``(key, ts)`` window — a
  single hash shuffle on the key and one sort per partition.  State per
  row is one int64; nothing is ever collected or cross-joined.  At 100 TB
  the plan is identical, only the shuffle is wider.

* ``asof_join`` deliberately does NOT use a range/theta join (Spark would
  plan a per-key cartesian: every left row × every right row with
  ``r.ts <= l.ts``, O(n·m) per key and quadratic on hot keys).  Instead it
  tags both sides, unions them, and takes ``last(value, ignorenulls)``
  over a ``(key, ts, side, tie)`` window — the classic union+window
  formulation.  Cost class = one shuffle on the key + one sort, i.e. the
  same as a sort-merge join, regardless of how many right rows precede
  each left row.  That is the only as-of shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign 1-based ``session_seq`` per key: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``.

    Equal-timestamp ties are harmless by construction: at equal ``ts`` the
    lag difference is 0 for whichever row sorts second, so the boundary
    flag — and therefore the running-sum session id — is order-insensitive.
    """
    # cast handles TIMESTAMP_NTZ sources: the session timezone is pinned to
    # UTC (session.py), so NTZ -> TIMESTAMP is value-preserving and
    # unix_micros equals the naive value's epoch micros
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1).otherwise(0)
    # two projections: a window function may not nest inside another window
    # function, so the boundary flag materializes before the running sum
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_is_new", is_new)
        .withColumn("session_seq", F.sum("_is_new").over(wsum).cast("bigint"))
        .drop("_is_new")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: stamp each ``left`` row with ``value_cols`` from the
    ``right`` row having the greatest ``right_ts`` at-or-before ``left_ts``
    for the same key (``None`` columns when no right row precedes).

    ``tie_col`` makes equal-``right_ts`` matches deterministic: the row
    with the greatest ``tie_col`` wins.  Sort order inside the window is
    ``(ts, side, tie)`` with right rows as side 0 — so a right row at
    exactly ``left_ts`` sorts before the left row (inclusive at-or-before),
    and among tied right rows ``last()`` picks the largest tie value.
    """
    vstruct_cols = [F.col(c) for c in value_cols]
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("bigint").alias("_tie"),
        F.struct(*vstruct_cols).alias("_val"),
    )
    null_val: Column = F.lit(None).cast(
        r.schema["_val"].dataType.simpleString()
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("_tie"),
        null_val.alias("_val"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    u = l.unionByName(r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType.simpleString())))
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_val", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
