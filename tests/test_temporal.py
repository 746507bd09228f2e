"""Edge semantics of the temporal operators (operators/temporal.py):
gap boundaries, inclusive as-of matching, tie determinism, no-match nulls.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from liatrio_otel_collector_spark.operators.temporal import asof_join, sessionize


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundary_is_strict(spark):
    # gaps of exactly `gap_seconds` stay in-session; gap_seconds + 1us splits
    rows = [
        (1, _ts(0)),
        (1, _ts(10)),  # 600 s gap == gap -> same session
        (1, dt.datetime(2024, 1, 1, 0, 20, 0, 1)),  # 600.000001 s -> new
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    out = sessionize(df, ("user_id",), "ts", 600)
    got = {(r.user_id, r.ts): r.session_seq for r in out.collect()}
    assert got[(1, _ts(0))] == 1
    assert got[(1, _ts(10))] == 1
    assert got[(1, dt.datetime(2024, 1, 1, 0, 20, 0, 1))] == 2
    assert got[(2, _ts(5))] == 1


def test_asof_inclusive_ties_and_no_match(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(4)), (102, 2, _ts(10))],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (7, 1, _ts(10), 70.0),  # exactly at left ts -> inclusive match
            (5, 1, _ts(10), 50.0),  # same ts, smaller tie -> loses to 7
            (3, 1, _ts(5), 30.0),  # after event 101 -> not matched there
        ],
        "okey bigint, custkey bigint, odate timestamp_ntz, price double",
    )
    out = asof_join(
        left, right, "user_id", "custkey", "ts", "odate",
        value_cols=("okey", "price"), tie_col="okey",
    )
    got = {r.event_id: (r.okey, r.price) for r in out.collect()}
    assert got[100] == (7, 70.0)  # inclusive + greatest-tie-wins
    assert got[101] == (None, None)  # no right row at-or-before
    assert got[102] == (None, None)  # key never on right side
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_join_is_not_a_range_join(spark):
    # the union+window formulation must never plan a per-key cartesian
    left = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("timestamp").alias("ts")
    )
    right = spark.range(100).select(
        F.col("id").alias("k"),
        F.col("id").cast("timestamp").alias("rts"),
        F.col("id").alias("v"),
    )
    out = asof_join(left, right, "k", "k", "ts", "rts", value_cols=("v",), tie_col="v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # not even a join: one shuffle + window
    assert plan.count("Window") >= 1


def _rand_rows(seed: int):
    """Dense, collision-rich random data: 5 keys, timestamps drawn from only
    300 distinct seconds so equal-ts ties (left==right, right==right) are
    common — the edge the window ordering must get right."""
    import random

    rnd = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    left = [
        (i, rnd.randrange(5), base + dt.timedelta(seconds=rnd.randrange(300)))
        for i in range(300)
    ]
    right = [
        (j, rnd.randrange(5), base + dt.timedelta(seconds=rnd.randrange(300)), float(j) * 1.5)
        for j in range(200)
    ]
    return left, right


def test_asof_join_matches_bruteforce_random(spark):
    left_rows, right_rows = _rand_rows(42)
    left = spark.createDataFrame(
        left_rows, "event_id bigint, k bigint, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        right_rows, "okey bigint, k bigint, rts timestamp_ntz, price double"
    )
    out = asof_join(
        left, right, "k", "k", "ts", "rts", value_cols=("okey", "price"), tie_col="okey"
    )
    got = {r.event_id: (r.okey, r.price) for r in out.collect()}
    assert len(got) == len(left_rows)
    for eid, k, ts in left_rows:
        cands = [(o, rts, p) for (o, rk, rts, p) in right_rows if rk == k and rts <= ts]
        exp = max(cands, key=lambda c: (c[1], c[0]))[::2] if cands else (None, None)
        assert got[eid] == (exp[0], exp[1] if cands else None), (eid, k, ts)


def test_sessionize_matches_bruteforce_random(spark):
    left_rows, _ = _rand_rows(7)
    df = spark.createDataFrame(left_rows, "event_id bigint, k bigint, ts timestamp_ntz")
    gap = 20
    out = sessionize(df, ("k",), "ts", gap)
    got = {r.event_id: r.session_seq for r in out.collect()}

    by_key: dict = {}
    for eid, k, ts in sorted(left_rows, key=lambda r: (r[1], r[2], r[0])):
        by_key.setdefault(k, []).append((eid, ts))
    for k, rows in by_key.items():
        seq, prev = 0, None
        for eid, ts in rows:
            if prev is None or (ts - prev).total_seconds() > gap:
                seq += 1
            prev = ts
            assert got[eid] == seq, (eid, k, ts)
