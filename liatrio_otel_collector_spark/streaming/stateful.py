"""Custom stateful streaming operators (SURVEY §2.9 / brief: "watermarks +
windowed aggs for late data; applyInPandasWithState for custom stateful
operators").

Two operators the batch DAG cannot express:

- :func:`dedup_by_key_stream` — exactly-once-per-key across micro-batches
  via ``applyInPandasWithState``: the first row of each key is emitted, every
  later arrival (same batch or any later batch) is dropped.  This is the
  streaming analog of dd1 exact-dedup and the guard the collector's
  webhook receivers get from deterministic ids (X4): replays collapse.
  State per key is one boolean — at 10^12 keys state size is bounded by
  distinct keys, and the shuffle is the same hash-on-key the sink write
  needs anyway.
- :func:`windowed_counts` — watermarked tumbling-window counts per source:
  late rows beyond the watermark are DROPPED by the engine (the
  collection_interval rollup analog with bounded state).

Worker fns are self-contained closures (pickle-by-value) per the repo rule:
executors may not be able to import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
        StructField("first_batch", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", IntegerType())])


def dedup_by_key_stream(stream: DataFrame, batch_id_col: str = "id") -> DataFrame:
    """Streaming exact-dedup on doc_id: emit the FIRST arrival of each key,
    drop all later duplicates across micro-batches (GroupState survives the
    checkpoint, so a restart keeps deduping where it left off)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            # key already emitted in an earlier batch: consume + drop
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is None:
            return
        state.update((1,))
        yield _pd.DataFrame(
            {
                "doc_id": first["doc_id"].values,
                "n_tok": first["n_tok"].values,
                "source": first["source"].values,
                "first_batch": first["id"].astype("int64").values,
            }
        )

    return (
        stream.groupBy("doc_id")
        .applyInPandasWithState(
            fn,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per source: the engine ages out
    window state past the watermark and silently drops later-than-watermark
    rows — bounded state at unbounded input."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n",
        )
    )
