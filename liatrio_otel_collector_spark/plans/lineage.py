"""Per-partition lineage manifests (north-rule resume requirement).

Each sink write is accompanied by a manifest DataFrame with one row per
Spark partition: (sink, batch_id, partition_id, row_count, min_doc_id,
max_doc_id, token_checksum).  The checksum is a commutative 64-bit fold of
xxhash64(doc_id, tokens) so a resumed/replayed batch can be verified
idempotent without re-reading sink data — the Spark analog of the
collector's self-observability obsreport counters
(/root/reference/receiver/githubreceiver/trace_receiver.go:135,187).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_manifest(df: DataFrame, sink: str, batch_id: int = 0) -> DataFrame:
    has_tokens = "tokens" in df.columns
    checksum_src = (
        F.xxhash64("doc_id", "tokens") if has_tokens else F.xxhash64(*df.columns)
    )
    key = F.col("doc_id") if "doc_id" in df.columns else F.lit(None).cast("string")
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_h", checksum_src)
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.min(key).alias("min_doc_id"),
            F.max(key).alias("max_doc_id"),
            # BIT XOR is commutative+associative => order/partition independent
            F.expr("CAST(bit_xor(_h) AS BIGINT)").alias("token_checksum"),
        )
        .select(
            F.lit(sink).alias("sink"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.col("_pid").alias("partition_id"),
            "row_count",
            "min_doc_id",
            "max_doc_id",
            "token_checksum",
        )
    )
