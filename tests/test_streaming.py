"""Streaming semantics: checkpointed resume (only unseen input processed on
restart), per-batch lineage + self-metrics, routed counts match batch mode."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from liatrio_otel_collector_spark.sources.sequences import sequences
from liatrio_otel_collector_spark.streaming import StreamingConfig, start_stream


def _write_chunk(spark, input_dir: str, lo: int, hi: int, name: str) -> None:
    df = sequences(spark, hi).filter(F.col("id") >= lo)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(input_dir, name))


def _seq_files(spark, input_dir):
    # file-stream source reads a flat dir of parquet part-dirs; re-point via glob
    return input_dir + "/*"


def test_stream_resume_from_checkpoint(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    # chunk 1: rows [0, 2000)
    sequences(spark, 2000).coalesce(1).write.mode("append").parquet(input_dir)

    cfg = StreamingConfig(input_dir=input_dir, output_dir=out, checkpoint_dir=ckpt)
    q = start_stream(spark, cfg, available_now=True)
    q.awaitTermination(300)

    logs1 = spark.read.parquet(os.path.join(out, "logs"))
    n_logs_1 = logs1.count()
    assert n_logs_1 == sum(1 for i in range(2000) if i % 5 in (2, 3, 4))
    metrics1 = spark.read.parquet(os.path.join(out, "_metrics"))
    assert metrics1.agg(F.sum("input_rows")).collect()[0][0] == 2000

    # chunk 2: rows [2000, 4000) arrive while the job is down
    sequences(spark, 4000).filter(F.col("id") >= 2000).coalesce(1).write.mode("append").parquet(
        input_dir
    )

    # restart from the same checkpoint: only the new file is processed
    q2 = start_stream(spark, cfg, available_now=True)
    q2.awaitTermination(300)

    metrics2 = spark.read.parquet(os.path.join(out, "_metrics"))
    total_input = metrics2.agg(F.sum("input_rows")).collect()[0][0]
    assert total_input == 4000, "restart must process ONLY unseen input (no reprocessing)"

    logs2 = spark.read.parquet(os.path.join(out, "logs"))
    assert logs2.count() == sum(1 for i in range(4000) if i % 5 in (2, 3, 4))
    # no duplicate doc_ids across the restart
    assert logs2.select("doc_id").distinct().count() == logs2.count()

    # batch ids strictly advance across the restart
    bids = sorted(r["batch_id"] for r in metrics2.select("batch_id").collect())
    assert len(bids) == len(set(bids))

    # lineage manifests cover every routed row
    lineage = spark.read.parquet(os.path.join(out, "_lineage", "logs"))
    assert lineage.agg(F.sum("row_count")).collect()[0][0] == logs2.count()


def test_stream_matches_batch_semantics(spark, tmp_path):
    from liatrio_otel_collector_spark.plans.pipeline import build_pipeline

    input_dir = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    os.makedirs(input_dir)
    sequences(spark, 3000).coalesce(2).write.mode("append").parquet(input_dir)

    cfg = StreamingConfig(
        input_dir=input_dir,
        output_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        max_files_per_trigger=10,
    )
    q = start_stream(spark, cfg, available_now=True)
    q.awaitTermination(300)

    stream_metrics = (
        spark.read.parquet(os.path.join(out, "metrics"))
        .groupBy("source", "severity")
        .agg(F.sum("seq_count").alias("seq_count"), F.sum("tok_count").alias("tok_count"))
    )
    batch_metrics = build_pipeline(spark, 3000)["metrics"]
    a = sorted(map(tuple, stream_metrics.collect()))
    b = sorted(map(tuple, batch_metrics.collect()))
    assert a == b
