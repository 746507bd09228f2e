"""liatrio_otel_collector_spark — a from-scratch PySpark-native telemetry
pipeline engine with the query/data-processing capabilities of
liatrio/liatrio-otel-collector (reference read-only at /root/reference).

Architecture (Spark-first, NOT a port):

- ``sources``   — deterministic tokenized-sequence generator (the north-rule
                  input table), testdata loaders, enrichment dimensions.
- ``functions`` — scalar kernels (deterministic sha256 ids, multi-format
                  timestamp parse, normalization maps, string rewrites) —
                  all JVM-side builtin expressions except the one mandated
                  Arrow-vectorized token-parse pandas UDF.
- ``operators`` — the aggregate library (SURVEY.md §2.4 A1–A24), windows
                  (§2.5), set ops (§2.7), plus training-data-pipeline ops:
                  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                  similarity search, text analysis.
- ``plans``     — the receive → process → export topology as a batch DAG:
                  parse → enrich → route → aggregate with multi-sink fan-out
                  and per-partition lineage manifests.
- ``streaming`` — Structured Streaming wrapper: micro-batch trigger,
                  checkpointed resume, foreachBatch fan-out, self-metrics.
"""

__version__ = "0.1.0"
