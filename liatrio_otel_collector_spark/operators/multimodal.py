"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas over Arrow batches, deterministic batching — while the actual
codec work is stubbed (the image/audio libraries are not in this container):

- :func:`decode_image_stub` raises NotImplementedError exactly where a codec
  (Pillow/libvips) would plug in;
- :func:`fake_decode_features` is the deterministic stand-in used by tests
  and benchmarks: it derives a feature vector from the bytes themselves, so
  the full pipeline (scan → batch → Python → feature column) is exercised
  end to end with verifiable output.

At 100 TB the shape matters: binary payloads stay columnar (parquet binary
with metadata columns for pruning), the UDF processes Arrow record batches
(never per-row Python), and frame-sampling/resizing are per-batch NumPy ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, features array<float>"
)


def synthetic_media(spark: SparkSession, n_rows: int) -> DataFrame:
    """Deterministic opaque-binary media table (payload = repeatable bytes
    derived from the id; the point is plumbing, not pixels)."""
    return spark.range(n_rows).selectExpr(
        "CAST(id AS STRING) AS media_id",
        "CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "CASE id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime",
        "CAST(64 + id % 512 AS INT) AS width",
        "CAST(64 + id % 256 AS INT) AS height",
        "CAST(1000 + id % 60000 AS INT) AS duration_ms",
        # repeat(sha-ish hex, …) cast to binary: deterministic, size varies
        "CAST(repeat(substring(sha2(CAST(id AS STRING), 256), 1, 16), CAST(1 + id % 8 AS INT)) AS BINARY) AS payload",
    )


def decode_image_stub(payload: bytes) -> "np.ndarray":
    """Where a real codec plugs in. Container has no image libs — see module
    docstring."""
    raise NotImplementedError(
        "image decode requires Pillow/libvips; use fake_decode_features for the "
        "pipeline-plumbing path"
    )


def fake_decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction: partition-preserving, Arrow-batched."""

    import numpy as _np
    import pandas as _pd

    dim = FEATURE_DIM

    # worker fn is self-contained (locals only) so cloudpickle serializes it
    # by value — runs on executors that cannot import this package
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _np.zeros((len(pdf), dim), dtype=_np.float32)
            for i, b in enumerate(pdf["payload"]):
                arr = _np.frombuffer(b, dtype=_np.uint8)
                hist = _np.bincount(arr % dim, minlength=dim).astype(_np.float32)
                out[i] = hist / max(len(arr), 1)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": list(out),
                }
            )

    return media.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: explode a deterministic frame-timestamp grid
    per video row (the decode of each frame is the stubbed step)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
