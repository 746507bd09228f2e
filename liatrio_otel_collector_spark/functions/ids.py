"""Deterministic trace/span id derivation (SURVEY §2.8 X4).

The reference derives 16-byte trace ids and 8-byte span ids from sha256
digests of business keys so redelivered webhooks are idempotent
(/root/reference/receiver/githubreceiver/trace_event_handling.go:88-121):
hex chars [1..32] of the digest for the trace id and [17..32] for span ids.
Pure column expressions — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _key(*parts: Column | str) -> Column:
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("|", *[c.cast("string") for c in cols])


def trace_id(*parts: Column | str) -> Column:
    """32-hex-char trace id = sha256(key) hex chars 1..32."""
    return F.substring(F.sha2(_key(*parts), 256), 1, 32)


def span_id(*parts: Column | str) -> Column:
    """16-hex-char span id = sha256(key) hex chars 17..32."""
    return F.substring(F.sha2(_key(*parts), 256), 17, 16)
