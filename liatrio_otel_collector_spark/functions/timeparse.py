"""Multi-format nullable timestamp parsing (SURVEY §2.8 X16).

The reference's ADO NullableTime tries 6 layouts and treats the zero time
0001-01-01 as null, assuming UTC when no zone is present
(/root/reference/receiver/azuredevopsreceiver/internal/scraper/
azuredevopsscraper/deployments.go:25-68).  Re-expressed as a coalesce chain
of try_to_timestamp — Catalyst constant-folds the format literals and the
whole chain stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime patterns mirroring the Go layouts in deployments.go:30-41
FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
]


def parse_multi_format_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # Length-dispatch fast path (guide §1.2 "per-task work"): the six layouts
    # are mutually exclusive by string length — the three fractional/zoned
    # layouts need >= 20 chars ('.SSSSSSS' adds a dot, 'XXX' is at least 'Z'),
    # the two second-resolution layouts are exactly 19 chars and differ only
    # in the separator at position 11, and the date-only layout is exactly 10.
    # A 19- or 10-char string therefore needs ONE DateTimeFormatter attempt,
    # not six; anything else can only match the three >=20-char zoned/
    # fractional layouts, so the fallback chain carries exactly those three
    # — the per-row parse outcome is identical for every input.
    full = F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in FORMATS[:3]])
    n = F.length(c)
    sep = F.substring(c, 11, 1)
    null_ts = F.lit(None).cast("timestamp")
    parsed = (
        F.when(
            n == 19,
            F.when(sep == "T", F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")))
            .when(sep == " ", F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")))
            .otherwise(null_ts),
        )
        .when(n == 10, F.try_to_timestamp(c, F.lit("yyyy-MM-dd")))
        .otherwise(full)
    )
    # zero-time => null (deployments.go:47-49)
    return F.when(c.startswith("0001-01-01"), null_ts).otherwise(parsed)
