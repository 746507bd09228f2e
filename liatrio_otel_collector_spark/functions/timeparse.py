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
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in FORMATS])
    # zero-time => null (deployments.go:47-49)
    return F.when(c.startswith("0001-01-01"), F.lit(None).cast("timestamp")).otherwise(parsed)
