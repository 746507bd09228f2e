"""Set operations (SURVEY.md §2.7 U1–U3)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# U1 — union of CVE sources before the severity rollup (helpers.go:414-424):
# dependabot ∪ code-scanning.
def union_cves(dependabot: DataFrame, code_scanning: DataFrame) -> DataFrame:
    return dependabot.unionByName(code_scanning)


# U2 — open PRs ∪ merged-since-cutoff PRs (getCombinedMergeRequests,
# gitlabscraper/helpers.go:207-231): different time filters per leg.
def combined_pull_requests(pull_requests: DataFrame, merged_cutoff: str) -> DataFrame:
    open_leg = pull_requests.filter(F.col("state") == "OPEN")
    merged_leg = pull_requests.filter(
        (F.col("state") == "MERGED") & (F.col("merged_at") >= F.to_timestamp(F.lit(merged_cutoff)))
    )
    return open_leg.unionByName(merged_leg)


# U3 — receiver fan-in (config.yaml:122): per-vendor frames with
# non-identical columns union into one pipeline.
def fan_in(*frames: DataFrame) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
