"""Normalization maps (SURVEY §2.8 X5/X6/X7) as constant-foldable exprs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# X5 — CVE severity normalization, mapSeverities
# (/root/reference/receiver/githubreceiver/internal/scraper/githubscraper/
# helpers.go:489-521): upper-case the input then map to canonical lowercase.
_SEVERITY_MAP = {
    "CRITICAL": "critical",
    "HIGH": "high",
    "MODERATE": "medium",
    "MEDIUM": "medium",
    "LOW": "low",
}


def normalize_severity(col: Column | str) -> Column:
    c = F.upper(F.col(col) if isinstance(col, str) else col)
    expr = F.lit("unknown")
    for k in reversed(list(_SEVERITY_MAP)):
        expr = F.when(c == k, F.lit(_SEVERITY_MAP[k])).otherwise(expr)
    return expr


# X7 — deployment status normalize then remap
# (/root/reference/receiver/azuredevopsreceiver/internal/scraper/
# azuredevopsscraper/azuredevops_scraper.go:369-381,445-459):
# lower(trim()), then partiallysucceeded/notdeployed collapse to failed;
# succeeded stays; everything else drops upstream (filter F5).
def normalize_deploy_status(col: Column | str) -> Column:
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return (
        F.when(c == "succeeded", F.lit("succeeded"))
        .when(c.isin("partiallysucceeded", "failed", "notdeployed"), F.lit("failed"))
        .otherwise(c)
    )


# X6 — CI conclusion -> OTel span status code
# (/root/reference/receiver/githubreceiver/trace_event_handling.go:145-152):
# success -> OK, failure -> ERROR, else UNSET.
def status_to_span_code(col: Column | str) -> Column:
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return (
        F.when(c == "success", F.lit("STATUS_CODE_OK"))
        .when(c == "failure", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_UNSET"))
    )
