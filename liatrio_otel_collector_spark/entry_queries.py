"""Driver-contract queries: one entry per implemented operator (SURVEY §2),
each with a DuckDB oracle twin.

Spark side = DataFrame-API operator library over domain views;
oracle side = independently hand-written DuckDB SQL over the same parquet
views (the driver pre-registers region/nation/customer/supplier/part/orders/
lineitem/events/documents/embeddings).

Determinism contract shared by both sides (see sources/domain.py):
pinned clock, floor() before every double→int, CAST(... AS BIGINT) around
sums (DuckDB SUM(int) returns HUGEINT), exact-integer arithmetic before any
division.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.strings import workflow_path_to_name
from .functions.timeparse import parse_multi_format_ts
from .operators import aggregates as A
from .operators import dedup as DD
from .operators import setops as U
from .operators import similarity as SIM
from .operators.similarity import _quantized, signlsh_buckets
from .operators.aggregates import _final_deployments
from .operators import textstats as TS
from .operators import windows as W
from .sources.domain import NOW, VIEW_BUILDERS, with_ctes
from .sources.sequences import (
    duckdb_enrich_dim_cte,
    duckdb_sequences_cte,
    enrich_dim,
    rows_for_sf,
    sequences,
)
from .sources.tables import ensure_parallel_scan as _wide
from .sources.tables import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _view(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return VIEW_BUILDERS[name](t)


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

_q(
    "a1_repository_count",
    with_ctes(
        "repos",
        body="SELECT CAST(count(*) AS BIGINT) AS repo_count FROM repos WHERE NOT archived",
    ),
)(lambda spark, sf: A.repository_count(_view(spark, sf, "repos")))

_q(
    "a2_ref_count",
    with_ctes(
        "branches",
        body="SELECT repo_name, CAST(count(*) AS BIGINT) AS ref_count FROM branches GROUP BY repo_name",
    ),
)(lambda spark, sf: A.ref_count(_view(spark, sf, "branches")))

_q(
    "a3_change_count",
    with_ctes(
        "pull_requests",
        body="SELECT repo_name, state, CAST(count(*) AS BIGINT) AS change_count "
        "FROM pull_requests GROUP BY repo_name, state",
    ),
)(lambda spark, sf: A.change_count(_view(spark, sf, "pull_requests")))

_q(
    "a4_change_time_to_merge",
    with_ctes(
        "pull_requests",
        body="SELECT repo_name, pr_id, date_diff('second', created_at, merged_at) AS time_to_merge_s "
        "FROM pull_requests WHERE state = 'MERGED'",
    ),
)(lambda spark, sf: A.change_time_to_merge(_view(spark, sf, "pull_requests")))

_q(
    "a5_change_duration",
    with_ctes(
        "pull_requests",
        body=f"SELECT repo_name, pr_id, date_diff('second', created_at, TIMESTAMP '{NOW}') AS duration_s "
        "FROM pull_requests WHERE state = 'OPEN'",
    ),
)(lambda spark, sf: A.change_duration(_view(spark, sf, "pull_requests")))

_q(
    "a6_change_time_to_approval",
    with_ctes(
        "pull_requests",
        body="SELECT repo_name, pr_id, date_diff('second', created_at, first_review_at) AS time_to_approval_s "
        "FROM pull_requests WHERE state = 'OPEN' AND review_count > 0",
    ),
)(lambda spark, sf: A.change_time_to_approval(_view(spark, sf, "pull_requests")))

_q(
    "a7_ref_revisions_delta",
    with_ctes(
        "branches",
        body="""
SELECT repo_name, branch_name, 'ahead' AS direction, CAST(behind_by AS BIGINT) AS revisions
FROM branches WHERE NOT is_default AND behind_by > 0
UNION ALL
SELECT repo_name, branch_name, 'behind' AS direction, CAST(ahead_by AS BIGINT) AS revisions
FROM branches WHERE NOT is_default AND behind_by > 0
""",
    ),
)(lambda spark, sf: A.ref_revisions_delta(_view(spark, sf, "branches")))

_q(
    "a8_ref_lines_delta",
    with_ctes(
        "commits",
        body="""
, sums AS (
  SELECT repo_name, branch_name,
         CAST(SUM(additions) AS BIGINT) AS added,
         CAST(SUM(deletions) AS BIGINT) AS removed
  FROM commits GROUP BY repo_name, branch_name
)
SELECT repo_name, branch_name, 'added' AS line_type, added AS lines FROM sums
UNION ALL
SELECT repo_name, branch_name, 'removed' AS line_type, removed AS lines FROM sums
""",
    ),
)(lambda spark, sf: A.ref_lines_delta(_view(spark, sf, "commits")))

_q(
    "a9_ref_time",
    with_ctes(
        "commits",
        body=f"SELECT repo_name, branch_name, "
        f"date_diff('second', min(committed_date), TIMESTAMP '{NOW}') AS ref_age_s "
        "FROM commits GROUP BY repo_name, branch_name",
    ),
)(lambda spark, sf: A.ref_time(_view(spark, sf, "commits")))

_q(
    "a10_contributor_count",
    with_ctes(
        "commits",
        body="SELECT repo_name, CAST(count(DISTINCT author_id) AS BIGINT) AS contributor_count "
        "FROM commits GROUP BY repo_name",
    ),
)(lambda spark, sf: A.contributor_count(_view(spark, sf, "commits")))

_q(
    "a11_cve_count",
    with_ctes(
        "cve_alerts",
        body="""
SELECT repo_name,
       CASE upper(severity_raw)
            WHEN 'CRITICAL' THEN 'critical' WHEN 'HIGH' THEN 'high'
            WHEN 'MODERATE' THEN 'medium' WHEN 'MEDIUM' THEN 'medium'
            WHEN 'LOW' THEN 'low' ELSE 'unknown' END AS severity,
       CAST(count(*) AS BIGINT) AS cve_count
FROM cve_alerts WHERE state = 'open'
GROUP BY 1, 2
""",
    ),
)(lambda spark, sf: A.cve_count(_view(spark, sf, "cve_alerts")))

_DEPLOY_FINAL_SQL = """
, fin AS (
  SELECT *,
         CASE WHEN lower(trim(status_raw)) = 'succeeded' THEN 'succeeded'
              WHEN lower(trim(status_raw)) IN ('partiallysucceeded', 'failed', 'notdeployed') THEN 'failed'
              ELSE lower(trim(status_raw)) END AS status,
         COALESCE(NULLIF(split_part(release_name, ' ', 1), ''), 'unknown') AS service,
         CASE WHEN started_on LIKE '0001-01-01%' THEN NULL
              ELSE COALESCE(try_strptime(started_on, '%Y-%m-%dT%H:%M:%S'),
                            try_strptime(started_on, '%Y-%m-%d %H:%M:%S'),
                            try_strptime(started_on, '%Y-%m-%d')) END AS started_ts,
         CASE WHEN completed_on LIKE '0001-01-01%' THEN NULL
              ELSE COALESCE(try_strptime(completed_on, '%Y-%m-%dT%H:%M:%S'),
                            try_strptime(completed_on, '%Y-%m-%d %H:%M:%S'),
                            try_strptime(completed_on, '%Y-%m-%d')) END AS completed_ts
  FROM deployments
)
, gated AS (SELECT * FROM fin WHERE status IN ('succeeded', 'failed'))
"""

_q(
    "a12_deployment_count",
    with_ctes(
        "deployments",
        body=_DEPLOY_FINAL_SQL
        + "SELECT service, environment, status, CAST(count(*) AS BIGINT) AS deployment_count "
        "FROM gated GROUP BY service, environment, status",
    ),
)(lambda spark, sf: A.deployment_count(_view(spark, sf, "deployments")))

_q(
    "a13_deployment_average_duration",
    with_ctes(
        "deployments",
        body=_DEPLOY_FINAL_SQL
        + """
SELECT service, environment,
       CAST(floor(SUM(date_diff('second', started_ts, completed_ts)) / count(*)) AS BIGINT)
         AS avg_duration_s
FROM gated WHERE status = 'succeeded' AND started_ts IS NOT NULL
GROUP BY service, environment
""",
    ),
)(lambda spark, sf: A.deployment_average_duration(_view(spark, sf, "deployments")))

_q(
    "a14_deployment_last_timestamp",
    with_ctes(
        "deployments",
        body=_DEPLOY_FINAL_SQL
        + "SELECT service, environment, status, "
        "CAST(max(epoch(completed_ts)) AS BIGINT) AS last_deploy_epoch "
        "FROM gated GROUP BY service, environment, status",
    ),
)(lambda spark, sf: A.deployment_last_timestamp(_view(spark, sf, "deployments")))

_q(
    "a15_work_item_count",
    with_ctes(
        "work_items",
        body="SELECT wi_type, state, CAST(count(*) AS BIGINT) AS work_item_count "
        "FROM work_items GROUP BY wi_type, state",
    ),
)(lambda spark, sf: A.work_item_count(_view(spark, sf, "work_items")))

_q(
    "a16_work_item_tag_count",
    with_ctes(
        "work_items",
        body="""
SELECT tag, wi_type, CAST(count(*) AS BIGINT) AS tag_count
FROM (
  SELECT wi_type, trim(t.u) AS tag
  FROM work_items, unnest(string_split(tags, ';')) AS t(u)
)
WHERE tag IN ('alpha', 'beta', 'gamma')
GROUP BY tag, wi_type
""",
    ),
)(lambda spark, sf: A.work_item_tag_count(_view(spark, sf, "work_items")))

_q(
    "a17_work_item_cycle_time",
    with_ctes(
        "work_items",
        body=f"""
SELECT id, wi_type,
       CASE WHEN closed_date IS NOT NULL
            THEN date_diff('second', created_date, closed_date)
            ELSE date_diff('second', created_date, TIMESTAMP '{NOW}') END AS cycle_time_s,
       (closed_date IS NOT NULL) AS is_closed
FROM work_items
""",
    ),
)(lambda spark, sf: A.work_item_cycle_time(_view(spark, sf, "work_items")))

_q(
    "a24_code_coverage",
    with_ctes(
        "coverage",
        body="""
SELECT repo_name,
       CASE WHEN CAST(SUM(total) AS BIGINT) = 0 THEN 0
            ELSE CAST(floor(100 * CAST(SUM(covered) AS BIGINT) / CAST(SUM(total) AS BIGINT)) AS BIGINT)
       END AS coverage_pct
FROM coverage GROUP BY repo_name
""",
    ),
)(lambda spark, sf: A.code_coverage(_view(spark, sf, "coverage")))

_q(
    "a18_catalog_component_counts",
    with_ctes(
        "ci_lines",
        body=r"""
, comp AS (
  SELECT project_path,
         regexp_extract(line, '^\s*-\s*component:\s*[^/]+/(.+)', 1) AS m
  FROM ci_lines
)
SELECT split_part(m, '@', 1) AS component,
       CAST(count(DISTINCT project_path) AS BIGINT) AS project_count,
       CAST(count(*) AS BIGINT) AS usage_count
FROM comp WHERE m <> ''
GROUP BY 1
""",
    ),
)(lambda spark, sf: A.catalog_component_counts(_view(spark, sf, "ci_lines")))

_q(
    "a21_terraform_module_consumers",
    with_ctes(
        "ci_lines",
        body=r"""
, mods AS (
  SELECT project_path, regexp_extract(line, 'source\s*=\s*"([^"]+)"', 1) AS src
  FROM ci_lines
)
SELECT split_part(src, '/', 3) AS module,
       regexp_extract(src, '([^/]+)$', 1) AS system,
       CAST(count(DISTINCT project_path) AS BIGINT) AS consumer_count
FROM mods WHERE src <> ''
GROUP BY 1, 2
""",
    ),
)(lambda spark, sf: A.terraform_module_consumers(_view(spark, sf, "ci_lines")))

# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

_q(
    "w1_unique_step_names",
    """
SELECT event_id,
       CASE WHEN rn > 1 THEN event_type || '-' || CAST(rn - 1 AS STRING)
            ELSE event_type END AS unique_name
FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
""",
)(
    lambda spark, sf: W.unique_step_names(
        load_tables(spark, sf)["events"],
        part_cols=("user_id",),
        name_col="event_type",
        order_cols=("ts", "event_id"),
    ).select("event_id", "unique_name")
)

_q(
    "w2_first_purchase_per_user",
    """
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS first_purchase_epoch
FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
)
WHERE rn = 1
""",
)(
    lambda spark, sf: W.first_event(
        load_tables(spark, sf)["events"].filter(F.col("event_type") == "purchase"),
        part_cols=("user_id",),
        order_cols=("ts", "event_id"),
    ).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("bigint").alias("first_purchase_epoch"),
    )
)

_q(
    "w4_oldest_commit_per_branch",
    with_ctes(
        "commits",
        body="""
SELECT repo_name, branch_name, CAST(epoch(committed_date) AS BIGINT) AS committed_epoch,
       additions, deletions
FROM (
  SELECT *, min(committed_date) OVER (PARTITION BY repo_name, branch_name) AS mn
  FROM commits
)
WHERE committed_date = mn
""",
    ),
)(
    lambda spark, sf: W.oldest_commit(_view(spark, sf, "commits")).select(
        "repo_name",
        "branch_name",
        F.unix_timestamp("committed_date").cast("bigint").alias("committed_epoch"),
        "additions",
        "deletions",
    )
)

_q(
    "w5_latest_event_per_user",
    """
SELECT user_id, CAST(floor(max(epoch(ts))) AS BIGINT) AS latest_epoch
FROM events GROUP BY user_id
""",
)(
    lambda spark, sf: W.latest_per_key(load_tables(spark, sf)["events"], ("user_id",), "ts").select(
        "user_id", F.unix_timestamp("latest_ts").cast("bigint").alias("latest_epoch")
    )
)

# ---------------------------------------------------------------------------
# §2.3 joins / enrichment
# ---------------------------------------------------------------------------

_q(
    "j1_broadcast_enrich_join",
    """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS item_count,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)(
    lambda spark, sf: (
        load_tables(spark, sf)["lineitem"]
        .join(F.broadcast(load_tables(spark, sf)["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("item_count"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
)

_q(
    "j5_case_insensitive_dim_join",
    with_ctes(
        "work_items",
        body="""
SELECT d.rank_val, CAST(count(*) AS BIGINT) AS item_count
FROM work_items w
JOIN (VALUES ('new', 1), ('active', 2), ('resolved', 3), ('closed', 4)) AS d(state_lc, rank_val)
  ON lower(trim(w.state)) = d.state_lc
GROUP BY d.rank_val
""",
    ),
)(
    lambda spark, sf: (
        _view(spark, sf, "work_items")
        .join(
            F.broadcast(
                spark.createDataFrame(
                    [("new", 1), ("active", 2), ("resolved", 3), ("closed", 4)],
                    "state_lc string, rank_val int",
                )
            ),
            F.lower(F.trim(F.col("state"))) == F.col("state_lc"),
        )
        .groupBy("rank_val")
        .agg(F.count(F.lit(1)).alias("item_count"))
    )
)

_q(
    "j7_service_name_precedence",
    with_ctes(
        "repos",
        body="""
SELECT repo_name,
       lower(replace(COALESCE(CASE WHEN archived THEN 'Custom_Svc' END, repo_name), '_', '-'))
         AS service_name
FROM repos
""",
    ),
)(
    lambda spark, sf: _view(spark, sf, "repos").select(
        "repo_name",
        F.lower(
            F.regexp_replace(
                F.coalesce(
                    F.when(F.col("archived"), F.lit("Custom_Svc")), F.col("repo_name")
                ),
                "_",
                "-",
            )
        ).alias("service_name"),
    )
)

# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------

_PR_CUTOFF = "2024-06-01 00:00:00"

_q(
    "u2_combined_pull_requests",
    with_ctes(
        "pull_requests",
        body=f"""
SELECT repo_name, state, CAST(count(*) AS BIGINT) AS pr_count FROM (
  SELECT * FROM pull_requests WHERE state = 'OPEN'
  UNION ALL
  SELECT * FROM pull_requests WHERE state = 'MERGED' AND merged_at >= TIMESTAMP '{_PR_CUTOFF}'
)
GROUP BY repo_name, state
""",
    ),
)(
    lambda spark, sf: U.combined_pull_requests(_view(spark, sf, "pull_requests"), _PR_CUTOFF)
    .groupBy("repo_name", "state")
    .agg(F.count(F.lit(1)).alias("pr_count"))
)

_q(
    "u3_receiver_fan_in",
    with_ctes(
        "repos",
        "branches",
        body="""
SELECT vendor, CAST(count(*) AS BIGINT) AS row_count,
       CAST(count(extra) AS BIGINT) AS with_extra
FROM (
  SELECT 'github' AS vendor, repo_name, org AS extra FROM repos
  UNION ALL BY NAME
  SELECT 'gitlab' AS vendor, repo_name, NULL AS extra FROM branches
)
GROUP BY vendor
""",
    ),
)(
    lambda spark, sf: U.fan_in(
        _view(spark, sf, "repos").select(
            F.lit("github").alias("vendor"), "repo_name", F.col("org").alias("extra")
        ),
        _view(spark, sf, "branches").select(F.lit("gitlab").alias("vendor"), "repo_name"),
    )
    .groupBy("vendor")
    .agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count("extra").alias("with_extra"),
    )
)

# ---------------------------------------------------------------------------
# §2.2 filters
# ---------------------------------------------------------------------------

_q(
    "f1_stale_branch_filter",
    with_ctes(
        "branches",
        body="SELECT repo_name, CAST(count(*) AS BIGINT) AS stale_branches "
        "FROM branches WHERE NOT is_default AND behind_by > 0 GROUP BY repo_name",
    ),
)(
    lambda spark, sf: _view(spark, sf, "branches")
    .filter(~F.col("is_default") & (F.col("behind_by") > 0))
    .groupBy("repo_name")
    .agg(F.count(F.lit(1)).alias("stale_branches"))
)

_q(
    "f8_regex_event_filter",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS event_count
FROM events WHERE regexp_matches(event_type, '^(purchase|signup)$')
GROUP BY event_type
""",
)(
    lambda spark, sf: load_tables(spark, sf)["events"]
    .filter(F.col("event_type").rlike("^(purchase|signup)$"))
    .groupBy("event_type")
    .agg(F.count(F.lit(1)).alias("event_count"))
)

# ---------------------------------------------------------------------------
# §2.8 scalar kernels
# ---------------------------------------------------------------------------

_q(
    "x4_deterministic_ids",
    with_ctes(
        "pull_requests",
        body="""
SELECT pr_id,
       substring(sha256(pr_id || '|' || repo_name), 1, 32) AS trace_id,
       substring(sha256(pr_id || '|' || repo_name), 17, 16) AS span_id
FROM pull_requests
""",
    ),
)(
    lambda spark, sf: (
        lambda prs: prs.select(
            "pr_id",
            F.substring(F.sha2(F.concat_ws("|", "pr_id", "repo_name"), 256), 1, 32).alias(
                "trace_id"
            ),
            F.substring(F.sha2(F.concat_ws("|", "pr_id", "repo_name"), 256), 17, 16).alias(
                "span_id"
            ),
        )
    )(_view(spark, sf, "pull_requests"))
)

_q(
    "x9_api_url_rewrite",
    with_ctes(
        "repos",
        body="SELECT repo_name, replace(url, 'api.github.com/repos', 'github.com') AS html_url FROM repos",
    ),
)(
    lambda spark, sf: _view(spark, sf, "repos").select(
        "repo_name",
        F.regexp_replace("url", r"api\.github\.com/repos", "github.com").alias("html_url"),
    )
)

_q(
    "x16_multi_format_timestamps",
    with_ctes(
        "deployments",
        body="""
SELECT deployment_id,
       CAST(epoch(CASE WHEN started_on LIKE '0001-01-01%' THEN NULL
            ELSE COALESCE(try_strptime(started_on, '%Y-%m-%dT%H:%M:%S'),
                          try_strptime(started_on, '%Y-%m-%d %H:%M:%S'),
                          try_strptime(started_on, '%Y-%m-%d')) END) AS BIGINT) AS started_epoch
FROM deployments
""",
    ),
)(
    lambda spark, sf: (
        lambda d: d.select(
            "deployment_id",
            F.unix_timestamp(parse_multi_format_ts("started_on"))
            .cast("bigint")
            .alias("started_epoch"),
        )
    )(_view(spark, sf, "deployments"))
)

_q(
    "x22_workflow_path_names",
    with_ctes(
        "pull_requests",
        body="""
SELECT pr_id,
       lower(split_part(regexp_extract(split_part(
           '.github/workflows/Build_' || pr_id || '.yml@refs/heads/main', '@', 1),
           '([^/]+)$', 1), '.', 1)) AS workflow_name
FROM pull_requests
""",
    ),
)(
    lambda spark, sf: (
        lambda prs: prs.select(
            "pr_id",
            workflow_path_to_name(
                F.concat(
                    F.lit(".github/workflows/Build_"), F.col("pr_id"), F.lit(".yml@refs/heads/main")
                )
            ).alias("workflow_name"),
        )
    )(_view(spark, sf, "pull_requests"))
)

# ---------------------------------------------------------------------------
# training-data ops: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
shingles AS (
  SELECT DISTINCT doc_id, sh AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
             i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')
           )) AS sh
    FROM documents
  ) WHERE sh <> ''
)
"""

_SIGS_CTE = ", sigs AS (\n  SELECT doc_id, " + ", ".join(
    f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(DD.NUM_HASHES)
) + "\n  FROM shingles GROUP BY doc_id\n)"

_BANDS_CTE = ", bands AS (\n" + "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band_id, md5(h{2*b} || '|' || h{2*b+1}) AS band_key FROM sigs"
    for b in range(DD.NUM_HASHES // DD.BAND_SIZE)
) + "\n)"

_q(
    "dd1_exact_dedup",
    "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count "
    "FROM documents GROUP BY text",
)(
    lambda spark, sf: DD.exact_dedup(load_tables(spark, sf)["documents"]).select(
        "keep_id", "dup_count"
    )
)

_MATCH_SUM = " + ".join(
    f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(DD.NUM_HASHES)
)

_q(
    "dd2_minhash_near_dups",
    "WITH "
    + _SHINGLES_CTE.strip()
    + _SIGS_CTE
    + _BANDS_CTE
    + f"""
, capped AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rk
    FROM bands
  ) WHERE rk <= {DD.MAX_BUCKET_WIDTH}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_MATCH_SUM} AS BIGINT) AS match_count
FROM cand
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b
WHERE {_MATCH_SUM} >= 4
""",
)(lambda spark, sf: DD.minhash_near_dups(load_tables(spark, sf)["documents"]))

# dd7 — duplicate-cluster connected components over the dd2 near-dup edges:
# (doc_id, cluster_id = min doc_id reachable).  Spark side is iterative
# min-label propagation (O(log V) shuffle rounds); the oracle states the
# same fixpoint as a recursive CTE, so the check is a full value hash.
_q(
    "dd7_dup_clusters",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.strip()
    + _SIGS_CTE
    + _BANDS_CTE
    + f"""
, capped AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rk
    FROM bands
  ) WHERE rk <= {DD.MAX_BUCKET_WIDTH}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
, edges AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sigs sa ON sa.doc_id = doc_a
  JOIN sigs sb ON sb.doc_id = doc_b
  WHERE {_MATCH_SUM} >= 4
)
, sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM edges
)
, reach(doc_id, r) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT rr.doc_id, s.dst FROM reach rr JOIN sym s ON s.src = rr.r
)
SELECT doc_id, CAST(LEAST(doc_id, MIN(r)) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc_id
""",
)(
    lambda spark, sf: DD.duplicate_clusters(
        DD.minhash_near_dups(load_tables(spark, sf)["documents"]).select("doc_a", "doc_b")
    )
)

_q(
    "dd3_ngram_jaccard_pairs",
    "WITH "
    + _SHINGLES_CTE.strip()
    + f"""
, sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingles GROUP BY doc_id)
, cold AS (
  SELECT s.* FROM shingles s JOIN (
    SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= {DD.MAX_DOC_FREQ}
  ) f USING (shingle)
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
)
, inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       round(inter / (wa.n_sh + wb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes wa ON wa.doc_id = doc_a
JOIN sizes wb ON wb.doc_id = doc_b
WHERE round(inter / (wa.n_sh + wb.n_sh - inter), 6) >= 0.5
""",
)(lambda spark, sf: DD.ngram_jaccard_pairs(load_tables(spark, sf)["documents"]))

_SIMHASH_SUMS = ", ".join(
    f"CAST(SUM((hv >> {j}) & 1) AS BIGINT) AS s{j}" for j in range(DD.SIMHASH_BITS)
)
_SIMHASH_FOLD = " + ".join(
    f"(CASE WHEN 2 * s{j} >= n THEN {2**j} ELSE 0 END)" for j in range(DD.SIMHASH_BITS)
)

_q(
    "dd4_simhash",
    "WITH "
    + _SHINGLES_CTE.strip()
    + f"""
, h AS (
  SELECT doc_id, CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS hv FROM shingles
)
, agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, {_SIMHASH_SUMS}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_FOLD} AS BIGINT) AS simhash FROM agg
""",
)(lambda spark, sf: DD.simhash(load_tables(spark, sf)["documents"]))

_QUANT_SQL = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_COSINE_SQL = """
round(
  CAST(list_sum(list_transform(range(1, len(qa) + 1), i -> qa[i] * qb[i])) AS BIGINT) /
  sqrt(CAST(list_sum(list_transform(qa, x -> x * x)) AS BIGINT) *
       CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT)), 6)
"""

_q(
    "sim1_brute_force_topk",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, {_QUANT_SQL} AS qa FROM embeddings WHERE vec_id IN (0, 1, 2)
), c AS (
  SELECT vec_id AS cand_id, {_QUANT_SQL} AS qb FROM embeddings
), scored AS (
  SELECT query_id, cand_id, {_COSINE_SQL} AS cosine
  FROM c, q WHERE cand_id <> query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
)(lambda spark, sf: SIM.brute_force_topk(load_tables(spark, sf)["embeddings"]))

# seeded random-hyperplane sign-LSH (operators/similarity.py RANDOM_PLANES):
# bit j = <q, plane_j> >= 0, all-integer so both engines agree bit-for-bit
def _plane_list_sql(plane):
    return "[" + ", ".join(str(int(v)) for v in plane) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(range(1, len(q) + 1), "
    f"i -> q[i] * list_extract({_plane_list_sql(plane)}, i))) >= 0 "
    f"THEN {2**j} ELSE 0 END)"
    for j, plane in enumerate(SIM.RANDOM_PLANES)
)

_PROBE_MASKS_SQL = "[" + ", ".join(str(m) for m in SIM.probe_masks(len(SIM.RANDOM_PLANES), 1)) + "]"

_q(
    "sim2_lsh_topk",
    f"""
WITH b0 AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
), b AS (
  SELECT vec_id, q, CAST({_BUCKET_SQL} AS INT) AS bucket FROM b0
), qv AS (
  SELECT vec_id AS query_id, q AS qa, xor(bucket, m) AS probe
  FROM b, unnest({_PROBE_MASKS_SQL}) AS t(m)
  WHERE vec_id IN (0, 1, 2)
), cv AS (
  SELECT vec_id AS cand_id, q AS qb, bucket FROM b
), scored AS (
  SELECT query_id, cand_id, {_COSINE_SQL} AS cosine
  FROM cv JOIN qv ON bucket = probe WHERE cand_id <> query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
)(lambda spark, sf: SIM.lsh_topk(load_tables(spark, sf)["embeddings"]))

_IVF_IDS = ", ".join(str(j * SIM.IVF_CENTROID_STRIDE) for j in range(SIM.IVF_K))
_SQDIST_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)

_q(
    "sim3_ivf_topk",
    f"""
WITH b0 AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
), cents AS (
  SELECT CAST(vec_id / {SIM.IVF_CENTROID_STRIDE} AS INT) AS cell, q AS qc
  FROM b0 WHERE vec_id IN ({_IVF_IDS})
), assigned AS (
  SELECT vec_id, q, cell FROM (
    SELECT b0.vec_id, b0.q, c.cell,
           row_number() OVER (
             PARTITION BY b0.vec_id
             ORDER BY {_SQDIST_SQL.format(a="q", b="qc")}, c.cell
           ) AS rk
    FROM b0 CROSS JOIN cents c
  ) WHERE rk = 1
), probes AS (
  SELECT query_id, qa, cell FROM (
    SELECT a.vec_id AS query_id, a.q AS qa, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_SQDIST_SQL.format(a="a.q", b="qc")}, c.cell
           ) AS rk
    FROM assigned a CROSS JOIN cents c WHERE a.vec_id IN (0, 1, 2)
  ) WHERE rk <= {SIM.IVF_NPROBE}
), scored AS (
  SELECT query_id, cand_id, {_COSINE_SQL} AS cosine
  FROM (SELECT vec_id AS cand_id, q AS qb, cell FROM assigned) cv
  JOIN probes USING (cell)
  WHERE cand_id <> query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
)(lambda spark, sf: SIM.ivf_topk(load_tables(spark, sf)["embeddings"]))

# ---------------------------------------------------------------------------
# r5: sim4 — IVF with LEARNED centroids (VERDICT r4 item 7): deterministic
# k-means (stride-sample init, exact-int assignment, floor(sum/count)
# updates, FIXED iteration count) so the oracle can UNROLL the same Lloyd
# iterations in SQL and hash-match the final assignment + top-k.  Recall
# improvement vs sampled centroids is pinned in tests/test_similarity_recall.
# ---------------------------------------------------------------------------


def _ivf_assign_sql(cents: str) -> str:
    return f"""
  SELECT vec_id, q, cell FROM (
    SELECT b0.vec_id, b0.q, c.cell,
           row_number() OVER (
             PARTITION BY b0.vec_id
             ORDER BY {_SQDIST_SQL.format(a="q", b="qc")}, c.cell
           ) AS rk
    FROM b0 CROSS JOIN {cents} c
  ) WHERE rk = 1
"""


def _ivf_mean_sql(src: str) -> str:
    # element-wise floor(sum/count) per cell; empty cells drop out — the
    # exact update rule of similarity.ivf_kmeans_centroids
    return f"""
  SELECT cell, list(d ORDER BY pos) AS qc FROM (
    SELECT cell, pos, CAST(floor(sum(v) / count(*)) AS BIGINT) AS d FROM (
      SELECT cell, unnest(q) AS v, generate_subscripts(q, 1) AS pos FROM {src}
    ) GROUP BY cell, pos
  ) GROUP BY cell
"""


_q(
    "sim4_ivf_kmeans_topk",
    f"""
WITH b0 AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
), cents0 AS (
  SELECT CAST(vec_id / {SIM.IVF_CENTROID_STRIDE} AS INT) AS cell, q AS qc
  FROM b0 WHERE vec_id IN ({_IVF_IDS})
), asg0 AS ({_ivf_assign_sql("cents0")}
), cents1 AS ({_ivf_mean_sql("asg0")}
), asg1 AS ({_ivf_assign_sql("cents1")}
), cents2 AS ({_ivf_mean_sql("asg1")}
), assigned AS ({_ivf_assign_sql("cents2")}
), probes AS (
  SELECT query_id, qa, cell FROM (
    SELECT a.vec_id AS query_id, a.q AS qa, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {_SQDIST_SQL.format(a="a.q", b="qc")}, c.cell
           ) AS rk
    FROM assigned a CROSS JOIN cents2 c WHERE a.vec_id IN (0, 1, 2)
  ) WHERE rk <= {SIM.IVF_NPROBE}
), scored AS (
  SELECT query_id, cand_id, {_COSINE_SQL} AS cosine
  FROM (SELECT vec_id AS cand_id, q AS qb, cell FROM assigned) cv
  JOIN probes USING (cell)
  WHERE cand_id <> query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
)(
    lambda spark, sf: SIM.ivf_topk(
        load_tables(spark, sf)["embeddings"],
        centroids=SIM.ivf_kmeans_centroids(load_tables(spark, sf)["embeddings"]),
    )
)

# ---------------------------------------------------------------------------
# r5: dd8 — semantic dedup (SemDeDup, Abbas et al. 2023): k-means-cluster
# the embeddings (the sim4 learned centroids, unrolled identically in the
# oracle), then label a vector a duplicate when an earlier same-cell vector
# sits within the cosine threshold.  Pair work happens only inside a cell —
# the clustering is what makes embedding dedup tractable at 10^12 vectors —
# and the rep cap bounds per-cell cost to O(m·R) (dedup.MAX_CELL_REPS).
# ---------------------------------------------------------------------------

_q(
    "dd8_semantic_dedup",
    f"""
WITH b0 AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
), cents0 AS (
  SELECT CAST(vec_id / {SIM.IVF_CENTROID_STRIDE} AS INT) AS cell, q AS qc
  FROM b0 WHERE vec_id IN ({_IVF_IDS})
), asg0 AS ({_ivf_assign_sql("cents0")}
), cents1 AS ({_ivf_mean_sql("asg0")}
), asg1 AS ({_ivf_assign_sql("cents1")}
), cents2 AS ({_ivf_mean_sql("asg1")}
), assigned AS ({_ivf_assign_sql("cents2")}
), reps AS (
  SELECT cell, vec_id AS rep_id, q AS qa FROM (
    SELECT cell, vec_id, q,
           row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
    FROM assigned
  ) WHERE rk <= {DD.MAX_CELL_REPS}
), pairs AS (
  SELECT b.vec_id, b.cell, r.rep_id, r.qa, b.q AS qb
  FROM assigned b JOIN reps r ON b.cell = r.cell AND r.rep_id < b.vec_id
)
SELECT vec_id, cell, min(rep_id) AS dup_of
FROM pairs WHERE {_COSINE_SQL} >= {DD.SEMANTIC_DUP_THRESHOLD}
GROUP BY vec_id, cell
""",
)(lambda spark, sf: DD.semantic_dedup(load_tables(spark, sf)["embeddings"]))

_q(
    "ts1_token_count",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
""",
)(lambda spark, sf: TS.token_count(load_tables(spark, sf)["documents"]))

_STOP_IN = ", ".join(f"'{s}'" for s in TS.STOPWORDS)

_q(
    "ts2_quality_score",
    f"""
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_filter(words, w -> w IN ({_STOP_IN}))) AS BIGINT) AS n_stopwords,
       round(CAST(len(list_filter(words, w -> w IN ({_STOP_IN}))) AS BIGINT)
             / greatest(CAST(len(words) AS BIGINT), 1), 6) AS stopword_ratio,
       round(CAST(length(text) AS BIGINT) / greatest(CAST(len(words) AS BIGINT), 1), 6)
         AS chars_per_word
FROM (SELECT doc_id, text, regexp_extract_all(text, '[a-zA-Z0-9]+') AS words FROM documents)
""",
)(lambda spark, sf: TS.quality_score(load_tables(spark, sf)["documents"]))

_LANG_SCORES = ", ".join(
    "len(list_filter(words, w -> w IN ({}))) AS score_{}".format(
        ", ".join(f"'{m}'" for m in markers), lang
    )
    for lang, markers in sorted(TS.LANG_MARKERS.items())
)
_LANG_BEST = "greatest({})".format(", ".join(f"score_{lang}" for lang in sorted(TS.LANG_MARKERS)))
_LANG_PRED = "CASE " + " ".join(
    f"WHEN score_{lang} = {_LANG_BEST} THEN '{lang}'" for lang in sorted(TS.LANG_MARKERS)
) + " END"

_q(
    "ts3_language_id",
    f"""
SELECT doc_id, lang AS actual_lang, {_LANG_PRED} AS predicted_lang
FROM (SELECT doc_id, lang, {_LANG_SCORES}
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents))
""",
)(lambda spark, sf: TS.language_id(load_tables(spark, sf)["documents"]))

_q(
    "ts4_fingerprint",
    r"""
SELECT doc_id, substring(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 16) AS fingerprint
FROM documents
""",
)(lambda spark, sf: TS.fingerprint(load_tables(spark, sf)["documents"]))

# ---------------------------------------------------------------------------
# flagship pipeline over the tokenized-sequence table (north rule):
# parse (pandas UDF) → enrich → route → aggregate, oracle recomputes the
# generator + scan-parse arithmetically in DuckDB.
# ---------------------------------------------------------------------------

_SEV_CASE = (
    "CASE list_filter(tokens, t -> t >= 10 AND t < 15)[1] "
    "WHEN 10 THEN 'debug' WHEN 11 THEN 'info' WHEN 12 THEN 'warn' "
    "WHEN 13 THEN 'error' WHEN 14 THEN 'fatal' END"
)
_RES_SQL = "'svc-' || CAST(list_filter(tokens, t -> t >= 100 AND t < 120)[1] - 100 AS STRING)"
_SCOPE_SQL = "'scope-' || CAST(list_filter(tokens, t -> t >= 200 AND t < 208)[1] - 200 AS STRING)"


def _pipeline_parsed(spark: SparkSession, sf: str):
    from .plans.pipeline import parse_stage

    return parse_stage(sequences(spark, rows_for_sf(sf)), use_udf=True)


_q(
    "pl1_parse_route_aggregate",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + f"""
SELECT source, {_SEV_CASE} AS severity,
       CAST(count(*) AS BIGINT) AS seq_count,
       CAST(SUM(n_tok) AS BIGINT) AS tok_count
FROM sequences GROUP BY 1, 2
""",
)(
    lambda spark, sf: _pipeline_parsed(spark, sf)
    .groupBy("source", "severity")
    .agg(
        F.count(F.lit(1)).alias("seq_count"),
        F.sum("n_tok").cast("bigint").alias("tok_count"),
    )
)

_q(
    "pl2_enrich_rollup",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + ", "
    + duckdb_enrich_dim_cte().strip()
    + f"""
, parsed AS (SELECT *, {_RES_SQL} AS resource FROM sequences)
SELECT team, tier, CAST(count(*) AS BIGINT) AS seq_count
FROM parsed LEFT JOIN enrich_dim USING (resource)
GROUP BY team, tier
""",
)(
    lambda spark, sf: _pipeline_parsed(spark, sf)
    .join(F.broadcast(enrich_dim(spark)), "resource", "left")
    .groupBy("team", "tier")
    .agg(F.count(F.lit(1)).alias("seq_count"))
)

_q(
    "pl3_trace_ids",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + f"""
, parsed AS (SELECT *, {_SCOPE_SQL} AS scope FROM sequences)
SELECT doc_id,
       substring(sha256(doc_id || '|' || source), 1, 32) AS trace_id,
       substring(sha256(doc_id || '|' || scope), 17, 16) AS span_id
FROM parsed
WHERE scope IN ('scope-0', 'scope-1', 'scope-2') AND source <> 'webhook'
""",
)(
    lambda spark, sf: (
        lambda parsed: parsed.filter(
            F.col("scope").isin("scope-0", "scope-1", "scope-2") & (F.col("source") != "webhook")
        ).select(
            "doc_id",
            F.substring(F.sha2(F.concat_ws("|", "doc_id", "source"), 256), 1, 32).alias("trace_id"),
            F.substring(F.sha2(F.concat_ws("|", "doc_id", "scope"), 256), 17, 16).alias("span_id"),
        )
    )(_pipeline_parsed(spark, sf))
)

_q(
    "pl4_logs_route_token_equality",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + f"""
, parsed AS (SELECT *, {_SEV_CASE} AS severity FROM sequences)
SELECT doc_id, severity, n_tok, CAST(list_sum(tokens) AS BIGINT) AS token_sum
FROM parsed WHERE severity IN ('warn', 'error', 'fatal')
""",
)(
    lambda spark, sf: _pipeline_parsed(spark, sf)
    .filter(F.col("severity").isin("warn", "error", "fatal"))
    .select(
        "doc_id",
        "severity",
        "n_tok",
        F.expr(
            "aggregate(tokens, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("token_sum"),
    )
)

# ---------------------------------------------------------------------------
# coverage round 2: source-scan semantics, top-1 windows, unions, filters
# ---------------------------------------------------------------------------

# S1/S2 — repo search scan: archived:false filter + per-org totalCount
# (githubscraper/helpers.go:29-78)
_q(
    "s1_repo_search_scan",
    with_ctes(
        "repos",
        body="SELECT org, CAST(count(*) AS BIGINT) AS total_count "
        "FROM repos WHERE NOT archived GROUP BY org",
    ),
)(
    lambda spark, sf: _view(spark, sf, "repos")
    .filter(~F.col("archived"))
    .groupBy("org")
    .agg(F.count(F.lit(1)).alias("total_count"))
)

# S16 — ADO oldest divergent commit: showOldestCommitsFirst=true&$top=1
# (azuredevopsscraper/helpers.go:291-324) = row_number asc over full ordering
_q(
    "s16_oldest_divergent_commit",
    with_ctes(
        "commits",
        body="""
SELECT repo_name, branch_name, CAST(floor(epoch(committed_date)) AS BIGINT) AS committed_epoch,
       additions
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY repo_name, branch_name
    ORDER BY committed_date, additions, deletions, author_id
  ) AS rn
  FROM commits
) WHERE rn = 1
""",
    ),
)(
    lambda spark, sf: W.first_event(
        _view(spark, sf, "commits"),
        part_cols=("repo_name", "branch_name"),
        order_cols=("committed_date", "additions", "deletions", "author_id"),
    ).select(
        "repo_name",
        "branch_name",
        F.unix_timestamp("committed_date").cast("bigint").alias("committed_epoch"),
        "additions",
    )
)

# W3/S17 — latest completed deployment per service ($top=1 newest,
# helpers.go:351-390; deployments last:1 genqlient.graphql:185-194)
_q(
    "w3_latest_deployment_per_service",
    with_ctes(
        "deployments",
        body=_DEPLOY_FINAL_SQL
        + """
SELECT service, deployment_id, CAST(floor(epoch(completed_ts)) AS BIGINT) AS completed_epoch
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY service ORDER BY completed_ts DESC, deployment_id DESC
  ) AS rn
  FROM gated WHERE completed_ts IS NOT NULL
) WHERE rn = 1
""",
    ),
)(
    lambda spark, sf: (
        lambda d: W.first_event(
            _final_deployments(d).filter(F.col("completed_ts").isNotNull()),
            part_cols=("service",),
            order_cols=("completed_ts", "deployment_id"),
            desc=True,
        ).select(
            "service",
            "deployment_id",
            F.unix_timestamp("completed_ts").cast("bigint").alias("completed_epoch"),
        )
    )(_view(spark, sf, "deployments"))
)

# U1 — dependabot ∪ code-scanning union before the severity rollup
# (helpers.go:414-424), kept as an observable two-leg union
_q(
    "u1_union_cve_sources",
    with_ctes(
        "cve_alerts",
        body="""
SELECT alert_source, CAST(count(*) AS BIGINT) AS alert_count FROM (
  SELECT * FROM cve_alerts WHERE alert_source = 'dependabot' AND state = 'open'
  UNION ALL
  SELECT * FROM cve_alerts WHERE alert_source = 'code_scanning' AND state = 'open'
)
GROUP BY alert_source
""",
    ),
)(
    lambda spark, sf: (
        lambda a: U.union_cves(
            a.filter((F.col("alert_source") == "dependabot") & (F.col("state") == "open")),
            a.filter((F.col("alert_source") == "code_scanning") & (F.col("state") == "open")),
        )
        .groupBy("alert_source")
        .agg(F.count(F.lit(1)).alias("alert_count"))
    )(_view(spark, sf, "cve_alerts"))
)

# F10 — repo-name substring filter (client-side strings.Contains,
# azuredevopsscraper/helpers.go:176-186)
_q(
    "f10_repo_substring_filter",
    with_ctes(
        "repos",
        body="SELECT org, CAST(count(*) AS BIGINT) AS match_count "
        "FROM repos WHERE contains(repo_name, '000000001') GROUP BY org",
    ),
)(
    lambda spark, sf: _view(spark, sf, "repos")
    .filter(F.col("repo_name").contains("000000001"))
    .groupBy("org")
    .agg(F.count(F.lit(1)).alias("match_count"))
)

# dedup #5 — embedding-cosine near-dup pairs within sign-LSH buckets
# (the ANN-bucketed variant of dd2 for dense vectors)
_q(
    "dd5_embedding_near_dups",
    f"""
WITH b0 AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
), b AS (
  SELECT vec_id, q, CAST({_BUCKET_SQL} AS INT) AS bucket FROM b0
), pairs AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.q AS qa, c.q AS qb
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT vec_a, vec_b, {_COSINE_SQL} AS cosine
FROM pairs
WHERE {_COSINE_SQL} >= 0.18
""",
)(
    lambda spark, sf: (
        lambda b: (
            lambda pairs: pairs.select(
                "vec_a",
                "vec_b",
                F.round(
                    SIM.dot_product("qa", "qb")
                    / F.sqrt(SIM.norm_sq("qa") * SIM.norm_sq("qb")),
                    6,
                ).alias("cosine"),
            ).filter(F.col("cosine") >= 0.18)
        )(
            b.alias("a")
            .join(
                b.alias("c"),
                (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("c.vec_id").alias("vec_b"),
                F.col("a.q").alias("qa"),
                F.col("c.q").alias("qb"),
            )
        )
    )(
        signlsh_buckets(
            _quantized(load_tables(spark, sf)["embeddings"])
        ).select("vec_id", "q", "bucket")
    )
)

# X19 — labels lowercased into an array attribute (model.go:255-262);
# output joined to string so both engines hash identically
_q(
    "x19_labels_lowercase",
    with_ctes(
        "pull_requests",
        body="""
SELECT pr_id,
       array_to_string(
         list_transform(['Bug', 'URGENT-' || pr_id, 'CI'], l -> lower(l)), ','
       ) AS labels_lc
FROM pull_requests
""",
    ),
)(
    lambda spark, sf: _view(spark, sf, "pull_requests").select(
        "pr_id",
        F.array_join(
            F.transform(
                F.array(F.lit("Bug"), F.concat(F.lit("URGENT-"), F.col("pr_id")), F.lit("CI")),
                lambda l: F.lower(l),
            ),
            ",",
        ).alias("labels_lc"),
    )
)

# X20 — referenced workflows -> indexed attribute keys
# github.reference.workflow.{i}.name (model.go:213-222) via posexplode
_q(
    "x20_indexed_workflow_attrs",
    with_ctes(
        "pull_requests",
        body="""
SELECT pr_id, s.k AS attr_key, s.v AS attr_value
FROM (
  SELECT pr_id,
         unnest(list_transform(range(0, 2), i -> {
           'k': 'github.reference.workflow.' || CAST(i AS STRING) || '.name',
           'v': 'wf-' || pr_id || '-' || CAST(i AS STRING)
         })) AS s
  FROM pull_requests
)
""",
    ),
)(
    lambda spark, sf: _view(spark, sf, "pull_requests")
    .select(
        "pr_id",
        F.posexplode(
            F.array(
                *[F.concat(F.lit("wf-"), F.col("pr_id"), F.lit(f"-{i}")) for i in range(2)]
            )
        ).alias("pos", "attr_value"),
    )
    .select(
        "pr_id",
        F.concat(F.lit("github.reference.workflow."), F.col("pos").cast("string"), F.lit(".name")).alias(
            "attr_key"
        ),
        "attr_value",
    )
)

# A20 — gitlab.catalog.resource.star_count / usage_count scalar passthrough
# (gitlab_catalog_scraper.go:188-197): projection from a dim, range-generated
_q(
    "a20_catalog_resource_stats",
    """
SELECT 'catalog/res-' || CAST(r AS STRING) AS resource_path,
       CAST(r % 50 AS BIGINT) AS star_count,
       CAST(r % 30 AS BIGINT) AS usage_count
FROM range(0, 100) t(r)
""",
)(
    lambda spark, sf: spark.range(100).selectExpr(
        "concat('catalog/res-', id) AS resource_path",
        "CAST(id % 50 AS BIGINT) AS star_count",
        "CAST(id % 30 AS BIGINT) AS usage_count",
    )
)

# A23 — vcs.terraform.module.consumer: one value=1 row per
# (module, system, consumer project) (gitlab_terraform_scraper.go:153-157)
_q(
    "a23_terraform_consumer_rows",
    with_ctes(
        "ci_lines",
        body=r"""
SELECT split_part(src, '/', 3) AS module,
       regexp_extract(src, '([^/]+)$', 1) AS system,
       project_path,
       CAST(1 AS BIGINT) AS value
FROM (
  SELECT DISTINCT project_path, regexp_extract(line, 'source\s*=\s*"([^"]+)"', 1) AS src
  FROM ci_lines
) WHERE src <> ''
""",
    ),
)(
    lambda spark, sf: _view(spark, sf, "ci_lines")
    .select("project_path", F.regexp_extract("line", r'source\s*=\s*"([^"]+)"', 1).alias("src"))
    .filter(F.col("src") != "")
    .distinct()
    .select(
        F.substring_index(F.substring_index("src", "/", 3), "/", -1).alias("module"),
        F.regexp_extract("src", "([^/]+)$", 1).alias("system"),
        "project_path",
        F.lit(1).cast("bigint").alias("value"),
    )
)

# ---------------------------------------------------------------------------
# connector analogs (config/manifest.yaml:66-68 — countconnector +
# spanmetricsconnector over the routed traces; plans/connectors.py)
# ---------------------------------------------------------------------------

from .plans import connectors as CN

_SPANS_FROM_EVENTS_SQL = """
spans AS (
  SELECT 'svc-' || CAST(user_id % 5 AS VARCHAR) AS service_name,
         event_type AS span_name,
         CASE WHEN event_type = 'error' THEN 2 ELSE 1 END AS status_code,
         CAST(floor(value * 100) AS BIGINT) AS duration_ms
  FROM events
)
"""

_q(
    "cn1_span_count",
    "WITH "
    + _SPANS_FROM_EVENTS_SQL.strip()
    + """
SELECT service_name, span_name, CAST(count(*) AS BIGINT) AS span_count
FROM spans GROUP BY 1, 2
""",
)(
    lambda spark, sf: CN.count_connector(
        CN.spans_from_events(load_tables(spark, sf)["events"])
    )
)

_LE_SQL = ", ".join(
    f"CAST(sum(CASE WHEN duration_ms <= {b} THEN 1 ELSE 0 END) AS BIGINT) AS le_{b}"
    for b in CN.DEFAULT_BOUNDS_MS
)

_q(
    "cn2_spanmetrics",
    "WITH "
    + _SPANS_FROM_EVENTS_SQL.strip()
    + f"""
SELECT service_name, span_name, status_code,
       CAST(count(*) AS BIGINT) AS calls,
       CAST(sum(duration_ms) AS BIGINT) AS duration_sum_ms,
       {_LE_SQL}
FROM spans GROUP BY 1, 2, 3
""",
)(
    lambda spark, sf: CN.spanmetrics_connector(
        CN.spans_from_events(load_tables(spark, sf)["events"])
    )
)

# ---------------------------------------------------------------------------
# pl5 — the composed training-data CURATION pipeline (brief: dedup + quality
# + language-ID as first-class components): exact-dedup survivors → quality
# gate (n_words >= 5, stopword_ratio <= 0.5) → language-ID → per-language
# corpus stats.  All ratios are single divisions over exact BIGINT sums so
# both engines hash identically.
# ---------------------------------------------------------------------------

_q(
    "pl5_curation_pipeline",
    f"""
WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
survivors AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
qual AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words,
         CAST(len(list_filter(regexp_extract_all(text, '[a-zA-Z0-9]+'),
                              w -> w IN ({_STOP_IN}))) AS BIGINT) AS n_stopwords
  FROM survivors
),
langp AS (
  SELECT doc_id, {_LANG_PRED} AS predicted_lang
  FROM (SELECT doc_id, {_LANG_SCORES}
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM survivors))
)
SELECT predicted_lang,
       CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_stopwords) AS BIGINT) AS total_stopwords,
       round(CAST(sum(n_stopwords) AS BIGINT) / greatest(CAST(sum(n_words) AS BIGINT), 1), 6) AS stop_ratio
FROM qual JOIN langp USING (doc_id)
WHERE n_words >= 5 AND round(n_stopwords / greatest(n_words, 1), 6) <= 0.5
GROUP BY 1
""",
)(
    lambda spark, sf: (
        lambda docs: (
            lambda survivors: (
                TS.quality_score(survivors)
                .filter((F.col("n_words") >= 5) & (F.col("stopword_ratio") <= 0.5))
                .join(TS.language_id(survivors).select("doc_id", "predicted_lang"), "doc_id")
                .groupBy("predicted_lang")
                .agg(
                    F.count(F.lit(1)).alias("kept_docs"),
                    F.sum("n_words").cast("bigint").alias("total_words"),
                    F.sum("n_stopwords").cast("bigint").alias("total_stopwords"),
                )
                .withColumn(
                    "stop_ratio",
                    F.round(
                        F.col("total_stopwords") / F.greatest(F.col("total_words"), F.lit(1)), 6
                    ),
                )
            )
        )(
            docs.join(
                DD.exact_dedup(docs).select(F.col("keep_id").alias("doc_id")), "doc_id"
            )
        )
        # widened: the quality/language regex passes run on the survivors
        # join output, whose streamed side is otherwise the unsplittable scan
    )(_wide(load_tables(spark, sf)["documents"]))
)

# ---------------------------------------------------------------------------
# s27/s26 driver rows — the webhook receivers as oracle-checked queries:
# synthesize raw JSON payloads FROM the events table (to_json), push them
# through the real from_json -> span-expansion plans, and let DuckDB
# recompute the expected span set arithmetically from the same base columns
# (the invariant under test: payload round-trip + id scheme + status rules).
# ---------------------------------------------------------------------------

from .plans.actions_traces import actions_job_spans
from .plans.ado_traces import ado_trace_pipeline


def _actions_raw(events: DataFrame) -> DataFrame:
    # deterministic subset (LIMIT without ORDER is scan-order-dependent)
    e = events.filter(F.col("event_id") < 2000)
    run_id = F.col("event_id")
    att = (F.col("event_id") % 3 + 1).cast("int")
    job = F.concat(F.lit("job-"), (F.col("event_id") % 7).cast("string"))
    # every 5th event duplicates the step name -> exercises the dup-id rule
    s2_name = F.when(F.col("event_id") % 5 == 0, F.lit("Set up")).otherwise(F.lit("Run build"))
    concl = F.when(F.col("event_id") % 4 == 0, "failure").otherwise("success")
    step = lambda name, num, concl_s: F.struct(  # noqa: E731
        name.alias("name"),
        F.lit("completed").alias("status"),
        concl_s.alias("conclusion"),
        F.lit(num).cast("int").alias("number"),
        F.col("ts").alias("started_at"),
        F.expr("ts + INTERVAL 1 MINUTE").alias("completed_at"),
    )
    payload = F.to_json(
        F.struct(
            F.lit("completed").alias("action"),
            F.struct(
                run_id.alias("id"),
                run_id.alias("run_id"),
                att.alias("run_attempt"),
                F.lit("wf").alias("workflow_name"),
                F.lit("main").alias("head_branch"),
                F.lit("completed").alias("status"),
                concl.alias("conclusion"),
                job.alias("name"),
                F.col("ts").alias("started_at"),
                F.expr("ts + INTERVAL 2 MINUTE").alias("completed_at"),
                F.array(
                    step(F.lit("Set up"), 1, F.lit("success")),
                    step(s2_name, 2, concl),
                ).alias("steps"),
            ).alias("workflow_job"),
            F.struct(
                F.concat(F.lit("repo_"), (F.col("user_id") % 9).cast("string")).alias("name")
            ).alias("repository"),
            F.struct(F.lit("sender").alias("login")).alias("sender"),
        )
    )
    return e.select(payload.alias("payload"))


_q(
    "s27_actions_job_spans",
    """
WITH e AS (SELECT * FROM events WHERE event_id < 2000),
base AS (
  SELECT event_id AS run_id,
         CAST(event_id % 3 + 1 AS INT) AS att,
         'job-' || CAST(event_id % 7 AS STRING) AS job,
         CASE WHEN event_id % 5 = 0 THEN 'Set up' ELSE 'Run build' END AS s2_name,
         CASE WHEN event_id % 4 = 0 THEN 'failure' ELSE 'success' END AS concl,
         ts
  FROM e
),
parent AS (
  SELECT substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || 't'), 1, 32) AS trace_id,
         substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job), 17, 16) AS span_id,
         substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || 's'), 17, 16) AS parent_span_id,
         job AS name,
         -- parent status: any step failure -> 2; all completed+success -> 1
         CASE WHEN concl = 'failure' THEN 2 ELSE 1 END AS status_code,
         concl AS status_message,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 1 MINUTE)) AS BIGINT) AS end_epoch
  FROM base
),
step1 AS (
  SELECT substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || 't'), 1, 32) AS trace_id,
         CASE WHEN s2_name = 'Set up'
              THEN substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job || 'Set up' || '1'), 17, 16)
              ELSE substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job || 'Set up'), 17, 16)
         END AS span_id,
         substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job), 17, 16) AS parent_span_id,
         'Set up' AS name,
         1 AS status_code,
         'success' AS status_message,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 1 MINUTE)) AS BIGINT) AS end_epoch
  FROM base
),
step2 AS (
  SELECT substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || 't'), 1, 32) AS trace_id,
         CASE WHEN s2_name = 'Set up'
              THEN substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job || 'Set up' || '2'), 17, 16)
              ELSE substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job || 'Run build'), 17, 16)
         END AS span_id,
         substring(sha256(CAST(run_id AS STRING) || CAST(att AS STRING) || job), 17, 16) AS parent_span_id,
         s2_name AS name,
         CASE WHEN concl = 'failure' THEN 2 ELSE 1 END AS status_code,
         concl AS status_message,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 1 MINUTE)) AS BIGINT) AS end_epoch
  FROM base
)
SELECT * FROM parent UNION ALL SELECT * FROM step1 UNION ALL SELECT * FROM step2
""",
)(
    lambda spark, sf: actions_job_spans(
        _actions_raw(load_tables(spark, sf)["events"])
    ).select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "name",
        "status_code",
        "status_message",
        F.unix_timestamp("start_ts").cast("bigint").alias("start_epoch"),
        F.unix_timestamp("end_ts").cast("bigint").alias("end_epoch"),
    )
)


def _ado_raw(events: DataFrame, run_result: Column | None = None) -> DataFrame:
    """ADO webhook payload synth for s26/cm3.  ``run_result`` overrides the
    run's result field (cm3's status-remap statement needs both branches
    live); everything else is shared so the span-id oracle derivations stay
    single-sourced."""
    e = events.filter(F.col("event_id") < 3000)
    pid = (F.col("event_id") % 13).cast("string")
    pipe = F.struct(
        (F.col("event_id") % 13).cast("long").alias("id"),
        F.concat(F.lit("pipe-"), pid).alias("name"),
    )
    run = F.struct(
        F.col("event_id").cast("long").alias("id"),
        F.lit("completed").alias("state"),
        (run_result if run_result is not None else F.lit("succeeded")).alias("result"),
        F.col("ts").alias("createdDate"),
        F.expr("ts + INTERVAL 5 MINUTE").alias("finishedDate"),
        F.concat(F.lit("https://dev.azure.com/org/proj/_apis/pipelines/"), pid).alias("url"),
        pipe.alias("pipeline"),
    )
    stage = F.struct(
        F.concat(F.lit("st-"), F.col("event_id").cast("string")).alias("id"),
        F.concat(F.lit("Deploy"), (F.col("event_id") % 4).cast("string")).alias("name"),
        F.lit("Deployment").alias("displayName"),
        F.lit(1).cast("long").alias("attempt"),
        F.lit("completed").alias("state"),
        F.lit("succeeded").alias("result"),
        F.col("ts").alias("startTime"),
        F.expr("ts + INTERVAL 2 MINUTE").alias("finishTime"),
    )
    job = F.struct(
        F.concat(F.lit("jb-"), F.col("event_id").cast("string")).alias("id"),
        F.concat(F.lit("J"), (F.col("event_id") % 6).cast("string")).alias("name"),
        (F.col("event_id") % 2 + 1).cast("long").alias("attempt"),
        F.lit("completed").alias("state"),
        F.lit("succeeded").alias("result"),
        F.col("ts").alias("startTime"),
        F.expr("ts + INTERVAL 1 MINUTE").alias("finishTime"),
    )
    from .plans.ado_traces import EVENT_JOB, EVENT_RUN, EVENT_STAGE

    etype = (
        F.when(F.col("event_id") % 3 == 0, F.lit(EVENT_RUN))
        .when(F.col("event_id") % 3 == 1, F.lit(EVENT_STAGE))
        .otherwise(F.lit(EVENT_JOB))
    )
    payload = F.to_json(
        F.struct(
            etype.alias("eventType"),
            F.struct(
                F.lit("proj-guid").alias("projectId"),
                F.col("event_id").cast("long").alias("runId"),
                run.alias("run"),
                pipe.alias("pipeline"),
                stage.alias("stage"),
                job.alias("job"),
            ).alias("resource"),
            F.struct(
                F.struct(F.lit("proj-guid").alias("id")).alias("project")
            ).alias("resourceContainers"),
        )
    )
    return e.select(payload.alias("body_raw"))


_q(
    "s26_ado_spans",
    """
WITH e AS (SELECT * FROM events WHERE event_id < 3000),
base AS (
  SELECT event_id, ts,
         CAST(event_id % 13 AS STRING) AS pid,
         'pipe-' || CAST(event_id % 13 AS STRING) AS pname,
         'Deploy' || CAST(event_id % 4 AS STRING) AS sname,
         'J' || CAST(event_id % 6 AS STRING) AS jname,
         CAST(event_id % 2 + 1 AS STRING) AS att,
         substring(sha256(CAST(event_id AS STRING) || 't'), 1, 32) AS trace_id
  FROM e
),
runs AS (
  SELECT trace_id,
         substring(sha256('pipeline_' || pid), 17, 16) AS span_id,
         '' AS parent_span_id,
         'Pipeline Run: ' || pname AS name,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 5 MINUTE)) AS BIGINT) AS end_epoch
  FROM base WHERE event_id % 3 = 0
),
stages AS (
  SELECT trace_id,
         substring(sha256('stage_st-' || CAST(event_id AS STRING)), 17, 16) AS span_id,
         substring(sha256('pipeline_' || pid), 17, 16) AS parent_span_id,
         'Pipeline Stage: ' || sname AS name,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 2 MINUTE)) AS BIGINT) AS end_epoch
  FROM base WHERE event_id % 3 = 1
),
jobs AS (
  SELECT trace_id,
         substring(sha256(CAST(event_id AS STRING) || att || jname), 17, 16) AS span_id,
         substring(sha256('stage_st-' || CAST(event_id AS STRING)), 17, 16) AS parent_span_id,
         'Pipeline Job: ' || jname AS name,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(ts + INTERVAL 1 MINUTE)) AS BIGINT) AS end_epoch
  FROM base WHERE event_id % 3 = 2
)
SELECT * FROM runs UNION ALL SELECT * FROM stages UNION ALL SELECT * FROM jobs
""",
)(
    lambda spark, sf: ado_trace_pipeline(
        _ado_raw(load_tables(spark, sf)["events"])
    ).select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "name",
        F.unix_timestamp("start_ts").cast("bigint").alias("start_epoch"),
        F.unix_timestamp("end_ts").cast("bigint").alias("end_epoch"),
    )
)

# ---------------------------------------------------------------------------
# a25 — the azuredevops scraper SNAPSHOT EMIT as a driver-checked query: the
# assembled long-format datapoint set (metric, value, one row per attr
# entry) over ADO-shaped inputs derived from the pull_requests view, with
# DuckDB recomputing every datapoint family incl. the structural
# emit-only-if-positive change.count rule.  (ref.time is exercised by the
# golden test, not here: branches get NULL initial_commit_ts.)
# ---------------------------------------------------------------------------

from .plans.vcs_metrics import ADO_DEFAULT_METRICS, azuredevops_scrape_metrics

_A25_NOW = "2026-01-01 00:00:00"


def _ado_snapshot(spark, sf):
    prs = _view(spark, sf, "pull_requests").select(
        "repo_name",
        F.col("repo_name").alias("repo_id"),
        F.lit("").alias("url"),
        "pr_id",
        F.when(F.col("state") == "MERGED", "completed").otherwise("active").alias("status"),
        F.col("created_at").cast("timestamp").alias("created_at"),
        F.col("merged_at").cast("timestamp").alias("closed_at"),
        F.concat(F.lit("br-"), (F.col("pr_id").cast("bigint") % 11).cast("string")).alias("source_ref"),
        "additions",
        "deletions",
    )
    repos = prs.select("repo_name", "repo_id", "url").distinct().withColumn(
        "default_branch", F.lit("main")
    )
    branches = (
        prs.select("repo_name", "repo_id", "url", F.col("source_ref").alias("branch_name"))
        .distinct()
        .withColumn("initial_commit_ts", F.lit(None).cast("timestamp"))
    )
    emit = azuredevops_scrape_metrics(
        repos, branches, prs, org="org", now=_A25_NOW, enabled=ADO_DEFAULT_METRICS
    )
    return emit.select(
        "metric_name",
        "value",
        F.explode_outer(F.map_entries("attrs")).alias("e"),
    ).select(
        "metric_name",
        "value",
        F.col("e.key").alias("attr_key"),
        F.col("e.value").alias("attr_value"),
    )


_A25_REPO_ATTRS = (
    "struct_pack(k := 'vcs.repository.name', v := repo_name), "
    "struct_pack(k := 'vcs.repository.id', v := repo_name), "
    "struct_pack(k := 'vcs.repository.url.full', v := '')"
)

_q(
    "a25_ado_snapshot_emit",
    with_ctes(
        "pull_requests",
        body=f"""
, pra AS (
  SELECT repo_name, pr_id,
         CASE WHEN state = 'MERGED' THEN 'completed' ELSE 'active' END AS status,
         created_at, merged_at AS closed_at,
         'br-' || CAST(CAST(pr_id AS BIGINT) % 11 AS STRING) AS source_ref,
         additions, deletions
  FROM pull_requests
),
repos_a AS (SELECT DISTINCT repo_name FROM pra),
branches_a AS (SELECT DISTINCT repo_name, source_ref FROM pra),
dp_repo_count AS (
  SELECT 'vcs.repository.count' AS metric_name, CAST(count(*) AS BIGINT) AS value,
         CAST(NULL AS VARCHAR) AS attr_key, CAST(NULL AS VARCHAR) AS attr_value
  FROM repos_a
),
dp_ref_count AS (
  SELECT 'vcs.ref.count' AS metric_name, n AS value, u.k AS attr_key, u.v AS attr_value
  FROM (SELECT repo_name, CAST(count(*) AS BIGINT) AS n FROM branches_a GROUP BY 1),
       unnest([struct_pack(k := 'vcs.ref.head.type', v := 'branch'), {_A25_REPO_ATTRS}]) AS t(u)
),
dp_change_count AS (
  SELECT 'vcs.change.count' AS metric_name, n AS value, u.k AS attr_key, u.v AS attr_value
  FROM (SELECT repo_name,
               CASE WHEN status = 'completed' THEN 'merged' ELSE 'open' END AS state,
               CAST(count(*) AS BIGINT) AS n
        FROM pra GROUP BY 1, 2),
       unnest([struct_pack(k := 'vcs.change.state', v := state), {_A25_REPO_ATTRS}]) AS t(u)
),
dp_duration AS (
  SELECT 'vcs.change.duration' AS metric_name,
         CAST(least(floor(epoch(TIMESTAMP '{_A25_NOW}')) - floor(epoch(created_at)), 9223372036) AS BIGINT) AS value,
         u.k AS attr_key, u.v AS attr_value
  FROM pra,
       unnest([struct_pack(k := 'vcs.change.state', v := 'open'),
               struct_pack(k := 'vcs.ref.head.name', v := source_ref), {_A25_REPO_ATTRS}]) AS t(u)
  WHERE status = 'active'
),
dp_ttm AS (
  SELECT 'vcs.change.time_to_merge' AS metric_name,
         CAST(least(floor(epoch(closed_at)) - floor(epoch(created_at)), 9223372036) AS BIGINT) AS value,
         u.k AS attr_key, u.v AS attr_value
  FROM pra,
       unnest([struct_pack(k := 'vcs.ref.head.name', v := source_ref), {_A25_REPO_ATTRS}]) AS t(u)
  WHERE status = 'completed' AND closed_at IS NOT NULL
),
dp_lines AS (
  SELECT 'vcs.ref.lines_delta' AS metric_name, lv.value, u.k AS attr_key, u.v AS attr_value
  FROM pra,
       unnest([struct_pack(lt := 'added', value := CAST(additions AS BIGINT)),
               struct_pack(lt := 'removed', value := CAST(deletions AS BIGINT))]) AS l(lv),
       unnest([struct_pack(k := 'vcs.line_change.type', v := lv.lt),
               struct_pack(k := 'vcs.ref.head.name', v := source_ref),
               struct_pack(k := 'vcs.ref.head.type', v := 'branch'), {_A25_REPO_ATTRS}]) AS t(u)
)
SELECT * FROM dp_repo_count UNION ALL SELECT * FROM dp_ref_count
UNION ALL SELECT * FROM dp_change_count UNION ALL SELECT * FROM dp_duration
UNION ALL SELECT * FROM dp_ttm UNION ALL SELECT * FROM dp_lines
""",
    ),
)(_ado_snapshot)

# ---------------------------------------------------------------------------
# ts5 — PII scrub (emails/URLs/IPv4 redaction + counts).  The synthetic docs
# carry no PII, so every 3rd doc gets a deterministic contaminated suffix on
# BOTH sides — the regex behavior is what's under test.
# ---------------------------------------------------------------------------

_PII_SUFFIX = " contact admin@example.com via https://ex.com/a?x=1 or 10.0.0.1"


def _ts5(spark, sf):
    docs = load_tables(spark, sf)["documents"].select(
        "doc_id",
        F.when(
            F.col("doc_id").cast("bigint") % 3 == 0,
            F.concat(F.col("text"), F.lit(_PII_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return TS.pii_scrub(docs).select(
        "doc_id", "n_urls", "n_emails", "n_ips", "scrubbed_len"
    )


_q(
    "ts5_pii_scrub",
    f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0
              THEN text || '{_PII_SUFFIX}' ELSE text END AS text
  FROM documents
),
s AS (
  SELECT doc_id, text,
         regexp_replace(text, '{TS.URL_RE}', '<URL>', 'g') AS t1
  FROM docs
),
s2 AS (
  SELECT doc_id, text, t1,
         regexp_replace(t1, '{TS.EMAIL_RE}', '<EMAIL>', 'g') AS t2
  FROM s
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{TS.URL_RE}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(t1, '{TS.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t2, '{TS.IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(length(regexp_replace(t2, '{TS.IPV4_RE}', '<IP>', 'g')) AS BIGINT) AS scrubbed_len
FROM s2
""",
)(_ts5)

# ---------------------------------------------------------------------------
# dd6 — benchmark-contamination scan: probes (4-word prefixes of every 7th
# doc) broadcast against the corpus; a hit = the probe appears as an exact
# substring of another document.
# ---------------------------------------------------------------------------

_q(
    "dd6_contamination_scan",
    """
WITH probes AS (
  SELECT doc_id AS probe_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ') AS probe
  FROM documents
  WHERE CAST(doc_id AS BIGINT) % 7 = 0 AND len(string_split(text, ' ')) >= 4
)
SELECT probe_id, doc_id
FROM documents, probes
WHERE doc_id <> probe_id AND strpos(text, probe) > 0
""",
)(
    lambda spark, sf: DD.contamination_scan(load_tables(spark, sf)["documents"])
)

# ---------------------------------------------------------------------------
# pl6 — sequence-table audit: length × source histogram with exact token
# checksums (the pre-training sanity pass that catches generator/tokenizer
# drift; one hash aggregate over the flagship table).
# ---------------------------------------------------------------------------

_q(
    "pl6_sequence_stats",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + """
SELECT source, n_tok,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(sum(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS token_sum
FROM sequences GROUP BY 1, 2
""",
)(
    lambda spark, sf: sequences(spark, rows_for_sf(sf))
    .select(
        "source",
        "n_tok",
        F.expr(
            "aggregate(tokens, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("row_sum"),
    )
    .groupBy("source", "n_tok")
    .agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("row_sum").cast("bigint").alias("token_sum"),
    )
)

# ---------------------------------------------------------------------------
# pr1/pr2 — sampling processor analogs (manifest.yaml:44-46) over spans
# derived from events; traces are per-user so tail sampling keeps/drops
# whole multi-span traces together.
# ---------------------------------------------------------------------------

from .plans.samplers import probabilistic_sample, tail_sample_errors


def _user_trace_spans(spark, sf):
    e = load_tables(spark, sf)["events"]
    return e.select(
        F.md5((F.col("user_id")).cast("string")).alias("trace_id"),
        F.substring(
            F.sha2(F.concat_ws("|", F.col("event_id"), F.col("event_type")), 256), 17, 16
        ).alias("span_id"),
        F.col("event_type").alias("span_name"),
        F.when(F.col("event_type") == "error", F.lit(2)).otherwise(F.lit(1)).alias("status_code"),
    )


_SPANS_BY_USER_SQL = """
spans AS (
  SELECT md5(CAST(user_id AS STRING)) AS trace_id,
         substring(sha256(CAST(event_id AS STRING) || '|' || event_type), 17, 16) AS span_id,
         event_type AS span_name,
         CASE WHEN event_type = 'error' THEN 2 ELSE 1 END AS status_code
  FROM events
)
"""

_q(
    "pr1_probabilistic_sampler",
    "WITH "
    + _SPANS_BY_USER_SQL.strip()
    + """
SELECT trace_id, span_id, span_name, status_code
FROM spans
WHERE CAST(from_hex_to_int AS BIGINT) % 10000 < 2500
""".replace(
        "from_hex_to_int", "('0x' || substring(md5(trace_id), 1, 8))::BIGINT"
    ),
)(lambda spark, sf: probabilistic_sample(_user_trace_spans(spark, sf)))

_q(
    "pr2_tail_sampler",
    "WITH "
    + _SPANS_BY_USER_SQL.strip()
    + """
SELECT s.trace_id, s.span_id, s.span_name, s.status_code
FROM spans s
WHERE s.trace_id IN (SELECT DISTINCT trace_id FROM spans WHERE status_code = 2)
""",
)(lambda spark, sf: tail_sample_errors(_user_trace_spans(spark, sf)))

# ---------------------------------------------------------------------------
# gb1/gt1/iv1 — grouping/compaction processor analogs
# (manifest.yaml:42,45-46: groupbyattrs, groupbytrace, interval)
# ---------------------------------------------------------------------------

from .plans.grouping import group_by_attrs, group_by_trace, interval_last


def _gb1(spark, sf):
    # Promote props.k (mod 10) from record scope to resource scope; 'view'
    # events deliberately lack the attribute to exercise the processor's
    # keep-original-resource fallback rule.
    e = load_tables(spark, sf)["events"]
    rec = e.withColumn(
        "k_attr",
        F.when(
            F.col("event_type") != "view",
            (F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint") % 10).cast(
                "string"
            ),
        ),
    )
    return group_by_attrs(rec, keys=["k_attr"], fallback_resource="event_type")


_q(
    "gb1_groupbyattrs",
    """
WITH rec AS (
  SELECT event_type,
         CASE WHEN event_type <> 'view'
              THEN CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS VARCHAR)
         END AS k_attr
  FROM events
)
SELECT k_attr,
       CASE WHEN k_attr IS NULL THEN event_type END AS fallback_event_type,
       CAST(count(*) AS BIGINT) AS record_count,
       CAST(count(DISTINCT event_type) AS BIGINT) AS merged_resource_count
FROM rec
GROUP BY 1, 2
""",
)(_gb1)

_q(
    "gt1_groupbytrace",
    "WITH "
    + _SPANS_BY_USER_SQL.strip()
    + """
SELECT trace_id,
       CAST(count(*) AS BIGINT) AS span_count,
       CAST(SUM(CASE WHEN status_code = 2 THEN 1 ELSE 0 END) AS BIGINT) AS error_span_count,
       CAST(count(DISTINCT span_name) AS BIGINT) AS span_name_count
FROM spans
GROUP BY trace_id
""",
)(lambda spark, sf: group_by_trace(_user_trace_spans(spark, sf)))

_q(
    "iv1_interval_last",
    """
SELECT user_id, event_type, interval_start, last_value_cents FROM (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 AS interval_start,
         CAST(floor(value * 100) AS BIGINT) AS last_value_cents,
         row_number() OVER (
           PARTITION BY user_id, event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) * 60
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
WHERE rn = 1
""",
)(
    lambda spark, sf: interval_last(
        load_tables(spark, sf)["events"],
        identity=("user_id", "event_type"),
        ts_col="ts",
        order_tiebreak="event_id",
        interval_sec=60,
    )
)

# ---------------------------------------------------------------------------
# gk1 — grok text-line parse (functions/grok.py): one compiled %{}-pattern
# drives BOTH engines — Spark regexp_extract columns and the DuckDB oracle
# use the identical anchored regex, so the extract itself is hash-checked.
# ---------------------------------------------------------------------------

from .functions.grok import grok_oracle_exprs, grok_parse

_GK1_EXPR = (
    "%{TIMESTAMP_ISO8601:log_ts} %{LOGLEVEL:level} %{NOTSPACE:service} "
    "event=%{WORD:etype} id=%{INT:eid}"
)


def _gk1(spark, sf):
    # single-row-group probe (guide §2.5 input skew / §6): the regex chain
    # below is expression-heavy and the events parquet cannot split — widen
    # the narrow source rows before the per-row work
    e = _wide(load_tables(spark, sf)["events"])
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(" "),
        F.when(F.col("event_type") == "error", "ERROR").otherwise("INFO"),
        F.lit(" "),
        F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string")),
        F.lit(" event="),
        F.col("event_type"),
        F.lit(" id="),
        F.col("event_id").cast("string"),
    )
    parsed = grok_parse(e.select(line.alias("line")), "line", _GK1_EXPR, keep=False)
    return parsed.groupBy("level", "service", "etype").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("eid").cast("bigint")).alias("max_id"),
    )


_GK1_X = grok_oracle_exprs(_GK1_EXPR, "line")

_q(
    "gk1_grok_parse",
    f"""
WITH lines AS (
  SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' ' ||
         CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END ||
         ' svc-' || CAST(user_id % 5 AS STRING) ||
         ' event=' || event_type || ' id=' || CAST(event_id AS STRING) AS line
  FROM events
)
, parsed AS (
  SELECT {_GK1_X['level']} AS level, {_GK1_X['service']} AS service,
         {_GK1_X['etype']} AS etype, {_GK1_X['eid']} AS eid
  FROM lines
)
SELECT level, service, etype, CAST(count(*) AS BIGINT) AS n,
       CAST(max(CAST(eid AS BIGINT)) AS BIGINT) AS max_id
FROM parsed GROUP BY 1, 2, 3
""",
)(_gk1)

# ---------------------------------------------------------------------------
# ts6 — repetition stats (Gopher-style duplicate k-gram fraction): the
# document-quality signal that catches self-repeating text.  Shuffle-free.
# ---------------------------------------------------------------------------

_q(
    "ts6_repetition_stats",
    """
WITH grams AS (
  SELECT doc_id,
         list_filter(list_transform(
           range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
           i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')
         ), g -> g <> '') AS gs
  FROM documents
)
SELECT doc_id,
       CAST(len(gs) AS BIGINT) AS ngram_count,
       CAST(len(list_distinct(gs)) AS BIGINT) AS distinct_ngrams,
       CASE WHEN len(gs) > 0
            THEN round(1 - len(list_distinct(gs)) / len(gs), 6)
            ELSE 0.0 END AS dup_fraction
FROM grams
""",
)(lambda spark, sf: TS.repetition_stats(load_tables(spark, sf)["documents"]))

# ---------------------------------------------------------------------------
# pl7 — token-bigram stats: the canonical pre-training n-gram analysis, and
# at 10^12 sequences the textbook heavy shuffle (explode fan-out ~56x, then
# groupBy with map-side combine; top-k per source via one window over the
# already-aggregated rows — never over the exploded stream).
# ---------------------------------------------------------------------------


def _pl7(spark, sf):
    from pyspark.sql import Window as _W

    seq = sequences(spark, rows_for_sf(sf))
    # Pack each bigram into ONE bigint key (t1 << 16 | t2 — exact: token
    # values are ints in [0, 50021) < 2^16) right after the explode, so the
    # groupBy/shuffle key is a single fixed-width long instead of two
    # struct fields (guide §2.3 "narrower types").  Measured A/B at 6M rows
    # (210M bigrams): 4.6 s → 4.0 s; building the packed array BEFORE the
    # explode via transform/zip_with HOFs was tried and is SLOWER (6.6 s)
    # — interpreted lambda evaluation per element loses to the slice+zip
    # array kernels.  The pack is monotonic in (t1, t2), so the row_number
    # tie order on the packed key is EXACTLY the old (n DESC, t1, t2)
    # order; unpacking after the ≤20-per-source filter restores identical
    # columns.
    n1 = F.size("tokens") - F.lit(1)
    bg = seq.select(
        "source",
        F.explode(
            F.arrays_zip(
                F.slice("tokens", F.lit(1), n1).alias("t1"),
                F.slice("tokens", F.lit(2), n1).alias("t2"),
            )
        ).alias("bg"),
    ).select(
        "source",
        (F.shiftleft(F.col("bg.t1").cast("bigint"), 16) + F.col("bg.t2")).alias("k"),
    )
    counts = bg.groupBy("source", "k").agg(F.count(F.lit(1)).alias("n"))
    w = _W.partitionBy("source").orderBy(F.col("n").desc(), "k")
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 20)
        .select(
            "source",
            F.shiftright("k", 16).cast("int").alias("t1"),
            (F.col("k") % 65536).cast("int").alias("t2"),
            "n",
        )
    )


_q(
    "pl7_token_bigrams",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + """
, bg AS (
  SELECT source, u.z[1] AS t1, u.z[2] AS t2
  FROM sequences,
       unnest(list_zip(tokens[1:length(tokens)-1], tokens[2:length(tokens)])) AS u(z)
)
SELECT source, t1, t2, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY 1, 2, 3
QUALIFY row_number() OVER (PARTITION BY source ORDER BY n DESC, t1, t2) <= 20
""",
)(_pl7)

# ---------------------------------------------------------------------------
# cm1 — config-driven assembly (confmap analog): the flagship metrics rollup
# DECLARED IN YAML (with ${env:} interpolation, the confmap expansion path)
# must produce the exact datapoints of the hand-written plan.  This gives the
# config surface itself a driver-graded row.
# ---------------------------------------------------------------------------

_CM1_YAML = """
receivers:
  sequences:
    n_rows: ${env:N_ROWS}
processors:
  parse_tokens: {}
  enrich: {}
  rollup/metrics:
    group_by: [source, severity, team]
exporters:
  debug: {}
service:
  pipelines:
    metrics:
      receivers: [sequences]
      processors: [parse_tokens, enrich, rollup/metrics]
      exporters: [debug]
"""


def _cm1(spark, sf):
    from .confmap import AssembleContext, assemble, load_config

    cfg = load_config(_CM1_YAML, env={"N_ROWS": str(rows_for_sf(sf))})
    df = assemble(spark, cfg, AssembleContext())["metrics"]
    return df.select(
        "source", "severity", "team", "seq_count",
        F.col("tok_count").cast("bigint").alias("tok_count"),
    )


_q(
    "cm1_config_pipeline",
    "WITH "
    + duckdb_sequences_cte(60000).strip()
    + ", "
    + duckdb_enrich_dim_cte().strip()
    + f"""
, parsed AS (SELECT *, {_SEV_CASE} AS severity, {_RES_SQL} AS resource FROM sequences)
SELECT source, severity, team,
       CAST(count(*) AS BIGINT) AS seq_count,
       CAST(SUM(n_tok) AS BIGINT) AS tok_count
FROM parsed LEFT JOIN enrich_dim USING (resource)
GROUP BY 1, 2, 3
""",
)(_cm1)


# ---------------------------------------------------------------------------
# r4: mm1 — multimodal feature extraction as a HARD driver row (VERDICT r3
# item 1: the last brief component with only soft pytest signal).  The
# deterministic fake-decode path (operators/multimodal.py — mapInPandas over
# Arrow batches, size-adaptive bincount kernel) is pure arithmetic over the
# payload bytes, so DuckDB restates it exactly: payload = repeat(16-hex-char
# sha prefix, k) and feature_j * n_bytes = count of bytes whose low nibble
# (byte & 15) == j = per-hex-char counts scaled by k.  Hex bytes only
# populate bins 0-9 ('0'-'9' -> 0-9, 'a'-'f' -> 1-6), so c0..c9 is the full
# non-zero feature surface; integer-exact on both engines.
# ---------------------------------------------------------------------------

from .operators.multimodal import fake_decode_features, synthetic_media

_MM1_N = 20000

# bin j <- hex chars whose ASCII low nibble is j
_MM1_BINS = {
    0: ["0"], 1: ["1", "a"], 2: ["2", "b"], 3: ["3", "c"], 4: ["4", "d"],
    5: ["5", "e"], 6: ["6", "f"], 7: ["7"], 8: ["8"], 9: ["9"],
}


def _mm1(spark, sf):
    feats = fake_decode_features(synthetic_media(spark, _MM1_N))
    cols = [
        F.round(F.element_at("features", j + 1) * F.col("n_bytes"))
        .cast("bigint")
        .alias(f"c{j}")
        for j in range(10)
    ]
    return feats.select("media_id", "kind", "n_bytes", *cols)


def _mm1_bin_sql(j: int) -> str:
    terms = " + ".join(
        f"(16 - length(replace(base, '{c}', '')))" for c in _MM1_BINS[j]
    )
    return f"CAST(k * ({terms}) AS BIGINT) AS c{j}"


_q(
    "mm1_multimodal_features",
    f"""
WITH m AS (
  SELECT id,
         CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         substring(sha256(CAST(id AS VARCHAR)), 1, 16) AS base,
         CAST(1 + id % 8 AS BIGINT) AS k
  FROM range({_MM1_N}) t(id)
)
SELECT CAST(id AS VARCHAR) AS media_id, kind, 16 * k AS n_bytes,
       {", ".join(_mm1_bin_sql(j) for j in range(10))}
FROM m
""",
)(_mm1)

# ---------------------------------------------------------------------------
# r5: mm2 — frame sampling as a HARD driver row (the brief's frame-sample
# leg; mm1 graded feature-extract).  operators/multimodal.frame_sample_plan
# explodes a deterministic frame-timestamp grid per video — the 100 TB shape
# for frame work is Catalyst sequence+explode of timestamps, with the actual
# codec behind the mapInPandas seam that mm1 already grades.  The stubbed
# per-frame "decode" here is a deterministic fingerprint (the code point of
# the payload byte the frame index selects), so DuckDB restates it exactly:
# payload = repeat(16-hex-char sha prefix, k) and both grids are inclusive
# 0..duration_ms-1 step EVERY.
# ---------------------------------------------------------------------------

_MM2_N = 3000
_MM2_EVERY = 750  # ms between sampled frames


def _mm2(spark, sf):
    from .operators.multimodal import frame_sample_plan

    media = synthetic_media(spark, _MM2_N)
    frames = frame_sample_plan(media, every_ms=_MM2_EVERY, carry=("payload",))
    frame_no = F.floor(F.col("frame_ts_ms") / _MM2_EVERY)
    pay = F.col("payload").cast("string")
    idx = (frame_no % F.length(pay)).cast("int")
    return frames.select(
        "media_id",
        F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"),
        F.ascii(F.substring(pay, idx + 1, F.lit(1))).cast("bigint").alias("frame_fp"),
    )


_q(
    "mm2_frame_sample",
    f"""
WITH m AS (
  SELECT id, CAST(1000 + id % 60000 AS BIGINT) AS duration_ms,
         repeat(substring(sha256(CAST(id AS VARCHAR)), 1, 16),
                CAST(1 + id % 8 AS INT)) AS payload
  FROM range({_MM2_N}) t(id) WHERE id % 3 = 2
), f AS (
  SELECT id, payload,
         unnest(generate_series(0, duration_ms - 1, {_MM2_EVERY})) AS frame_ts_ms
  FROM m
)
SELECT CAST(id AS VARCHAR) AS media_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
       CAST(ascii(substring(payload,
            CAST(1 + (frame_ts_ms // {_MM2_EVERY}) % length(payload) AS INT), 1))
            AS BIGINT) AS frame_fp
FROM f
""",
)(_mm2)

# ---------------------------------------------------------------------------
# r4: gk2 — COMBINEDAPACHELOG-class grok parse (VERDICT r3 item 7): the
# composite patterns real log pipelines hit first (HTTPDATE, QS, URIPATH,
# USER) plus the bare non-capturing %{NAME} form, over an Apache-style
# access-log corpus synthesized from events.  Same one-compiled-regex
# contract as gk1: Spark regexp_extract and the DuckDB oracle run the
# IDENTICAL anchored pattern.
# ---------------------------------------------------------------------------

_GK2_EXPR = (
    '%{IPV4:client} - %{USER:ident} [%{HTTPDATE:when}] '
    '"%{WORD:method} %{URIPATH:path} HTTP/1.1" %{INT:status} %{INT:bytes} '
    '%{QS:referrer} %{QS}'
)


def _gk2(spark, sf):
    # widen the unsplittable scan before the line build + 5-group grok regex
    e = _wide(load_tables(spark, sf)["events"])
    method = (
        F.when(F.col("event_id") % 4 == 0, "GET")
        .when(F.col("event_id") % 4 == 1, "POST")
        .when(F.col("event_id") % 4 == 2, "PUT")
        .otherwise("DELETE")
    )
    status = (
        F.when(F.col("event_id") % 10 == 0, "500")
        .when(F.col("event_id") % 10 == 1, "404")
        .otherwise("200")
    )
    line = F.concat(
        F.lit("10."), (F.col("user_id") % 200).cast("string"), F.lit("."),
        (F.col("event_id") % 250).cast("string"), F.lit(".7 - user"),
        (F.col("user_id") % 97).cast("string"), F.lit(" ["),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(' +0000] "'),
        method, F.lit(" /api/"), F.col("event_type"), F.lit("/"),
        (F.col("user_id") % 10).cast("string"), F.lit(' HTTP/1.1" '),
        status, F.lit(" "), (F.col("event_id") % 5000).cast("string"),
        F.lit(' "https://example.com/'), F.col("event_type"),
        F.lit('" "Mozilla/5.0"'),
    )
    parsed = grok_parse(e.select(line.alias("line")), "line", _GK2_EXPR, keep=False)
    return parsed.groupBy("method", F.col("status").cast("bigint").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bytes").cast("bigint")).alias("total_bytes"),
        F.countDistinct("client").alias("distinct_clients"),
        F.max("path").alias("max_path"),
    )


_GK2_X = grok_oracle_exprs(_GK2_EXPR, "line")

_q(
    "gk2_grok_apache_log",
    f"""
WITH lines AS (
  SELECT '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
         CAST(event_id % 250 AS VARCHAR) || '.7 - user' ||
         CAST(user_id % 97 AS VARCHAR) || ' [' ||
         strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] "' ||
         CASE event_id % 4 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
              WHEN 2 THEN 'PUT' ELSE 'DELETE' END ||
         ' /api/' || event_type || '/' || CAST(user_id % 10 AS VARCHAR) ||
         ' HTTP/1.1" ' ||
         CASE event_id % 10 WHEN 0 THEN '500' WHEN 1 THEN '404' ELSE '200' END ||
         ' ' || CAST(event_id % 5000 AS VARCHAR) ||
         ' "https://example.com/' || event_type || '" "Mozilla/5.0"' AS line
  FROM events
)
, parsed AS (
  SELECT {_GK2_X['client']} AS client, {_GK2_X['method']} AS method,
         {_GK2_X['path']} AS path, {_GK2_X['status']} AS status,
         {_GK2_X['bytes']} AS bytes
  FROM lines
)
SELECT method, CAST(status AS BIGINT) AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(bytes AS BIGINT)) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT client) AS BIGINT) AS distinct_clients,
       max(path) AS max_path
FROM parsed GROUP BY 1, 2
""",
)(_gk2)

# ---------------------------------------------------------------------------
# r4: cm2 — the generic OTTL frontend (ottl.py) as a driver row (VERDICT r3
# item 4): the reference's ACTUAL transform/filter statements
# (config/config.yaml:80-108) loaded from YAML — not named analogs — compile
# to one Catalyst chain (from_json schema inferred from keep_keys, map
# upserts with OTTL nil rules, filter drop-on-match) over a gitlab-webhook
# JSON corpus synthesized from events; DuckDB recomputes every promoted
# attribute directly.
# ---------------------------------------------------------------------------

_CM2_YAML = """
receivers:
  webhookevent: {}
processors:
  transform/body:
    error_mode: ignore
    log_statements: ['set(log.body, ParseJSON(log.body)) where log.body != nil']
  filter/gitlabpipelineevents:
    error_mode: ignore
    logs:
      log_record:
        - not IsMatch(body["object_kind"], "pipeline")
  transform/gitlabpipelineevents:
    log_statements:
      - context: log
        statements:
          - keep_keys(log.body, ["object_kind", "project", "object_attributes"])
          - keep_keys(log.body["project"], ["id", "name", "namespace", "path_with_namespace", "web_url"]) where log.body["project"] != nil
          - keep_keys(log.body["object_attributes"], ["id", "ref", "sha", "url", "status"]) where log.body["object_attributes"] != nil
          - set(log.attributes["event.name"], Concat(["pipeline", log.body["project"]["id"], log.body["object_attributes"]["id"]], "_")) where log.body["project"]["id"] != nil and log.body["object_attributes"]["id"] != nil
          - set(log.attributes["vcs.repository.owner"], log.body["project"]["namespace"]) where log.body["project"]["namespace"] != nil
          - set(log.attributes["vcs.repository.url.full"], log.body["project"]["web_url"]) where log.body["project"]["web_url"] != nil
          - set(log.attributes["vcs.ref.head.name"], log.body["object_attributes"]["ref"]) where log.body["object_attributes"]["ref"] != nil
          - set(log.attributes["vcs.ref.head.revision"], log.body["object_attributes"]["sha"]) where log.body["object_attributes"]["sha"] != nil
          - set(log.attributes["vcs.repository.name"], log.body["project"]["path_with_namespace"]) where log.body["project"]["path_with_namespace"] != nil
          - set(log.attributes["vcs.repository.id"], Concat(["", log.body["project"]["id"]], "")) where log.body["project"]["id"] != nil
          - set(resource.attributes["service.namespace"], "gitlab")
          - set(resource.attributes["service.name"], log.body["project"]["name"]) where log.body["project"]["name"] != nil
exporters:
  debug: {}
service:
  pipelines:
    logs:
      receivers: [webhookevent]
      processors: [transform/body, filter/gitlabpipelineevents, transform/gitlabpipelineevents]
      exporters: [debug]
"""


def _cm2(spark, sf):
    from .confmap import AssembleContext, assemble, load_config

    # widen the unsplittable scan: the OTTL chain below (to_json → ParseJSON
    # → map editors) is the heaviest per-row work in the registry
    e = _wide(load_tables(spark, sf)["events"])
    pid = (F.col("user_id") % 50).cast("string")
    grp = F.concat(F.lit("grp-"), (F.col("user_id") % 7).cast("string"))
    body = F.to_json(
        F.struct(
            F.when(F.col("event_id") % 3 == 0, "pipeline")
            .when(F.col("event_id") % 3 == 1, "push")
            .otherwise("note")
            .alias("object_kind"),
            F.struct(
                (F.col("user_id") % 50).cast("long").alias("id"),
                F.concat(F.lit("proj-"), pid).alias("name"),
                grp.alias("namespace"),
                F.concat(grp, F.lit("/proj-"), pid).alias("path_with_namespace"),
                F.concat(F.lit("https://gitlab.com/"), grp, F.lit("/proj-"), pid).alias("web_url"),
            ).alias("project"),
            F.struct(
                F.col("event_id").cast("long").alias("id"),
                F.when(F.col("event_id") % 2 == 0, "main").otherwise("dev").alias("ref"),
                F.substring(F.sha2(F.col("event_id").cast("string"), 256), 1, 8).alias("sha"),
                F.concat(F.lit("https://gitlab.com/p/"), F.col("event_id").cast("string")).alias("url"),
                F.when(F.col("event_id") % 4 == 0, "success")
                .when(F.col("event_id") % 4 == 1, "failed")
                .when(F.col("event_id") % 4 == 2, "running")
                .otherwise("pending")
                .alias("status"),
            ).alias("object_attributes"),
        )
    )
    raw = e.select(F.col("event_id").cast("bigint").alias("eid"), body.alias("body_raw"))
    # Receiver ingestion boundary (guide §7.3 / the cm3 lesson in
    # plans/ado_traces.py): without a plan barrier, the OTTL filter's
    # predicate is pushed below the widening exchange INTO the payload
    # synthesis, so the whole to_json+ParseJSON chain runs on the single
    # unsplittable scan task (measured ~10 s at sf1.0); a real deployment's
    # optimizer could never fold a filter into the upstream webhook sender
    # either.  Lazy localCheckpoint: no job at build time, payload built
    # once, post-boundary pipeline runs on all slots.
    raw = raw.localCheckpoint(eager=False)
    cfg = load_config(_CM2_YAML)
    logs = assemble(spark, cfg, AssembleContext(frames={"webhookevent": raw}))["logs"]
    a, r = F.col("attrs"), F.col("resource")
    return logs.select(
        "eid",
        a["event.name"].alias("event_name"),
        a["vcs.repository.owner"].alias("owner"),
        a["vcs.ref.head.name"].alias("ref_name"),
        a["vcs.ref.head.revision"].alias("revision"),
        a["vcs.repository.name"].alias("repo_name"),
        a["vcs.repository.id"].alias("repo_id"),
        r["service.namespace"].alias("service_ns"),
        r["service.name"].alias("service_name"),
    )


_q(
    "cm2_ottl_compiled_pipeline",
    """
SELECT CAST(event_id AS BIGINT) AS eid,
       'pipeline_' || CAST(user_id % 50 AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) AS event_name,
       'grp-' || CAST(user_id % 7 AS VARCHAR) AS owner,
       CASE WHEN event_id % 2 = 0 THEN 'main' ELSE 'dev' END AS ref_name,
       substring(sha256(CAST(event_id AS VARCHAR)), 1, 8) AS revision,
       'grp-' || CAST(user_id % 7 AS VARCHAR) || '/proj-' || CAST(user_id % 50 AS VARCHAR) AS repo_name,
       CAST(user_id % 50 AS VARCHAR) AS repo_id,
       'gitlab' AS service_ns,
       'proj-' || CAST(user_id % 50 AS VARCHAR) AS service_name
FROM events WHERE event_id % 3 = 0
""",
)(_cm2)

# ---------------------------------------------------------------------------
# r5: cm3 — OTTL span context (VERDICT r4 item 4): the transformprocessor
# ships for ALL signals (/root/reference/config/manifest.yaml:40); this row
# compiles a trace_statements program — status remap, merge_maps,
# replace_all_patterns, delete_matching_keys, truncate_all — plus a traces
# filterprocessor over S26-style ADO spans (plans/ado_traces.py), all from
# collector YAML.  DuckDB recomputes every surviving attribute.
# ---------------------------------------------------------------------------

_CM3_YAML = r"""
receivers:
  otlp: {}
processors:
  transform/spans:
    error_mode: ignore
    trace_statements:
      - context: span
        statements:
          - replace_pattern(span.name, "^Pipeline ", "")
          - set(span.status.code, 2) where resource.attributes["cicd.pipeline.run.result"] == "failed"
          - set(span.status.code, 1) where span.status.code == nil
          - set(span.attributes["run.url"], resource.attributes["cicd.pipeline.run.url"])
          - merge_maps(span.attributes, resource.attributes, "insert")
          - replace_all_patterns(span.attributes, "value", "^https://dev\\.azure\\.com/", "")
          - delete_matching_keys(span.attributes, "^cicd\\.pipeline\\.run\\.")
          - truncate_all(span.attributes, 24)
  filter/runs_only:
    error_mode: ignore
    traces:
      span:
        - 'not IsMatch(span.name, "^Run: ")'
exporters:
  debug: {}
service:
  pipelines:
    traces:
      receivers: [otlp]
      processors: [transform/spans, filter/runs_only]
      exporters: [debug]
"""




def _cm3(spark, sf):
    from .confmap import AssembleContext, assemble, load_config
    from .plans.ado_traces import ado_trace_pipeline

    spans = ado_trace_pipeline(
        _ado_raw(
            load_tables(spark, sf)["events"],
            run_result=F.when(F.col("event_id") % 4 == 1, "failed").otherwise("succeeded"),
        )
    )
    cfg = load_config(_CM3_YAML)
    out = assemble(spark, cfg, AssembleContext(frames={"otlp": spans}))["traces"]
    a = F.col("attrs")
    return out.select(
        "trace_id",
        "span_id",
        "name",
        F.col("status_code").cast("int").alias("status_code"),
        a["run.url"].alias("run_url"),
        a["cicd.pipeline.name"].alias("pipeline_name"),
        a["cicd.pipeline.id"].alias("pipeline_id"),
        a["vcs.vendor.name"].alias("vcs_vendor"),
    )


_q(
    "cm3_ottl_span_pipeline",
    """
SELECT substring(sha256(CAST(event_id AS VARCHAR) || 't'), 1, 32) AS trace_id,
       substring(sha256('pipeline_' || CAST(event_id % 13 AS VARCHAR)), 17, 16) AS span_id,
       'Run: pipe-' || CAST(event_id % 13 AS VARCHAR) AS name,
       CAST(CASE WHEN event_id % 4 = 1 THEN 2 ELSE 1 END AS INTEGER) AS status_code,
       'org/proj/pipelines/' || CAST(event_id % 13 AS VARCHAR) AS run_url,
       'pipe-' || CAST(event_id % 13 AS VARCHAR) AS pipeline_name,
       CAST(event_id AS VARCHAR) AS pipeline_id,
       'azuredevops' AS vcs_vendor
FROM events WHERE event_id < 3000 AND event_id % 3 = 0
""",
)(_cm3)

# ---------------------------------------------------------------------------
# r5: cm4 — OTTL datapoint context: a metrics pipeline whose
# transformprocessor runs metric_statements (metric.name path, map editors)
# and whose filterprocessor drops datapoints by value — the metrics third of
# the all-signals transform/filter surface (config/manifest.yaml:40),
# YAML-driven like cm2/cm3.
# ---------------------------------------------------------------------------

_CM4_YAML = r"""
receivers:
  otlp: {}
processors:
  transform/datapoints:
    error_mode: ignore
    metric_statements:
      - context: datapoint
        statements:
          - set(datapoint.attributes["metric.name"], metric.name)
          - set(datapoint.attributes["vcs.vendor"], "github")
          - replace_all_patterns(datapoint.attributes, "key", "^repository\\.", "vcs.repository.")
          - delete_key(datapoint.attributes, "internal.tag")
          - truncate_all(datapoint.attributes, 20)
  filter/nonzero:
    error_mode: ignore
    metrics:
      datapoint:
        - value_int == 0
exporters:
  debug: {}
service:
  pipelines:
    metrics:
      receivers: [otlp]
      processors: [transform/datapoints, filter/nonzero]
      exporters: [debug]
"""


def _cm4(spark, sf):
    from .confmap import AssembleContext, assemble, load_config

    e = load_tables(spark, sf)["events"]
    dp = e.select(
        F.col("event_id").cast("bigint").alias("eid"),
        F.when(F.col("event_id") % 3 == 0, "vcs.change.count")
        .when(F.col("event_id") % 3 == 1, "vcs.ref.count")
        .otherwise("vcs.contributor.count")
        .alias("metric_name"),
        (F.col("event_id") % 7).cast("long").alias("value_int"),
        F.create_map(
            F.lit("repository.name"),
            F.concat(F.lit("repo-"), (F.col("user_id") % 20).cast("string")),
            F.lit("internal.tag"),
            F.lit("x"),
            F.lit("team.name"),
            F.concat(F.lit("team-"), F.sha2(F.col("user_id").cast("string"), 256)),
        ).alias("attrs"),
    )
    cfg = load_config(_CM4_YAML)
    out = assemble(spark, cfg, AssembleContext(frames={"otlp": dp}))["metrics"]
    a = F.col("attrs")
    return out.select(
        "eid",
        "metric_name",
        F.col("value_int").alias("value"),
        a["vcs.repository.name"].alias("repo"),
        a["team.name"].alias("team"),
        a["metric.name"].alias("mname"),
        a["vcs.vendor"].alias("vendor"),
    )


_q(
    "cm4_ottl_datapoint_pipeline",
    """
SELECT CAST(event_id AS BIGINT) AS eid,
       CASE CAST(event_id % 3 AS INTEGER) WHEN 0 THEN 'vcs.change.count'
            WHEN 1 THEN 'vcs.ref.count' ELSE 'vcs.contributor.count' END AS metric_name,
       CAST(event_id % 7 AS BIGINT) AS value,
       'repo-' || CAST(user_id % 20 AS VARCHAR) AS repo,
       substring('team-' || sha256(CAST(user_id AS VARCHAR)), 1, 20) AS team,
       substring(CASE CAST(event_id % 3 AS INTEGER) WHEN 0 THEN 'vcs.change.count'
            WHEN 1 THEN 'vcs.ref.count' ELSE 'vcs.contributor.count' END, 1, 20) AS mname,
       'github' AS vendor
FROM events WHERE event_id % 7 <> 0
""",
)(_cm4)

# ---------------------------------------------------------------------------
# r5: gk3 — grok with a USER pattern file (VERDICT r4 item 8): real pipelines
# ship custom logstash `patterns/` packs; load_pattern_file + add_patterns
# resolve %{REF} composites (cycle-checked, capture-safe) and the SAME merged
# library drives both engines, exactly like gk1/gk2.
# ---------------------------------------------------------------------------

from .functions.grok import add_patterns, load_pattern_file

_GK3_PATTERN_FILE = r"""
# app-log pattern pack (logstash patterns/ format)
REQID [a-f0-9]{8}
DURMS \d{1,6}
APPHDR \[%{TIMESTAMP_ISO8601}\] \[%{LOGLEVEL}\]
APPREQ req=%{REQID} dur=%{DURMS}ms
"""

_GK3_LIB = add_patterns(load_pattern_file(_GK3_PATTERN_FILE))

# APPHDR captures as ONE composite field; REQID/DURMS re-capture individually
_GK3_EXPR = (
    "%{APPHDR:hdr} svc=%{NOTSPACE:svc} %{APPREQ} req=%{REQID:req} "
    "dur=%{DURMS:dur}ms bytes=%{INT:bytes} %{GREEDYDATA:msg}"
)


def _gk3_line():
    return F.concat(
        F.lit("["),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("] ["),
        F.when(F.col("event_type") == "error", "ERROR").otherwise("INFO"),
        F.lit("] svc=svc-"),
        (F.col("user_id") % 7).cast("string"),
        F.lit(" req="),
        F.substring(F.sha2(F.col("event_id").cast("string"), 256), 1, 8),
        F.lit(" dur="),
        (F.col("event_id") % 997).cast("string"),
        F.lit("ms req="),
        F.substring(F.sha2(F.col("event_id").cast("string"), 256), 1, 8),
        F.lit(" dur="),
        (F.col("event_id") % 997).cast("string"),
        F.lit("ms bytes="),
        (F.col("user_id") % 4096).cast("string"),
        F.lit(" op="),
        F.col("event_type"),
    )


def _gk3(spark, sf):
    # widen the unsplittable scan before the line build + pattern-file grok
    e = _wide(load_tables(spark, sf)["events"])
    parsed = grok_parse(
        e.select(_gk3_line().alias("line")), "line", _GK3_EXPR, keep=False,
        patterns=_GK3_LIB,
    )
    return parsed.groupBy("svc").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dur").cast("bigint")).alias("total_dur"),
        F.max("req").alias("max_req"),
        F.max("hdr").alias("max_hdr"),
        F.sum(F.col("bytes").cast("bigint")).alias("total_bytes"),
    )


_GK3_X = grok_oracle_exprs(_GK3_EXPR, "line", patterns=_GK3_LIB)

_q(
    "gk3_grok_pattern_file",
    f"""
WITH lines AS (
  SELECT '[' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '] [' ||
         CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END ||
         '] svc=svc-' || CAST(user_id % 7 AS VARCHAR) ||
         ' req=' || substring(sha256(CAST(event_id AS VARCHAR)), 1, 8) ||
         ' dur=' || CAST(event_id % 997 AS VARCHAR) ||
         'ms req=' || substring(sha256(CAST(event_id AS VARCHAR)), 1, 8) ||
         ' dur=' || CAST(event_id % 997 AS VARCHAR) ||
         'ms bytes=' || CAST(user_id % 4096 AS VARCHAR) ||
         ' op=' || event_type AS line
  FROM events
)
, parsed AS (
  SELECT {_GK3_X['svc']} AS svc, {_GK3_X['dur']} AS dur, {_GK3_X['req']} AS req,
         {_GK3_X['hdr']} AS hdr, {_GK3_X['bytes']} AS bytes
  FROM lines
)
SELECT svc, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(dur AS BIGINT)) AS BIGINT) AS total_dur,
       max(req) AS max_req, max(hdr) AS max_hdr,
       CAST(sum(CAST(bytes AS BIGINT)) AS BIGINT) AS total_bytes
FROM parsed GROUP BY 1
""",
)(_gk3)

# ---------------------------------------------------------------------------
# r5: pl8 — token-budget sequence packing (training-batch assembly): per
# source, documents pack into fixed token budgets by cumulative-token offset
# bucketing — pack_id = floor(preceding_tokens / B).  The Spark-first packing
# strategy at 100 TB: ONE window cum-sum per source partition (no driver
# loop, no per-pack state), deterministic, and docs stay whole.
# ---------------------------------------------------------------------------

_PL8_BUDGET = 2048


def _pl8(spark, sf):
    from pyspark.sql import Window

    d = load_tables(spark, sf)["documents"]
    tok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("source").orderBy("doc_id")
    x = (
        d.select("doc_id", "source", tok.alias("tok"))
        .withColumn("cum", F.sum("tok").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("tok")) / F.lit(_PL8_BUDGET)).cast("bigint"),
        )
    )
    return x.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("tok_total"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_q(
    "pl8_token_packing",
    f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS tok,
         sum(len(string_split(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
SELECT source, CAST(floor((cum - tok) / {_PL8_BUDGET}.0) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_total,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM t GROUP BY 1, 2
""",
)(_pl8)

# ---------------------------------------------------------------------------
# r5: pl9 — source-mixing weights (training-data curation): per-source token
# shares and the uniform-target oversampling weight (weight = corpus_share /
# source_share), the static data-mixture computation behind DoReMi-style
# reweighting.  Two aggregations: a full groupBy over the corpus, then
# whole-frame window totals over the ALREADY-AGGREGATED rows only — the
# unpartitioned window touches one row per source (20 here, thousands at
# 100 TB), never the corpus.  Integer-exact (floor-permille) on both sides.
# ---------------------------------------------------------------------------


def _pl9(spark, sf):
    from pyspark.sql import Window

    d = load_tables(spark, sf)["documents"]
    tok = F.size(F.split(F.col("text"), " "))
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).cast("bigint").alias("tok_total"),
    )
    w = Window.partitionBy()
    return (
        per.withColumn("corpus_tok", F.sum("tok_total").over(w).cast("bigint"))
        .withColumn("n_sources", F.count(F.lit(1)).over(w))
        .select(
            "source",
            "n_docs",
            "tok_total",
            F.floor(1000 * F.col("tok_total") / F.col("corpus_tok"))
            .cast("bigint")
            .alias("share_permille"),
            F.floor(1000 * F.col("corpus_tok") / (F.col("n_sources") * F.col("tok_total")))
            .cast("bigint")
            .alias("weight_x1000"),
        )
    )


_q(
    "pl9_source_mixing",
    """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_total
  FROM documents GROUP BY 1
)
SELECT source, n_docs, tok_total,
       CAST(floor(1000 * tok_total / t.corpus_tok) AS BIGINT) AS share_permille,
       CAST(floor(1000 * t.corpus_tok / (t.n_sources * tok_total)) AS BIGINT) AS weight_x1000
FROM per, (SELECT CAST(sum(tok_total) AS BIGINT) AS corpus_tok,
                  count(*) AS n_sources FROM per) t
""",
)(_pl9)

# ---------------------------------------------------------------------------
# r5: ts7 — corpus-statistics quality signal: rare-word ratio per document
# from a two-pass unigram model (global word frequencies, then a keyed join
# back).  Integer-exact (counts and a floor-permille) so both engines hash-
# match; the freq side joins on the word key — Spark picks broadcast while
# the vocabulary fits and shuffle-hash beyond (Zipf vocab at 100 TB exceeds
# any broadcast budget, so the plan must not FORCE a broadcast).
# ---------------------------------------------------------------------------


def _ts7(spark, sf):
    d = load_tables(spark, sf)["documents"]
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    joined = words.join(freq, "w")
    out = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.when(F.col("c") < 5, 1).otherwise(0)).cast("bigint").alias("rare_words"),
    )
    return out.withColumn(
        "rare_permille",
        F.floor(1000 * F.col("rare_words") / F.col("n_words")).cast("bigint"),
    )


_q(
    "ts7_rare_word_stats",
    """
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
), freq AS (SELECT w, count(*) AS c FROM words GROUP BY w)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) AS rare_words,
       CAST(floor(1000.0 * sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS rare_permille
FROM words JOIN freq USING (w) GROUP BY doc_id
""",
)(_ts7)

# ---------------------------------------------------------------------------
# r5: pl10 — deterministic per-source downsampling (the apply step behind
# pl9's mixing weights): keep a document iff the first 32 bits of
# md5(doc_id) fall under a per-source threshold floor(cap·2^32 / n_source).
# Expected kept count per source is min(cap, n) with no per-source sort or
# rank — one tiny groupBy for counts, broadcast back, then a stateless
# hash gate that scales to any corpus (the threshold division keeps every
# intermediate ≤ cap·2^32, overflow-safe even at 10^12 docs/source, where
# h32·n would overflow int64).  Same md5/conv arithmetic on both engines.
# ---------------------------------------------------------------------------

_PL10_CAP = 16


def _pl10(spark, sf):
    from .operators.sampling import source_downsample

    d = load_tables(spark, sf)["documents"]
    return source_downsample(d, _PL10_CAP).select("doc_id", "source", "h32")


_q(
    "pl10_source_downsample",
    f"""
WITH per AS (
  SELECT source, count(*) AS n_src FROM documents GROUP BY 1
), thr AS (
  SELECT source, CAST(floor({_PL10_CAP} * 4294967296.0 / n_src) AS BIGINT) AS thr
  FROM per
)
SELECT doc_id, d.source,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
FROM documents d JOIN thr USING (source)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < thr
""",
)(_pl10)

# ---------------------------------------------------------------------------
# r5: ts8 — per-source document-length quantiles (curation diagnostics: the
# length distribution drives truncation budgets and the Gopher length
# gates).  Exact percentiles via Spark's `percentile` — a single shuffle on
# source with partial aggregation; the per-group state is the sorted value
# multiset, bounded by docs-per-source, and at 100 TB the same statement
# swaps to `percentile_approx` (t-digest, constant state) with no plan
# change.  DuckDB's quantile_cont uses the identical linear interpolation
# (verified bit-for-bit on the float repr).
# ---------------------------------------------------------------------------


def _ts8(spark, sf):
    d = load_tables(spark, sf)["documents"]
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.percentile(F.col("n_chars"), F.lit(p)).alias(name) for name, p in qs.items()
    ]
    return d.groupBy("source").agg(*aggs)


_q(
    "ts8_length_quantiles",
    """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.5)  AS p50,
       quantile_cont(n_chars, 0.9)  AS p90,
       quantile_cont(n_chars, 0.99) AS p99
FROM documents GROUP BY 1
""",
)(_ts8)

# ---------------------------------------------------------------------------
# Driver grading window (established r3; rotated per VERDICT r5 item 1).
#
# The driver grades exactly the FIRST 50 entries of queries() in registration
# order.  Round-6 rotation: the four late-r5 registrations that have never
# held a driver row (ts10/ts11/pl12/dd10) lead the window, and the remaining
# 46 slots re-grade queries whose newest driver row is r4, so r5 ∪ r6 leaves
# every query with a green row at most one round old except four r4-green
# holdovers (pl2/pl4/dd1/x4) that carry independent pytest/golden coverage
# (pipeline rollup + token-equality tests, exact-dedup via pl5's survivors
# join, trace-id goldens).  Rotated-out rows keep their keys, oracles, and
# the full-registry local parity gate (tests/test_oracle_parity.py) — only
# dict ORDER moves.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW = [
    # never graded before r6 — first driver rows
    "ts10_tfidf_topk",
    "ts11_zipf_histogram",
    "pl12_context_chunks",
    "dd10_cluster_retention",
    # newest driver row r4 — re-graded this round
    "a1_repository_count",
    "a2_ref_count",
    "a3_change_count",
    "a4_change_time_to_merge",
    "a5_change_duration",
    "a8_ref_lines_delta",
    "a9_ref_time",
    "a10_contributor_count",
    "a12_deployment_count",
    "a13_deployment_average_duration",
    "a14_deployment_last_timestamp",
    "a15_work_item_count",
    "a16_work_item_tag_count",
    "a17_work_item_cycle_time",
    "w2_first_purchase_per_user",
    "w4_oldest_commit_per_branch",
    "w5_latest_event_per_user",
    "j1_broadcast_enrich_join",
    "j5_case_insensitive_dim_join",
    "j7_service_name_precedence",
    "u2_combined_pull_requests",
    "u3_receiver_fan_in",
    "f1_stale_branch_filter",
    "f8_regex_event_filter",
    "x9_api_url_rewrite",
    "x16_multi_format_timestamps",
    "x22_workflow_path_names",
    "dd2_minhash_near_dups",
    "dd7_dup_clusters",
    "sim1_brute_force_topk",
    "ts1_token_count",
    "ts3_language_id",
    "ts4_fingerprint",
    "pl1_parse_route_aggregate",
    "pl3_trace_ids",
    "dd6_contamination_scan",
    "gb1_groupbyattrs",
    "gt1_groupbytrace",
    "iv1_interval_last",
    "gk1_grok_parse",
    "ts6_repetition_stats",
    "pl7_token_bigrams",
    "cm1_config_pipeline",
    "mm1_multimodal_features",
    "gk2_grok_apache_log",
    "cm2_ottl_compiled_pipeline",
]

assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
# the reorder itself runs at the END of this module (after every
# registration) so late-registered queries can hold window slots

# ---------------------------------------------------------------------------
# r5 (late session): more training-data curation ops; the first seven hold
# r5 window slots (see _DRIVER_WINDOW), the rest enter the local parity
# gate immediately and rotate into the r6 window.
#
# dd9 — duplicated-span statistics at chunk granularity ("Deduplicating
# Training Data Makes Language Models Better", Lee et al. 2022, simplified
# from suffix-array substrings to non-overlapping 8-word chunks, the
# shuffle-friendly form): a chunk is duplicated iff its exact text occurs
# ≥2 times corpus-wide.  The corpus-frequency join ships 32-hex md5 digests,
# never the chunk text — at 100 TB the shuffle carries ~45 bytes/chunk and
# the per-key state is one int64, so the same plan holds at any scale.
# ---------------------------------------------------------------------------

_DD9_W = 8  # words per chunk


def _dd9_chunks(d: DataFrame) -> DataFrame:
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_chunks = F.floor(F.size(ws) / _DD9_W).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(F.array_join(F.slice(ws, i * _DD9_W + 1, _DD9_W), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(chunks).alias("h"))


def _dd9(spark, sf):
    # widen the unsplittable documents scan before the chunk explode + md5
    d = _wide(load_tables(spark, sf)["documents"])
    # pre-aggregate per (doc, chunk-hash): the exploded frame feeds BOTH the
    # corpus-frequency branch and the join-back, and with no exchange in
    # between Catalyst would recompute scan+explode+md5 once per branch.
    # The (doc_id, h) aggregate inserts an Exchange both branches share
    # (ReusedExchange in the final plan — asserted in test_plan_shape) so
    # the corpus is scanned and hashed exactly once.  Within-doc repeats are
    # preserved through `cnt`.
    c = _dd9_chunks(d).groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("cnt"))
    freq = c.groupBy("h").agg(F.sum("cnt").alias("c"))
    return (
        c.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("c") >= 2, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("dup_chunks"),
        )
        .withColumn(
            "dup_permille",
            F.floor(1000 * F.col("dup_chunks") / F.col("n_chunks")).cast("bigint"),
        )
    )


_q(
    "dd9_dup_chunk_stats",
    """
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents
), chunks AS (
  SELECT doc_id, md5(array_to_string(list_slice(ws, 8*i+1, 8*i+8), ' ')) AS h
  FROM words, unnest(range(0, CAST(floor(len(ws)/8.0) AS BIGINT))) AS t(i)
), freq AS (SELECT h, count(*) AS c FROM chunks GROUP BY h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       CAST(floor(1000.0 * sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS dup_permille
FROM chunks JOIN freq USING (h) GROUP BY doc_id
""",
)(_dd9)

# ---------------------------------------------------------------------------
# ts9 — unigram-surprisal quality proxy (the Catalyst-friendly stand-in for
# CCNet's LM-perplexity filter): score each document by the mean corpus
# surprisal of its words.  Surprisal is computed in INTEGER log2 —
# bitlen(total) - bitlen(count), where bitlen(x) = length(bin(x)) — so both
# engines produce bit-identical sums with no transcendental-rounding risk
# (ln/log2 on doubles can differ by 1 ulp between libm implementations and
# flip a floor()).  Two shuffles total: word-frequency groupBy, then the
# doc re-aggregation; the corpus total joins in as a broadcast 1-row frame.
# ---------------------------------------------------------------------------


def _ts9(spark, sf):
    # widen the unsplittable documents scan before the word explode
    d = _wide(load_tables(spark, sf)["documents"])
    words = d.select(
        "doc_id", F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("w")
    )
    # per-(doc, word) pre-aggregate: same shared-exchange rationale as dd9 —
    # one scan+explode feeds both the frequency branch and the join-back
    w1 = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    freq = w1.groupBy("w").agg(F.sum("cnt").alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    scored = freq.crossJoin(F.broadcast(total)).select(
        "w",
        (F.length(F.bin(F.col("total"))) - F.length(F.bin(F.col("c")))).cast("bigint").alias("s"),
    )
    return (
        w1.join(scored, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.floor(1000 * F.sum(F.col("cnt") * F.col("s")) / F.sum("cnt"))
            .cast("bigint")
            .alias("surprisal_permille"),
        )
    )


_q(
    "ts9_unigram_surprisal",
    """
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
), freq AS (SELECT w, count(*) AS c FROM words GROUP BY w),
scored AS (
  SELECT w, CAST(length(bin((SELECT sum(c) FROM freq))) - length(bin(c)) AS BIGINT) AS s
  FROM freq
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(floor(1000.0 * sum(s) / count(*)) AS BIGINT) AS surprisal_permille
FROM words JOIN scored USING (w) GROUP BY doc_id
""",
)(_ts9)

# ---------------------------------------------------------------------------
# Temporal operators (operators/temporal.py): gap sessionization and the
# union+window as-of join.  Registered after the window reorder — both enter
# the local parity gate now and rotate into the r6 driver window.
# ---------------------------------------------------------------------------

from .operators.temporal import asof_join, sessionize  # noqa: E402


def _w6(spark, sf):
    e = load_tables(spark, sf)["events"]
    s = sessionize(e, ("user_id",), "ts", 1800)
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ source, UTC session
    return s.groupBy("user_id", "session_seq").agg(
        F.min(us).alias("session_start_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max(us) - F.min(us)).cast("bigint").alias("duration_us"),
    )


_q(
    "w6_gap_sessions",
    """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, us,
    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
), sess AS (
  SELECT user_id, us,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING)
      AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       min(us) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session_seq
""",
)(_w6)


def _j8(spark, sf):
    t = load_tables(spark, sf)
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        t["orders"],
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=("o_orderkey", "o_totalprice"),
        tie_col="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


_q(
    "j8_asof_latest_order",
    """
SELECT e.event_id, e.user_id,
       o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
FROM events e LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
) o ON true
""",
)(_j8)

# ---------------------------------------------------------------------------
# ts10 — TF-IDF top-k keyword extraction per document.  IDF in the same
# integer-log2 form as ts9 (bitlen(N) − bitlen(df)) so scores are exact
# int64 on both engines; rank ties break on the word itself, so the top-3 is
# fully deterministic.  Two shuffles (doc-term tf, term df) + one window
# over the already-aggregated tf rows; the corpus doc count broadcasts as a
# 1-row frame.  The df join is NOT forced broadcast — a Zipf vocabulary at
# 100 TB exceeds any broadcast budget (same reasoning as ts7).
# ---------------------------------------------------------------------------


def _ts10(spark, sf):
    d = load_tables(spark, sf)["documents"]
    # widen only the explode branch; n_docs below counts the raw scan
    words = _wide(d).select(
        "doc_id", F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    # df as sum(1[tf>0]) == count(*) (tf >= 1 always), but it keeps the tf
    # column alive in this branch: otherwise Catalyst prunes tf from the
    # (doc_id, w) aggregate here, the two exchanges stop being identical,
    # and AQE cannot reuse one — the corpus would be scanned and exploded
    # twice.  With it, the final plan shows a ReusedExchange (asserted in
    # test_plan_shape) and the scan+explode runs once.
    dfreq = tf.groupBy("w").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).cast("bigint").alias("df")
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            (
                F.col("tf") * (F.length(F.bin(F.col("n_docs"))) - F.length(F.bin(F.col("df"))))
            ).cast("bigint").alias("score"),
        )
    )
    from pyspark.sql import Window as _W

    rnk = F.row_number().over(
        _W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("w"))
    )
    return (
        scored.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "w", "score", "rnk")
    )


_q(
    "ts10_tfidf_topk",
    """
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
), tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT doc_id, w,
    CAST(tf * (length(bin((SELECT count(*) FROM documents))) - length(bin(df)))
         AS BIGINT) AS score
  FROM tf JOIN dfreq USING (w)
), ranked AS (
  SELECT doc_id, w, score,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, w, score, rnk FROM ranked WHERE rnk <= 3
""",
)(_ts10)

# ---------------------------------------------------------------------------
# emb1 — symmetric int8 embedding quantization, the storage/ANN prep step
# (per-vector scale = max|x|, q_i = round-half-up(x_i·127/scale)).  Pure
# Catalyst higher-order functions, zero Python, no shuffle at all — the map-
# only shape that runs at parquet-scan speed on 100 TB.  floor(x+0.5) is the
# rounding on BOTH engines (library round() differs in half-tie mode between
# engines; floor of identical IEEE doubles cannot).  The result is reported
# as integer invariants (scale_ppm, L1 mass, position-weighted checksum) —
# exactly what a downstream loader would verify — rather than a raw int8
# array, keeping the driver compare scalar.
# ---------------------------------------------------------------------------


def _emb1(spark, sf):
    e = load_tables(spark, sf)["embeddings"]
    ma = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    qv = lambda x: F.when(F.col("_ma") == 0, F.lit(0.0)).otherwise(  # noqa: E731
        F.floor(x.cast("double") * 127 / F.col("_ma") + 0.5)
    )
    return (
        e.withColumn("_ma", ma)
        .select(
            "vec_id",
            F.floor(F.col("_ma") * 1e6).cast("bigint").alias("scale_ppm"),
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: F.abs(qv(x))),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("bigint")
            .alias("q_l1"),
            F.aggregate(
                F.transform(F.col("embedding"), lambda x, i: qv(x) * (i + 1)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("bigint")
            .alias("q_checksum"),
        )
    )


_q(
    "emb1_int8_quant",
    """
WITH base AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
  FROM embeddings
), q AS (
  SELECT vec_id, ma,
    list_transform(embedding, (x, i) -> CASE WHEN ma = 0 THEN 0.0
      ELSE floor(CAST(x AS DOUBLE) * 127 / ma + 0.5) END) AS qs
  FROM base
)
SELECT vec_id,
  CAST(floor(ma * 1e6) AS BIGINT) AS scale_ppm,
  CAST(list_sum(list_transform(qs, x -> abs(x))) AS BIGINT) AS q_l1,
  CAST(list_sum(list_transform(qs, (x, i) -> x * i)) AS BIGINT) AS q_checksum
FROM q
""",
)(_emb1)

# ---------------------------------------------------------------------------
# pf1 — table profiling: per-column null count, exact distinct count, and
# min/max over the numeric lineitem columns, in ONE aggregation pass
# unpivoted to a row per column.  Every statistic is selection- or
# integer-valued (no double summation, whose partition-order rounding would
# differ between engines).  At 100 TB the exact count(distinct) — which
# Catalyst plans as an Expand (one shuffle lane per column) — swaps to
# approx_count_distinct (HLL, constant state) with no other plan change;
# the exact form is kept here because the oracle demands exactness.
# ---------------------------------------------------------------------------

_PF1_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _pf1(spark, sf):
    # lineitem at bench SFs is a one-byte-range file (guide §6): widen so the
    # partial aggregates use every slot; column pruning pushes through the
    # round-robin exchange, so only the 4 profiled columns move.
    li = _wide(load_tables(spark, sf)["lineitem"])
    # One independent two-level aggregation per column instead of 4
    # count_distincts in a single agg: multiple distinct aggregates force a
    # 5x Expand of every input row into one multi-key aggregate (guide §2.3
    # "aggregate before you shuffle" — the Expand shuffles 5 copies).  Per
    # column, groupBy(c) partial-aggregates to the column's distinct values
    # and the final agg reads counts off the groups (null_count = the null
    # group's count, n_distinct = non-null group count, min/max = group-key
    # min/max — nulls excluded exactly like min(c)/count_distinct(c)).  The
    # four subtrees run as one job over four pruned single-column scans.
    # Measured sf1.0: 2.65 s -> 0.66 s, values bit-identical.
    parts = []
    for c in _PF1_COLS:
        g = li.groupBy(c).agg(F.count(F.lit(1)).alias("_n"))
        parts.append(
            g.agg(
                F.lit(c).alias("col_name"),
                F.sum(F.when(F.col(c).isNull(), F.col("_n")).otherwise(0))
                .cast("bigint")
                .alias("null_count"),
                F.count(F.when(F.col(c).isNotNull(), 1)).cast("bigint").alias("n_distinct"),
                F.min(c).alias("min_val"),
                F.max(c).alias("max_val"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


_q(
    "pf1_table_profile",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  min({c}) AS min_val, max({c}) AS max_val
FROM lineitem"""
        for c in _PF1_COLS
    ),
)(_pf1)

# ---------------------------------------------------------------------------
# pl11 — deterministic train/val/test split (operators/sampling.py): hash-
# bucket assignment (md5 first-32-bits mod 100), summarized per split ×
# source.  The split itself is a zero-shuffle map expression; only this
# report aggregates.
# ---------------------------------------------------------------------------


def _pl11(spark, sf):
    from .operators.sampling import train_val_test_split

    d = load_tables(spark, sf)["documents"]
    return (
        train_val_test_split(d)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


_q(
    "pl11_train_split",
    """
WITH s AS (
  SELECT source, n_chars,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
  FROM documents
)
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY 1, 2
""",
)(_pl11)

# ---------------------------------------------------------------------------
# pl12 — fixed-context chunking: split each document into ceil(n_tok/CTX)
# training chunks of at most CTX tokens (the sequence-assembly step between
# tokenization and pl8's budget packing).  Catalyst sequence+explode — the
# chunk grid needs no Python and no shuffle; row count grows by the chunk
# factor only.
# ---------------------------------------------------------------------------

_PL12_CTX = 32


def _pl12(spark, sf):
    d = load_tables(spark, sf)["documents"]
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_tok = F.size(ws)
    n_chunks = F.ceil(n_tok / F.lit(_PL12_CTX)).cast("int")
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return d.select(
        "doc_id", n_tok.alias("n_tok"), F.explode(idx).alias("ci")
    ).select(
        "doc_id",
        F.col("ci").cast("bigint").alias("chunk_idx"),
        F.least(F.lit(_PL12_CTX), F.col("n_tok") - F.col("ci") * _PL12_CTX)
        .cast("bigint")
        .alias("chunk_len"),
    )


_q(
    "pl12_context_chunks",
    f"""
WITH t AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(least({_PL12_CTX}, n_tok - i * {_PL12_CTX}) AS BIGINT) AS chunk_len
FROM t, unnest(range(0, CAST(ceil(n_tok / {_PL12_CTX}.0) AS BIGINT))) AS u(i)
""",
)(_pl12)

# ---------------------------------------------------------------------------
# ts11 — Zipf histogram: corpus word-frequency distribution log2-bucketed
# (bucket = bitlen(count)), the one-page corpus health report (a healthy
# natural-language corpus is a straight line here; bot spam and boilerplate
# bend it).  Word-freq groupBy then a tiny bucket rollup.
# ---------------------------------------------------------------------------


def _ts11(spark, sf):
    # widen the unsplittable documents scan before the word explode
    d = _wide(load_tables(spark, sf)["documents"])
    words = d.select(
        F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("w")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return (
        freq.groupBy(F.length(F.bin(F.col("c"))).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("c").cast("bigint").alias("n_occurrences"),
        )
    )


_q(
    "ts11_zipf_histogram",
    """
WITH words AS (
  SELECT w FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
), freq AS (SELECT w, count(*) AS c FROM words GROUP BY w)
SELECT CAST(length(bin(c)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(c) AS BIGINT) AS n_occurrences
FROM freq GROUP BY 1
""",
)(_ts11)

# ---------------------------------------------------------------------------
# dd10 — duplicate-cluster retention, the APPLY step of dedup: per dd7
# cluster keep the longest member (ties: lowest doc_id) and count the
# drops.  One extra shuffle on cluster_id after the CC; the argmax is a
# struct-max aggregate, not a window, so map-side partial aggregation
# applies.  Retention-by-quality is RefinedWeb/FineWeb practice — clusters
# keep one canonical doc, not an arbitrary first-seen.
# ---------------------------------------------------------------------------


def _dd10(spark, sf):
    d = load_tables(spark, sf)["documents"]
    edges = DD.minhash_near_dups(d).select("doc_a", "doc_b")
    clusters = DD.duplicate_clusters(edges)
    m = clusters.join(d.select("doc_id", "n_chars"), "doc_id")
    return (
        m.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max(F.struct(F.col("n_chars").alias("nc"), (-F.col("doc_id")).alias("neg"))).alias("b"),
        )
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            (-F.col("b.neg")).cast("bigint").alias("keep_id"),
            "n_members",
            (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
        )
    )


_q(
    "dd10_cluster_retention",
    "WITH RECURSIVE "
    + _SHINGLES_CTE.strip()
    + _SIGS_CTE
    + _BANDS_CTE
    + f"""
, capped AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rk
    FROM bands
  ) WHERE rk <= {DD.MAX_BUCKET_WIDTH}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
, edges AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sigs sa ON sa.doc_id = doc_a
  JOIN sigs sb ON sb.doc_id = doc_b
  WHERE {_MATCH_SUM} >= 4
)
, sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM edges
)
, reach(doc_id, r) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT rr.doc_id, s.dst FROM reach rr JOIN sym s ON s.src = rr.r
)
, clusters AS (
  SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster_id FROM reach GROUP BY doc_id
)
, m AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM m GROUP BY cluster_id
""",
)(_dd10)

# ---------------------------------------------------------------------------
# Driver-window reorder — MUST stay the last statement of this module: the
# driver grades the first 50 entries of queries(), so every registration
# above is eligible for a window slot and everything else follows in
# registration order for the local parity gate.
# ---------------------------------------------------------------------------

assert set(_DRIVER_WINDOW) <= set(QUERIES), sorted(set(_DRIVER_WINDOW) - set(QUERIES))
_ORDER = _DRIVER_WINDOW + [k for k in QUERIES if k not in _DRIVER_WINDOW]
QUERIES = {k: QUERIES[k] for k in _ORDER}
ORACLES = {k: ORACLES[k] for k in _ORDER if k in ORACLES}
