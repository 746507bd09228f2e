"""Scraper-snapshot golden test: the github scraper happy path.

Re-expresses the reference's mock-server inputs
(githubscraper/github_scraper_test.go:67-188 TestHappyPath) as domain rows
and asserts the EXACT datapoint set of
testdata/scraper/expected_happy_path.yaml (dumped verbatim below), compared
order-insensitively like pmetrictest.CompareMetrics with timestamps pinned.

Also the no-repos case (expected_no_repos.yaml: only vcs.repository.count=0).
"""

from __future__ import annotations

from datetime import datetime

from liatrio_otel_collector_spark.plans.vcs_metrics import github_scrape_metrics

NOW = "2026-01-01 00:00:00"
ZERO = datetime(1, 1, 2)  # Go zero time (day 2 keeps Spark's parquet-free range happy)
DAY_AGO = datetime(2025, 12, 31)  # NOW - 86400s

REPOS = [("repo1", "", "main", False)]
REPO_SCHEMA = "repo_name string, url string, default_branch string, archived boolean"

BRANCHES = [("repo1", "", "dev", 0, 1, "main")]
BRANCH_SCHEMA = (
    "repo_name string, url string, branch_name string, ahead_by int, behind_by int, base_ref string"
)

# one commit behind trunk: committedDate = now-1d, +10/-9
COMMITS = [("repo1", "", "dev", "main", DAY_AGO, 10, 9, "dev-1")]
COMMIT_SCHEMA = (
    "repo_name string, url string, branch_name string, base_ref string, "
    "committed_date timestamp, additions int, deletions int, author_id string"
)

# two PRs: one merged, one open — all timestamps zero (mock leaves them unset)
PRS = [
    ("repo1", "", "pr-1", "MERGED", ZERO, ZERO, ""),
    ("repo1", "", "pr-2", "OPEN", ZERO, None, ""),
]
PR_SCHEMA = (
    "repo_name string, url string, pr_id string, state string, "
    "created_at timestamp, merged_at timestamp, head_ref string"
)

# dependabot alerts HIGH + MODERATE (code-scanning 404 -> empty, U1 union)
CVES = [("repo1", "", "HIGH", "open"), ("repo1", "", "MODERATE", "open")]
CVE_SCHEMA = "repo_name string, url string, severity_raw string, state string"

# expected_happy_path.yaml datapoints, verbatim (metric, value, attrs)
EXPECTED = {
    ("vcs.repository.count", 1, frozenset()),
    ("vcs.ref.count", 1, frozenset({("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.change.count", 1, frozenset({("vcs.change.state", "merged"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.change.count", 1, frozenset({("vcs.change.state", "open"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.change.time_to_merge", 0, frozenset({("vcs.ref.head.name", ""), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.change.duration", 9223372036, frozenset({("vcs.change.state", "open"), ("vcs.ref.head.name", ""), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.cve.count", 1, frozenset({("cve.severity", "high"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.cve.count", 1, frozenset({("cve.severity", "medium"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    # THE SWAP: BehindBy=1 emitted as ahead, AheadBy=0 as behind
    ("vcs.ref.revisions_delta", 1, frozenset({("vcs.ref.head.name", "dev"), ("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", ""), ("vcs.revision_delta.direction", "ahead")})),
    ("vcs.ref.revisions_delta", 0, frozenset({("vcs.ref.head.name", "dev"), ("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", ""), ("vcs.revision_delta.direction", "behind")})),
    ("vcs.ref.lines_delta", 10, frozenset({("vcs.line_change.type", "added"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "dev"), ("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.ref.lines_delta", 9, frozenset({("vcs.line_change.type", "removed"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "dev"), ("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
    ("vcs.ref.time", 86400, frozenset({("vcs.ref.head.name", "dev"), ("vcs.ref.head.type", "branch"), ("vcs.repository.name", "repo1"), ("vcs.repository.url.full", "")})),
}


def _scrape(spark, repos, branches, commits, prs, cves):
    return github_scrape_metrics(
        spark.createDataFrame(repos, REPO_SCHEMA),
        spark.createDataFrame(branches, BRANCH_SCHEMA),
        spark.createDataFrame(prs, PR_SCHEMA),
        spark.createDataFrame(commits, COMMIT_SCHEMA),
        spark.createDataFrame(cves, CVE_SCHEMA),
        org="liatrio",
        now=NOW,
    )


def test_github_happy_path_golden(spark):
    rows = _scrape(spark, REPOS, BRANCHES, COMMITS, PRS, CVES).collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == EXPECTED
    # resource stamped on every datapoint (J6)
    for r in rows:
        assert r["resource"] == {"organization.name": "liatrio", "vcs.vendor.name": "github"}
    # datapoint multiset == set here (no duplicate-keyed datapoints)
    assert len(rows) == len(EXPECTED)


def test_github_no_repos_golden(spark):
    """expected_no_repos.yaml: only vcs.repository.count = 0."""
    rows = _scrape(spark, [], [], [], [], []).collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == {("vcs.repository.count", 0, frozenset())}


# --- gitlab scraper golden (gitlab_scraper_test.go:59-146 Happy Path;
# testdata/scraper/expected_happy_path.yaml) -------------------------------

from datetime import datetime as _dt

from liatrio_otel_collector_spark.plans.vcs_metrics import gitlab_scrape_metrics

GL_PROJECTS = [("project", "1", "")]
GL_PROJECT_SCHEMA = "repo_name string, repo_id string, url string"

GL_BRANCHES = [("project", "1", "", "branch1", _dt(2025, 12, 31))]
GL_BRANCH_SCHEMA = (
    "repo_name string, repo_id string, url string, branch_name string, "
    "initial_commit_ts timestamp"
)

GL_MRS = [
    ("project", "1", "", "1", "feature-a", "main", _dt(2025, 12, 31), None, 10, 5),
    ("project", "1", "", "2", "feature-a", "main", _dt(2025, 12, 30), _dt(2025, 12, 31), 20, 8),
]
GL_MR_SCHEMA = (
    "repo_name string, repo_id string, url string, mr_iid string, source_branch string, "
    "target_branch string, created_at timestamp, merged_at timestamp, additions int, deletions int"
)

_GL_REPO = (("vcs.repository.id", "1"), ("vcs.repository.name", "project"), ("vcs.repository.url.full", ""))

GL_EXPECTED = {
    ("vcs.repository.count", 1, frozenset()),
    ("vcs.ref.count", 1, frozenset({("vcs.ref.head.type", "branch"), *_GL_REPO})),
    ("vcs.ref.time", 86400, frozenset({("vcs.ref.head.name", "branch1"), ("vcs.ref.head.type", "branch"), *_GL_REPO})),
    ("vcs.change.duration", 86400, frozenset({("vcs.change.state", "open"), ("vcs.ref.head.name", "feature-a"), *_GL_REPO})),
    ("vcs.change.time_to_merge", 86400, frozenset({("vcs.ref.head.name", "feature-a"), *_GL_REPO})),
    ("vcs.ref.lines_delta", 10, frozenset({("vcs.change.id", "1"), ("vcs.line_change.type", "added"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "feature-a"), ("vcs.ref.head.type", "branch"), *_GL_REPO})),
    ("vcs.ref.lines_delta", 5, frozenset({("vcs.change.id", "1"), ("vcs.line_change.type", "removed"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "feature-a"), ("vcs.ref.head.type", "branch"), *_GL_REPO})),
    ("vcs.ref.lines_delta", 20, frozenset({("vcs.change.id", "2"), ("vcs.line_change.type", "added"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "feature-a"), ("vcs.ref.head.type", "branch"), *_GL_REPO})),
    ("vcs.ref.lines_delta", 8, frozenset({("vcs.change.id", "2"), ("vcs.line_change.type", "removed"), ("vcs.ref.base.name", "main"), ("vcs.ref.base.type", "branch"), ("vcs.ref.head.name", "feature-a"), ("vcs.ref.head.type", "branch"), *_GL_REPO})),
}


def test_gitlab_happy_path_golden(spark):
    rows = gitlab_scrape_metrics(
        spark.createDataFrame(GL_PROJECTS, GL_PROJECT_SCHEMA),
        spark.createDataFrame(GL_BRANCHES, GL_BRANCH_SCHEMA),
        spark.createDataFrame(GL_MRS, GL_MR_SCHEMA),
        org="project",
        now=NOW,
    ).collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == GL_EXPECTED
    for r in rows:
        assert r["resource"] == {"organization.name": "project", "vcs.vendor.name": "gitlab"}


# --- terraform scraper golden (gitlab_terraform_scraper_test.go:85-133;
# expected_happy_path.yaml / expected_no_modules.yaml) ----------------------

from liatrio_otel_collector_spark.plans.vcs_metrics import (
    gitlab_catalog_scrape_metrics,
    gitlab_terraform_scrape_metrics,
)

TF_PKG_SCHEMA = "package_name string, package_type string"
TF_BLOB_SCHEMA = "project_id long, line string"
TF_PROJ_SCHEMA = "project_id long, path_with_namespace string, web_url string"

_TF_MOD = (("vcs.terraform.module.name", "my-vpc"), ("vcs.terraform.module.system", "aws"))


def test_terraform_happy_path_golden(spark):
    pkgs = spark.createDataFrame([("my-vpc/aws", "terraform_module")], TF_PKG_SCHEMA)
    blobs = spark.createDataFrame(
        [
            (100, 'source = "gitlab.com/testgroup/my-vpc/aws"'),
            (200, 'source = "gitlab.com/testgroup/my-vpc/aws"'),
        ],
        TF_BLOB_SCHEMA,
    )
    projs = spark.createDataFrame(
        [
            (100, "testgroup/consumer-app", "https://gitlab.com/testgroup/consumer-app"),
            (200, "testgroup/another-app", "https://gitlab.com/testgroup/another-app"),
        ],
        TF_PROJ_SCHEMA,
    )
    rows = gitlab_terraform_scrape_metrics(pkgs, blobs, projs, org="testgroup").collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == {
        ("vcs.terraform.module.count", 1, frozenset()),
        ("vcs.terraform.module.consumer", 1, frozenset({
            ("vcs.repository.name", "testgroup/consumer-app"),
            ("vcs.repository.url.full", "https://gitlab.com/testgroup/consumer-app"), *_TF_MOD})),
        ("vcs.terraform.module.consumer", 1, frozenset({
            ("vcs.repository.name", "testgroup/another-app"),
            ("vcs.repository.url.full", "https://gitlab.com/testgroup/another-app"), *_TF_MOD})),
        ("vcs.terraform.module.consumer.count", 2, frozenset(_TF_MOD)),
    }
    for r in rows:
        assert r["resource"] == {"organization.name": "testgroup", "vcs.vendor.name": "gitlab"}


def test_terraform_no_modules_golden(spark):
    """expected_no_modules.yaml: only vcs.terraform.module.count = 0."""
    pkgs = spark.createDataFrame([("x", "npm")], TF_PKG_SCHEMA)
    blobs = spark.createDataFrame([], TF_BLOB_SCHEMA)
    projs = spark.createDataFrame([], TF_PROJ_SCHEMA)
    rows = gitlab_terraform_scrape_metrics(pkgs, blobs, projs, org="testgroup").collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == {("vcs.terraform.module.count", 0, frozenset())}


# --- catalog scraper golden (gitlab_catalog_scraper_test.go:40-90;
# expected_happy_path.yaml) --------------------------------------------------

CAT_PROJ_SCHEMA = "project_path string, url string"
CAT_USAGE_SCHEMA = "project_path string, usage_name string"
CAT_LINE_SCHEMA = "project_path string, line string"
CAT_RES_SCHEMA = "full_path string, name string, star_count long, usage_count long"


def test_catalog_happy_path_golden(spark):
    projects = spark.createDataFrame([("my-app", "https://gitlab.com/project/my-app")], CAT_PROJ_SCHEMA)
    usages = spark.createDataFrame([("my-app", "sast"), ("my-app", "fmt")], CAT_USAGE_SCHEMA)
    # the my-app CI config from the mock, one include per line (X12 parse)
    lines = spark.createDataFrame(
        [
            ("my-app", "  - component: gitlab.com/components/secret-detection/sast@2.3.0"),
            ("my-app", "  - component: gitlab.com/components/opentofu/fmt@4.5.0"),
            ("my-app", "include:"),
        ],
        CAT_LINE_SCHEMA,
    )
    resources = spark.createDataFrame(
        [
            ("components/secret-detection", "Secret Detection", 50, 8000),
            ("components/opentofu", "OpenTofu", 161, 5445),
        ],
        CAT_RES_SCHEMA,
    )
    rows = gitlab_catalog_scrape_metrics(projects, usages, lines, resources, org="project").collect()
    got = {(r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows}
    assert got == {
        ("gitlab.catalog.project.component_count", 2,
         frozenset({("vcs.repository.url.full", "https://gitlab.com/project/my-app")})),
        ("gitlab.catalog.component.project_count", 1,
         frozenset({("gitlab.catalog.component.name", "components/secret-detection/sast")})),
        ("gitlab.catalog.component.project_count", 1,
         frozenset({("gitlab.catalog.component.name", "components/opentofu/fmt")})),
        ("gitlab.catalog.resource.star_count", 50,
         frozenset({("gitlab.catalog.resource.full_path", "components/secret-detection"),
                    ("gitlab.catalog.resource.name", "Secret Detection")})),
        ("gitlab.catalog.resource.star_count", 161,
         frozenset({("gitlab.catalog.resource.full_path", "components/opentofu"),
                    ("gitlab.catalog.resource.name", "OpenTofu")})),
        ("gitlab.catalog.resource.usage_count", 8000,
         frozenset({("gitlab.catalog.resource.full_path", "components/secret-detection"),
                    ("gitlab.catalog.resource.name", "Secret Detection")})),
        ("gitlab.catalog.resource.usage_count", 5445,
         frozenset({("gitlab.catalog.resource.full_path", "components/opentofu"),
                    ("gitlab.catalog.resource.name", "OpenTofu")})),
    }
    for r in rows:
        assert r["resource"] == {"organization.name": "project", "vcs.vendor.name": "gitlab"}
