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


# --- azuredevops scraper golden (azuredevops_scraper.go:102-317;
# testdata/scraper/expected_happy_path.yaml / expected_no_projects.yaml) -----
#
# No Go test reads these goldens (they predate the current scraper: old attr
# names vcs.ref.head.type + organization.name/vcs.vendor.name, lines_delta
# still present, change.count disabled) — the replay inputs below are
# reconstructed so the datapoint set matches the YAML exactly:
#   1 repo ("project", id "1", url "") -> repository.count=1
#   1 non-default branch branch1, initial commit now-1d -> ref.count=1,
#     ref.time=86400
#   4 PRs, all sourceRefName "" and 0/0 line stats ->
#     8 lines_delta points (4 added + 4 removed, all 0);
#     2 active created now-1d -> 2 x change.duration=86400;
#     2 completed with Go-zero creationDate -> 2 x time_to_merge clamped to
#       MaxInt64 ns = 9223372036 s.
# The golden contains DUPLICATE datapoints (identical attrs), so comparison
# is a multiset (Counter), unlike the github/gitlab sets.

from collections import Counter

from liatrio_otel_collector_spark.plans.vcs_metrics import (
    ADO_DEFAULT_METRICS,
    azuredevops_scrape_metrics,
)

ADO_REPOS = [("project", "1", "", "main")]
ADO_REPO_SCHEMA = "repo_name string, repo_id string, url string, default_branch string"

ADO_BRANCHES = [("project", "1", "", "branch1", DAY_AGO)]
ADO_BRANCH_SCHEMA = (
    "repo_name string, repo_id string, url string, branch_name string, "
    "initial_commit_ts timestamp"
)

ADO_PRS = [
    ("project", "1", "", "pr-1", "active", DAY_AGO, None, "", 0, 0),
    ("project", "1", "", "pr-2", "active", DAY_AGO, None, "", 0, 0),
    ("project", "1", "", "pr-3", "completed", None, _dt(2026, 1, 1), "", 0, 0),
    ("project", "1", "", "pr-4", "completed", None, _dt(2026, 1, 1), "", 0, 0),
]
ADO_PR_SCHEMA = (
    "repo_name string, repo_id string, url string, pr_id string, status string, "
    "created_at timestamp, closed_at timestamp, source_ref string, "
    "additions int, deletions int"
)

_ADO_REPO = (
    ("vcs.repository.name", "project"),
    ("vcs.repository.id", "1"),
    ("vcs.repository.url.full", ""),
)
_ADO_HEAD = (("vcs.ref.head.name", ""), ("vcs.ref.head.type", "branch"))

ADO_EXPECTED = Counter(
    {
        ("vcs.repository.count", 1, frozenset()): 1,
        ("vcs.ref.count", 1, frozenset({("vcs.ref.head.type", "branch"), *_ADO_REPO})): 1,
        ("vcs.ref.time", 86400, frozenset({("vcs.ref.head.name", "branch1"), ("vcs.ref.head.type", "branch"), *_ADO_REPO})): 1,
        ("vcs.change.duration", 86400, frozenset({("vcs.change.state", "open"), ("vcs.ref.head.name", ""), *_ADO_REPO})): 2,
        ("vcs.change.time_to_merge", 9223372036, frozenset({("vcs.ref.head.name", ""), *_ADO_REPO})): 2,
        ("vcs.ref.lines_delta", 0, frozenset({("vcs.line_change.type", "added"), *_ADO_HEAD, *_ADO_REPO})): 4,
        ("vcs.ref.lines_delta", 0, frozenset({("vcs.line_change.type", "removed"), *_ADO_HEAD, *_ADO_REPO})): 4,
    }
)

# the golden was generated with vcs.change.count disabled (absent from the
# YAML despite nonzero open/merged counts)
ADO_GOLDEN_METRICS = ADO_DEFAULT_METRICS - {"vcs.change.count"}


def _ado_scrape(spark, repos, branches, prs, **kw):
    return azuredevops_scrape_metrics(
        spark.createDataFrame(repos, ADO_REPO_SCHEMA),
        spark.createDataFrame(branches, ADO_BRANCH_SCHEMA),
        spark.createDataFrame(prs, ADO_PR_SCHEMA),
        org="project",
        now=NOW,
        **kw,
    )


def test_azuredevops_happy_path_golden(spark):
    rows = _ado_scrape(
        spark, ADO_REPOS, ADO_BRANCHES, ADO_PRS, enabled=ADO_GOLDEN_METRICS
    ).collect()
    got = Counter(
        (r["metric_name"], r["value"], frozenset(r["attrs"].items())) for r in rows
    )
    assert got == ADO_EXPECTED
    for r in rows:
        assert r["resource"] == {
            "organization.name": "project",
            "vcs.vendor.name": "azuredevops",
        }


def test_azuredevops_no_projects_golden(spark):
    """expected_no_projects.yaml is `--- {}`: the getRepositories error path
    (azuredevops_scraper.go:133-137) emits NOTHING — not even a zero count."""
    rows = _ado_scrape(spark, [], [], [], enabled=frozenset()).collect()
    assert rows == []


def test_azuredevops_change_count_emit_only_if_positive(spark):
    """Current-code rule (azuredevops_scraper.go:273-278): change.count only
    for states with >0 PRs; 'abandoned' PRs are skipped entirely."""
    prs = [
        ("project", "1", "", "pr-1", "active", DAY_AGO, None, "feat", 1, 2),
        ("project", "1", "", "pr-9", "abandoned", DAY_AGO, None, "x", 5, 5),
    ]
    rows = _ado_scrape(spark, ADO_REPOS, ADO_BRANCHES, prs).collect()
    counts = [
        (r["value"], dict(r["attrs"])["vcs.change.state"])
        for r in rows
        if r["metric_name"] == "vcs.change.count"
    ]
    assert counts == [(1, "open")]  # no merged row, no abandoned row


def test_azuredevops_deploy_and_work_item_sections(spark):
    """Optional snapshot sections mirror recordDeploymentMetrics
    (azuredevops_scraper.go:360-440: partiallySucceeded->failed, integer avg,
    max epoch) and recordWorkItemMetrics (work_items.go:232-316:
    closed->cycle_time, open->age, allowlisted tags only)."""
    deps = [
        ("svc-a", "Succeeded", _dt(2025, 12, 31, 0, 0, 0), _dt(2025, 12, 31, 0, 10, 0)),
        ("svc-a", "succeeded ", _dt(2025, 12, 31, 1, 0, 0), _dt(2025, 12, 31, 1, 0, 15)),
        ("svc-a", "partiallySucceeded", _dt(2025, 12, 31), _dt(2025, 12, 31, 2)),
        ("svc-a", "inProgress", None, None),  # non-final: skipped
    ]
    DEP_SCHEMA = "service string, status_raw string, started_ts timestamp, completed_ts timestamp"
    wis = [
        ("1", "Bug", "Closed", "alpha; zeta", _dt(2025, 12, 30), _dt(2025, 12, 31)),
        ("2", "Bug", "Active", "", _dt(2025, 12, 31), None),
    ]
    WI_SCHEMA = (
        "id string, wi_type string, state string, tags string, "
        "created_date timestamp, closed_date timestamp"
    )
    rows = azuredevops_scrape_metrics(
        spark.createDataFrame(ADO_REPOS, ADO_REPO_SCHEMA),
        spark.createDataFrame([], ADO_BRANCH_SCHEMA),
        spark.createDataFrame([], ADO_PR_SCHEMA),
        org="org",
        now=NOW,
        deployments=spark.createDataFrame(deps, DEP_SCHEMA),
        work_items=spark.createDataFrame(wis, WI_SCHEMA),
        environment="prod",
        project="proj",
        tag_allowlist=("alpha",),
    ).collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r["metric_name"], []).append(
            (r["value"], frozenset(r["attrs"].items()))
        )
    dep = lambda status=None: frozenset(  # noqa: E731
        [("service.name", "svc-a"), ("deployment.environment.name", "prod")]
        + ([("deployment.status", status)] if status else [])
    )
    assert sorted(by_metric["deploy.deployment.count"]) == [
        (1, dep("failed")),
        (2, dep("succeeded")),
    ]
    # integer avg: (600 + 15) / 2 = 307 (truncated)
    assert by_metric["deploy.deployment.average_duration"] == [(307, dep())]
    last = dict((f, v) for v, f in by_metric["deploy.deployment.last_timestamp"])
    assert last[dep("succeeded")] == int(_dt(2025, 12, 31, 1, 0, 15).timestamp())
    assert last[dep("failed")] == int(_dt(2025, 12, 31, 2).timestamp())
    wi_counts = sorted(
        (v, dict(f)["work_item.type"], dict(f)["work_item.state"])
        for v, f in by_metric["work_item.count"]
    )
    assert wi_counts == [(1, "Bug", "Active"), (1, "Bug", "Closed")]
    assert by_metric["work_item.cycle_time"] == [
        (86400, frozenset({("work_item.id", "1"), ("work_item.type", "Bug"), ("project.name", "proj")}))
    ]
    assert by_metric["work_item.age"] == [
        (86400, frozenset({("work_item.id", "2"), ("work_item.type", "Bug"), ("work_item.state", "Active"), ("project.name", "proj")}))
    ]
    assert by_metric["work_item.tag.count"] == [
        (1, frozenset({("work_item.tag", "alpha"), ("work_item.type", "Bug"), ("project.name", "proj")}))
    ]
