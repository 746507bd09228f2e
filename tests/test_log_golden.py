"""Golden-parity tests for the logs pipeline:

- gitlabprocessor enrich golden: processor/gitlabprocessor/testdata/
  input_logs.yaml → expected_logs.yaml (+ negative: missing key untouched,
  input_logs_missing_repo.yaml / processor_test.go:54-97)
- OTTL chain semantics from config/config.yaml:79-108
- include classification X13 (processor.go:135-169)
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from liatrio_otel_collector_spark.plans.logs import (
    classify_includes,
    gitlab_enrich,
    log_pipeline,
    ottl_filter_pipeline_events,
    ottl_parse_body,
    ottl_promote_attrs,
)

LOG_SCHEMA = "ts long, severity_text string, body_str string, attrs map<string,string>"


def _input_log(attrs):
    # input_logs.yaml: timeUnixNano 1647436595447000000, severity info,
    # body "Pipeline execution started"
    return (1647436595447000000, "info", "Pipeline execution started", attrs)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "repo_name string, revision string, components map<string,string>"
    )


def test_gitlab_enrich_golden(spark):
    """expected_logs.yaml: one component.<path>.version attribute added."""
    logs = spark.createDataFrame(
        [_input_log({"vcs.repository.name": "test/repo", "vcs.ref.head.revision": "abc123"})],
        LOG_SCHEMA,
    )
    dim = _dim(
        spark,
        [("test/repo", "abc123", {"example-org/pipeline-components/components/test": "1.0.0"})],
    )
    [r] = gitlab_enrich(logs, dim).collect()
    assert r["attrs"] == {
        "vcs.repository.name": "test/repo",
        "vcs.ref.head.revision": "abc123",
        "component.example-org/pipeline-components/components/test.version": "1.0.0",
    }
    assert r["ts"] == 1647436595447000000
    assert r["severity_text"] == "info"
    assert r["body_str"] == "Pipeline execution started"


def test_gitlab_enrich_missing_key_untouched(spark):
    """input_logs_missing_repo.yaml / expected_logs_no_includes.yaml: a record
    without the lookup keys passes through unmodified."""
    attrs = {"vcs.ref.head.revision": "abc123"}  # repo name missing
    logs = spark.createDataFrame([_input_log(attrs)], LOG_SCHEMA)
    dim = _dim(spark, [("test/repo", "abc123", {"x": "1"})])
    [r] = gitlab_enrich(logs, dim).collect()
    assert r["attrs"] == attrs


def test_gitlab_enrich_no_match_untouched(spark):
    attrs = {"vcs.repository.name": "other/repo", "vcs.ref.head.revision": "zzz"}
    logs = spark.createDataFrame([_input_log(attrs)], LOG_SCHEMA)
    dim = _dim(spark, [("test/repo", "abc123", {"x": "1"})])
    [r] = gitlab_enrich(logs, dim).collect()
    assert r["attrs"] == attrs


def _pipeline_body(kind="pipeline"):
    return json.dumps(
        {
            "object_kind": kind,
            "project": {
                "id": 42,
                "name": "My Project",
                "namespace": "my-group",
                "path_with_namespace": "my-group/my-project",
                "web_url": "https://gitlab.com/my-group/my-project",
                "secret_field": "DROP-ME",
            },
            "object_attributes": {
                "id": 1001,
                "ref": "main",
                "sha": "abc123",
                "url": "https://gitlab.com/my-group/my-project/-/pipelines/1001",
                "status": "success",
                "noise": "DROP-ME",
            },
        }
    )


def test_ottl_chain(spark):
    """config.yaml:80-108: parse → filter non-pipeline → keep_keys + promote."""
    raw = spark.createDataFrame(
        [
            (1, _pipeline_body("pipeline")),
            (2, _pipeline_body("push")),
            (3, _pipeline_body("note")),
            (4, None),
        ],
        "ts long, body_raw string",
    )
    parsed = ottl_parse_body(raw)
    assert parsed.filter(F.col("body").isNotNull()).count() == 3
    filtered = ottl_filter_pipeline_events(parsed)
    assert filtered.count() == 1
    [r] = ottl_promote_attrs(filtered).collect()
    assert r["attrs"] == {
        "event.name": "pipeline_42_1001",
        "vcs.repository.owner": "my-group",
        "vcs.repository.url.full": "https://gitlab.com/my-group/my-project",
        "vcs.ref.head.name": "main",
        "vcs.ref.head.revision": "abc123",
        "vcs.repository.name": "my-group/my-project",
        "vcs.repository.id": "42",
    }
    assert r["resource"] == {"service.namespace": "gitlab", "service.name": "My Project"}
    # keep_keys: pruned fields never survive the parse
    assert "secret_field" not in r["body"].asDict()["project"].asDict()


def test_full_log_pipeline(spark):
    raw = spark.createDataFrame(
        [(1, _pipeline_body("pipeline")), (2, _pipeline_body("push"))],
        "ts long, body_raw string",
    )
    dim = _dim(spark, [("my-group/my-project", "abc123", {"comps/test": "2.0.0"})])
    out = log_pipeline(raw, dim).collect()
    assert len(out) == 1
    assert out[0]["attrs"]["component.comps/test.version"] == "2.0.0"


def test_classify_includes(spark):
    """X13 (processor.go:135-169): component / file / local include kinds."""
    rows = [
        ("component", "gitlab.com/org/comps/deploy@1.2.3", None),
        (
            "file",
            "/templates/build.yml",
            "https://gitlab.com/org/templates/-/blob/deadbeef/templates/build.yml",
        ),
        (
            "local",
            "ci/local.yml",
            "https://gitlab.com/org/myrepo/-/blob/cafe1234/ci/local.yml",
        ),
        ("component", "malformed-no-at", None),
    ]
    df = spark.createDataFrame(rows, "include_type string, location string, blob string")
    got = {
        r["component_name"]: r["component_version"] for r in classify_includes(df).collect()
    }
    assert got == {
        "org/comps/deploy": "1.2.3",
        "org/templates/templates/build.yml": "deadbeef",
        "org/myrepo/ci/local.yml": "local",
    }
