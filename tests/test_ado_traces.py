"""ADO webhook → span tests (S26 router + F4 gate + deterministic ids),
re-expressing the reference's example-{pipeline,stage,job}-event.json shapes
(receiver/azuredevopsreceiver/testdata/) compactly; id derivations verified
against the sha256 schemes of trace_event_handling.go:200-264."""

from __future__ import annotations

import hashlib
import json

from liatrio_otel_collector_spark.plans.ado_traces import (
    EVENT_JOB,
    EVENT_RUN,
    EVENT_STAGE,
    ado_trace_pipeline,
)


def _run_event(state="completed", run_id=5152):
    return json.dumps(
        {
            "eventType": EVENT_RUN,
            "resource": {
                "projectId": "proj-1",
                "runId": run_id,
                "run": {
                    "id": run_id,
                    "name": "20250903.1",
                    "state": state,
                    "result": "succeeded",
                    "createdDate": "2025-09-03T10:00:00Z",
                    "finishedDate": "2025-09-03T10:05:00Z",
                    "url": "https://dev.azure.com/org/proj/_apis/pipelines/55/runs/5152",
                    "pipeline": {"id": 55, "name": "build-pipe"},
                },
            },
            "resourceContainers": {"project": {"id": "proj-guid"}},
        }
    )


def _stage_event(state="completed", run_id=5152):
    return json.dumps(
        {
            "eventType": EVENT_STAGE,
            "resource": {
                "runId": run_id,
                "pipeline": {"id": 55, "name": "build-pipe"},
                "run": {
                    "id": run_id,
                    "createdDate": "2025-09-03T10:00:00Z",
                    "pipeline": {"id": 55, "name": "build-pipe"},
                },
                "stage": {
                    "id": "stage-guid-1",
                    "name": "Build",
                    "displayName": "Build Stage",
                    "state": state,
                    "result": "succeeded",
                    "startTime": "2025-09-03T10:00:30Z",
                    "finishTime": "2025-09-03T10:02:30Z",
                },
                "repositories": [
                    {
                        "url": "https://dev.azure.com/org/proj/_git/repo",
                        "type": "TfsGit",
                        "change": {
                            "author": {"name": "Dev One", "email": "dev@example.com"},
                            "message": "fix build",
                            "version": "abc123",
                        },
                    }
                ],
            },
            "resourceContainers": {"project": {"id": "proj-guid"}},
        }
    )


def _job_event(state="completed", run_id=5152, attempt=2, job="Compile"):
    return json.dumps(
        {
            "eventType": EVENT_JOB,
            "resource": {
                "runId": run_id,
                "pipeline": {"id": 55, "name": "build-pipe"},
                "run": {
                    "id": run_id,
                    "createdDate": "2025-09-03T10:00:00Z",
                    "pipeline": {"id": 55, "name": "build-pipe"},
                },
                "stage": {"id": "stage-guid-1", "name": "Build", "displayName": "Build Stage"},
                "job": {
                    "id": "job-guid",
                    "name": job,
                    "attempt": attempt,
                    "state": state,
                    "result": "succeeded",
                    "startTime": "2025-09-03T10:00:40Z",
                    "finishTime": "2025-09-03T10:01:40Z",
                },
                "repositories": [],
            },
            "resourceContainers": {"project": {"id": "proj-guid"}},
        }
    )


def _hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_ado_router_and_ids(spark):
    raw = spark.createDataFrame(
        [
            (1, _run_event()),
            (2, _stage_event()),
            (3, _job_event()),
            (4, _run_event(state="inProgress")),  # F4: dropped
            (5, _stage_event(state="inProgress")),  # F4: dropped
            (6, json.dumps({"eventType": "ms.vss-code.git-push-event"})),  # unsupported
        ],
        "ts long, body_raw string",
    )
    spans = {s["name"]: s for s in ado_trace_pipeline(raw).collect()}
    assert set(spans) == {"Pipeline Run: build-pipe", "Pipeline Stage: Build", "Pipeline Job: Compile"}

    trace = _hex("5152t")[:32]
    pipe_span = _hex("pipeline_55")[16:32]
    stage_span = _hex("stage_stage-guid-1")[16:32]
    job_span = _hex("51522Compile")[16:32]

    run = spans["Pipeline Run: build-pipe"]
    assert run["trace_id"] == trace
    assert run["span_id"] == pipe_span and run["parent_span_id"] == ""
    assert run["kind"] == 1
    assert run["resource"]["cicd.pipeline.run.url"] == (
        "https://dev.azure.com/org/proj/pipelines/55/runs/5152"
    )
    assert run["resource"]["vcs.vendor.name"] == "azuredevops"
    assert run["resource"]["cicd.pipeline.run.created_date"] == "2025-09-03T10:00:00Z"

    stage = spans["Pipeline Stage: Build"]
    assert stage["trace_id"] == trace
    assert stage["span_id"] == stage_span and stage["parent_span_id"] == pipe_span
    assert stage["resource"]["vcs.commit.author.name"] == "Dev One"
    assert stage["resource"]["azuredevops.project.id"] == "proj-guid"

    job = spans["Pipeline Job: Compile"]
    assert job["trace_id"] == trace
    assert job["span_id"] == job_span and job["parent_span_id"] == stage_span
    assert job["resource"]["cicd.pipeline.job.attempt"] == "2"
    # repositories empty -> no repo attrs, record still produced
    assert "vcs.repository.url.full" not in job["resource"]
