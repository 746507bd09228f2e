"""Malformed-webhook robustness: the Go receivers reject unparseable or
unknown payloads with HTTP 400 (trace_receiver.go parse/dispatch errors);
the Spark plans must express the same as DROPPED ROWS — never a job failure,
never a span row with null ids."""

from __future__ import annotations

import pytest

from liatrio_otel_collector_spark.plans.actions_traces import actions_webhook_spans
from liatrio_otel_collector_spark.plans.ado_traces import ado_trace_pipeline

BAD_PAYLOADS = [
    "not json at all {{{",
    "",
    "42",
    '{"eventType": null}',
    '{"unexpected": {"shape": [1,2,3]}}',
    '{"workflow_job": "a string, not an object"}',
]


@pytest.mark.parametrize("payload", BAD_PAYLOADS)
def test_actions_malformed_dropped(spark, payload):
    raw = spark.createDataFrame(
        [("workflow_job", payload), ("workflow_run", payload)],
        "event_type string, payload string",
    )
    assert actions_webhook_spans(raw).count() == 0


@pytest.mark.parametrize("payload", BAD_PAYLOADS)
def test_ado_malformed_dropped(spark, payload):
    raw = spark.createDataFrame([(payload,)], "body_raw string")
    assert ado_trace_pipeline(raw).count() == 0


def test_actions_partial_payload_no_null_ids(spark):
    """A syntactically valid but incomplete completed-job payload still
    yields well-formed span ids (Go getters return zero values; sha256 over
    them is still deterministic)."""
    payload = '{"workflow_job": {"status": "completed", "steps": []}}'
    raw = spark.createDataFrame(
        [("workflow_job", payload)], "event_type string, payload string"
    )
    rows = actions_webhook_spans(raw).collect()
    assert len(rows) == 1  # parent span only, no steps
    assert rows[0]["trace_id"] and rows[0]["span_id"]
    assert rows[0]["status_code"] == 1  # vacuous all-successful over zero steps
