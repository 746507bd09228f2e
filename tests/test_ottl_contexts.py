"""OTTL span/datapoint contexts and the upstream editor functions
(merge_maps / truncate_all / replace_all_patterns / delete_matching_keys).

The reference distro ships the transformprocessor for ALL three signals
(/root/reference/config/manifest.yaml:40); its own config only exercises the
log context, so these tests pin the span/datapoint surface against the
upstream ottlfuncs semantics (insert/update/upsert merge, strings-only
truncation, key/value pattern rewrite, key-regex deletion)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from liatrio_otel_collector_spark import ottl
from liatrio_otel_collector_spark.ottl import OttlError


def _span_frame(spark):
    rows = [
        ("t1", "s1", "Pipeline Run: pipe-1", 1, {"env": "prod", "internal.debug": "x"},
         {"cicd.pipeline.name": "pipe-1", "cicd.pipeline.run.result": "failed", "env": "RES"}),
        ("t2", "s2", "Pipeline Stage: Deploy", 1, {"env": "dev"},
         {"cicd.pipeline.name": "pipe-2", "cicd.pipeline.run.result": "succeeded"}),
    ]
    return spark.createDataFrame(
        rows, "trace_id string, span_id string, name string, kind int, "
        "attrs map<string,string>, resource map<string,string>"
    )


def _chain(pcfg, ptype="transform"):
    return [("p0", ptype, pcfg)]


def _one(df, trace_id="t1"):
    return df.filter(F.col("trace_id") == trace_id).first()


class TestSpanContext:
    def test_set_name_and_status(self, spark):
        out = ottl.compile_chain(
            _span_frame(spark),
            _chain({"trace_statements": [
                'replace_pattern(span.name, "^Pipeline ", "")',
                'set(span.status.code, 2) where resource.attributes["cicd.pipeline.run.result"] == "failed"',
                'set(span.status.code, 1) where span.status.code == nil',
            ]}),
            signal="traces",
        )
        r1, r2 = _one(out, "t1"), _one(out, "t2")
        assert r1["name"] == "Run: pipe-1" and r1["status_code"] == 2
        assert r2["name"] == "Stage: Deploy" and r2["status_code"] == 1

    def test_span_attr_set_and_filter(self, spark):
        out = ottl.compile_chain(
            _span_frame(spark),
            _chain({"trace_statements": [
                'set(span.attributes["vendor"], "ado")',
            ]})
            + _chain({"traces": {"span": ['IsMatch(span.name, "Stage")']}}, "filter"),
            signal="traces",
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["trace_id"] == "t1"
        assert rows[0]["attrs"]["vendor"] == "ado"

    def test_legacy_context_relative_paths(self, spark):
        # pre-contexts transformprocessor spelling: bare `name`, `attributes`
        out = ottl.compile_chain(
            _span_frame(spark),
            _chain({"trace_statements": [{
                "context": "span",
                "statements": ['set(attributes["n"], name)'],
            }]}),
            signal="traces",
        )
        assert _one(out)["attrs"]["n"] == "Pipeline Run: pipe-1"

    def test_merge_maps_strategies(self, spark):
        for strategy, env, extra in (
            ("insert", "prod", True),   # keeps target's env, adds new keys
            ("upsert", "RES", True),    # source wins on conflict
            ("update", "RES", False),   # only existing keys rewritten
        ):
            out = ottl.compile_chain(
                _span_frame(spark),
                _chain({"trace_statements": [
                    f'merge_maps(span.attributes, resource.attributes, "{strategy}")',
                ]}),
                signal="traces",
            )
            a = _one(out)["attrs"]
            assert a["env"] == env, strategy
            assert ("cicd.pipeline.name" in a) == extra, strategy
            assert a.get("internal.debug") == "x", strategy

    def test_truncate_replace_delete(self, spark):
        out = ottl.compile_chain(
            _span_frame(spark),
            _chain({"trace_statements": [
                'merge_maps(span.attributes, resource.attributes, "insert")',
                'replace_all_patterns(span.attributes, "value", "^pipe-", "p/")',
                'replace_all_patterns(span.attributes, "key", "^cicd\\.pipeline\\.", "ci.")',
                'delete_matching_keys(span.attributes, "^internal\\.")',
                'truncate_all(span.attributes, 4)',
            ]}),
            signal="traces",
        )
        a = _one(out)["attrs"]
        assert a["ci.name"] == "p/1"
        assert a["ci.run.result"] == "fail"  # truncated to 4
        assert "internal.debug" not in a
        assert a["env"] == "prod"

    def test_replace_all_patterns_key_collision_first_wins(self, spark):
        # create_map fixes entry order (dict-built maps don't) — the
        # determinism contract is first-IN-ENTRY-ORDER wins
        df = spark.range(1).select(
            F.lit("t").alias("trace_id"),
            F.create_map(
                F.lit("a.x"), F.lit("1"), F.lit("b.x"), F.lit("2")
            ).alias("attrs"),
        )
        out = ottl.compile_chain(
            df,
            _chain({"trace_statements": [
                'replace_all_patterns(attributes, "key", "^[ab]\\.", "c.")',
            ]}),
            signal="traces",
        )
        a = out.first()["attrs"]
        assert a == {"c.x": "1"}  # entry-order first occurrence survives

    def test_wrong_context_rejected(self, spark):
        with pytest.raises(OttlError):
            ottl.extract_program(
                _chain({"trace_statements": [{"context": "log", "statements": ["set(body, nil)"]}]}),
                signal="traces",
            )

    def test_bad_status_path_rejected(self, spark):
        with pytest.raises(OttlError):
            ottl.parse_statement("set(span.status.bogus, 1)", context="span")

    def test_set_whole_map_rejected(self, spark):
        # set(span.attributes, "x") would replace the map with a scalar
        with pytest.raises(OttlError, match="whole attrs map|whole .* map"):
            ottl.compile_chain(
                _span_frame(spark),
                _chain({"trace_statements": ['set(span.attributes, "x")']}),
                signal="traces",
            )

    def test_unknown_pipeline_signal_refuses_ottl(self, spark):
        # an OTTL processor in a pipeline whose id is not logs/traces/metrics
        # must raise, not silently no-op under a guessed signal
        from liatrio_otel_collector_spark.confmap import (
            AssembleContext,
            ConfigError,
            assemble,
            load_config,
        )

        cfg = load_config(
            """
receivers:
  otlp: {}
processors:
  transform/x:
    trace_statements: ['set(span.attributes["k"], "v")']
exporters:
  debug: {}
service:
  pipelines:
    spans:
      receivers: [otlp]
      processors: [transform/x]
      exporters: [debug]
"""
        )
        with pytest.raises(ConfigError, match="logs/traces/metrics"):
            assemble(spark, cfg, AssembleContext(frames={"otlp": _span_frame(spark)}))

    def test_parsejson_rejected_outside_logs(self, spark):
        with pytest.raises(OttlError, match="log context"):
            ottl.compile_chain(
                _span_frame(spark),
                _chain({"trace_statements": ['set(attributes["x"], ParseJSON(name))']}),
                signal="traces",
            )

    def test_resource_context_group(self, spark):
        # a `context: resource` group is valid inside any signal's statement
        # list; bare `attributes` and qualified `resource.attributes` both
        # address the resource map
        out = ottl.compile_chain(
            _span_frame(spark),
            _chain({"trace_statements": [{
                "context": "resource",
                "statements": [
                    'set(attributes["collector"], "spark")',
                    'delete_matching_keys(resource.attributes, "^env$")',
                ],
            }]}),
            signal="traces",
        )
        r = _one(out)["resource"]
        assert r["collector"] == "spark" and "env" not in r
        assert r["cicd.pipeline.name"] == "pipe-1"
        # span columns untouched
        assert _one(out)["attrs"] == {"env": "prod", "internal.debug": "x"}

    def test_resource_context_bad_path_rejected(self, spark):
        with pytest.raises(OttlError):
            ottl.parse_statement('set(name, "x")', context="resource")

    def test_log_only_processor_is_noop_in_traces(self, spark):
        # a log_statements-only transform contributes nothing to a traces
        # pipeline — same as the collector's per-signal processor instances
        df = _span_frame(spark)
        out = ottl.compile_chain(
            df, _chain({"log_statements": ['set(log.attributes["x"], "y")']}), signal="traces"
        )
        assert _one(out)["attrs"] == {"env": "prod", "internal.debug": "x"}


class TestDatapointContext:
    def _frame(self, spark):
        return spark.createDataFrame(
            [("vcs.change.count", "{change}", 7, {"repository.name": "r1"}),
             ("vcs.ref.count", "{ref}", 3, {"repository.name": "r2"})],
            "metric_name string, metric_unit string, value_int long, attrs map<string,string>",
        )

    def test_set_and_filter(self, spark):
        out = ottl.compile_chain(
            self._frame(spark),
            _chain({"metric_statements": [
                'set(datapoint.attributes["metric"], metric.name)',
            ]})
            + _chain({"metrics": {"datapoint": ['IsMatch(metric.name, "ref")']}}, "filter"),
            signal="metrics",
        )
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["attrs"]["metric"] == "vcs.change.count"

    def test_value_int_condition(self, spark):
        out = ottl.compile_chain(
            self._frame(spark),
            _chain({"metric_statements": [
                'set(datapoint.attributes["big"], "yes") where value_int == 7',
            ]}),
            signal="metrics",
        )
        by_name = {r["metric_name"]: r["attrs"] for r in out.collect()}
        assert by_name["vcs.change.count"].get("big") == "yes"
        assert "big" not in by_name["vcs.ref.count"]

    def test_relational_operators(self, spark):
        out = ottl.compile_chain(
            self._frame(spark),
            _chain({"metric_statements": [
                'set(datapoint.attributes["gt"], "y") where value_int > 3',
                'set(datapoint.attributes["le"], "y") where value_int <= 3',
                'set(datapoint.attributes["ge7"], "y") where value_int >= 7',
            ]}),
            signal="metrics",
        )
        by_name = {r["metric_name"]: r["attrs"] for r in out.collect()}
        a7, a3 = by_name["vcs.change.count"], by_name["vcs.ref.count"]
        assert a7.get("gt") == "y" and "le" not in a7 and a7.get("ge7") == "y"
        assert "gt" not in a3 and a3.get("le") == "y" and "ge7" not in a3

    def test_converters(self, spark):
        out = ottl.compile_chain(
            self._frame(spark),
            _chain({"metric_statements": [
                'set(datapoint.attributes["len"], Len(metric.name))',
                'set(datapoint.attributes["sub"], Substring(metric.name, 4, 6))',
                'set(datapoint.attributes["dbl"], Double(value_int))',
                'set(datapoint.attributes["bad"], Int("not-a-number"))',
                'set(datapoint.attributes["s"], String(value_int))',
            ]}),
            signal="metrics",
        )
        a = {r["metric_name"]: r["attrs"] for r in out.collect()}["vcs.change.count"]
        assert a["len"] == "16"          # len("vcs.change.count")
        assert a["sub"] == "change"      # 0-based start=4, length 6
        assert a["dbl"] == "7.0"
        assert "bad" not in a            # Int("junk") -> nil -> set is a no-op
        assert a["s"] == "7"


@settings(max_examples=15, deadline=None)
@given(
    target=st.dictionaries(st.sampled_from("abcde"), st.text("xy", max_size=3), max_size=4),
    source=st.dictionaries(st.sampled_from("abcde"), st.text("xy", max_size=3), max_size=4),
    strategy=st.sampled_from(["insert", "update", "upsert"]),
)
def test_merge_maps_model(spark, target, source, strategy):
    """merge_maps == the upstream ottlfuncs dict model for every strategy."""
    if strategy == "insert":
        expect = {**source, **target}
    elif strategy == "update":
        expect = {k: source.get(k, v) for k, v in target.items()}
    else:
        expect = {**target, **source}
    df = spark.createDataFrame(
        [(target, source)], "attrs map<string,string>, resource map<string,string>"
    )
    out = ottl.compile_chain(
        df,
        [("p0", "transform", {"trace_statements": [
            f'merge_maps(attributes, resource.attributes, "{strategy}")',
        ]})],
        signal="traces",
    )
    assert (out.first()["attrs"] or {}) == expect
