"""Tracing analogue tests (reference: task/bq2bq/telemetry.go)."""

import json
import os

import pytest

from transformers_spark import tracing
from transformers_spark.tracing import (
    InitTelemetryError,
    current_traceparent,
    init_telemetry,
    start_child_span,
)


@pytest.fixture(autouse=True)
def _clean_provider():
    yield
    tracing._provider = None
    tracing._stack.spans = []


def _read_spans(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh]


def test_disabled_tracing_is_noop():
    shutdown = init_telemetry("")
    with start_child_span("GenerateDestination") as span:
        span.set_attribute("k", "v")  # must not raise
        span.add_event("cache hit")
    shutdown()
    assert tracing._provider is None


def test_spans_nest_and_flush_on_shutdown(tmp_path):
    sink = str(tmp_path / "trace.jsonl")
    shutdown = init_telemetry(sink)
    with start_child_span("GenerateDependencies") as parent:
        parent.add_event("Request found in cache")
        with start_child_span("FindDependenciesWithRegex") as child:
            child.set_attribute("n_dependencies", 3)
    shutdown()
    spans = _read_spans(sink)
    assert [s["name"] for s in spans] == [
        "FindDependenciesWithRegex",  # child ends (and exports) first
        "GenerateDependencies",
    ]
    child, parent = spans
    assert child["parent_span_id"] == parent["span_id"]
    assert child["trace_id"] == parent["trace_id"]
    assert parent["events"][0]["name"] == "Request found in cache"
    assert child["attributes"] == {"n_dependencies": 3}
    assert parent["resource"]["service.name"] == "transformers-spark"
    assert all(s["end_time_ns"] >= s["start_time_ns"] for s in spans)


def test_exception_marks_span_error(tmp_path):
    sink = str(tmp_path / "trace.jsonl")
    shutdown = init_telemetry(sink)
    with pytest.raises(ValueError):
        with start_child_span("Transform"):
            raise ValueError("boom")
    shutdown()
    (span,) = _read_spans(sink)
    assert span["status"] == "ERROR"
    assert span["events"][0]["attributes"]["exception.message"] == "boom"


def test_upstream_traceparent_is_adopted(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "TRACEPARENT", "00-" + "ab" * 16 + "-" + "cd" * 8 + "-01"
    )
    sink = str(tmp_path / "trace.jsonl")
    shutdown = init_telemetry(sink)
    with start_child_span("Transform"):
        tp = current_traceparent()
    shutdown()
    (span,) = _read_spans(sink)
    assert span["trace_id"] == "ab" * 16
    assert span["parent_span_id"] == "cd" * 8  # root joins upstream
    assert tp.startswith("00-" + "ab" * 16 + "-" + span["span_id"])


def test_bad_sink_fails_at_init(tmp_path):
    with pytest.raises(InitTelemetryError):
        init_telemetry(str(tmp_path / "nodir" / "trace.jsonl"))


def test_dependency_resolver_emits_cache_event(tmp_path):
    from transformers_spark.plans.dependencies import DependencyResolver

    sink = str(tmp_path / "trace.jsonl")
    shutdown = init_telemetry(sink)
    r = DependencyResolver()
    sql = "SELECT * FROM `proj.data.src`"
    r.resolve(sql)
    r.resolve(sql)  # second call hits the cache
    shutdown()
    spans = _read_spans(sink)
    deps_spans = [s for s in spans if s["name"] == "GenerateDependencies"]
    assert len(deps_spans) == 2
    assert deps_spans[0]["events"] == []
    assert deps_spans[1]["events"][0]["name"] == "Request found in cache"
    regex_spans = [s for s in spans if s["name"] == "FindDependenciesWithRegex"]
    assert len(regex_spans) == 1  # cached call never re-resolves
    assert regex_spans[0]["parent_span_id"] == deps_spans[0]["span_id"]
