"""Distributed-tracing analogue of the reference's OpenTelemetry setup
(reference: task/bq2bq/telemetry.go:16-41 ``InitTelemetry`` — Jaeger
exporter, batched span processor, W3C TraceContext propagation — and
telemetry.go:68-72 ``StartChildSpan``, used around destination/
dependency generation in main.go:184,208,371,440,466).

The OTel SDK isn't a dependency here, so the same architecture is
built from the stdlib:

* a global ``TracerProvider`` holding a batched exporter — spans
  buffer in memory and flush in batches (the ``WithBatcher``
  discipline; an OTLP/Jaeger HTTP exporter drops into
  :class:`JsonFileExporter`'s slot unchanged when the collector
  endpoint and client exist),
* a resource block stamped on every span (``service.name`` /
  ``service.version`` — the semconv attributes the reference sets),
* W3C ``traceparent`` propagation INBOUND via the ``TRACEPARENT`` env
  var (the scheduler/container boundary — the reference's composite
  TextMap propagator receives trace context from upstream Optimus the
  same way) and OUTBOUND via :func:`current_traceparent` for anything
  the task itself shells out to,
* ``start_child_span`` — a context manager; nesting derives from a
  thread-local span stack, so concurrent tasks in one session trace
  independently (same property the Go context tree gives).

Spans record wall-clock start/end (ns), status, attributes, and
events (``add_event`` ≙ ``span.AddEvent``, e.g. the dependency-cache
hit in main.go:217). When tracing was never initialized, the span
API is a no-op: ``start_child_span`` costs one thread-local read —
safe to leave instrumented in hot paths.
"""

from __future__ import annotations

import json
import os
import secrets
import threading
import time
from dataclasses import dataclass, field

__all__ = [
    "InitTelemetryError",
    "init_telemetry",
    "start_child_span",
    "current_traceparent",
    "Span",
]

SERVICE_NAME = "transformers-spark"
SERVICE_VERSION = "2.0"
_BATCH_SIZE = 64

_TRACEPARENT_ENV = "TRACEPARENT"


class InitTelemetryError(RuntimeError):
    """Raised when the tracing address can't be opened (the reference
    surfaces the equivalent Jaeger-exporter construction error)."""


def _rand_hex(nbytes: int) -> str:
    return secrets.token_hex(nbytes)


def _parse_traceparent(value: str) -> tuple[str, str] | None:
    """``version-traceid-parentid-flags`` → (trace_id, parent_id)."""
    parts = value.strip().split("-")
    if len(parts) != 4:
        return None
    _, trace_id, parent_id, _ = parts
    if len(trace_id) != 32 or len(parent_id) != 16:
        return None
    try:
        int(trace_id, 16), int(parent_id, 16)
    except ValueError:
        return None
    return trace_id, parent_id


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_id: str | None
    start_ns: int
    end_ns: int | None = None
    status: str = "OK"
    attributes: dict = field(default_factory=dict)
    events: list = field(default_factory=list)

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value

    def add_event(self, name: str, attributes: dict | None = None) -> None:
        self.events.append(
            {"name": name, "time_ns": time.time_ns(), "attributes": attributes or {}}
        )

    def record_exception(self, exc: BaseException) -> None:
        self.status = "ERROR"
        self.add_event(
            "exception",
            {"exception.type": type(exc).__name__, "exception.message": str(exc)},
        )

    def to_dict(self, resource: dict) -> dict:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "parent_span_id": self.parent_id,
            "start_time_ns": self.start_ns,
            "end_time_ns": self.end_ns,
            "status": self.status,
            "attributes": self.attributes,
            "events": self.events,
            "resource": resource,
        }


class _NoopSpan:
    """Returned when tracing is off — every method is a no-op."""

    __slots__ = ()

    def set_attribute(self, key, value) -> None:
        pass

    def add_event(self, name, attributes=None) -> None:
        pass

    def record_exception(self, exc) -> None:
        pass


_NOOP = _NoopSpan()


class JsonFileExporter:
    """Batched JSON-lines span sink. The file path is the analogue of
    the Jaeger collector endpoint; an HTTP exporter implements the same
    two methods against a network client."""

    def __init__(self, path: str) -> None:
        try:
            # open eagerly so a bad path fails at init (telemetry.go:22
            # returns the exporter error from InitTelemetry, not later)
            self._fh = open(path, "a", encoding="utf-8")
        except OSError as exc:
            raise InitTelemetryError(f"cannot open trace sink {path!r}: {exc}") from exc

    def export(self, batch: list[dict]) -> None:
        for span in batch:
            self._fh.write(json.dumps(span, separators=(",", ":")) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class TracerProvider:
    def __init__(self, exporter: JsonFileExporter) -> None:
        self._exporter = exporter
        self._resource = {
            "service.name": SERVICE_NAME,
            "service.version": SERVICE_VERSION,
        }
        self._buffer: list[dict] = []
        self._lock = threading.Lock()
        upstream = _parse_traceparent(os.environ.get(_TRACEPARENT_ENV, ""))
        self.trace_id = upstream[0] if upstream else _rand_hex(16)
        self.root_parent_id = upstream[1] if upstream else None

    def on_end(self, span: Span) -> None:
        with self._lock:
            self._buffer.append(span.to_dict(self._resource))
            if len(self._buffer) >= _BATCH_SIZE:
                batch, self._buffer = self._buffer, []
            else:
                return
        self._exporter.export(batch)

    def shutdown(self) -> None:
        with self._lock:
            batch, self._buffer = self._buffer, []
        if batch:
            self._exporter.export(batch)
        self._exporter.close()


_provider: TracerProvider | None = None
_stack = threading.local()


def init_telemetry(tracing_addr: str | None):
    """Install the global tracer and return a shutdown callable —
    exactly the ``InitTelemetry(l, tracingAddr) (func(), error)``
    contract (telemetry.go:16-41): empty address → tracing stays off
    and the returned callable is a no-op."""
    global _provider
    if not tracing_addr:
        return lambda: None
    provider = TracerProvider(JsonFileExporter(tracing_addr))
    _provider = provider

    def shutdown() -> None:
        global _provider
        provider.shutdown()
        if _provider is provider:
            _provider = None

    return shutdown


def _span_stack() -> list:
    stack = getattr(_stack, "spans", None)
    if stack is None:
        stack = _stack.spans = []
    return stack


class _SpanContext:
    __slots__ = ("_name", "_span")

    def __init__(self, name: str) -> None:
        self._name = name
        self._span: Span | _NoopSpan = _NOOP

    def __enter__(self):
        provider = _provider
        if provider is None:
            return _NOOP
        stack = _span_stack()
        parent = stack[-1].span_id if stack else provider.root_parent_id
        self._span = Span(
            name=self._name,
            trace_id=provider.trace_id,
            span_id=_rand_hex(8),
            parent_id=parent,
            start_ns=time.time_ns(),
        )
        stack.append(self._span)
        return self._span

    def __exit__(self, exc_type, exc, tb):
        span = self._span
        if span is _NOOP:
            return False
        stack = _span_stack()
        if stack and stack[-1] is span:
            stack.pop()
        if exc is not None:
            span.record_exception(exc)
        span.end_ns = time.time_ns()
        provider = _provider
        if provider is not None:
            provider.on_end(span)
        return False


def start_child_span(name: str) -> _SpanContext:
    """``with start_child_span("GenerateDependencies") as span:`` —
    the ``StartChildSpan(ctx, name)`` analogue (telemetry.go:68-72);
    the thread-local stack supplies what Go's ctx threading does."""
    return _SpanContext(name)


def current_traceparent() -> str | None:
    """W3C traceparent for the innermost live span — hand this to
    subprocesses/services the task calls so their spans join this
    trace (outbound half of the composite propagator)."""
    provider = _provider
    if provider is None:
        return None
    stack = _span_stack()
    span_id = stack[-1].span_id if stack else provider.root_parent_id
    if span_id is None:
        span_id = _rand_hex(8)
    return f"00-{provider.trace_id}-{span_id}-01"
