"""Structured Streaming operators: windowed counts + custom stateful
sessionization, driven with availableNow triggers over file sources."""

import pytest
from pyspark.sql import functions as F

from transformers_spark.streaming import (
    run_available_now,
    sessionize,
    streaming_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Micros-precision copy of the events sample as a streaming source
    directory (the raw file is nanos, which Spark can't stream)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    from transformers_spark.sources.testdata import load_table

    load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_streaming_event_counts_matches_batch(spark, events_dir):
    sdf = streaming_event_counts(spark, events_dir, window="1 day")
    result = run_available_now(sdf, "stream_counts", output_mode="complete")
    streamed = {
        (str(r["window_start"]), r["event_type"]): r["n_events"] for r in result.collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {(str(r["win"]["start"]), r["event_type"]): r["n"] for r in batch}
    assert streamed == expected
    assert len(streamed) > 0


def test_sessionize_bounded_state(spark, events_dir):
    sdf = sessionize(spark, events_dir)
    result = run_available_now(sdf, "stream_sessions", output_mode="append")
    rows = result.collect()
    # closed sessions only (final per-user open session stays in state);
    # every emitted session must respect the gap invariant
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    assert len(rows) > 0


def test_sessionize_event_time_timeout(spark, events_dir):
    """EventTimeTimeout closes idle sessions as the watermark advances
    with the data — more sessions emitted than the no-timeout drain,
    without any wall-clock waiting."""
    base = run_available_now(
        sessionize(spark, events_dir), "sess_none2", output_mode="append"
    ).collect()
    evt = run_available_now(
        sessionize(spark, events_dir, timeout="event", max_files_per_trigger=1),
        "sess_event",
        output_mode="append",
    ).collect()
    for r in evt:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    # watermark-driven closes can only add sessions vs the no-timeout run
    assert len(evt) >= len(base)


def test_streaming_distinct_matches_batch(spark, events_dir):
    from transformers_spark.streaming.windows import streaming_distinct

    got = sorted(
        (r["user_id"], r["event_type"])
        for r in run_available_now(
            streaming_distinct(spark, events_dir), "stream_dd", output_mode="append"
        ).collect()
    )
    want = sorted(
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(events_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    assert got == want


def test_streaming_distinct_within_watermark_bounded_state(spark, events_dir):
    """The watermarked variant keeps bounded state; its emissions are a
    superset of the distinct set (late re-emits allowed), and every
    distinct key appears."""
    from transformers_spark.streaming.windows import streaming_distinct

    rows = run_available_now(
        streaming_distinct(spark, events_dir, watermark="1 hour"),
        "stream_ddw",
        output_mode="append",
    ).collect()
    got = {(r["user_id"], r["event_type"]) for r in rows}
    want = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(events_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want
    assert len(rows) >= len(want)


def test_stream_stream_join_interval_boundaries(spark, tmp_path):
    """Inclusive [view_ts, view_ts + 1h] window: a purchase exactly at
    +1h matches, one microsecond later does not; cross-user never."""
    from datetime import datetime

    from transformers_spark.streaming.windows import (
        EVENT_SCHEMA,
        streaming_view_purchase_join,
    )

    t = datetime.fromisoformat
    rows = [
        (1, t("2024-01-01 10:00:00"), 7, "view", 0.0),
        (2, t("2024-01-01 11:00:00"), 7, "purchase", 1.0),   # exactly +1h
        (3, t("2024-01-01 11:00:00.000001"), 7, "purchase", 1.0),  # 1us late
        (4, t("2024-01-01 09:59:59"), 7, "purchase", 1.0),   # before the view
        (5, t("2024-01-01 10:30:00"), 8, "purchase", 1.0),   # other user
    ]
    src = str(tmp_path / "ssj")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(src)
    sdf = streaming_view_purchase_join(spark, src)
    out = run_available_now(sdf, "ssj_test", output_mode="append").collect()
    assert [(r["view_id"], r["purchase_id"], r["lag_us"]) for r in out] == [
        (1, 2, 3_600_000_000)
    ]


def test_stream_into_table_append_and_replay_tag(spark, events_dir, tmp_path):
    """foreachBatch sink: the stream lands in the engine's managed
    partitioned table via Writer.append, rows carry the micro-batch id
    (the replay-dedup hook), and a second drain with the SAME
    checkpoint writes nothing new (no re-delivery)."""
    from transformers_spark.catalog import PartitionKind, PartitionSpec
    from transformers_spark.engine import Engine
    from transformers_spark.streaming import stream_into_table
    from transformers_spark.streaming.windows import EVENT_SCHEMA

    eng = Engine(spark)
    fqn = "g-project.playground.stream_sink_dest"
    eng.catalog.create_table(
        fqn,
        [("event_id", "bigint"), ("ts", "timestamp"), ("value", "double"),
         ("_batch_id", "bigint")],
        PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="ts"),
    )
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir).select(
        "event_id", "ts", "value"
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_into_table(sdf, eng.writer, fqn, "sink_test", ckpt)
    q.awaitTermination()
    dest = eng.catalog.read(fqn)
    n_src = spark.read.schema(EVENT_SCHEMA).parquet(events_dir).count()
    assert dest.count() == n_src
    assert dest.filter(F.col("_batch_id").isNotNull()).count() == n_src
    assert dest.select("dt").distinct().count() > 1  # partitioned by day

    # same checkpoint: everything already committed -> no new rows
    q2 = stream_into_table(sdf, eng.writer, fqn, "sink_test2", ckpt)
    q2.awaitTermination()
    assert eng.catalog.read(fqn).count() == n_src


def test_stream_into_table_dynamic_overwrite_idempotent(spark, events_dir, tmp_path):
    """overwrite_dynamic sink: replaying the same micro-batch data with
    a FRESH checkpoint replaces the same day-partitions instead of
    duplicating them — per-batch idempotence under at-least-once
    delivery."""
    from transformers_spark.catalog import PartitionKind, PartitionSpec
    from transformers_spark.engine import Engine
    from transformers_spark.streaming import stream_into_table
    from transformers_spark.streaming.windows import EVENT_SCHEMA

    eng = Engine(spark)
    fqn = "g-project.playground.stream_sink_dyn_dest"
    eng.catalog.create_table(
        fqn,
        [("event_id", "bigint"), ("ts", "timestamp"), ("value", "double")],
        PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="ts"),
    )
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir).select(
        "event_id", "ts", "value"
    )
    n_src = spark.read.schema(EVENT_SCHEMA).parquet(events_dir).count()
    for i in range(2):  # fresh checkpoint each time = full replay
        q = stream_into_table(
            sdf, eng.writer, fqn, f"sink_dyn_{i}", str(tmp_path / f"ckpt{i}"),
            mode="overwrite_dynamic",
        )
        q.awaitTermination()
        assert eng.catalog.read(fqn).count() == n_src  # replaced, not doubled


def test_stream_into_table_guards(spark, events_dir, tmp_path):
    """Sink misconfiguration fails at start(), and a day-partition
    straddling two micro-batches raises instead of silently losing the
    earlier batch's rows."""
    from transformers_spark.catalog import PartitionKind, PartitionSpec
    from transformers_spark.engine import Engine
    from transformers_spark.streaming import stream_into_table
    from transformers_spark.streaming.windows import EVENT_SCHEMA

    eng = Engine(spark)
    fqn = "g-project.playground.stream_guard_dest"
    eng.catalog.create_table(
        fqn,
        [("event_id", "bigint"), ("ts", "timestamp"), ("value", "double")],
        PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="ts"),
    )
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir).select(
        "event_id", "ts", "value"
    )
    # append with a batch-id column the table lacks -> loud, at start
    with pytest.raises(ValueError, match="batch_id_col"):
        stream_into_table(sdf, eng.writer, fqn, "g1", str(tmp_path / "c1"))
    # file-at-a-time drain over a round-robin multi-file copy: every
    # day spans several source files, so the second micro-batch must
    # trip the partition-clobber guard
    multi_dir = str(tmp_path / "multi")
    spark.read.schema(EVENT_SCHEMA).parquet(events_dir).repartition(3).write.mode(
        "overwrite"
    ).parquet(multi_dir)
    sdf_multi = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_dir)
        .select("event_id", "ts", "value")
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = stream_into_table(
        sdf_multi, eng.writer, fqn, "g2", str(tmp_path / "c2"),
        mode="overwrite_dynamic",
    )
    with pytest.raises(StreamingQueryException, match="micro-batches"):
        q.awaitTermination()

    # restart with the SAME checkpoint: the seen-partition set is
    # persisted under the checkpoint dir, so the replayed batch (a
    # DIFFERENT batch id touching batch 0's days) still trips the
    # guard — a restart must not silently erase pre-restart partitions
    q3 = stream_into_table(
        sdf_multi, eng.writer, fqn, "g3", str(tmp_path / "c2"),
        mode="overwrite_dynamic",
    )
    with pytest.raises(StreamingQueryException, match="micro-batches"):
        q3.awaitTermination()


def test_streaming_static_enrichment_matches_batch_join(spark, tmp_path):
    """Stateless stream-static broadcast join: drained output equals
    the batch left join, including stream rows with no dimension hit."""
    from transformers_spark.streaming.windows import (
        run_available_now,
        streaming_static_enrichment,
    )
    from datetime import datetime as dt

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 5), 10, "view", 1.0),
            (2, dt(2024, 1, 1, 6), 11, "purchase", 2.0),
            (3, dt(2024, 1, 1, 7), 99, "view", 3.0),  # no dim row
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    ).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "BUILDING"), (11, "MACHINERY")], ["c_custkey", "c_mktsegment"]
    )
    out = run_available_now(
        streaming_static_enrichment(spark, src, dim),
        "enrich_unit",
        output_mode="append",
    )
    got = {r["event_id"]: r["c_mktsegment"] for r in out.collect()}
    assert got == {1: "BUILDING", 2: "MACHINERY", 3: None}


def test_overwrite_dynamic_sink_rejects_bad_destination_at_start(spark, tmp_path):
    """overwrite_dynamic sink misconfiguration must fail at start(),
    not inside the first micro-batch: non-partitioned and
    ingestion-time destinations have no per-batch partition mapping."""
    import pytest as _pytest

    from transformers_spark.catalog import Catalog, PartitionKind, PartitionSpec
    from transformers_spark.loaders import Writer
    from transformers_spark.streaming.sink import stream_into_table
    from transformers_spark.streaming.windows import EVENT_SCHEMA

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    cat.create_table("sinkv.ds.flat", [("event_id", "bigint"), ("ts", "timestamp"),
                                       ("user_id", "bigint"), ("event_type", "string"),
                                       ("value", "double")])
    src = str(tmp_path / "src")
    spark.createDataFrame([], EVENT_SCHEMA).write.parquet(src)
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    with _pytest.raises(ValueError, match="column-DAY partitioned"):
        stream_into_table(
            sdf, writer, "sinkv.ds.flat",
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="sink_flat",
            mode="overwrite_dynamic",
        )


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the pandas fns."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        pass

    def setTimeoutDuration(self, ms):
        pass


def test_running_totals_fn_ignores_null_values():
    """An all-null first micro-batch must not seed min/max with NaN —
    min(NaN, x) stays NaN forever, permanently diverging from the
    oracle's null-ignoring MIN/MAX (round-4 review)."""
    import pandas as pd

    from transformers_spark.streaming.windows import _running_totals_fn

    state = _FakeState()
    b1 = pd.DataFrame({"value": [None, None]}, dtype="float64")
    out1 = list(_running_totals_fn((7,), iter([b1]), state))
    assert out1[0]["min_value"][0] is None or pd.isna(out1[0]["min_value"][0])
    b2 = pd.DataFrame({"value": [3.5, 1.25]})
    out2 = list(_running_totals_fn((7,), iter([b2]), state))
    assert out2[0]["n_events"][0] == 4          # counts ALL rows
    assert out2[0]["min_value"][0] == 1.25      # NaN never poisoned it
    assert out2[0]["max_value"][0] == 3.5


def test_session_fn_drops_null_timestamps():
    """NULL ts must not become the int64-min NaT sentinel and fabricate
    a bogus session boundary (round-4 review)."""
    import pandas as pd

    from transformers_spark.streaming.windows import _make_session_fn

    fn = _make_session_fn("none")
    state = _FakeState()
    batch = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 10:00:00", None, "2024-01-01 10:05:00"])}
    )
    list(fn((1,), iter([batch]), state))
    start_us, last_us, n = state.get
    assert n == 2                               # null row dropped
    assert start_us > 0                         # no int64-min garbage


def test_sessionization_single_batch_drain_equals_per_file(spark):
    """r13: the catalog sessionization drains ALL files in one
    micro-batch (plus the engine's one trailing timeout batch) — the
    per-file drain paid a state-store/Python round trip per file for
    the same rows. Pin both the batch count and the row identity
    against the file-at-a-time drain over the SAME sentinel-flushed
    source."""
    import hashlib

    from transformers_spark.streaming.specs import (
        SENTINEL_USER,
        _stream_flush_source_dir,
    )
    from transformers_spark.streaming.windows import shuffle_partitions

    source = _stream_flush_source_dir(spark, "/root/testdata/sf0.001")
    results = {}
    batches = {}
    for arm, mft in (("onebatch", None), ("perfile", 1)):
        with shuffle_partitions(spark, 4):
            sdf = sessionize(
                spark, source, timeout="event", max_files_per_trigger=mft
            )
            name = "sess_ab_" + hashlib.md5(arm.encode()).hexdigest()[:8]
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            batches[arm] = len(q.recentProgress)
            results[arm] = sorted(
                map(
                    tuple,
                    spark.table(name)
                    .filter(F.col("user_id") != SENTINEL_USER)
                    .collect(),
                )
            )
    assert results["onebatch"] == results["perfile"]
    assert len(results["onebatch"]) > 0
    # 4 source files: data batch + trailing timeout batch vs >= 4
    assert batches["onebatch"] <= 2 < batches["perfile"]
