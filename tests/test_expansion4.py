"""Round-7 expansion queries + round-7 engine fixes: semantic
invariants on hand-built inputs (the oracle gate checks engine
equality; these check the operators mean what they claim).
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _write(df, sf, name):
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, f"{name}.parquet"))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def test_cdc_merge_exercises_update_and_insert(spark, tmp_path):
    """The standing table REALLY holds stale rows pre-merge, and the
    post-merge index holds none — i.e. the MERGE's matched-UPDATE path
    fired (the oracle-equality gate alone can't distinguish 'updated'
    from 'was never stale')."""
    from transformers_spark.catalog import Catalog
    from transformers_spark.expansion4 import q_dedup_cdc_merge

    rows = [
        # doc_ids 0..9: threshold = 9*4//5 = 7 -> new batch {7, 8, 9};
        # 8 is the even new doc that gets a stale standing row
        (i, f"alpha beta gamma delta {i}", "en", "web", 20)
        for i in range(10)
    ]
    sf = str(tmp_path / "sfcdc")
    _write(_docs(spark, rows), sf, "documents")
    out = q_dedup_cdc_merge(spark, sf)
    # build() already ran the merge; the result is the post-merge rollup
    assert out.count() > 0
    cat = Catalog(spark)
    merged = cat.read("g-project.playground.cdc_lsh_index")
    assert merged.filter(F.col("bucket") == "stale").count() == 0
    # every doc with >= 2 tokens is indexed in every band post-merge
    n_docs = merged.select("doc").distinct().count()
    assert n_docs == 10


def test_pack_fill_rate_accounts_every_doc(spark, tmp_path):
    """sum(docs_started * n_seqs) == number of packable docs, and
    seq_share sums to 1."""
    from transformers_spark.expansion4 import q_pack_fill_rate

    rows = [(i, "tok " * (i + 1), "en", "web", 4 * (i + 1)) for i in range(50)]
    rows.append((99, None, "en", "web", 0))  # NULL text drops
    sf = str(tmp_path / "sfpack")
    _write(_docs(spark, rows), sf, "documents")
    hist = q_pack_fill_rate(spark, sf).collect()
    assert sum(r["docs_started"] * r["n_seqs"] for r in hist) == 50
    assert abs(sum(r["seq_share"] for r in hist) - 1.0) < 1e-9


def test_watermark_late_arrivals_flags_only_late(spark, tmp_path):
    """An event 3h behind the running max is late under both bounds;
    one 1h behind only under the 30min bound; in-order events never."""
    from transformers_spark.expansion4 import q_watermark_late_arrivals

    rows = [
        (1, datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 12), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),   # 3h late
        (4, datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),  # 1h late
        (5, datetime(2024, 1, 1, 13), 1, "view", 1.0, "{}"),  # in order
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sflate")
    _write(ev, sf, "events")
    out = {r["day"].isoformat(): r for r in
           q_watermark_late_arrivals(spark, sf).collect()}
    r = out["2024-01-01"]
    assert r["n_events"] == 5
    assert r["n_late_30m"] == 2
    assert r["n_late_2h"] == 1


def test_lsh_band_bucket_skew_pair_slots_exact(spark, tmp_path):
    """Three identical docs -> every band has one bucket of size 3 ->
    pair_slots == 3 per band."""
    from transformers_spark.expansion4 import q_lsh_band_bucket_skew

    rows = [(i, "same text every time", "en", "web", 20) for i in range(3)]
    sf = str(tmp_path / "sfskewq")
    _write(_docs(spark, rows), sf, "documents")
    for r in q_lsh_band_bucket_skew(spark, sf).collect():
        assert r["n_buckets"] == 1
        assert r["max_sz"] == 3
        assert r["pair_slots"] == 3


def test_recall_curve_perfect_on_identical_lists(spark, tmp_path):
    """A corpus where every vector shares one LSH bucket makes the ANN
    list identical to the exact list -> recall 1.0 at both k."""
    from transformers_spark.expansion4 import q_embedding_recall_curve

    rows = [(i, [float(i + 1)] * 64, "a") for i in range(10)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    sf = str(tmp_path / "sfrecall")
    _write(emb, sf, "embeddings")
    out = {r["k"]: r for r in q_embedding_recall_curve(spark, sf).collect()}
    assert set(out) == {1, 5}
    # all-positive colinear vectors: one hyperplane bucket, so LSH
    # candidates == corpus and the lists match exactly
    assert out[1]["recall"] == 1.0
    assert out[5]["recall"] == 1.0


def test_resize_passthrough_collision_raises(spark):
    """ADVICE r6: a passthrough column colliding with the resize output
    schema must raise, not silently overwrite."""
    from transformers_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(b"x", "m1", 7)], "payload binary, media_id string, width long"
    )
    with pytest.raises(ValueError, match="collide"):
        resize_images(df, passthrough=("width",))


def test_resize_passthrough_collision_case_insensitive(spark):
    """ADVICE r7: Spark resolves columns case-insensitively by default,
    so passthrough=('WIDTH',) is just as ambiguous as ('width',) and
    must raise too."""
    from transformers_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(b"x", "m1", 7)], "payload binary, media_id string, WIDTH long"
    )
    with pytest.raises(ValueError, match="collide"):
        resize_images(df, passthrough=("WIDTH",))


class _FakeState:
    """Minimal GroupState stand-in for the timeout-clamp contract."""

    def __init__(self, watermark_ms):
        self.exists = False
        self.hasTimedOut = False
        self._wm = watermark_ms
        self.set_to = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def update(self, v):
        self._updated = v

    def setTimeoutTimestamp(self, ts):
        self.set_to = ts


def test_session_timeout_clamped_to_watermark():
    """r7 soak defect: a within-watermark late event whose gap boundary
    sits BEHIND the watermark must register watermark+1, never a past
    timestamp (Spark kills the query on a past timeout)."""
    import pandas as pd

    from transformers_spark.streaming.windows import (
        SESSION_GAP_MS,
        _session_fn,
    )

    late_ts = pd.Timestamp("2024-01-01 00:00:00")
    batch = pd.DataFrame({"ts": [late_ts]})
    wm_ms = int(late_ts.value // 1_000_000) + SESSION_GAP_MS + 999_999
    state = _FakeState(wm_ms)
    list(_session_fn((1,), [batch], state, timeout="event"))
    assert state.set_to == wm_ms + 1

    # and the normal case still registers the true gap boundary
    state2 = _FakeState(0)
    list(_session_fn((1,), [batch], state2, timeout="event"))
    assert state2.set_to == int(late_ts.value // 1_000_000) + SESSION_GAP_MS


def test_session_drain_survives_behind_watermark_event(spark, tmp_path):
    """End-to-end twin of the clamp unit test: a file layout where a
    later file carries an event BEHIND the already-advanced watermark
    (Spark does NOT auto-drop late rows for applyInPandasWithState).
    Pre-clamp code registered a past timeout and the whole drain died
    with INVALID_TIMEOUT_TIMESTAMP; now it must complete and emit the
    user's session under the documented merge-into-newest contract."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from transformers_spark.streaming.windows import (
        sessionize,
        shuffle_partitions,
    )

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    hour_us = 3_600_000_000
    t0 = 1_704_100_000_000_000  # 2024-01-01-ish, micros
    files = [
        # f1: user 1 at t0
        [(-1, t0, 1)],
        # f2: user 2 far ahead — advances the watermark past
        # t0 + gap (watermark = T - 2h, T = t0 + 12h)
        [(-2, t0 + 12 * hour_us, 2)],
        # f3: user 1 again at t0+10min — BEHIND the watermark now;
        # its gap boundary t0+40min is also behind the watermark
        [(-3, t0 + 600_000_000, 1)],
        # f4: sentinel far past everything so all sessions flush
        [(-4, t0 + 48 * hour_us, 3)],
    ]
    base = time.time()
    for i, rows in enumerate(files):
        table = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
        })
        dest = os.path.join(src, f"f{i}.parquet")
        pq.write_table(table, dest)
        os.utime(dest, (base + i, base + i))

    with shuffle_partitions(spark, 4):
        sdf = sessionize(spark, src, timeout="event",
                         max_files_per_trigger=1)
        q = (
            sdf.writeStream.format("memory")
            .queryName("late_clamp_e2e")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()  # pre-clamp: StreamingQueryException here
        out = spark.table("late_clamp_e2e")
        rows = {r["user_id"]: r for r in out.collect()}
    # user 1's late event merged into the open session (bounded-state
    # contract): one session spanning t0 .. t0+10min with 2 events
    assert rows[1]["n_events"] == 2
    assert rows[2]["n_events"] == 1
