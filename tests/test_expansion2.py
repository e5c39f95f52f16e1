"""Round-5 expansion queries: semantic invariants + plan pins.

The oracle gate (tests/test_queries_oracle.py + the driver) checks
engine equality; these tests check the operators mean what they claim
on hand-built inputs, and pin the scale-bearing plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_ngram_novelty_copy_is_all_duplicate(spark, tmp_path):
    """A doc that is a verbatim copy of a lower-id doc has novelty 0;
    the original keeps novelty 1; per-source rollup reflects both."""
    from transformers_spark.expansion2 import q_text_ngram_novelty

    base = "a b c d e f g h"  # 4 distinct 5-grams
    df = _docs(
        spark,
        [
            (1, base, "en", "web", len(base)),
            (2, base, "en", "books", len(base)),  # exact copy, later id
            (3, "p q r s t u", "en", "books", 11),  # all novel
        ],
    )
    sf = str(tmp_path / "sfnov")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r["source"]: r.asDict() for r in q_text_ngram_novelty(spark, sf).collect()}
    assert out["web"]["novelty_ratio"] == 1.0
    # books: doc 2 contributes 4 non-novel shingles, doc 3 adds 2 novel
    assert out["books"]["n_shingles"] == 6
    assert out["books"]["n_novel"] == 2


def test_source_overlap_matrix_asymmetry(spark, tmp_path):
    """overlap(a->b) normalizes by |a|'s shingles: a small source fully
    contained in a big one reads 1.0 one way and < 1 the other."""
    from transformers_spark.expansion2 import q_source_overlap_matrix

    small = "a b c d e"  # 1 shingle
    big = "a b c d e f g h i"  # 5 shingles, superset
    df = _docs(
        spark,
        [(1, big, "en", "web", len(big)), (2, small, "en", "wiki", len(small))],
    )
    import os

    sf = str(tmp_path / "sfover")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r["overlap_frac"]
        for r in q_source_overlap_matrix(spark, sf).collect()
    }
    assert out[("wiki", "web")] == 1.0
    assert out[("web", "wiki")] == 0.2


def test_kmv_rollup_merge_equals_direct(spark, tmp_path):
    """The mergeable-sketch identity: per-day k-min sketches merged =
    the direct global sketch, exactly — with > k distinct users spread
    over several days so the estimation path (not the lossless path)
    is exercised."""
    import os
    from datetime import datetime

    from transformers_spark.expansion2 import KMV_ROLLUP_K, q_sketch_kmv_rollup

    rows = []
    eid = 0
    for day in range(1, 8):
        for u in range(40):  # 7 days x 40 users/day, 280 user-days
            eid += 1
            rows.append(
                (eid, (day * 37 + u * 11) % 200, "view",
                 datetime(2024, 1, day, 12, 0, 0), 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    sf = str(tmp_path / "sfkmv")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    row = q_sketch_kmv_rollup(spark, sf).collect()[0]
    assert row["merged_est_users"] == row["direct_est_users"]
    assert row["n_days"] == 7
    assert row["exact_users"] > KMV_ROLLUP_K  # estimation path exercised
    # KMV with k=64 over ~200 distinct: estimate within 50% of exact
    assert 0.5 * row["exact_users"] <= row["merged_est_users"] <= 2 * row["exact_users"]


def test_basket_pairs_null_partkeys_excluded(spark, tmp_path):
    """NULL part keys form no pairs and no marginals; lift of a pair
    always co-occurring with independent marginals of 1 is n_orders."""
    import os
    from datetime import datetime

    from transformers_spark.expansion2 import q_order_basket_pairs

    rows = [
        # order 1: parts 10, 20 + a NULL partkey row
        (1, 10, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)),
        (1, 20, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)),
        (1, None, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)),
        # order 2: parts 10, 20 again
        (2, 10, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 2)),
        (2, 20, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 2)),
        # order 3: part 30 alone
        (3, 30, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 3)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sf = str(tmp_path / "sfbask")
    os.makedirs(sf, exist_ok=True)
    li.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    out = q_order_basket_pairs(spark, sf).collect()
    assert len(out) == 1  # only (10, 20); NULL never pairs
    r = out[0]
    assert (r["p1"], r["p2"], r["n_together"]) == (10, 20, 2)
    # lift = n_together * n_orders / (n_p1 * n_p2) = 2*3/(2*2)
    assert abs(r["lift"] - 1.5) < 1e-12


def test_basket_pairs_cap_excludes_mega_basket(spark, tmp_path):
    """The BASKET_CAP contract: an order with more distinct parts than
    the cap contributes NOTHING (no pairs, no marginals, not counted in
    n_orders) — the quadratic blowup is excluded, not materialized."""
    import os
    from datetime import datetime

    from transformers_spark.expansion2 import BASKET_CAP, q_order_basket_pairs

    rows = []
    # degenerate order 99: BASKET_CAP + 1 distinct parts
    for i in range(BASKET_CAP + 1):
        rows.append(
            (99, 1000 + i, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
             datetime(1995, 1, 1))
        )
    # normal orders: parts 10, 20 co-occur twice
    for ok, day in [(1, 1), (2, 2)]:
        rows.append((ok, 10, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(1995, 1, day)))
        rows.append((ok, 20, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(1995, 1, day)))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sf = str(tmp_path / "sfcap")
    os.makedirs(sf, exist_ok=True)
    li.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    out = q_order_basket_pairs(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p1"], r["p2"], r["n_together"]) == (10, 20, 2)
    # n_orders counts only qualifying orders (2, not 3):
    # lift = 2 * 2 / (2 * 2) = 1.0
    assert abs(r["lift"] - 1.0) < 1e-12


def test_event_path_counts_ordering_and_threshold(spark, tmp_path):
    """Paths use the first 3 events by (ts, event_id); user-days with
    fewer than 3 events don't qualify."""
    import os
    from datetime import datetime

    from transformers_spark.expansion2 import q_event_path_counts

    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    rows = [
        (1, 1, "view", t(1), 1.0, "{}"),
        (2, 1, "click", t(2), 1.0, "{}"),
        (3, 1, "purchase", t(3), 1.0, "{}"),
        (4, 1, "error", t(4), 1.0, "{}"),  # beyond the 3-slice
        # same-ts tie on user 2: event_id breaks it
        (6, 2, "b_second", t(5), 1.0, "{}"),
        (5, 2, "a_first", t(5), 1.0, "{}"),
        (7, 2, "c_third", t(6), 1.0, "{}"),
        # user 3: only 2 events -> no path
        (8, 3, "view", t(1), 1.0, "{}"),
        (9, 3, "click", t(2), 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    sf = str(tmp_path / "sfpath")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = {r["path"]: r["n_user_days"] for r in q_event_path_counts(spark, sf).collect()}
    assert out == {"view>click>purchase": 1, "a_first>b_second>c_third": 1}


def test_time_to_convert_semantics(spark, tmp_path):
    """Only users whose first purchase FOLLOWS their first view count;
    purchase-before-view and never-purchase users drop; the median is
    an actual observed gap (percentile_disc)."""
    import os
    from datetime import datetime

    from transformers_spark.expansion2 import q_time_to_convert_stats

    t = lambda d, h: datetime(2024, 1, d, h)
    rows = [
        # user 1: view at 1h, purchase at 3h -> gap 2h
        (1, 1, "view", t(1, 1), 1.0, "{}"),
        (2, 1, "purchase", t(1, 3), 1.0, "{}"),
        # user 2: view at 1h, purchase at 7h -> gap 6h (the later view
        # at 5h and second purchase at 9h are ignored: FIRSTs only)
        (3, 2, "view", t(1, 1), 1.0, "{}"),
        (4, 2, "view", t(1, 5), 1.0, "{}"),
        (5, 2, "purchase", t(1, 7), 1.0, "{}"),
        (6, 2, "purchase", t(1, 9), 1.0, "{}"),
        # user 3: purchase BEFORE view -> excluded
        (7, 3, "purchase", t(1, 1), 1.0, "{}"),
        (8, 3, "view", t(1, 2), 1.0, "{}"),
        # user 4: view only -> excluded
        (9, 4, "view", t(1, 1), 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    sf = str(tmp_path / "sfttc")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    row = q_time_to_convert_stats(spark, sf).collect()[0]
    assert row["n_converting_users"] == 2
    assert row["min_hours"] == 2.0
    assert row["max_hours"] == 6.0
    assert row["median_hours"] in (2.0, 6.0)  # disc percentile: a real gap
    assert row["median_hours"] == 2.0  # n=2 -> lower member


def test_vocab_coverage_curve_semantics(spark, tmp_path):
    """Coverage at V is the occurrence share of the top-V tokens by
    (count desc, token asc); a V beyond the vocabulary covers 1.0."""
    import os

    from transformers_spark.expansion2 import q_text_vocab_coverage_curve

    # frequencies: a:5, b:3, c:1, d:1 -> top-5 tokens = whole vocab
    df = _docs(
        spark,
        [
            (1, "a a a b b", "en", "web", 9),
            (2, "a a b c d", "en", "web", 9),
        ],
    )
    sf = str(tmp_path / "sfvoc")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r["vocab_size"]: r.asDict() for r in q_text_vocab_coverage_curve(spark, sf).collect()}
    assert out[5]["coverage"] == 1.0 and out[5]["total_tokens"] == 10
    # top-5 includes everything; the smallest point (5) is the whole
    # 4-token vocab here, so check ordering instead on a bigger corpus:
    # every point's coverage is non-decreasing in V
    sizes = sorted(out)
    covs = [out[v]["coverage"] for v in sizes]
    assert covs == sorted(covs)


def test_streaming_hopping_counts_matches_batch(spark, tmp_path):
    """Each event lands in exactly 2 hopping windows (1h width, 30min
    slide); the drained complete-mode result equals the batch window
    arithmetic."""
    import os
    from datetime import datetime

    from transformers_spark.streaming.specs import q_streaming_hopping_counts

    rows = [
        (1, 1, "view", datetime(2024, 1, 1, 10, 15), 2.0, "{}"),
        (2, 1, "view", datetime(2024, 1, 1, 10, 45), 3.0, "{}"),
        (3, 2, "click", datetime(2024, 1, 1, 11, 5), 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    sf = str(tmp_path / "sfhop")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = q_streaming_hopping_counts(spark, sf)
    rows_out = {
        (r["window_start"].isoformat(), r["event_type"]): (
            r["n_events"], r["total_value"],
        )
        for r in out.collect()
    }
    # 10:15 event -> windows starting 09:30 and 10:00
    assert rows_out[("2024-01-01T09:30:00", "view")] == (1, 2.0)
    # 10:15 and 10:45 share the 10:00 window
    assert rows_out[("2024-01-01T10:00:00", "view")] == (2, 5.0)
    # 10:45 -> 10:30 window; 11:05 -> 10:30 and 11:00 (click)
    assert rows_out[("2024-01-01T10:30:00", "view")] == (1, 3.0)
    assert rows_out[("2024-01-01T10:30:00", "click")] == (1, 1.0)
    assert rows_out[("2024-01-01T11:00:00", "click")] == (1, 1.0)
    assert len(rows_out) == 5


def test_expansion2_plan_shapes(spark):
    """Scale pins: no CartesianProduct anywhere; the top-k queries
    compile to TakeOrderedAndProject; novelty/overlap never plan a
    SinglePartition exchange (their data-sized stages stay parallel)."""
    from transformers_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name, require_topk, forbid_single in [
        ("text_ngram_novelty", False, True),
        ("source_overlap_matrix", False, True),
        ("event_path_counts", True, True),
        ("order_basket_pairs", True, False),  # 1-row n_orders agg is bounded
        ("sketch_kmv_rollup", True, False),  # <=k-row reductions are bounded
        # vocab curve: two-phase global rank (rangepartitioning) feeds a
        # 1-row conditional aggregate — that last agg is bounded
        ("text_vocab_coverage_curve", False, False),
    ]:
        plan = (
            QUERIES[name]
            .build(spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        if require_topk:
            assert "TakeOrderedAndProject" in plan, name
        if forbid_single:
            assert "SinglePartition" not in plan, name
        if name == "event_path_counts":
            # the r6 cardinality guard: the first-3 slice must stay the
            # two-phase WindowGroupLimit (map-side partial top-k before
            # the (user, day) exchange) — a plain Window+filter would
            # ship whole bot user-days into the shuffle
            assert "WindowGroupLimit" in plan, name
            assert ", Partial" in plan and ", Final" in plan, name
