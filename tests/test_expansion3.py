"""Round-6 expansion queries: semantic invariants + plan pins.

The oracle gate (tests/test_queries_oracle.py + the driver) checks
engine equality; these check the operators mean what they claim on
hand-built inputs, and pin the scale-bearing plan shapes.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F


def _write(df, sf, name):
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, f"{name}.parquet"))


def test_weekday_matrix_epoch_arithmetic(spark, tmp_path):
    """2024-01-01 was a Monday -> dow_0; 2024-01-07 a Sunday -> dow_6;
    NULL ts and NULL event_type drop."""
    from transformers_spark.expansion3 import q_weekday_activity_matrix

    rows = [
        (1, datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 7, 10), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 1, 7, 11), 1, "view", 1.0, "{}"),
        (4, None, 1, "view", 1.0, "{}"),
        (5, datetime(2024, 1, 2, 10), 1, None, 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfdow")
    _write(ev, sf, "events")
    out = q_weekday_activity_matrix(spark, sf).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["event_type"] == "view"
    assert r["dow_0"] == 1 and r["dow_6"] == 2
    assert sum(r[f"dow_{d}"] for d in range(7)) == 3


def test_monthly_cumshare_reaches_one(spark, tmp_path):
    """The last month of each year has cum_share exactly 1.0 (exact
    decimal running sum over the full year)."""
    from transformers_spark.expansion3 import q_monthly_revenue_cumshare

    rows = [
        (1, 1, "O", 100.0, datetime(1995, 1, 10), "1-URGENT"),
        (2, 1, "O", 200.0, datetime(1995, 6, 10), "1-URGENT"),
        (3, 1, "O", 700.0, datetime(1995, 12, 10), "1-URGENT"),
        (4, 1, "O", 50.0, datetime(1996, 3, 10), "1-URGENT"),
    ]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    sf = str(tmp_path / "sfcum")
    _write(od, sf, "orders")
    out = {
        (r["year"], r["month"]): r["cum_share"]
        for r in q_monthly_revenue_cumshare(spark, sf).collect()
    }
    assert out[(1995, 1)] == 0.1
    assert out[(1995, 6)] == 0.3
    assert out[(1995, 12)] == 1.0
    assert out[(1996, 3)] == 1.0


def test_word_length_profile_is_byte_based(spark, tmp_path):
    """'日本語' is 3 characters but 9 UTF-8 bytes -> b_8_12 bucket
    (byte semantics are the portable contract)."""
    from transformers_spark.expansion3 import q_word_length_profile

    docs = spark.createDataFrame(
        [(1, "日本語", "ja", "s1", 3), (2, "ab cd", "en", "s1", 5)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sfwlen")
    _write(docs, sf, "documents")
    out = {
        (r["lang"], r["len_bucket"]): (r["n_tokens"], r["share"])
        for r in q_word_length_profile(spark, sf).collect()
    }
    assert out[("ja", "b_8_12")] == (1, 1.0)
    assert out[("en", "b_1_3")] == (2, 1.0)


def test_trade_balance_missing_sides(spark, tmp_path):
    """A nation with no suppliers keeps bought volume and a NULL
    ratio guard when bought is 0."""
    from transformers_spark.expansion3 import q_nation_trade_balance

    nation = spark.createDataFrame(
        [(1, "ALPHA", 0), (2, "BETA", 0)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    supplier = spark.createDataFrame(
        [(10, 1)], ["s_suppkey", "s_nationkey"]
    )
    customer = spark.createDataFrame(
        [(100, 2)], ["c_custkey", "c_nationkey"]
    )
    orders = spark.createDataFrame(
        [(1000, 100, "O", 500.0, datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1000, 7, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
          datetime(1995, 1, 5))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    sf = str(tmp_path / "sftrade")
    for name, df in [
        ("nation", nation), ("supplier", supplier), ("customer", customer),
        ("orders", orders), ("lineitem", lineitem),
    ]:
        _write(df, sf, name)
    out = {r["n_name"]: r for r in q_nation_trade_balance(spark, sf).collect()}
    # ALPHA supplies 100, buys nothing -> ratio NULL (guarded division)
    assert out["ALPHA"]["supplied_volume"] == 100.0
    assert out["ALPHA"]["bought_volume"] == 0.0
    assert out["ALPHA"]["supply_buy_ratio"] is None
    # BETA buys 500, supplies nothing -> ratio 0.0
    assert out["BETA"]["supplied_volume"] == 0.0
    assert out["BETA"]["bought_volume"] == 500.0
    assert out["BETA"]["supply_buy_ratio"] == 0.0


def test_embedding_dim_range_null_vectors_skipped(spark, tmp_path):
    """NULL embedding rows contribute no dims; dims are 1-based."""
    from transformers_spark.expansion3 import q_embedding_dim_range

    emb = spark.createDataFrame(
        [(1, [1.0, -2.0], 0), (2, [3.0, 0.5], 0), (3, None, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    sf = str(tmp_path / "sfdim")
    _write(emb, sf, "embeddings")
    out = {r["dim"]: r for r in q_embedding_dim_range(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_values"] == 2
    assert out[1]["min_val"] == 1.0 and out[1]["max_val"] == 3.0
    assert out[2]["min_val"] == -2.0 and out[2]["max_val"] == 0.5


def test_expansion3_plan_shapes(spark):
    """Scale pins: no CartesianProduct (except the deliberate 1-row
    broadcast crosses); brand_top_parts keeps the two-phase
    WindowGroupLimit; big dims broadcast in the lag join."""
    from transformers_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    plan = (
        QUERIES["brand_top_parts"]
        .build(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert ", Partial" in plan and ", Final" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # part dim stays map-side

    lag_plan = (
        QUERIES["supplier_fulfillment_lag"]
        .build(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in lag_plan
    assert "BroadcastHashJoin" in lag_plan  # supplier + nation map-side

    for name in [
        "doc_length_buckets", "weekday_activity_matrix",
        "segment_repeat_rate", "monthly_revenue_cumshare",
        "word_length_profile", "embedding_dim_range",
    ]:
        p = (
            QUERIES[name]
            .build(spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in p, name


def test_hll_rollup_merge_equals_direct_and_registers(spark, tmp_path):
    """merged register sum == direct register sum (max is associative)
    and the raw estimate tracks small cardinalities loosely while
    exact_users is exact."""
    from transformers_spark.expansion3 import q_sketch_hll_rollup

    rows = [
        (i, datetime(2024, 1, 1 + (i % 3), 10), 100 + (i % 7), "view", 1.0, "{}")
        for i in range(50)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfhll")
    _write(ev, sf, "events")
    r = q_sketch_hll_rollup(spark, sf).collect()[0]
    assert r["merged_reg_sum"] == r["direct_reg_sum"]
    assert r["exact_users"] == 7
    assert r["n_days"] == 3
    assert r["est_users"] > 0


def test_session_conversion_rate_semantics(spark, tmp_path):
    """A purchase inside a session converts it; a later gap-separated
    session without one doesn't; the day is the session START day."""
    from transformers_spark.expansion3 import q_session_conversion_rate

    t = lambda d, h, m=0: datetime(2024, 1, d, h, m)
    rows = [
        # user 1, day 1: one session view->purchase (converts)
        (1, t(1, 10), 1, "view", 1.0, "{}"),
        (2, t(1, 10, 10), 1, "purchase", 1.0, "{}"),
        # user 1, day 1: second session (>30min later), no purchase
        (3, t(1, 12), 1, "view", 1.0, "{}"),
        # user 2, day 2: single-event session, no purchase
        (4, t(2, 9), 2, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfconv")
    _write(ev, sf, "events")
    out = {str(r["day"]): (r["n_sessions"], r["n_converting"])
           for r in q_session_conversion_rate(spark, sf).collect()}
    assert out["2024-01-01"] == (2, 1)
    assert out["2024-01-02"] == (1, 0)


def test_char_class_profile_math(spark, tmp_path):
    from transformers_spark.expansion3 import q_text_char_class_profile

    docs = spark.createDataFrame(
        [(1, "ab 12!", "en", "s1", 6)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sfchar")
    _write(docs, sf, "documents")
    r = q_text_char_class_profile(spark, sf).collect()[0]
    assert r["n_chars"] == 6
    assert abs(r["digit_frac"] - 2 / 6) < 1e-12
    assert abs(r["space_frac"] - 1 / 6) < 1e-12
    assert abs(r["punct_frac"] - 1 / 6) < 1e-12


def test_embedding_norm_profile_buckets(spark, tmp_path):
    from transformers_spark.expansion3 import q_embedding_norm_profile

    emb = spark.createDataFrame(
        [(1, [0.5, 0.0], 0),    # norm2 0.25 -> lt_0_5
         (2, [1.0, 1.0], 0),    # norm2 2.0  -> ge_2
         (3, None, 0)],         # dropped
        "vec_id long, embedding array<float>, label int",
    )
    sf = str(tmp_path / "sfnorm")
    _write(emb, sf, "embeddings")
    out = {r["norm_bucket"]: (r["n_vectors"], r["share"])
           for r in q_embedding_norm_profile(spark, sf).collect()}
    assert out == {"lt_0_5": (1, 0.5), "ge_2": (1, 0.5)}
