"""Replicates the driver's correctness gate locally: run every catalog
query in Spark AND its DuckDB oracle on the same parquet tables, then
compare row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

from transformers_spark.queries import QUERIES
from transformers_spark.sources.testdata import TABLES, table_path


def _duckdb_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(rows, columns):
    # sort columns by name, then rows; stringify with float rounding
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


_MULTIMODAL_KINDS = {
    "multimodal_image_features": "image",
    "multimodal_audio_features": "audio",
    "multimodal_resize_plan": "resize",
}


def _oracle_for(name, sf_dir):
    """The multimodal VALUES-literal oracles are generated from the
    driver's correctness sf (sf0.01); regenerate them for the test's
    own sf_dir so the local gate checks the same semantics at any sf."""
    if name in _MULTIMODAL_KINDS:
        from transformers_spark.operators.specs import _multimodal_oracle

        return _multimodal_oracle(_MULTIMODAL_KINDS[name], table_path(sf_dir, "documents"))
    return QUERIES[name].oracle


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.oracle])
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duckdb_con(sf_dir)
    res = con.execute(_oracle_for(name, sf_dir))
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    assert _normalize(spark_rows, spark_cols) == _normalize(duck_rows, duck_cols), (
        f"{name}: value mismatch"
    )


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if not s.oracle])
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    assert df.count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    names = entry_mod.queries().keys()
    oracles = entry_mod.oracle_sql()
    assert set(oracles).issubset(set(names))


def test_windowed_query_does_not_poison_shared_events_view(spark, sf_dir):
    """q_windowed_daily_events registers a pre-filtered events source;
    it must live under its own view name — replacing the shared
    "events" view would silently window every later events query in
    the session (the registration cache skips already-registered
    views)."""
    from transformers_spark.sources.testdata import register_tables

    register_tables(spark, sf_dir, ("events",))  # populate the cache
    full = spark.table("events").count()
    QUERIES["windowed_daily_events"].build(spark, sf_dir).count()
    register_tables(spark, sf_dir, ("events",))  # cache hit: no-op
    assert spark.table("events").count() == full


def test_event_value_moments_degenerate_groups(spark, tmp_path):
    """n=1 and zero-variance groups: NULL on BOTH engines by explicit
    guard (ADVICE r1 — Spark's non-ANSI x/0 is NULL while DuckDB's IEEE
    doubles are inf/NaN, and sqrt(negative cancellation) is NaN here,
    an error there). Runs query AND oracle on a synthetic events table
    that actually contains the degenerate groups the testdata lacks."""
    import duckdb as _duck
    from datetime import datetime as dt

    from transformers_spark.analytics import (
        ORACLE_EVENT_VALUE_MOMENTS,
        q_event_value_moments,
    )

    sf = str(tmp_path / "sfdeg")
    df = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 5), 10, "single", 3.5),
            (2, dt(2024, 1, 1, 6), 11, "constant", 2.0),
            (3, dt(2024, 1, 1, 6), 12, "constant", 2.0),
            (4, dt(2024, 1, 1, 7), 13, "normal", 1.0),
            (5, dt(2024, 1, 1, 8), 14, "normal", 5.0),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    # write micros, not INT96: pyarrow reports INT96 as timestamp[ns],
    # which would mis-trigger the source layer's nanos conversion
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.parquet(f"{sf}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)

    out = {r["event_type"]: r for r in q_event_value_moments(spark, sf).collect()}
    assert out["single"]["stddev_value"] is None
    assert out["single"]["corr_value_hour"] is None
    assert out["constant"]["stddev_value"] == 0.0
    assert out["constant"]["corr_value_hour"] is None  # zero variance
    assert out["normal"]["corr_value_hour"] == 1.0  # exact positive corr

    con = _duck.connect()
    con.execute(
        # Spark wrote a directory of part files; glob them for DuckDB
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    res = con.execute(ORACLE_EVENT_VALUE_MOMENTS)
    cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    spark_rows = [tuple(r) for r in q_event_value_moments(spark, sf).collect()]
    assert _normalize(spark_rows, [c.lower() for c in q_event_value_moments(spark, sf).columns]) == _normalize(duck_rows, cols)
