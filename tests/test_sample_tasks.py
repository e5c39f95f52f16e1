"""End-to-end runs of the reference's 17 sample task dirs against the
Spark engine — the integration corpus the reference itself only
exercises against a mocked BigQuery."""

from datetime import date, datetime, timedelta

import pytest

from transformers_spark.engine import Engine
from transformers_spark.samples import (
    create_fixture_tables,
    run_sample_task,
)

AUG = datetime(2020, 8, 8)  # schedule inside sample_select's 2020-08 data


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    create_fixture_tables(eng)
    return eng


def rows(engine, fqn):
    return engine.catalog.read(fqn).collect()


def test_non_partitioned_append(engine):
    before = len(rows(engine, "g-project.playground.sample_select"))
    run_sample_task(engine, "non_partitioned_append", AUG)
    after = rows(engine, "g-project.playground.sample_select")
    assert len(after) == before + 1
    added = [r for r in after if r["hakai"] == "beerus"]
    assert added and added[0]["over"] > 8000


def test_select_without_dependency(engine):
    before = len(rows(engine, "g-project.playground.sample_select"))
    run_sample_task(engine, "select/without_dependency", AUG)
    assert len(rows(engine, "g-project.playground.sample_select")) == before + 1


def test_partition_append(engine):
    run_sample_task(engine, "partition_append", AUG)
    out = rows(engine, "g-project.playground.sample_select_partitioned")
    assert out  # 3-day window of shifted events
    days = {r["event_timestamp"].date() for r in out}
    assert days <= {date(2020, 8, d) for d in range(5, 9)}


def test_partition_by_column(engine):
    run_sample_task(engine, "partition_by_column", datetime(2024, 1, 10))
    out = rows(engine, "g-project.playground.test_booking_count_column_partitioned")
    assert len(out) == 1  # one day aggregated (Jakarta window)
    assert out[0]["count"] > 0


def test_partition_by_column_load_timestamp(engine):
    # 2d window +1d offset → two per-day compiled queries
    result = run_sample_task(engine, "partition_by_column_load_timestamp", AUG)
    assert len(result.rendered_queries) == 2
    assert len(result.partitions_written) == 2


def test_partition_by_ingestiontime(engine):
    run_sample_task(engine, "partition_by_ingestiontime", datetime(2024, 1, 10))
    out = engine.catalog.read("g-project.playground.test_booking_count").collect()
    assert out and {r["dt"] for r in out}  # landed in an ingestion partition


def test_replace_all(engine):
    run_sample_task(engine, "replace_all/basic", datetime(2021, 9, 15))
    out = engine.catalog.read("g-project.playground.sample_replace_monthly").collect()
    # all rows in the single window-start partition (M truncation:
    # end=Sep 1, start=end-720h=Aug 2)
    assert out
    assert {r["dt"] for r in out} == {date(2021, 8, 2)}
    assert {r["event_timestamp"] for r in out} == {datetime(2021, 9, 1, 1, 2, 3)}


def test_replace_merge_auto(engine):
    run_sample_task(engine, "replace_merge/auto", AUG)
    out = engine.catalog.read("g-project.playground.sample_replace").collect()
    dts = {r["dt"] for r in out}
    # partitions 08-04..08-07 replaced with fresh rows; out-of-scope old rows kept
    assert not any(r["hakai"] == "old" and date(2020, 8, 4) <= r["dt"] <= date(2020, 8, 7) for r in out)
    assert any(r["hakai"] == "old" and r["dt"] > date(2020, 8, 8) for r in out)
    assert any(r["hakai"] != "old" for r in out)
    assert dts  # non-empty


def test_replace_merge_with_filter(engine, spark):
    # restore the pre-populated state first
    spark.sql(
        "INSERT OVERWRITE `g_project_playground`.`sample_replace` "
        "SELECT 'old', 'old', CAST(1 AS BIGINT), ts, CAST(ts AS DATE) FROM "
        "(SELECT explode(sequence(TIMESTAMP'2020-08-04 12:00:00', TIMESTAMP'2020-08-10 12:00:00', INTERVAL 1 DAY)) AS ts)"
    )
    run_sample_task(engine, "replace_merge/with_filter", AUG)
    out = engine.catalog.read("g-project.playground.sample_replace").collect()
    assert not any(r["hakai"] == "old" and r["dt"] < date(2020, 8, 8) for r in out)
    assert any(r["hakai"] == "old" and r["dt"] >= date(2020, 8, 8) for r in out)


def test_weekly_partitioned(engine):
    result = run_sample_task(engine, "weekly_partitioned", datetime(1996, 7, 10))
    assert len(result.rendered_queries) == 7  # one per day of the week window
    out = engine.catalog.read("g-project.playground.count_weekly").collect()
    assert out
    assert all(r["order_count"] > 0 for r in out)
    assert all(r["week_start_date"].weekday() == 0 for r in out)  # Mondays


def test_dml_merge(engine):
    run_sample_task(engine, "dml", datetime(2024, 1, 10))
    out = {r["date"]: r["count"] for r in rows(engine, "g-project.playground.test_booking_count_dml")}
    assert date(2024, 1, 9) in out and out[date(2024, 1, 9)] > 0


def test_delete(engine):
    run_sample_task(engine, "delete", AUG)
    out = rows(engine, "g-project.playground.sample_select_dependency_level_2")
    assert [r["v"] for r in out] == [2]  # the 2020-06-02 row deleted


def test_drop(engine):
    assert engine.catalog.table_exists("g-project.playground.sample_select_copy")
    run_sample_task(engine, "drop", AUG)
    assert not engine.catalog.table_exists("g-project.playground.sample_select_copy")


def test_select_script(engine):
    result = run_sample_task(engine, "select/script", AUG)
    assert result.rows and len(result.rows[0]) > 0
    assert all(r["over"] == 9001 for r in result.rows[0])


def test_federated_table_udf(engine):
    run_sample_task(engine, "select/federated_table", AUG)
    out = rows(engine, "g-project.playground.gsheet_log_dest")
    assert out
    # standardRule('cleanup') lowercases the upper-cased method column
    assert all(r["method_name"] == r["method_name"].lower() for r in out)
    assert all(r["total_sample_count"] is not None for r in out)


def test_allow_field_addition(engine):
    result = run_sample_task(engine, "allow_field_addition/basic", datetime(2021, 9, 15))
    meta = engine.catalog.get_table("g-data-gojek-id-mart.playground.allow_field_addition_test")
    assert "test_column" in meta.column_names  # schema evolved
    out = engine.catalog.read("g-data-gojek-id-mart.playground.allow_field_addition_test").collect()
    assert out and all(r["test_column"] == "allow_field_addition" for r in out)
    assert len(result.rendered_queries) == 30  # 720h window → 30 per-day queries


def test_legacy_not_use_spillover(engine):
    run_sample_task(engine, "legacy/not_use_spillover", datetime(2024, 1, 10))
    out = engine.catalog.read("g-project.playground.test_booking_count").collect()
    assert out


def test_legacy_use_spillover(engine):
    now = datetime.utcnow().replace(hour=12, minute=0, second=0, microsecond=0)
    result = run_sample_task(engine, "legacy/use_spillover", now)
    assert hasattr(result, "extras")
    assert isinstance(result.extras["spillover_dates"], list)
