"""Reference sample-task harness.

Runs the reference's 17 sample task dirs (reference:
executor/samples/tasks/**) verbatim against the Spark engine: fixture
tables are synthesized from the driver testdata per FIXTURES.md, the
legacy macro styles are normalized, the window is computed from each
``properties.cfg``, and multi-day REPLACE queries are per-day compiled
exactly like the Go plugin's CompileAssets.
"""

from __future__ import annotations

import os
import re
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import PartitionKind, PartitionSpec
from .config import LoadMethod, TaskConfig, task_config_from_properties
from .engine import Engine, TransformResult, compile_assets
from .functions.bigquery_compat import DEFAULT_UDF_REGISTRY
from .sources.testdata import load_table
from .windowing import window_for

SAMPLES_ROOT = "/root/reference/task/bq2bq/executor/samples/tasks"

__all__ = ["SAMPLES_ROOT", "create_fixture_tables", "run_sample_task", "normalize_legacy_macros"]


# --- fixture synthesis (FIXTURES.md → engine tables from testdata) ----


def create_fixture_tables(engine: Engine, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = engine.spark
    cat = engine.catalog
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    # playground.sample_select: timestamps shifted into 2020-08 so the
    # replace_merge samples' hardcoded 2020-08-04..08 filters hit data.
    shift_days = (datetime(2024, 1, 1) - datetime(2020, 8, 1)).days
    sample_select = events.select(
        F.col("event_type").alias("hakai"),
        F.col("props").alias("rasengan"),
        (F.lit(9000) + (F.col("event_id") % 3)).alias("over"),
        F.expr(f"ts - INTERVAL {shift_days} DAYS").alias("load_timestamp"),
    )
    # ... and a second slice in 2021-09 (replace_all's hardcoded range)
    shift_days_2021 = (datetime(2024, 1, 1) - datetime(2021, 9, 1)).days
    sample_select_2021 = events.select(
        F.col("event_type").alias("hakai"),
        F.col("props").alias("rasengan"),
        (F.lit(9000) + (F.col("event_id") % 3)).alias("over"),
        F.expr(f"ts - INTERVAL {shift_days_2021} DAYS").alias("load_timestamp"),
    )
    cat.create_table(
        "g-project.playground.sample_select",
        [("hakai", "string"), ("rasengan", "string"), ("over", "bigint"), ("load_timestamp", "timestamp")],
    )
    sample_select.unionByName(sample_select_2021).write.insertInto(
        cat.spark_name("g-project.playground.sample_select"), overwrite=True
    )

    cat.create_table(
        "g-project.playground.booking_log",
        [("booking_creation_time", "timestamp"), ("status", "string")],
    )
    events.select(F.col("ts").alias("booking_creation_time"), F.col("event_type").alias("status")).write.insertInto(
        cat.spark_name("g-project.playground.booking_log"), overwrite=True
    )

    # twomonths_data: order timestamps (1995-2001) with mixed-case status
    cat.create_table(
        "g-project.playground.twomonths_data",
        [("created_timestamp", "timestamp"), ("order_no", "string"), ("latest_status_name", "string")],
    )
    orders.select(
        F.col("o_orderdate").alias("created_timestamp"),
        F.col("o_orderkey").cast("string").alias("order_no"),
        F.when(F.col("o_orderstatus") == "F", "Completed")
        .when(F.col("o_orderstatus") == "O", "COMPLETED")
        .otherwise("pending")
        .alias("latest_status_name"),
    ).write.insertInto(cat.spark_name("g-project.playground.twomonths_data"), overwrite=True)

    # gsheet_log source (federated): dup-heavy 4-column sheet
    cat.create_table(
        "g-project.playground.gsheet_log",
        [("method", "string"), ("type", "string"), ("accuracy", "double"), ("total_sample", "string")],
    )
    events.select(
        F.upper(F.col("event_type")).alias("method"),
        F.col("props").alias("type"),
        F.round(F.col("value"), 1).alias("accuracy"),
        (F.col("user_id") % 100).cast("string").alias("total_sample"),
    ).write.insertInto(cat.spark_name("g-project.playground.gsheet_log"), overwrite=True)

    # legacy spillover source: ingestion-partitioned with recent dates
    cat.create_table(
        "g-project.integration.fd_booking_all",
        [("load_time", "timestamp")],
        PartitionSpec(kind=PartitionKind.INGESTION_DAY),
    )
    recent = spark.range(200).select(
        F.expr("current_timestamp() - make_interval(0,0,0, CAST(id % 5 AS INT), 3,0,0)").alias("load_time"),
        F.expr("current_date() - CAST(id % 5 AS INT)").alias("dt"),
    )
    recent.write.insertInto(cat.spark_name("g-project.integration.fd_booking_all"), overwrite=True)

    # destinations (CREATE_NEVER: engine never auto-creates)
    dests: list[tuple[str, list[tuple[str, str]], PartitionSpec]] = [
        ("g-project.playground.sample_select_partitioned",
         [("hakai", "string"), ("rasengan", "string"), ("over", "bigint"), ("event_timestamp", "timestamp")],
         PartitionSpec(PartitionKind.COLUMN_DAY, "event_timestamp")),
        ("g-project.playground.test_booking_count",
         [("count", "bigint"), ("date", "date")],
         PartitionSpec(PartitionKind.INGESTION_DAY)),
        ("g-project.playground.test_booking_count_column_partitioned",
         [("count", "bigint"), ("date", "date")],
         PartitionSpec(PartitionKind.COLUMN_DAY, "date")),
        ("g-project.playground.test_booking_count_dml",
         [("date", "date"), ("count", "bigint")],
         PartitionSpec()),
        ("g-project.playground.sample_replace",
         [("hakai", "string"), ("rasengan", "string"), ("over", "bigint"), ("event_timestamp", "timestamp")],
         PartitionSpec(PartitionKind.COLUMN_DAY, "event_timestamp")),
        ("g-project.playground.sample_replace_monthly",
         [("hakai", "string"), ("rasengan", "string"), ("over", "bigint"), ("event_timestamp", "timestamp")],
         PartitionSpec(PartitionKind.COLUMN_DAY, "event_timestamp")),
        ("g-data-gojek-id-mart.playground.allow_field_addition_test",
         [("hakai", "string"), ("rasengan", "string"), ("overs", "string"), ("event_timestamp", "timestamp")],
         PartitionSpec(PartitionKind.COLUMN_DAY, "event_timestamp")),
        ("g-project.playground.count_weekly",
         [("week_start_date", "date"), ("order_count", "decimal(38,9)"),
          ("load_timestamp", "timestamp"), ("last_modified_timestamp", "timestamp")],
         PartitionSpec(PartitionKind.INGESTION_DAY)),
        ("g-project.playground.gsheet_log_dest",
         [("method_name", "string"), ("type", "string"), ("accuracy", "double"),
          ("total_sample_count", "decimal(38,9)")],
         PartitionSpec()),
        ("g-project.playground.sample_select_dependency_level_1",
         [("hakai", "string"), ("rasengan", "string"), ("over", "bigint"), ("load_timestamp", "timestamp")],
         PartitionSpec()),
        ("g-project.playground.sample_select_dependency_level_2",
         [("load_timestamp", "timestamp"), ("v", "bigint")],
         PartitionSpec()),
        ("g-project.playground.sample_select_copy",
         [("hakai", "string"), ("rasengan", "string")],
         PartitionSpec()),
    ]
    for fqn, columns, part in dests:
        cat.create_table(fqn, columns, part)

    # pre-populate replace_merge target partitions 2020-08-04..08 + one
    # out-of-scope partition, so delete scope is observable
    pre = spark.sql(
        "SELECT 'old' AS hakai, 'old' AS rasengan, CAST(1 AS BIGINT) AS over, ts AS event_timestamp, "
        "CAST(ts AS DATE) AS dt FROM (SELECT explode(sequence(TIMESTAMP'2020-08-04 12:00:00', "
        "TIMESTAMP'2020-08-10 12:00:00', INTERVAL 1 DAY)) AS ts)"
    )
    pre.write.insertInto(cat.spark_name("g-project.playground.sample_replace"), overwrite=True)

    # delete target: include the exact timestamp the sample deletes
    spark.sql(
        f"INSERT OVERWRITE {_q(cat.spark_name('g-project.playground.sample_select_dependency_level_2'))} "
        "VALUES (TIMESTAMP'2020-06-02 02:00:41.634266', 1), (TIMESTAMP'2020-06-03 00:00:00', 2)"
    )
    spark.sql(
        f"INSERT OVERWRITE {_q(cat.spark_name('g-project.playground.sample_select_copy'))} "
        "VALUES ('a', 'b')"
    )


def _q(name: str) -> str:
    return ".".join(f"`{p}`" for p in name.split("."))


# --- legacy macro normalization ---------------------------------------

_LEGACY_MACROS = {
    "dstart": "{{ .DSTART | Date }}",
    "dend": "{{ .DEND | Date }}",
}


def normalize_legacy_macros(sql: str, sub_daily: bool = False) -> str:
    """``'dstart'`` / ``'dend'`` string-literal macros (pre-Optimus
    style in the sample corpus) → Go-template macros that CompileAssets
    renders; `__dstart__`-style macros pass through untouched."""
    out = sql
    for legacy, template in _LEGACY_MACROS.items():
        rendered = template.replace(" | Date ", " ") if sub_daily else template
        out = re.sub(rf"(['\"]){legacy}\1", f"'{rendered}'", out)
    # legacy bare `destination_table` identifier → the rendered macro
    out = re.sub(r"`(?<!_)destination_table`(?!_)", "`__destination_table__`", out)
    return out


# --- task runner -------------------------------------------------------


def run_sample_task(
    engine: Engine,
    task_dir: str,
    schedule_at: datetime,
    dry_run: bool = False,
) -> TransformResult:
    """Run one sample task dir (properties.cfg + query.sql) at the
    given schedule time, mirroring the production path: window calc →
    CompileAssets per-day render → engine dispatch."""
    path = os.path.join(SAMPLES_ROOT, task_dir)
    with open(os.path.join(path, "properties.cfg")) as fh:
        cfg = task_config_from_properties(fh.read())
    with open(os.path.join(path, "query.sql")) as fh:
        sql = fh.read()
    # the one dest-name collision: source AND dest both 'gsheet_log'
    if task_dir == "select/federated_table":
        cfg.destination_table_name = "gsheet_log_dest"

    window = window_for(
        schedule_at, cfg.window_size or "24h", cfg.window_offset or "", cfg.window_truncate_upto or ""
    )
    sql = normalize_legacy_macros(sql, sub_daily=window.is_sub_daily)
    compiled = compile_assets(
        sql, window.start, window.end, cfg.load_method, execution_time=schedule_at
    )

    eng = Engine(engine.spark, catalog=engine.catalog, udf_registry=DEFAULT_UDF_REGISTRY)
    result = eng.transform(
        cfg, compiled, window.start, window.end, schedule_at, dry_run=dry_run
    )

    # legacy spillover fan-out: re-run the task window for each
    # collected spillover date (reference transformation.py:454-487)
    spill_file = os.path.join(path, "spillover_date.sql")
    if cfg.use_spillover and os.path.exists(spill_file):
        with open(spill_file) as fh:
            spill_sql = normalize_legacy_macros(fh.read(), sub_daily=False)
        dates = eng.collect_spillover_dates(
            spill_sql, window.start, window.end, schedule_at, cfg.timezone
        )
        for day in dates:
            day_start = datetime(day.year, day.month, day.day)
            day_sql = compile_assets(sql, day_start, day_start, cfg.load_method, schedule_at)
            eng.transform(
                cfg,
                day_sql,
                day_start,
                day_start + (window.end - window.start),
                schedule_at,
                dry_run=dry_run,
            )
        result.extras = {"spillover_dates": dates}  # type: ignore[attr-defined]
    return result
