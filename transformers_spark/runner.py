"""One-call task runner — the engine's equivalent of the reference's
``bq2bq(properties_file, query_file, ..., dstart, dend, execution_time,
dry_run)`` library API + container entrypoint (reference:
executor/bumblebee/bq2bq.py:15-51, executor/main.py:10-39).
"""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import SparkSession

from .config import TaskConfig, task_config_from_env, task_config_from_properties
from .engine import Engine, TransformResult
from .stats import collect_job_stats, write_xcom
from .windowing import parse_datetime

__all__ = ["run_task", "run_task_files"]


def run_task(
    spark: SparkSession,
    task_config: TaskConfig,
    sql_query: str,
    dstart: datetime | str,
    dend: datetime | str,
    execution_time: datetime | str,
    dry_run: bool = False,
    xcom_path: str | None = None,
    engine: Engine | None = None,
) -> TransformResult:
    """Run one transformation task and write job stats as xcom JSON."""
    if isinstance(dstart, str):
        dstart = parse_datetime(dstart)
    if isinstance(dend, str):
        dend = parse_datetime(dend)
    if isinstance(execution_time, str):
        execution_time = parse_datetime(execution_time)
    started = time.time()
    eng = engine or Engine(spark)
    if task_config.labels:
        label_str = ",".join(f"{k}={v}" for k, v in task_config.labels.items())
        spark.sparkContext.setJobGroup("transformers-spark", label_str)
    result = eng.transform(
        task_config, sql_query, dstart, dend, execution_time, dry_run=dry_run
    )
    stats = collect_job_stats(spark, started)
    stats.extras["dry_run"] = dry_run
    stats.extras["load_method"] = task_config.load_method.value
    write_xcom(stats, xcom_path)
    return result


def run_task_files(
    spark: SparkSession,
    properties_file: str | None,
    query_file: str,
    dstart: datetime | str,
    dend: datetime | str,
    execution_time: datetime | str,
    dry_run: bool = False,
    xcom_path: str | None = None,
) -> TransformResult:
    """File-based variant: ini properties (or env when None) + query.sql."""
    if properties_file:
        with open(properties_file) as fh:
            task_config = task_config_from_properties(fh.read())
    else:
        task_config = task_config_from_env()
    with open(query_file) as fh:
        sql_query = fh.read()
    return run_task(
        spark, task_config, sql_query, dstart, dend, execution_time, dry_run, xcom_path
    )
