"""Test-data source registry.

Registers the driver-generated parquet tables
(``/root/testdata/sf*/{name}.parquet``) as temp views so both SQL text
and DataFrame builders can address them by bare name. Reads stay plain
parquet scans — filter pushdown and column pruning reach the files.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = ["TABLES", "register_tables", "table_path", "load_table"]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=256)
def _nano_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as
    nano-precision longs (spark.sql.legacy.parquet.nanosAsLong), so the
    source layer must convert them back to timestamps. Footer-only read,
    driver-side, once per path."""
    if os.path.isdir(path):
        parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
        if not parts:
            return ()
        path = os.path.join(path, sorted(parts)[0])
    try:
        pf = pq.ParquetFile(path)
        schema = pf.schema_arrow
    except Exception:
        return ()
    # INT96 (Spark's default timestamp output) ALSO surfaces as
    # timestamp[ns] in the arrow schema, but Spark reads it back as a
    # real TIMESTAMP — only annotated TIMESTAMP(NANOS) int64 columns
    # need the long->timestamp conversion. The physical type separates
    # the two.
    physical = {
        pf.schema.column(i).name: pf.schema.column(i).physical_type
        for i in range(len(pf.schema))
    }
    return tuple(
        field.name
        for field in schema
        if str(field.type).startswith("timestamp[ns")
        and physical.get(field.name) == "INT64"
    )


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    time_filter: tuple[str, "datetime", "datetime"] | None = None,
) -> DataFrame:
    """Load one table; nano-timestamp columns are converted to real
    timestamps.

    ``time_filter=(col, start, end)`` applies the half-open window ON
    THE RAW nanosecond longs *before* conversion: a filter on the
    converted column is an expression Parquet can't push down (at
    100 TB that's a full scan), while the raw long comparison reaches
    the row groups as a PushedFilter.
    """
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    nanos = _nano_timestamp_columns(path)
    if time_filter is not None:
        col, start, end = time_filter
        if col in nanos:
            df = df.filter(
                (F.col(col) >= _epoch_nanos(start)) & (F.col(col) < _epoch_nanos(end))
            )
        else:
            df = df.filter(
                (F.col(col) >= F.lit(start.isoformat(sep=" ")).cast("timestamp"))
                & (F.col(col) < F.lit(end.isoformat(sep=" ")).cast("timestamp"))
            )
    for col in nanos:
        # integer DIV keeps the long exact (nanos ≈ 1.7e18 > 2^53 would
        # lose precision through a double division)
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` DIV 1000)"))
    return df


def _epoch_nanos(dt: "datetime") -> int:
    from datetime import datetime, timedelta, timezone

    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)  # engine time is UTC
    # integer arithmetic end-to-end: dt.timestamp() is a float that
    # cannot hold epoch-seconds at microsecond precision (~1% of
    # instants truncate 1us low), which would shift the pushed-down
    # nanos bound off the converted-timestamp semantics at window edges
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return ((dt - epoch) // timedelta(microseconds=1)) * 1_000


def register_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Idempotent per session: each (view, sf_dir) registers once
    (~120 ms of schema read + analysis per table otherwise — several
    seconds across the full catalog run). Re-registering the same
    view from a different sf_dir replaces it."""
    cache = getattr(spark, "_ts_registered", None)
    if cache is None:
        cache = {}
        spark._ts_registered = cache
    for name in tables:
        if cache.get(name) == sf_dir:
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        cache[name] = sf_dir
