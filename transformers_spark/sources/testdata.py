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
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        field.name
        for field in schema
        if str(field.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for col in _nano_timestamp_columns(path):
        # integer DIV keeps the long exact (nanos ≈ 1.7e18 > 2^53 would
        # lose precision through a double division)
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` DIV 1000)"))
    return df


def register_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
