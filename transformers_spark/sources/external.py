"""External (federated) tables.

The reference reads Google-Sheet-backed BigQuery external tables
(reference: samples/tasks/select/federated_table/, drive scope in
bigquery_service.py:183). The Spark analogue: register CSV/JSON/
parquet files as external tables under the same catalog coordinates —
queries address them exactly like managed tables; Catalyst handles
schema, pushdown (parquet) and pruning.

A JDBC variant is sketched with the same surface; it needs a driver
jar on the classpath, so it's gated behind a clear error here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog

__all__ = ["register_external_table", "register_jdbc_table"]

_READERS = {"csv", "json", "parquet"}


def register_external_table(
    catalog: Catalog,
    fqn: str,
    path: str,
    fmt: str = "csv",
    schema_ddl: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Register a file-backed external table at ``project.dataset.table``.

    Uses CREATE TABLE ... USING <fmt> LOCATION — an unmanaged catalog
    entry; DROP removes metadata only, never the files.
    """
    if fmt not in _READERS:
        raise ValueError(f"unsupported external format {fmt!r}")
    spark = catalog.spark
    name = catalog.spark_name(fqn)
    db = name.split(".")[0]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    if schema_ddl is None and fmt in ("csv", "json"):
        # infer once driver-side, then pin the schema in the DDL so the
        # table definition is stable across sessions
        schema_ddl = (
            spark.read.format(fmt).options(**opts, inferSchema=True).load(path).schema.simpleString()
        )
        schema_ddl = schema_ddl.removeprefix("struct<").removesuffix(">").replace(":", " ")
    cols = f" ({schema_ddl})" if schema_ddl else ""
    opts_ddl = (
        " OPTIONS (" + ", ".join(f"'{k}' = '{v}'" for k, v in opts.items()) + ")"
        if opts
        else ""
    )
    qname = ".".join(f"`{p}`" for p in name.split("."))
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {qname}{cols} USING {fmt}{opts_ddl} LOCATION '{path}'"
    )
    return spark.table(name)


def register_jdbc_table(
    catalog: Catalog,
    fqn: str,
    url: str,
    dbtable: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC-backed external table (same catalog surface). Requires the
    JDBC driver jar on the Spark classpath."""
    spark = catalog.spark
    try:
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", dbtable)
            .options(**(options or {}))
            .load()
        )
    except Exception as err:  # driver jar missing, bad url, ...
        raise RuntimeError(
            f"JDBC source unavailable for {fqn} ({url}): {err}"
        ) from err
    df.createOrReplaceTempView(catalog.spark_name(fqn).replace(".", "__"))
    return df
