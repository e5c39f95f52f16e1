"""External (federated) tables.

The reference reads Google-Sheet-backed BigQuery external tables
(reference: samples/tasks/select/federated_table/, drive scope in
bigquery_service.py:183). The Spark analogue: register CSV/JSON/
parquet files as external tables under the same catalog coordinates —
queries address them exactly like managed tables; Catalyst handles
schema, pushdown (parquet) and pruning.

A JDBC variant has the same surface; it needs a driver jar on the
classpath, so it's gated behind a clear error here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog

__all__ = ["register_external_table", "register_jdbc_table"]

_READERS = {"csv", "json", "parquet"}


def _sq(value: str) -> str:
    """Single-quote a DDL option/location value, escaping embedded
    quotes (a path like /data/o'brien must not break the statement)."""
    return "'" + str(value).replace("'", "\\'") + "'"


def _schema_to_ddl(schema) -> str:
    """Field-by-field DDL with backticked names — schema.simpleString()
    munging breaks on names containing spaces/colons/hyphens."""
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


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
    entry; DROP removes metadata only, never the files. DDL goes
    through the catalog's retry wrapper like every other catalog call.
    """
    if fmt not in _READERS:
        raise ValueError(f"unsupported external format {fmt!r}")
    spark = catalog.spark
    name = catalog.spark_name(fqn)
    db = name.split(".")[0]
    catalog._run_ddl(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    if schema_ddl is None and fmt in ("csv", "json"):
        # infer once driver-side, then pin the schema in the DDL so the
        # table definition is stable across sessions
        schema = (
            spark.read.format(fmt).options(**opts, inferSchema=True).load(path).schema
        )
        schema_ddl = _schema_to_ddl(schema)
    cols = f" ({schema_ddl})" if schema_ddl else ""
    opts_ddl = (
        " OPTIONS (" + ", ".join(f"{_sq(k)} = {_sq(v)}" for k, v in opts.items()) + ")"
        if opts
        else ""
    )
    qname = ".".join(f"`{p}`" for p in name.split("."))
    catalog._run_ddl(
        f"CREATE TABLE IF NOT EXISTS {qname}{cols} USING {fmt}{opts_ddl} "
        f"LOCATION {_sq(path)}"
    )
    return spark.table(name)


def register_jdbc_table(
    catalog: Catalog,
    fqn: str,
    url: str,
    dbtable: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC-backed external table registered under the SAME catalog
    coordinates the dialect produces for ``fqn`` (``project_dataset.
    table``) via ``CREATE TABLE ... USING jdbc`` — so queries address
    it exactly like any other table. Requires the JDBC driver jar on
    the Spark classpath; probed up front for a clear error."""
    spark = catalog.spark
    opts = {"url": url, "dbtable": dbtable, **(options or {})}
    try:
        df = spark.read.format("jdbc").options(**opts).load()
    except Exception as err:  # driver jar missing, bad url, ...
        raise RuntimeError(
            f"JDBC source unavailable for {fqn} ({url}): {err}"
        ) from err
    name = catalog.spark_name(fqn)
    db = name.split(".")[0]
    catalog._run_ddl(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    qname = ".".join(f"`{p}`" for p in name.split("."))
    if any(k.lower() in ("password", "keytab") for k in opts):
        # the options are serialized into CREATE TABLE DDL and stored
        # as plaintext table properties (readable via SHOW CREATE
        # TABLE, durable under a Hive metastore) — never put secrets
        # there; use a credential provider or a secrets-managed url
        import warnings

        warnings.warn(
            f"register_jdbc_table({fqn}): credential option will be "
            "persisted in PLAINTEXT catalog DDL — use a credential "
            "provider or secrets-managed url instead",
            RuntimeWarning,
            stacklevel=2,
        )
    opts_ddl = ", ".join(f"{_sq(k)} = {_sq(v)}" for k, v in opts.items())
    catalog._run_ddl(
        f"CREATE TABLE IF NOT EXISTS {qname} USING jdbc OPTIONS ({opts_ddl})"
    )
    return df
