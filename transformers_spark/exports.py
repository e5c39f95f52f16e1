"""Export jobs: query/table results to files — the analogue of
BigQuery extract jobs and ``EXPORT DATA OPTIONS(...)`` (the one
egress surface a bq2bq user has besides destination tables).

Mapping:

* format csv/json/parquet ↔ extract-job destination formats
  (CSV/NEWLINE_DELIMITED_JSON/PARQUET); csv gets a header like BQ's
  default, and compression (gzip/none) maps to Spark codec options.
* ``single_file=True`` ↔ an extract to one URI (no wildcard): BQ
  requires the wildcard form for large tables and errors past 1 GB on
  single-URI extracts — here the analogous discipline is a
  ``coalesce(1)`` that funnels the result through ONE task, which is
  exactly as scale-hostile as BQ's single-URI path. Callers exporting
  anything big keep the default sharded layout (one file per
  partition, the wildcard analogue).
* Exports run through the same engine session, so the result being
  exported benefits from the same pushdown/pruning as any query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["export_data", "EXPORT_FORMATS"]

EXPORT_FORMATS = ("csv", "json", "parquet")


def export_data(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    single_file: bool = False,
    compression: str | None = None,
    header: bool = True,
    overwrite: bool = True,
) -> None:
    """Write ``df`` to ``path`` in an interchange format. See module
    docstring for the BigQuery extract-job mapping; ``compression``
    accepts 'gzip'/'none' for csv+json and 'snappy'/'gzip'/'zstd'/
    'none' for parquet."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(
            f"unsupported export format {fmt!r}: use one of {EXPORT_FORMATS}"
        )
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite" if overwrite else "error")
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer.option("header", str(header).lower()).option("escape", '"').csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)
