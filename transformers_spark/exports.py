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

__all__ = ["export_data", "parse_export_data", "execute_export_data", "EXPORT_FORMATS"]

EXPORT_FORMATS = ("csv", "json", "parquet", "orc", "avro")


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
    accepts 'gzip'/'none' for csv+json, 'snappy'/'gzip'/'zstd'/'none'
    for parquet, 'zlib'/'snappy'/'zstd'/'none' for orc, and
    'snappy'/'deflate'/'none' for avro — validated up front so an
    invalid codec errors clearly, not deep inside the writer."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(
            f"unsupported export format {fmt!r}: use one of {EXPORT_FORMATS}"
        )
    valid_codecs = {
        "csv": {"gzip", "none"},
        "json": {"gzip", "none"},
        "parquet": {"snappy", "gzip", "zstd", "none"},
        "orc": {"zlib", "snappy", "zstd", "none"},
        "avro": {"snappy", "deflate", "none"},
    }
    if compression and compression.lower() not in valid_codecs[fmt]:
        raise ValueError(
            f"compression {compression!r} is not valid for {fmt}: use one "
            f"of {sorted(valid_codecs[fmt])}"
        )
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite" if overwrite else "error")
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer.option("header", str(header).lower()).option("escape", '"').csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "avro":
        # BigQuery extract format; Spark ships it as the external
        # spark-avro module — surface a clear error when absent
        try:
            writer.format("avro").save(path)
        except Exception as err:
            if "Failed to find data source: avro" in str(err):
                raise ValueError(
                    "avro export requires the spark-avro package "
                    "(org.apache.spark:spark-avro) on the session classpath"
                ) from err
            raise
    else:
        writer.parquet(path)


_EXPORT_RE_SRC = (
    r"^\s*EXPORT\s+DATA\s+OPTIONS\s*\((?P<opts>.*?)\)\s+AS\s+(?P<query>.*)$"
)


def parse_export_data(sql: str) -> tuple[dict, str]:
    """``EXPORT DATA OPTIONS(uri='...', format='CSV', ...) AS SELECT
    ...`` → (options, query). Mirrors BigQuery's statement: uri and
    format are required; header/compression/overwrite optional and
    DEFAULT FALSE (BigQuery's documented statement defaults). String
    literals are masked BEFORE the OPTIONS(...)/AS split, so a quoted
    value containing ``) AS`` (or a comma) cannot terminate the options
    group early."""
    import re

    from .dialect import _mask, _unmask

    masked = _mask(sql.strip().rstrip(";"))
    m = re.match(_EXPORT_RE_SRC, masked.text, re.IGNORECASE | re.DOTALL)
    if m is None:
        raise ValueError("not an EXPORT DATA statement")
    opts: dict = {}
    for part in m.group("opts").split(","):
        k, sep, v = part.partition("=")
        if not sep:
            raise ValueError(f"malformed EXPORT DATA option: {part!r}")
        key = k.strip().lower()
        val = _unmask(masked, v.strip())
        # strip MATCHING surrounding quotes only
        if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
            val = val[1:-1]
        opts[key] = val
    if "uri" not in opts or "format" not in opts:
        raise ValueError("EXPORT DATA requires uri and format options")
    return opts, _unmask(masked, m.group("query")).strip()


def execute_export_data(spark, sql: str) -> str:
    """Run an EXPORT DATA statement through :func:`export_data`;
    returns the destination directory. Overwrite semantics are
    DIRECTORY-level (Spark's file-sink model): with overwrite=true the
    whole destination directory is replaced — coarser than BigQuery's
    per-object replacement, hence overwrite defaults to false and a
    degenerate destination (root / empty) is rejected outright."""
    opts, query = parse_export_data(sql)
    # Options BigQuery honors but this engine does not implement must
    # ERROR, not silently produce non-matching output.
    supported = {"uri", "format", "header", "compression", "overwrite"}
    unknown = sorted(set(opts) - supported)
    if unknown:
        raise ValueError(
            f"unsupported EXPORT DATA option(s) {unknown}; supported: "
            f"{sorted(supported)}"
        )
    uri = opts["uri"]
    # BQ-style wildcard uri ('gs://.../part-*') → the directory is the
    # destination and sharding is the default; a non-wildcard uri maps
    # to the single-file form
    import os

    # guard only applies when there IS a directory part: for a bare
    # 'part-*' the rsplit head is the whole uri and the wildcard is
    # legitimately in the final (only) segment
    if "/" in uri and "*" in uri.rsplit("/", 1)[0]:
        raise ValueError(
            f"EXPORT DATA uri {uri!r}: the wildcard must appear in the "
            "final path segment (it names the shard files, not a "
            "directory)"
        )
    single = "*" not in uri
    # 'dir/part-*' → the DIRECTORY is the destination (the wildcard
    # names the shard files, which Spark controls)
    dest = os.path.dirname(uri.split("*")[0]) if "*" in uri else uri
    if not dest.rstrip("/" + os.sep):
        raise ValueError(
            f"EXPORT DATA uri {uri!r} resolves to an empty or root "
            "destination directory — refuse rather than overwrite it"
        )
    fmt_map = {
        "csv": "csv",
        "json": "json",
        "newline_delimited_json": "json",
        "parquet": "parquet",
        "avro": "avro",  # BQ extract format (needs spark-avro module)
        "orc": "orc",  # engine extension beyond BQ's format list
    }
    fmt = fmt_map.get(opts["format"].lower())
    if fmt is None:
        raise ValueError(f"unsupported EXPORT DATA format {opts['format']!r}")
    export_data(
        spark.sql(query),
        dest,
        fmt,
        single_file=single,
        compression=(opts.get("compression") or "").lower() or None,
        # BigQuery EXPORT DATA defaults BOTH to false
        header=opts.get("header", "false").lower() in ("true", "1"),
        overwrite=opts.get("overwrite", "false").lower() in ("true", "1"),
    )
    return dest
