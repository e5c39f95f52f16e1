"""Raw-corpus ingestion: JSONL / CSV document readers for the
training-data pipeline operators (dedup, curation, text analysis all
consume the (doc_id, text, lang, source) shape).

Scale discipline:

* **Explicit schema, never inference.** ``inferSchema``/sampled JSON
  schema inference is a second full pass over the corpus — at 100 TB
  that doubles ingest cost and can still guess wrong on sparse keys.
  Callers pass (or accept) a fixed schema; drift lands in the corrupt
  bucket instead of silently re-typing a column.
* **Corrupt records are data, not exceptions.** The quarantine path
  (:func:`ingest_jsonl` / :func:`ingest_csv`) reads files as text and
  parses with ``from_json``/``from_csv`` + ``columnNameOfCorruptRecord``
  — one scan yields both the clean frame and the corrupt lines with
  their source file. This deliberately avoids the native reader's
  corrupt-column restriction (Spark refuses corrupt-only projections
  over raw files unless the whole frame is cached — caching a corpus
  to count bad lines is exactly the wrong trade at scale).
* **Deterministic ids.** When the corpus has no id field, a content
  hash (md5 of text, optionally salted with the source file name) is
  synthesized — stable across runs, re-partitioning, and appends,
  which exact-dedup and hash-split require. Monotonic/zip ids are NOT
  used: they change with partitioning.
* Compression (gz/zstd) is transparent everywhere; gzipped files are
  non-splittable, so corpora should arrive as many medium files — the
  readers accept directories/globs and parallelize per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = [
    "DOC_SCHEMA",
    "CORRUPT_COL",
    "read_jsonl_documents",
    "read_csv_documents",
    "ingest_jsonl",
    "ingest_csv",
    "corrupt_rate_by_file",
    "synthesize_doc_id",
]

CORRUPT_COL = "_corrupt_record"

# canonical ingest shape; doc_id is synthesized later if absent
DOC_SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
    ]
)


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Plain clean-side reader — one JSON object per line (the standard
    crawl-dump shape), malformed lines dropped (DROPMALFORMED).
    ``multiLine`` stays False: multiline JSON forces whole-file parsing
    (one task per file, no intra-file parallelism). Use
    :func:`ingest_jsonl` when the corrupt lines must be kept."""
    return (
        spark.read.schema(schema or DOC_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    multiline_quotes: bool = False,
) -> DataFrame:
    """Plain clean-side CSV reader. ``multiline_quotes=True`` handles
    quoted embedded newlines at the cost of per-file (non-split)
    parsing — leave it off unless the corpus genuinely contains
    them."""
    return (
        spark.read.schema(schema or DOC_SCHEMA)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .option("multiLine", str(multiline_quotes).lower())
        .option("escape", '"')
        .csv(path)
    )


def _split_parsed(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    clean = (
        parsed.filter(F.col(f"r.{CORRUPT_COL}").isNull() & F.col("r").isNotNull())
        .select("r.*")
        .drop(CORRUPT_COL)
    )
    corrupt = parsed.filter(
        F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    ).select(F.col("value").alias("raw_record"), "source_file")
    return clean, corrupt


def _text_lines(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).select(
        "value", F.input_file_name().alias("source_file")
    )


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) from one text scan: each line parses via
    ``from_json`` with a corrupt-record column; corrupt keeps the raw
    line plus its source file for quarantine. Both frames derive from
    the same narrow scan — no caching, no double read."""
    schema = _with_corrupt(schema or DOC_SCHEMA)
    parsed = _text_lines(spark, path).select(
        F.from_json(
            "value", schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("r"),
        "value",
        "source_file",
    )
    return _split_parsed(parsed)


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) for HEADERLESS CSV shards (the common shape of
    bulk exports — a header per shard would need per-file first-line
    handling; use :func:`read_csv_documents` for header'd files).
    Same one-scan text + ``from_csv`` quarantine pattern as
    :func:`ingest_jsonl`; quoted embedded newlines are not supported
    on this path (they span text lines)."""
    schema = _with_corrupt(schema or DOC_SCHEMA)
    from .external import _schema_to_ddl

    ddl = _schema_to_ddl(schema)
    parsed = _text_lines(spark, path).select(
        F.from_csv(
            "value",
            ddl,
            {
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "mode": "PERMISSIVE",
                "sep": sep,
                "escape": '"',
            },
        ).alias("r"),
        "value",
        "source_file",
    )
    return _split_parsed(parsed)


def corrupt_rate_by_file(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    fmt: str = "jsonl",
    sep: str = ",",
) -> DataFrame:
    """Per-file corrupt-line rate — the ingest health report. One
    text scan + one aggregate. The csv branch takes the SAME parse
    options as :func:`ingest_csv` (``sep``, quote escaping) so the
    report agrees with what ingestion actually accepts."""
    schema = _with_corrupt(schema or DOC_SCHEMA)
    if fmt == "jsonl":
        parse = F.from_json(
            "value", schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        )
    elif fmt == "csv":
        from .external import _schema_to_ddl

        ddl = _schema_to_ddl(schema)
        parse = F.from_csv(
            "value",
            ddl,
            {
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": sep,
                "escape": '"',
            },
        )
    else:
        raise ValueError(f"unknown corpus format {fmt!r}: use 'jsonl' or 'csv'")
    lines = _text_lines(spark, path).select(
        "source_file", parse.alias("r")
    )
    bad = (
        F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    ).cast("int")
    return (
        lines.select("source_file", bad.alias("bad"))
        .groupBy("source_file")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("bad").cast("bigint").alias("n_corrupt"),
            F.round(F.sum("bad") / F.count(F.lit(1)), 6).alias("corrupt_rate"),
        )
    )


def synthesize_doc_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_with_file: bool = False,
) -> DataFrame:
    """Deterministic content-hash id: md5(text) (optionally salted with
    the source file name so byte-identical docs in different files get
    distinct ids — leave OFF when exact dedup should collapse them).
    Map-only; stable under re-partitioning/appends, unlike
    ``monotonically_increasing_id``. An existing non-null ``id`` column
    wins; rows lacking both id and text get NULL (quarantine them) —
    INCLUDING on the salted path (concat_ws would otherwise swallow
    the NULL text and hand every null-text row in a file the same
    md5(filename) id). Caveat: ``salt_with_file`` relies on
    ``input_file_name()``, which is only populated directly over a
    file scan — call this BEFORE any shuffle/join/union (the ingest
    functions' ``source_file`` column is the durable alternative)."""
    if salt_with_file:
        basis = F.when(
            F.col(text_col).isNotNull(),
            F.concat_ws("\x00", F.input_file_name(), F.col(text_col)),
        )
    else:
        basis = F.col(text_col)
    content_id = F.md5(basis)
    existing = F.col("id") if "id" in df.columns else F.lit(None).cast("string")
    return df.withColumn(id_col, F.coalesce(existing, content_id))
