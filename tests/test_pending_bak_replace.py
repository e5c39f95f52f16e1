"""Pending-backup hygiene at the REPLACE/append entry points (r11
ADVICE, medium): a ``__bak_`` snapshot left by a DML that crashed
mid-swap must be consumed by the NEXT destination-mutating load of
ANY kind — not just the DML family. Before the fix, this sequence
silently lost a whole-table REPLACE:

  DML crashes mid-swap leaving __bak_ (pre-crash state A)
  -> user runs REPLACE writing B (converged, bak SURVIVED)
  -> next DML's _restore_pending_backup restores A over B.

These tests simulate the crashed DML in-process by creating the bak
snapshot directly (``Writer._create_backup`` — exactly the artifact a
real mid-swap kill leaves behind; the process-kill arms live in
test_crash_atomicity.py) and then assert every REPLACE-family and
append entry point clears it before committing.

Also covers the low-severity case-sensitivity fix: the Hive/in-memory
catalog lowercases stored table names, so a mixed-case destination
name must still match its (lowercased) ``__bak_`` listing during the
pending-restore scan.
"""

from __future__ import annotations

from datetime import date

import pytest

from transformers_spark.catalog import Catalog, PartitionKind, PartitionSpec
from transformers_spark.loaders import Writer


def _ids(spark, sname):
    return sorted(r[0] for r in spark.table(sname).select("id").collect())


def _baks(spark, sname):
    db = sname.rsplit(".", 1)[0]
    return [t.name for t in spark.catalog.listTables(db) if "__bak" in t.name]


@pytest.fixture()
def flat_table(spark):
    """Non-partitioned table seeded with state A = {1, 2} and a
    surviving bak snapshot of A (the crashed-DML artifact)."""
    cat = Catalog(spark)
    writer = Writer(spark, cat)
    fqn = "g-project.playground.bak_replace_t"
    sname = cat.spark_name(fqn)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(fqn, [("id", "bigint"), ("v", "string")])
    writer.append(fqn, spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"))
    meta = cat.get_table(fqn)
    bak = writer._create_backup(meta, None)
    yield spark, cat, writer, fqn, sname, bak
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    for name in _baks(spark, sname):
        spark.sql(f"DROP TABLE IF EXISTS {sname.rsplit('.', 1)[0]}.`{name}`")


def test_replace_consumes_pending_bak_and_next_dml_keeps_b(flat_table):
    spark, cat, writer, fqn, sname, bak = flat_table
    # REPLACE writes state B
    writer.overwrite_table(fqn, spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z")], "id bigint, v string"))
    assert _ids(spark, sname) == [10, 20, 30]
    # the pending bak must NOT survive the REPLACE...
    assert _baks(spark, sname) == []
    # ...so the next DML operates on B, not on a rolled-back A
    writer.delete_where(fqn, "id = 20")
    assert _ids(spark, sname) == [10, 30]


def test_replace_reads_destination_consumes_pending_bak(flat_table):
    spark, cat, writer, fqn, sname, bak = flat_table
    meta = cat.get_table(fqn)
    writer.overwrite_table(
        fqn,
        spark.table(meta.spark_name).selectExpr("id + 100 AS id", "v"),
        reads_destination=True,
    )
    assert _ids(spark, sname) == [101, 102]
    assert _baks(spark, sname) == []
    writer.delete_where(fqn, "id = 101")
    assert _ids(spark, sname) == [102]


def test_append_restores_damaged_destination_then_appends(flat_table):
    spark, cat, writer, fqn, sname, bak = flat_table
    # simulate the mid-swap damage the bak exists to undo: the
    # destination holds junk while the bak holds pre-crash state A
    spark.sql(f"INSERT OVERWRITE TABLE {sname} SELECT 999, 'junk'")
    writer.append(fqn, spark.createDataFrame(
        [(3, "c")], "id bigint, v string"))
    # restore-at-entry rebuilt A, then the append landed on top of it
    assert _ids(spark, sname) == [1, 2, 3]
    assert _baks(spark, sname) == []


def test_partitioned_replace_consumes_pending_bak(spark):
    cat = Catalog(spark)
    writer = Writer(spark, cat)
    fqn = "g-project.playground.bak_replace_part_t"
    sname = cat.spark_name(fqn)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(
        fqn, [("id", "bigint"), ("d", "date")],
        partition=PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="d"),
    )
    writer.append(fqn, spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id bigint, d string"
    ).selectExpr("id", "CAST(d AS DATE) AS d"))
    meta = cat.get_table(fqn)
    bak = writer._create_backup(meta, [date(2024, 1, 2)])
    # day-scoped REPLACE of 2024-01-02 with state B for that day
    writer.overwrite_partition(
        fqn,
        spark.createDataFrame([(202, "2024-01-02")], "id bigint, d string"
                              ).selectExpr("id", "CAST(d AS DATE) AS d"),
        date(2024, 1, 2),
    )
    assert _ids(spark, sname) == [1, 202]
    assert _baks(spark, sname) == []
    # next DML keeps the REPLACE's output
    writer.delete_where(fqn, "id = 1")
    assert _ids(spark, sname) == [202]
    spark.sql(f"DROP TABLE IF EXISTS {sname}")


def test_dynamic_replace_and_multi_partition_replace_consume_bak(spark):
    cat = Catalog(spark)
    writer = Writer(spark, cat)
    fqn = "g-project.playground.bak_replace_dyn_t"
    sname = cat.spark_name(fqn)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(
        fqn, [("id", "bigint"), ("d", "date")],
        partition=PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="d"),
    )
    writer.append(fqn, spark.createDataFrame(
        [(1, "2024-01-01")], "id bigint, d string"
    ).selectExpr("id", "CAST(d AS DATE) AS d"))
    meta = cat.get_table(fqn)
    writer._create_backup(meta, None)
    writer.overwrite_dynamic(fqn, spark.createDataFrame(
        [(11, "2024-01-01")], "id bigint, d string"
    ).selectExpr("id", "CAST(d AS DATE) AS d"))
    assert _ids(spark, sname) == [11]
    assert _baks(spark, sname) == []

    writer._create_backup(meta, None)
    writer.overwrite_partitions(fqn, {
        date(2024, 1, 1): spark.createDataFrame(
            [(111, "2024-01-01")], "id bigint, d string"
        ).selectExpr("id", "CAST(d AS DATE) AS d"),
    })
    assert _ids(spark, sname) == [111]
    assert _baks(spark, sname) == []
    spark.sql(f"DROP TABLE IF EXISTS {sname}")


def test_mixed_case_destination_still_matches_its_bak(spark):
    """The metastore lowercases stored names; a mixed-case spark_name
    anchored verbatim would never match listTables() output, voiding
    the mid-swap recovery guarantee for that table (r11 ADVICE, low).
    Build a Writer around a meta whose spark_name carries the original
    casing and prove the pending-restore still finds the bak."""
    cat = Catalog(spark)
    writer = Writer(spark, cat)
    fqn = "g-project.playground.MixedCase_Bak_T"
    sname = cat.spark_name(fqn)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(fqn, [("id", "bigint"), ("v", "string")])
    writer.append(fqn, spark.createDataFrame(
        [(1, "a")], "id bigint, v string"))
    meta = cat.get_table(fqn)
    assert meta.spark_name != meta.spark_name.lower(), (
        "fixture lost its point: sanitize lowercased the name, so this "
        "no longer exercises the mixed-case matching path"
    )
    writer._create_backup(meta, None)
    spark.sql(f"INSERT OVERWRITE TABLE {sname} SELECT 999, 'junk'")
    restored = writer._restore_pending_backup(meta)
    assert restored, "mixed-case pending bak was not found"
    assert _ids(spark, sname) == [1]
    assert _baks(spark, sname) == []
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
