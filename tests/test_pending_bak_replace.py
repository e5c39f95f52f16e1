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


def test_rename_swap_preserves_table_properties_for_fresh_catalog(spark):
    """r13 staged-overwrite contract: after a whole-table staged
    overwrite, a FRESH Catalog (no cached meta) must read the same
    partition spec and user-set TBLPROPERTIES, and the data must be
    intact. The PARTITIONED arm is the regression this test CAUGHT
    when first written: rename-swapping a partitioned stage leaves
    the catalog's partition entries pointing at the stage's old
    per-partition locations (the table reads empty) — partitioned
    destinations therefore keep the snapshot protocol, and this test
    pins that routing. The flat arm pins prop survival through the
    actual RENAME swap (the stage becomes the destination, so props
    must be copied onto it)."""
    from pyspark.sql import functions as F

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    fqn = "g-project.playground.swap_props_t"
    sname = cat.spark_name(fqn)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(
        fqn,
        [("id", "bigint"), ("d", "date")],
        partition=PartitionSpec(kind=PartitionKind.COLUMN_DAY, field="d"),
    )
    writer.append(fqn, spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01")], "id bigint, d string"
    ).selectExpr("id", "CAST(d AS DATE) AS d"))
    spark.sql(
        f"ALTER TABLE {sname} SET TBLPROPERTIES ('custom.prop' = 'keepme')"
    )
    # partition-UNSAFE update (SET touches the partition field) routes
    # through the whole-table rename swap on a PARTITIONED destination
    writer.update_where(fqn, {"d": "DATE'2024-03-03'"}, "id = 2")

    fresh = Catalog(spark)  # no cached meta: props come from the table
    meta = fresh.get_table(fqn)
    assert meta.partition.kind == PartitionKind.COLUMN_DAY
    assert meta.partition.field == "d"
    props = {
        r[0]: r[1]
        for r in spark.sql(f"SHOW TBLPROPERTIES {sname}").collect()
    }
    assert props.get("custom.prop") == "keepme"
    rows = {r["id"]: r for r in fresh.read(fqn).collect()}
    assert str(rows[2]["d"]) == "2024-03-03"
    assert str(rows[2]["dt"]) == "2024-03-03"  # dt recomputed + partitioned
    assert str(rows[1]["d"]) == "2024-01-01"
    # the swap leaves no __old_/__stage_/__bak_ state behind
    db = sname.rsplit(".", 1)[0]
    leftovers = [t.name for t in spark.catalog.listTables(db)
                 if "__old_" in t.name or "__bak" in t.name]
    assert leftovers == [], leftovers
    spark.sql(f"DROP TABLE IF EXISTS {sname}")

    # flat arm: the RENAME swap itself must carry props onto the
    # swapped-in stage
    ffqn = "g-project.playground.swap_props_flat"
    fname = cat.spark_name(ffqn)
    spark.sql(f"DROP TABLE IF EXISTS {fname}")
    cat.create_table(ffqn, [("id", "bigint"), ("v", "string")])
    writer.append(ffqn, spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"))
    spark.sql(
        f"ALTER TABLE {fname} SET TBLPROPERTIES ('custom.prop' = 'keepme')"
    )
    writer.update_where(ffqn, {"v": "'z'"}, "id = 2")
    fprops = {
        r[0]: r[1]
        for r in spark.sql(f"SHOW TBLPROPERTIES {fname}").collect()
    }
    assert fprops.get("custom.prop") == "keepme"
    got = {r["id"]: r["v"] for r in Catalog(spark).read(ffqn).collect()}
    assert got == {1: "a", 2: "z"}
    leftovers = [t.name for t in spark.catalog.listTables(db)
                 if "__old_" in t.name or "__bak" in t.name
                 or "__stage_" in t.name]
    assert leftovers == [], leftovers
    spark.sql(f"DROP TABLE IF EXISTS {fname}")
