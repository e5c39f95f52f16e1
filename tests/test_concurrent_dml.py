"""Concurrent-DML contract (round-9 verdict ask 6): CONCSOAK proves
partition REPLACE loads race safely, but MERGE (and every
DML-emulation load) computes its staged replacement BY READING the
destination — two concurrent MERGEs without coordination would race
read-modify-write and lose updates. The contract (loaders.py module
docs): in-process loads on one table SERIALIZE on a per-table lock,
so N concurrent MERGEs produce the state of SOME serial execution
order; cross-process concurrency is unsupported. This module races
two real threads through dml.execute_merge and asserts exactly that,
plus that no orphan __stage_ tables survive."""

from __future__ import annotations

import threading

import pytest

FQN = "g-project.playground.conc_merge_t"

MERGE_TMPL = """MERGE INTO {sname} T
USING (SELECT k, v FROM {view}) S
ON T.k = S.k
WHEN MATCHED THEN UPDATE SET v = S.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (S.k, S.v)"""


def _state(cat, fqn):
    return sorted((r["k"], r["v"]) for r in cat.read(fqn).collect())


def _apply_upserts(state: dict, upserts) -> dict:
    out = dict(state)
    out.update(upserts)
    return out


@pytest.mark.parametrize("iteration", range(3))
def test_concurrent_merges_serialize_to_a_serial_outcome(
    spark, iteration
):
    from transformers_spark.catalog import Catalog
    from transformers_spark.dml import execute_merge, parse_merge
    from transformers_spark.loaders import Writer

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    cat.create_table(FQN, [("k", "bigint"), ("v", "bigint")])
    sname = cat.spark_name(FQN)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"
    ).createOrReplaceTempView("conc_merge_target_v")
    spark.sql(
        f"INSERT OVERWRITE TABLE {sname} "
        "SELECT k, v FROM conc_merge_target_v"
    )

    # A and B collide on key 1 (order-dependent) and each add a key
    # the other doesn't (a lost update drops one of them).
    batches = {
        "a": {1: 100, 3: 300},
        "b": {1: 111, 4: 400},
    }
    for label, rows in batches.items():
        spark.createDataFrame(
            sorted(rows.items()), "k long, v long"
        ).createOrReplaceTempView(f"conc_merge_src_{label}_v")

    errors: list[BaseException] = []
    barrier = threading.Barrier(len(batches))

    def run(label: str) -> None:
        try:
            stmt = parse_merge(
                MERGE_TMPL.format(
                    sname=sname, view=f"conc_merge_src_{label}_v"
                )
            )
            barrier.wait(timeout=60)
            execute_merge(spark, cat, writer, stmt, FQN)
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errors.append(exc)

    threads = [
        threading.Thread(target=run, args=(lb,)) for lb in batches
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    initial = {1: 10, 2: 20}
    serial_ab = _apply_upserts(
        _apply_upserts(initial, batches["a"].items()),
        batches["b"].items(),
    )
    serial_ba = _apply_upserts(
        _apply_upserts(initial, batches["b"].items()),
        batches["a"].items(),
    )
    final = _state(cat, FQN)
    assert final in (
        sorted(serial_ab.items()),
        sorted(serial_ba.items()),
    ), f"not a serial outcome: {final}"

    # both loads completed normally, so their try/finally dropped the
    # stages. Assert on THIS table's stage prefix only — a catalog-wide
    # recover_orphan_stages() here would race (and drop) live stages
    # belonging to other tests sharing the session (r10 ADVICE item 4).
    db, table = sname.replace("`", "").rsplit(".", 1)
    leftover = [
        t.name
        for t in spark.catalog.listTables(db)
        if t.name.startswith(f"{table}__stage_")
    ]
    assert leftover == []


REPLACE_FQN = "g-project.playground.conc_replace_t"


@pytest.mark.parametrize("iteration", range(2))
def test_merge_racing_replace_serializes(spark, iteration):
    """Mixed RMW + REPLACE concurrency on one table (r10 ADVICE item
    1): the MERGE reads the destination while a whole-table REPLACE
    swap rewrites it. With the REPLACE swap window now under the same
    per-table lock, the outcome must be one of the two serial orders —
    a torn outcome (MERGE planned against the pre-REPLACE listing but
    swapped in after it, resurrecting replaced rows) must be
    impossible in-process."""
    from transformers_spark.catalog import Catalog
    from transformers_spark.dml import execute_merge, parse_merge
    from transformers_spark.loaders import Writer

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    cat.create_table(REPLACE_FQN, [("k", "bigint"), ("v", "bigint")])
    sname = cat.spark_name(REPLACE_FQN)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"
    ).createOrReplaceTempView("conc_rr_init_v")
    spark.sql(
        f"INSERT OVERWRITE TABLE {sname} SELECT k, v FROM conc_rr_init_v"
    )
    spark.createDataFrame(
        [(1, 100), (3, 300)], "k long, v long"
    ).createOrReplaceTempView("conc_rr_merge_src_v")
    replace_df = spark.createDataFrame([(5, 50)], "k long, v long")

    errors: list[BaseException] = []
    barrier = threading.Barrier(2)

    def run_merge() -> None:
        try:
            stmt = parse_merge(
                MERGE_TMPL.format(sname=sname, view="conc_rr_merge_src_v")
            )
            barrier.wait(timeout=60)
            execute_merge(spark, cat, writer, stmt, REPLACE_FQN)
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errors.append(exc)

    def run_replace() -> None:
        try:
            barrier.wait(timeout=60)
            writer.overwrite_table(REPLACE_FQN, replace_df)
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errors.append(exc)

    threads = [
        threading.Thread(target=run_merge),
        threading.Thread(target=run_replace),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    serial_merge_then_replace = [(5, 50)]
    serial_replace_then_merge = [(1, 100), (3, 300), (5, 50)]
    final = _state(cat, REPLACE_FQN)
    assert final in (
        serial_merge_then_replace,
        serial_replace_then_merge,
    ), f"not a serial outcome: {final}"
