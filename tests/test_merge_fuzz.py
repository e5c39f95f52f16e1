"""Differential fuzz of the general MERGE executor (round-7 verdict
ask 4): ``dml.build_merge_plan`` / ``execute_merge`` implement
clause-order resolution, multi-source-match errors, AND-predicates,
by-source deletes, and pass-through — this module property-tests those
semantics against an independent ~40-line pure-Python reference
interpreter of SQL-standard MERGE (reference semantics:
executor/bumblebee/query.py:6-62 and samples/tasks/dml/query.sql;
BigQuery MERGE documentation is the public contract). DuckDB in this
container (1.0.0) predates MERGE INTO, so the oracle is the reference
interpreter rather than a second engine — its clause DSL is
declarative, and each predicate/assignment carries BOTH its SQL text
and its Python meaning, so the two implementations cannot drift.

Workloads randomize: duplicate source keys (the multi-match error
path), NULL join keys (never match), NULL values through arithmetic
and comparisons (three-valued logic), multiple matched clauses with
AND-predicates (first-applicable resolution), inserts racing updates,
and by-source deletes. Pinned deterministic cases cover each named
verdict scenario so a regression names the broken semantics, not just
a shrunken example.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FQN = "g-project.playground.merge_fuzz_t"


# --- clause DSL: (sql fragment, python meaning) pairs -------------------

# matched-clause predicates see (t, s); insert predicates see s only;
# by-source predicates see t only. SQL three-valued logic: a NULL
# operand fails every comparison (mirrored with explicit None checks).
M_PREDS = {
    None: (None, lambda t, s: True),
    "tv_lt_sv": (
        "T.v < S.v",
        lambda t, s: t["v"] is not None and s["v"] is not None
        and t["v"] < s["v"],
    ),
    "sv_even": (
        "S.v % 2 = 0",
        lambda t, s: s["v"] is not None and s["v"] % 2 == 0,
    ),
    "sv_gt2": ("S.v > 2", lambda t, s: s["v"] is not None and s["v"] > 2),
}
I_PREDS = {
    None: (None, lambda s: True),
    "sv_even": ("S.v % 2 = 0", lambda s: s["v"] is not None and s["v"] % 2 == 0),
}
B_PREDS = {
    None: (None, lambda t: True),
    "tv_neg": ("T.v < 0", lambda t: t["v"] is not None and t["v"] < 0),
}
SETS = {
    "sv": ("v = S.v", lambda t, s: s["v"]),
    "sum": (
        "v = T.v + S.v",
        lambda t, s: None if t["v"] is None or s["v"] is None
        else t["v"] + s["v"],
    ),
    "lit9": ("v = 9", lambda t, s: 9),
}
INSERTS = {
    "sv": ("(k, v) VALUES (S.k, S.v)", lambda s: {"k": s["k"], "v": s["v"]}),
    "lit9": ("(k, v) VALUES (S.k, 9)", lambda s: {"k": s["k"], "v": 9}),
    "k_only": ("(k) VALUES (S.k)", lambda s: {"k": s["k"], "v": None}),
}

# each template: (matched clauses, insert clauses, by-source clauses)
# matched clause = (kind, pred key, set key or None for delete)
TEMPLATES = [
    # classic upsert
    ([("update", None, "sv")], [(None, "sv")], []),
    # guarded update, fall-through delete, gated insert
    (
        [("update", "tv_lt_sv", "sv"), ("delete", None, None)],
        [("sv_even", "sv")],
        [],
    ),
    # arithmetic update + by-source delete of negative leftovers
    ([("update", None, "sum")], [], [("tv_neg",)]),
    # delete-only matched path, literal insert, unconditional by-source
    ([("delete", "sv_gt2", None)], [(None, "lit9")], [(None,)]),
    # clause-order duel: both clauses are updates, first wins
    ([("update", "sv_even", "lit9"), ("update", None, "sum")], [], []),
    # partial-column insert (unlisted columns become NULL)
    ([("update", "tv_lt_sv", "lit9")], [(None, "k_only")], []),
]


def _merge_sql(spark_name: str, template) -> str:
    matched, inserts, by_source = template
    lines = [
        f"MERGE INTO {spark_name} T "
        "USING (SELECT k, v FROM merge_fuzz_source_v) S ON T.k = S.k"
    ]
    for kind, pred, setk in matched:
        cond = f" AND {M_PREDS[pred][0]}" if pred else ""
        if kind == "update":
            lines.append(f"WHEN MATCHED{cond} THEN UPDATE SET {SETS[setk][0]}")
        else:
            lines.append(f"WHEN MATCHED{cond} THEN DELETE")
    for pred, insk in inserts:
        cond = f" AND {I_PREDS[pred][0]}" if pred else ""
        lines.append(f"WHEN NOT MATCHED{cond} THEN INSERT {INSERTS[insk][0]}")
    for (pred,) in by_source:
        cond = f" AND {B_PREDS[pred][0]}" if pred else ""
        lines.append(f"WHEN NOT MATCHED BY SOURCE{cond} THEN DELETE")
    return "\n".join(lines)


def _ref_merge(target, source, template):
    """Reference MERGE: returns the post-merge row multiset, or None
    for the multi-source-match error."""
    matched, inserts, by_source = template

    def key_match(t, s):
        return (
            t["k"] is not None and s["k"] is not None and t["k"] == s["k"]
        )

    out = []
    for t in target:
        matches = [s for s in source if key_match(t, s)]
        affecting = []
        for s in matches:
            for kind, pred, setk in matched:
                if M_PREDS[pred][1](t, s):
                    affecting.append((kind, setk, s))
                    break
        if len(affecting) > 1:
            return None
        if affecting:
            kind, setk, s = affecting[0]
            if kind == "update":
                out.append({"k": t["k"], "v": SETS[setk][1](t, s)})
            # delete: row dropped
        elif not matches and by_source:
            for (pred,) in by_source:
                if B_PREDS[pred][1](t):
                    break  # deleted
            else:
                out.append(dict(t))
        else:
            out.append(dict(t))
    for s in source:
        if not any(key_match(t, s) for t in target):
            for pred, insk in inserts:
                if I_PREDS[pred][1](s):
                    out.append(INSERTS[insk][1](s))
                    break
    return out


def _canon(rows) -> list[tuple]:
    return sorted(
        (
            ("n" if r["k"] is None else f"i{r['k']}"),
            ("n" if r["v"] is None else f"i{r['v']}"),
        )
        for r in rows
    )


def _run_spark_merge(spark, target, source, template):
    from transformers_spark.catalog import Catalog
    from transformers_spark.dml import execute_merge, parse_merge
    from transformers_spark.loaders import Writer

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    cat.create_table(FQN, [("k", "bigint"), ("v", "bigint")])
    sname = cat.spark_name(FQN)
    schema = "k long, v long"
    tdf = spark.createDataFrame(
        [(r["k"], r["v"]) for r in target], schema
    )
    tdf.createOrReplaceTempView("merge_fuzz_target_v")
    spark.sql(
        f"INSERT OVERWRITE TABLE {sname} SELECT k, v FROM merge_fuzz_target_v"
    )
    sdf = spark.createDataFrame(
        [(r["k"], r["v"]) for r in source], schema
    )
    sdf.createOrReplaceTempView("merge_fuzz_source_v")
    stmt = parse_merge(_merge_sql(sname, template))
    execute_merge(spark, cat, writer, stmt, FQN)
    return [
        {"k": r["k"], "v": r["v"]} for r in cat.read(FQN).collect()
    ]


_key = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
_val = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_row = st.fixed_dictionaries({"k": _key, "v": _val})


@given(
    target=st.lists(_row, max_size=6),
    source=st.lists(_row, max_size=6),
    tidx=st.integers(min_value=0, max_value=len(TEMPLATES) - 1),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_merge_matches_reference(spark, target, source, tidx):
    template = TEMPLATES[tidx]
    expected = _ref_merge(target, source, template)
    if expected is None:
        with pytest.raises(Exception, match="matched more than one source"):
            _run_spark_merge(spark, target, source, template)
    else:
        got = _run_spark_merge(spark, target, source, template)
        assert _canon(got) == _canon(expected)


# --- ingestion-day arm: dt retention under randomized workloads ---------

ING_FQN = "g-project.playground.merge_fuzz_ing"
ING_DATES = ("2020-05-05", "2020-06-06")  # target rows split by parity


def _ref_merge_ingestion(target, source, template, load_day):
    """Reference MERGE over an INGESTION_DAY table: rows carry dt;
    updated and kept rows RETAIN it, inserts stamp ``load_day``. Same
    walk as ``_ref_merge`` with dt carried through."""
    matched, inserts, by_source = template

    def key_match(t, s):
        return (
            t["k"] is not None and s["k"] is not None and t["k"] == s["k"]
        )

    out = []
    for t in target:
        matches = [s for s in source if key_match(t, s)]
        affecting = []
        for s in matches:
            for kind, pred, setk in matched:
                if M_PREDS[pred][1](t, s):
                    affecting.append((kind, setk, s))
                    break
        if len(affecting) > 1:
            return None
        if affecting:
            kind, setk, s = affecting[0]
            if kind == "update":
                out.append(
                    {"k": t["k"], "v": SETS[setk][1](t, s), "dt": t["dt"]}
                )
        elif not matches and by_source:
            for (pred,) in by_source:
                if B_PREDS[pred][1](t):
                    break
            else:
                out.append(dict(t))
        else:
            out.append(dict(t))
    for s in source:
        if not any(key_match(t, s) for t in target):
            for pred, insk in inserts:
                if I_PREDS[pred][1](s):
                    row = INSERTS[insk][1](s)
                    out.append({**row, "dt": load_day})
                    break
    return out


def _run_spark_merge_ingestion(spark, target, source, template):
    from transformers_spark.catalog import (
        Catalog,
        PartitionKind,
        PartitionSpec,
    )
    from transformers_spark.dml import execute_merge, parse_merge
    from transformers_spark.loaders import Writer

    cat = Catalog(spark)
    writer = Writer(spark, cat)
    sname = cat.spark_name(ING_FQN)
    spark.sql(f"DROP TABLE IF EXISTS {sname}")
    cat.create_table(
        ING_FQN,
        [("k", "bigint"), ("v", "bigint")],
        PartitionSpec(kind=PartitionKind.INGESTION_DAY),
    )
    schema = "k long, v long"
    for dt, rows in zip(
        ING_DATES,
        (
            [r for i, r in enumerate(target) if i % 2 == 0],
            [r for i, r in enumerate(target) if i % 2 == 1],
        ),
    ):
        tdf = spark.createDataFrame([(r["k"], r["v"]) for r in rows], schema)
        tdf.createOrReplaceTempView("merge_fuzz_ing_target_v")
        spark.sql(
            f"INSERT OVERWRITE TABLE {sname} PARTITION (dt = '{dt}') "
            "SELECT k, v FROM merge_fuzz_ing_target_v"
        )
    sdf = spark.createDataFrame([(r["k"], r["v"]) for r in source], schema)
    sdf.createOrReplaceTempView("merge_fuzz_source_v")
    stmt = parse_merge(_merge_sql(sname, template))
    execute_merge(spark, cat, writer, stmt, ING_FQN)
    return [
        {"k": r["k"], "v": r["v"], "dt": str(r["dt"])}
        for r in cat.read(ING_FQN, include_partition_col=True).collect()
    ]


def _canon_dt(rows) -> list[tuple]:
    return sorted(
        (
            ("n" if r["k"] is None else f"i{r['k']}"),
            ("n" if r["v"] is None else f"i{r['v']}"),
            str(r["dt"]),
        )
        for r in rows
    )


@given(
    target=st.lists(_row, max_size=5),
    source=st.lists(_row, max_size=5),
    tidx=st.integers(min_value=0, max_value=len(TEMPLATES) - 1),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ingestion_merge_matches_reference(spark, target, source, tidx):
    """INGESTION_DAY tables under the same randomized workloads: every
    kept/updated row retains its original dt partition, every insert
    stamps the load day — checked on (k, v, dt) multisets."""
    template = TEMPLATES[tidx]
    # seed dt by position parity, matching _run_spark_merge_ingestion
    target = [
        {**r, "dt": ING_DATES[i % 2]} for i, r in enumerate(target)
    ]
    load_day = str(
        spark.sql("SELECT current_date() AS d").collect()[0]["d"]
    )
    expected = _ref_merge_ingestion(target, source, template, load_day)
    if expected is None:
        with pytest.raises(Exception, match="matched more than one source"):
            _run_spark_merge_ingestion(spark, target, source, template)
    else:
        got = _run_spark_merge_ingestion(spark, target, source, template)
        assert _canon_dt(got) == _canon_dt(expected)


# --- pinned verdict scenarios (named, not shrunk) ------------------------


def test_multi_match_update_errors(spark):
    """Two source rows both UPDATE-match one target row -> the merge
    MUST raise (BigQuery errors; picking one would corrupt the table)."""
    with pytest.raises(Exception, match="matched more than one source"):
        _run_spark_merge(
            spark,
            [{"k": 1, "v": 0}],
            [{"k": 1, "v": 1}, {"k": 1, "v": 2}],
            TEMPLATES[0],
        )


def test_multi_match_allowed_when_preds_disambiguate(spark):
    """Duplicate source keys are legal when only ONE of them passes a
    matched clause predicate — the guard counts AFFECTING pairs, not
    raw matches."""
    template = ([("update", "sv_gt2", "sv")], [], [])
    got = _run_spark_merge(
        spark,
        [{"k": 1, "v": 0}],
        [{"k": 1, "v": 1}, {"k": 1, "v": 7}],  # only 7 passes S.v > 2
        template,
    )
    assert _canon(got) == _canon([{"k": 1, "v": 7}])


def test_clause_order_first_applicable_wins(spark):
    """matched AND t.v < s.v UPDATE SET v = S.v, else DELETE: the row
    below the source value updates, the row above it is deleted."""
    got = _run_spark_merge(
        spark,
        [{"k": 1, "v": 5}, {"k": 2, "v": 20}],
        [{"k": 1, "v": 10}, {"k": 2, "v": 10}],
        TEMPLATES[1],
    )
    assert _canon(got) == _canon([{"k": 1, "v": 10}])


def test_null_keys_never_match(spark):
    """NULL join keys match nothing: the NULL-keyed target row passes
    through, the NULL-keyed source row INSERTs."""
    got = _run_spark_merge(
        spark,
        [{"k": None, "v": 1}],
        [{"k": None, "v": 2}],
        TEMPLATES[0],
    )
    assert _canon(got) == _canon(
        [{"k": None, "v": 1}, {"k": None, "v": 2}]
    )


def test_ingestion_partition_retained_on_update(spark):
    """INGESTION_DAY semantics: updated rows RETAIN their original dt
    partition (BigQuery never moves _PARTITIONTIME on UPDATE);
    inserted rows stamp the load day (current_date)."""
    from datetime import date

    from pyspark.sql import functions as F

    from transformers_spark.catalog import (
        Catalog,
        PartitionKind,
        PartitionSpec,
    )
    from transformers_spark.dml import execute_merge, parse_merge
    from transformers_spark.loaders import Writer

    fqn = "g-project.playground.merge_fuzz_ingest"
    cat = Catalog(spark)
    writer = Writer(spark, cat)
    cat.create_table(
        fqn,
        [("k", "bigint"), ("v", "bigint")],
        PartitionSpec(kind=PartitionKind.INGESTION_DAY),
    )
    sname = cat.spark_name(fqn)
    spark.sql(
        f"INSERT OVERWRITE TABLE {sname} PARTITION (dt = '2020-05-05') "
        "SELECT 1 AS k, 10 AS v"
    )
    spark.createDataFrame(
        [(1, 99), (2, 20)], "k long, v long"
    ).createOrReplaceTempView("merge_fuzz_source_v")
    stmt = parse_merge(_merge_sql(sname, TEMPLATES[0]))
    execute_merge(spark, cat, writer, stmt, fqn)
    rows = {
        r["k"]: r
        for r in cat.read(fqn, include_partition_col=True).collect()
    }
    assert rows[1]["v"] == 99
    assert rows[1]["dt"] == date(2020, 5, 5)  # partition retained
    assert rows[2]["dt"] == spark.sql(
        "SELECT current_date() AS d"
    ).collect()[0]["d"]  # insert stamps load day
