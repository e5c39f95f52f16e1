"""Full regex dependency-extraction corpus ported from the reference
Go tests (reference: task/bq2bq/main_test.go:302-496 'parse test')."""

import pytest

from transformers_spark.dialect import table_references

DEST = "proj.datas.tab"

CASES = [
    ("simple query",
     "select * from data-engineering.testing.table1",
     {"data-engineering.testing.table1"}),
    ("hyphenated table name",
     "select * from data-engineering.testing.table_name-1",
     {"data-engineering.testing.table_name-1"}),
    ("simple query with quotes",
     "select * from `data-engineering.testing.table1`",
     {"data-engineering.testing.table1"}),
    ("without project name",
     "select * from testing.table1",
     set()),
    ("simple join",
     "select * from data-engineering.testing.table1 join data-engineering.testing.table2 on some_field",
     {"data-engineering.testing.table1", "data-engineering.testing.table2"}),
    ("outer join",
     "select * from data-engineering.testing.table1 outer join data-engineering.testing.table2 on some_field",
     {"data-engineering.testing.table1", "data-engineering.testing.table2"}),
    ("subquery",
     "select * from (select order_id from data-engineering.testing.orders)",
     {"data-engineering.testing.orders"}),
    ("with clause + simple query",
     "with `information.foo.bar` as (select * from `data-engineering.testing.data`) select * from `information.foo.bar`",
     {"data-engineering.testing.data"}),
    ("with clause with missing project name",
     "with `foo.bar` as (select * from `data-engineering.testing.data`) select * from `foo.bar`",
     {"data-engineering.testing.data"}),
    ("project name with dashes",
     "select * from `foo-bar.baz.data`",
     {"foo-bar.baz.data"}),
    ("dataset and project name with dashes (unbalanced backtick)",
     "select * from `foo-bar.bar-baz.data",
     {"foo-bar.bar-baz.data"}),
    ("with clause + join",
     "with dedup_source as (select * from `project.fire.fly`) select * from dedup_source "
     "join `project.maximum.overdrive` on dedup_source.left = `project.maximum.overdrive`.right",
     {"project.fire.fly", "project.maximum.overdrive"}),
    ("double with + pseudoreference",
     "with s1 as (select * from internal.pseudo.ref), with internal.pseudo.ref as "
     "(select * from `project.another.name`) select * from s1",
     {"project.another.name"}),
    ("ignores from upstream",
     "select * from /* @ignoreupstream */ data-engineering.testing.table1",
     set()),
    ("ignores from upstream with quotes",
     "select * from /* @ignoreupstream */ `data-engineering.testing.table1`",
     set()),
    ("join that ignores from upstream",
     "select * from /* @ignoreupstream */ data-engineering.testing.table1 "
     "join data-engineering.testing.table2 on some_field",
     {"data-engineering.testing.table2"}),
    ("empty comment does not ignore upstream",
     "select * from /*  */ data-engineering.testing.table1 join data-engineering.testing.table2 on some_field",
     {"data-engineering.testing.table1", "data-engineering.testing.table2"}),
    ("ignores upstream of join",
     "select * from data-engineering.testing.table1 join /* @ignoreupstream */ "
     "data-engineering.testing.table2 on some_field",
     {"data-engineering.testing.table1"}),
    ("ignoreupstream on a CTE alias keeps the underlying table",
     """
     WITH my_temp_table AS (
         SELECT id, name FROM data-engineering.testing.an_upstream_table
     )
     SELECT id FROM /* @ignoreupstream */ my_temp_table
     """,
     {"data-engineering.testing.an_upstream_table"}),
    ("ignoreupstream inside the CTE body",
     """
     WITH my_temp_table AS (
         SELECT id, name FROM /* @ignoreupstream */ data-engineering.testing.an_upstream_table
     )
     SELECT id FROM my_temp_table
     """,
     set()),
    ("ignoreupstream both CTE body and alias",
     "WITH my_temp_table AS ( SELECT id, name FROM /* @ignoreupstream */ "
     "data-engineering.testing.an_upstream_table ) SELECT id FROM /* @ignoreupstream */ my_temp_table",
     set()),
    ("query inside line comment",
     """
     select * from data-engineering.testing.tableABC
     -- select * from data-engineering.testing.table1 join data-engineering.testing.table2 on some_field
     """,
     {"data-engineering.testing.tableABC"}),
    ("query inside block comment + ignored join",
     """
     select * from data-engineering.testing.tableABC
     /* select * from data-engineering.testing.table1 join data-engineering.testing.table2 on some_field */
     join /* @ignoreupstream */ data-engineering.testing.table2 on some_field
     """,
     {"data-engineering.testing.tableABC"}),
    ("destination self-reference excluded",
     f"select * from {DEST} join a.b.c on 1=1",
     {"a.b.c"}),
]


@pytest.mark.parametrize("name,query,expected", CASES, ids=[c[0] for c in CASES])
def test_regex_corpus(name, query, expected):
    assert set(table_references(query, destination=DEST)) == expected
