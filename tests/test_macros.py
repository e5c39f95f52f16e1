"""Macro-substitution tests — vectors ported from the reference suite
(reference: executor/tests/test_query.py)."""

from datetime import datetime

from transformers_spark.macros import render_macros
from transformers_spark.windowing import CustomWindow, window_for


def test_daily_window_renders_dates():
    w = CustomWindow(datetime(2019, 1, 1), datetime(2019, 1, 2))
    sql = "select * from t where d >= '__dstart__' and d < '__dend__'"
    assert (
        render_macros(sql, window=w)
        == "select * from t where d >= '2019-01-01' and d < '2019-01-02'"
    )


def test_execution_time_and_destination():
    w = CustomWindow(datetime(2020, 7, 8, 4), datetime(2020, 7, 9, 4))
    sql = "select * from `__destination_table__` where d => '__execution_time__' and d < '__dend__'"
    out = render_macros(
        sql,
        window=w,
        execution_time=datetime(2020, 7, 8, 4),
        destination_table="table",
    )
    assert out == (
        "select * from `table` where d => '2020-07-08T04:00:00.000000' and d < '2020-07-09'"
    )


def test_sub_daily_window_renders_datetimes():
    w = window_for(datetime(2020, 7, 9, 4), "2h", "0", "h")
    sql = "select 1 where d >= '__dstart__' and d < '__dend__' and tt < '__dstart__'"
    assert render_macros(sql, window=w) == (
        "select 1 where d >= '2020-07-09 02:00:00' and d < '2020-07-09 04:00:00'"
        " and tt < '2020-07-09 02:00:00'"
    )


def test_no_substring_false_positives():
    w = window_for(datetime(2020, 7, 9, 4), "2h", "0", "h")
    sql = "select * from t where d => adstarta && event > __execution_time__"
    # execution_time not supplied → macro left untouched; adstarta untouched
    assert render_macros(sql, window=w) == sql


def test_multiple_occurrences_replaced():
    w = CustomWindow(datetime(2019, 1, 1), datetime(2019, 1, 2))
    sql = "'__dstart__' '__dstart__' '__dend__'"
    assert render_macros(sql, window=w) == "'2019-01-01' '2019-01-01' '2019-01-02'"
