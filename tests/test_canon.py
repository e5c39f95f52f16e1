"""Unit tests for the shared result canonicalization (canon.py).

The pandas canon must treat a null DATE/TIMESTAMP identically whether
it arrives as Spark's object-cell ``None`` or DuckDB's datetime64
``NaT`` — round-4 review found NaT (a datetime.datetime that is NOT a
pd.Timestamp) slipping past the null check and stringifying as "NaT".
"""

import datetime

import pandas as pd

from transformers_spark.canon import normalize_rows, pandas_canon


def test_pandas_canon_nat_equals_none_for_dates():
    # DuckDB fetch_df() shape: DATE column -> datetime64[ns] with NaT.
    duck = pd.DataFrame({"d": pd.to_datetime(["2020-01-02", None])})
    assert str(duck["d"].dtype).startswith("datetime64")
    # Spark toPandas() shape: DateType -> object cells (date / None).
    spark = pd.DataFrame(
        {"d": [datetime.date(2020, 1, 2), None]}, dtype=object
    )
    assert pandas_canon(duck) == pandas_canon(spark)
    assert ("null",) in pandas_canon(duck)


def test_pandas_canon_nat_timestamp_column():
    duck = pd.DataFrame({"t": pd.to_datetime(["2020-01-02 03:04:05", None])})
    spark = pd.DataFrame(
        {"t": [datetime.datetime(2020, 1, 2, 3, 4, 5), None]}, dtype=object
    )
    assert pandas_canon(duck) == pandas_canon(spark)


def test_pandas_canon_int_float_drift_still_fails():
    # The driver-faithful property the canon exists for: int-vs-float
    # dtype drift must NOT canonicalize equal.
    ints = pd.DataFrame({"x": [1, 2]})
    floats = pd.DataFrame({"x": [1.0, 2.0]})
    assert pandas_canon(ints) != pandas_canon(floats)


def test_normalize_rows_sorts_columns_and_rounds():
    rows = [(2.0000001, "b"), (1.0, "a")]
    out = normalize_rows(rows, ["val", "key"])
    assert out == sorted([("a", "1"), ("b", "2")])
