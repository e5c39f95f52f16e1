"""Window-calculus tests — vectors ported from the reference suite
(reference: executor/tests/test_window.py)."""

from datetime import datetime, timedelta

import pytest

from transformers_spark.windowing import (
    CustomWindow,
    localise_datetime,
    parse_datetime,
    parse_duration,
    window_for,
)

SCHEDULED_NEXT_AT = datetime(2020, 7, 9, 4)


def test_size_only():
    w = window_for(SCHEDULED_NEXT_AT, "24h", "", "")
    assert w.end == SCHEDULED_NEXT_AT
    assert w.start == SCHEDULED_NEXT_AT - timedelta(days=1)


def test_positive_offset():
    w = window_for(SCHEDULED_NEXT_AT, "2d", "1d", "")
    assert w.end == SCHEDULED_NEXT_AT + timedelta(days=1)
    assert w.start == w.end - timedelta(days=2)


def test_negative_offset():
    w = window_for(SCHEDULED_NEXT_AT, "2d", "-24h", "")
    assert w.end == SCHEDULED_NEXT_AT - timedelta(days=1)
    assert w.start == w.end - timedelta(days=2)


def test_hour_truncation():
    w = window_for(SCHEDULED_NEXT_AT, "2h", "0", "h")
    assert w.end == datetime(2020, 7, 9, 4)
    assert w.start == datetime(2020, 7, 9, 2)


def test_day_truncation():
    w = window_for(SCHEDULED_NEXT_AT, "2d", "1d", "d")
    assert w.end == datetime(2020, 7, 10)
    assert w.start == datetime(2020, 7, 8)


def test_week_size_day_truncation():
    w = window_for(SCHEDULED_NEXT_AT, "1w", "24h", "d")
    assert w.end == datetime(2020, 7, 10)
    assert w.start == datetime(2020, 7, 3)


def test_week_truncation():
    # Monday-first week of 2020-07-09 runs Jul 6 – Jul 12 (Sunday);
    # snap to the Sunday, then back one week.
    w = window_for(SCHEDULED_NEXT_AT, "1w", "0", "w")
    assert w.start == datetime(2020, 7, 5)
    assert w.end == datetime(2020, 7, 12)


def test_week_truncation_with_offset():
    w = window_for(SCHEDULED_NEXT_AT, "1w", "2d", "w")
    assert w.start == datetime(2020, 7, 7)
    assert w.end == datetime(2020, 7, 14)


def test_week_truncation_on_sunday_stays_in_same_week():
    # Sunday belongs to the Mon–Sun week ending on itself.
    w = window_for(datetime(2020, 7, 12, 10), "1w", "0", "w")
    assert w.start == datetime(2020, 7, 5)
    assert w.end == datetime(2020, 7, 12)


def test_month_truncation():
    w = window_for(datetime(2020, 7, 9, 4), "720h", "0", "m")
    assert w.end == datetime(2020, 7, 1)
    assert w.start == datetime(2020, 7, 1) - timedelta(hours=720)


def test_custom_window():
    w = CustomWindow(datetime(2020, 1, 1), datetime(2020, 1, 3))
    assert w.size == timedelta(days=2)
    assert w.days() == [datetime(2020, 1, 1), datetime(2020, 1, 2)]


def test_invalid_truncate_raises():
    with pytest.raises(ValueError):
        window_for(SCHEDULED_NEXT_AT, "1d", "", "x")


@pytest.mark.parametrize(
    "text,seconds",
    [
        ("1d", 86400),
        ("2h", 7200),
        ("720h", 720 * 3600),
        ("-24h", -86400),
        ("1w", 7 * 86400),
        ("1d2h", 86400 + 7200),
        ("90m", 5400),
        ("", 0),
        ("0", 0),
        ("30", 30),
    ],
)
def test_parse_duration(text, seconds):
    assert parse_duration(text) == timedelta(seconds=seconds)


def test_parse_duration_invalid():
    with pytest.raises(ValueError):
        parse_duration("abc")


def test_localise_naive_and_aware():
    naive = datetime(2020, 7, 9, 4)
    jkt = localise_datetime(naive, "Asia/Jakarta")
    assert jkt.utcoffset() == timedelta(hours=7)
    assert (jkt.year, jkt.hour) == (2020, 4)  # naive → attach tz, wall time kept
    utc = localise_datetime(jkt, "UTC")
    assert utc.hour == 21 and utc.day == 8  # aware → convert


def test_parse_datetime_formats():
    assert parse_datetime("2020-07-09") == datetime(2020, 7, 9)
    aware = parse_datetime("2020-07-09T04:00:00Z")
    assert aware.utcoffset() == timedelta(0)
