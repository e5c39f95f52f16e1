"""Property-based tests (hypothesis) for the pure-Python kernels —
window calculus and macro rendering. The reference tests these with a
handful of examples (reference: executor/tests/test_window.py,
test_query.py); properties pin the invariants for the whole input
space."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from transformers_spark.macros import render_macros
from transformers_spark.windowing import CustomWindow, _truncate, window_for

schedule_times = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2035, 12, 31)
)
sizes = st.sampled_from(["1h", "2h", "24h", "1d", "2d", "7d", "720h", "30d"])
offsets = st.sampled_from(["", "0", "1h", "-1h", "24h", "-24h", "2d", "-48h"])
truncs = st.sampled_from(["", "h", "d", "w", "M"])


@given(schedule_times, sizes, offsets, truncs)
@settings(max_examples=300, deadline=None)
def test_window_is_half_open_and_sized(end_time, size, offset, trunc):
    w = window_for(end_time, size, offset, trunc)
    assert w.start < w.end
    assert w.end - w.start == w.size  # size is exact, offset only shifts


@given(schedule_times, truncs)
@settings(max_examples=300, deadline=None)
def test_truncation_is_idempotent(end_time, trunc):
    once = _truncate(end_time, trunc)
    assert _truncate(once, trunc) == once
    assert once <= end_time or trunc == "w"  # week truncates to END of week


@given(schedule_times)
@settings(max_examples=300, deadline=None)
def test_week_truncation_lands_on_sunday_within_a_week(end_time):
    t = _truncate(end_time, "w")
    assert t.weekday() == 6  # Sunday (Monday-first weeks end Sunday)
    assert timedelta(0) <= t - end_time.replace(
        hour=0, minute=0, second=0, microsecond=0
    ) <= timedelta(days=6)


@given(schedule_times, sizes, truncs)
@settings(max_examples=300, deadline=None)
def test_consecutive_windows_tile_without_gap(end_time, size, trunc):
    """A schedule advancing by exactly the window size produces
    adjacent half-open windows (no gap, no overlap) when no
    truncation re-snaps the edge."""
    w1 = window_for(end_time, size, "", "")
    w2 = window_for(end_time + w1.size, size, "", "")
    assert w2.start == w1.end


@given(schedule_times, schedule_times)
@settings(max_examples=300, deadline=None)
def test_macro_rendering_no_substring_false_positives(a, b):
    start, end = sorted([a, b])
    if start == end:
        end = end + timedelta(hours=1)
    w = CustomWindow(start, end)
    sql = "select adstarta, __dstart__, __dend__ from t"
    out = render_macros(sql, w, execution_time=end)
    # reference contract (query.py plain re.sub + test_query.py:57-64):
    # names WITHOUT the dunder fences stay untouched; every fenced
    # occurrence is replaced
    assert "adstarta" in out
    assert "__dstart__" not in out and "__dend__" not in out


@given(schedule_times, schedule_times)
@settings(max_examples=300, deadline=None)
def test_macro_format_matches_window_grain(a, b):
    start, end = sorted([a, b])
    if start == end:
        end = end + timedelta(days=1)
    w = CustomWindow(start.replace(microsecond=0), end.replace(microsecond=0))
    out = render_macros("__dstart__|__dend__", w, execution_time=end)
    ds, de = out.split("|")
    if w.is_sub_daily:
        assert " " in ds or "T" in ds or ":" in ds  # datetime format
    else:
        assert len(ds) == len("2024-01-01")  # date-only format
        assert len(de) == len("2024-01-01")
