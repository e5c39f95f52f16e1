"""Transformation-window calculus.

A *window* here is a half-open batch time interval ``[start, end)``
derived from a schedule time plus (size, offset, truncate) config —
the reference's core scheduling abstraction
(reference: executor/bumblebee/window.py:36-128,
executor/bumblebee/datehelper.py:6-25). Semantics preserved:

* truncate ``h``  → drop minutes/seconds/micros from the schedule time
* truncate ``d``  → drop the whole time-of-day
* truncate ``w``  → snap to the *end* (Sunday 00:00) of the
  Monday-first calendar week containing the schedule date
* truncate ``M``  → snap to the first day of the month (00:00)
* ``end = truncated + offset``; ``start = end - size``

Durations are strings like ``"1d"``, ``"2h"``, ``"720h"``, ``"-24h"``,
``"1w"``, ``"30m"``, combinations like ``"1d2h"``, or ``""``/``"0"``
for zero. Implemented from scratch (stdlib only — no pytimeparse/pytz).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from zoneinfo import ZoneInfo

__all__ = [
    "parse_duration",
    "localise_datetime",
    "parse_datetime",
    "Window",
    "CustomWindow",
    "window_for",
]

_DURATION_UNIT_SECONDS = {
    "w": 7 * 86400,
    "d": 86400,
    "h": 3600,
    "m": 60,
    "s": 1,
}

_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)\s*([wdhms])")


def parse_duration(text: str | int | float | timedelta) -> timedelta:
    """Parse ``"1d" / "2h" / "-24h" / "1d12h" / "90m" / "" / "0"`` → timedelta."""
    if isinstance(text, timedelta):
        return text
    if isinstance(text, (int, float)):
        return timedelta(seconds=text)
    s = (text or "").strip().lower()
    if s in ("", "0"):
        return timedelta(0)
    sign = 1
    if s.startswith("-"):
        sign, s = -1, s[1:]
    elif s.startswith("+"):
        s = s[1:]
    # bare number → seconds
    if re.fullmatch(r"\d+(?:\.\d+)?", s):
        return timedelta(seconds=sign * float(s))
    matches = _DURATION_RE.findall(s)
    if not matches or "".join(f"{n}{u}" for n, u in matches) != s.replace(" ", ""):
        raise ValueError(f"invalid duration: {text!r}")
    total = sum(float(n) * _DURATION_UNIT_SECONDS[u] for n, u in matches)
    return timedelta(seconds=sign * total)


def localise_datetime(dt: datetime, tzname: str) -> datetime:
    """Attach (naive) or convert (aware) ``dt`` to timezone ``tzname``.

    Mirrors reference datehelper.py:15-25 but on stdlib zoneinfo.
    """
    tz = ZoneInfo(tzname)
    if dt.tzinfo is None:
        return dt.replace(tzinfo=tz)
    return dt.astimezone(tz)


def parse_datetime(text: str) -> datetime:
    """Parse ISO-8601 ``YYYY-mm-dd[THH:MM:SS[Z|±HH:MM]]`` into datetime."""
    t = text.strip()
    if t.endswith(("Z", "z")):
        t = t[:-1] + "+00:00"
    return datetime.fromisoformat(t)


def _truncate(end_time: datetime, truncate_upto: str) -> datetime:
    t = (truncate_upto or "").lower()
    if t in ("", "0"):
        return end_time
    if t == "h":
        return end_time.replace(minute=0, second=0, microsecond=0)
    if t == "d":
        return end_time.replace(hour=0, minute=0, second=0, microsecond=0)
    if t == "w":
        # End (Sunday) of the Monday-first week containing the date.
        d: date = end_time.date()
        sunday = d + timedelta(days=6 - d.weekday())
        return datetime.combine(sunday, datetime.min.time(), tzinfo=end_time.tzinfo)
    if t == "m":
        first = end_time.date().replace(day=1)
        return datetime.combine(first, datetime.min.time(), tzinfo=end_time.tzinfo)
    raise ValueError(f"unsupported truncate method: {truncate_upto!r}")


@dataclass(frozen=True)
class Window:
    """Half-open transformation interval ``[start, end)``."""

    start: datetime
    end: datetime
    size: timedelta
    offset: timedelta = timedelta(0)
    truncate_upto: str = ""

    def __post_init__(self) -> None:
        if self.end < self.start:
            raise ValueError(f"window end {self.end} before start {self.start}")

    @property
    def is_sub_daily(self) -> bool:
        """True when macros should render with a time component.

        REFERENCE PARITY — do not "fix": the reference renders
        date-only for any >=1-day window regardless of the actual
        bound times (query.py:76-84 uses exactly this size/truncate
        test), so a 24h window offset by 6h renders as dates there
        too. Rendered SQL and Window.start/end can therefore disagree
        by design for offset whole-day windows; code needing the true
        bounds must use start/end, never the rendered macros."""
        return self.size < timedelta(days=1) or self.truncate_upto == "h"

    def days(self) -> list[datetime]:
        """Day-grain partition start times covered by the window."""
        out, cur = [], self.start
        while cur < self.end:
            out.append(cur)
            cur += timedelta(days=1)
        return out


def CustomWindow(start: datetime, end: datetime) -> Window:
    """Window from explicit bounds (reference window.py:75-85)."""
    return Window(start=start, end=end, size=end - start)


def window_for(
    end_time: datetime,
    window_size: str,
    window_offset: str = "",
    window_truncate_upto: str = "",
) -> Window:
    """Compute the window for a schedule time (reference window.py:88-128)."""
    size = parse_duration(window_size)
    offset = parse_duration(window_offset)
    end = _truncate(end_time, window_truncate_upto) + offset
    return Window(
        start=end - size,
        end=end,
        size=size,
        offset=offset,
        truncate_upto=(window_truncate_upto or "").lower(),
    )
