"""Macro substitution for task SQL.

The reference renders three macros into the user SQL before handing it
to the execution engine (reference: executor/bumblebee/query.py:70-118):

* ``__dstart__`` / ``__dend__`` — the window bounds. Rendered as
  ``YYYY-mm-dd`` when the window is ≥ 1 day and not hour-truncated,
  else ``YYYY-mm-dd HH:MM:SS``.
* ``__execution_time__`` — ISO datetime with microseconds.
* ``__destination_table__`` — the fully-qualified destination name.

Whole-token replacement only: ``adstarta`` must NOT be rewritten
(reference tests/test_query.py:57-64). Replacement is plain substring
search on the literal macro text, which cannot match inside
``adstarta`` because of the double underscores.
"""

from __future__ import annotations

from datetime import datetime

from .windowing import Window

__all__ = ["render_macros", "DSTART", "DEND", "EXECUTION_TIME", "DESTINATION_TABLE"]

DSTART = "__dstart__"
DEND = "__dend__"
EXECUTION_TIME = "__execution_time__"
DESTINATION_TABLE = "__destination_table__"

DATE_FMT = "%Y-%m-%d"
DATETIME_FMT = "%Y-%m-%d %H:%M:%S"
EXECUTION_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def window_macro_values(window: Window) -> dict[str, str]:
    fmt = DATETIME_FMT if window.is_sub_daily else DATE_FMT
    return {DSTART: window.start.strftime(fmt), DEND: window.end.strftime(fmt)}


KNOWN_MACROS = (DSTART, DEND, EXECUTION_TIME, DESTINATION_TABLE)


def render_macros(
    sql: str,
    window: Window | None = None,
    execution_time: datetime | None = None,
    destination_table: str | None = None,
    extra: dict[str, str] | None = None,
    strict: bool = False,
) -> str:
    """Render all macros present in ``sql``; unknown text is untouched.

    ``strict=True`` raises if any KNOWN macro token survives rendering
    (e.g. the caller passed ``window=None`` while the SQL uses
    ``__dstart__``): with ``spark.sql.ansi.enabled=false`` a leftover
    macro literal CASTs to NULL and the query silently filters to zero
    rows — the engine's execution paths want the loud error instead."""
    params: dict[str, str] = {}
    if window is not None:
        params.update(window_macro_values(window))
    if execution_time is not None:
        params[EXECUTION_TIME] = execution_time.strftime(EXECUTION_FMT)
    if destination_table is not None:
        params[DESTINATION_TABLE] = destination_table
    if extra:
        params.update(extra)
    out = sql
    for key, value in params.items():
        out = out.replace(key, value)
    if strict:
        leftover = [m for m in KNOWN_MACROS if m in out]
        if leftover:
            raise ValueError(
                f"macros {leftover} remain after rendering — no value "
                "was supplied for them (a leftover literal would cast "
                "to NULL under non-ANSI SQL and silently empty the "
                "result)"
            )
    return out
