"""Temporal joins Spark lacks natively: as-of and bounded-range.

The reference's join surface is delegated SQL equi-joins only
(`SURVEY.md §2.B` "Joins": inner/left/outer, no temporal forms), but
an event/training-data pipeline needs point-in-time enrichment. Both
operators here avoid the naive |L|×|R| range join:

* :func:`asof_join` — union + ordered window: tag both sides, sort by
  (key, time, side) within key partitions, carry the most recent right
  row forward, keep left rows. ONE shuffle on the join key; state per
  row is one right-payload struct. This is the scalable as-of shape —
  a range join would explode before AQE could help.
* :func:`range_count_join` — equi-bucketed range join: quantize time
  into window-width buckets, probe each left row's two candidate
  buckets, then apply the exact range predicate. Work is proportional
  to pairs within the window, never |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_count_join", "ts_micros"]


def ts_micros(col):
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``unix_micros`` rejects TIMESTAMP_NTZ; the engine pins the session
    timezone to UTC (session.py), so the NTZ->TZ cast is wall-clock
    preserving and the two types yield identical numbers.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` and equal join key(s) (backward
    inclusive as-of — DuckDB's ``ASOF JOIN ... ON l.t >= r.t``).

    Returns all left columns plus ``right_cols`` (null when no right
    row precedes). Ties at identical (key, right_time) are broken by
    ``right_order`` ascending when given; pre-dedup the right side if
    neither time nor order is unique.

    NULL semantics match SQL ASOF: right rows with a NULL key or NULL
    ``right_time`` are dropped up front — without that, ascending sort
    puts NULL times FIRST so such a row would ride at the head of
    every window frame and match left rows that have no real
    predecessor, and NULL keys would enrich NULL-key left rows (an
    equality join never matches NULL). NULL-key or NULL-time left rows
    come back with null right columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [
        c for c in right.columns if c not in set(keys) | {right_time}
    ]
    order_expr = F.col(right_order) if right_order else F.lit(0)
    clean = right.filter(F.col(right_time).isNotNull())
    for k in keys:
        clean = clean.filter(F.col(k).isNotNull())
    r = clean.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        order_expr.alias("__ord"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    l = (
        left.withColumn("__t", F.col(left_time))
        .withColumn("__side", F.lit(1))
        # NullType coerces to the right side's __ord type in the union;
        # a typed 0 literal would conflict with e.g. a timestamp
        # right_order. Left rows never need an order value (only right
        # payloads participate in last(ignorenulls)).
        .withColumn("__ord", F.lit(None) if right_order else F.lit(0))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left at equal time (__side 0 < 1), so an
    # exactly-simultaneous right row matches — inclusive semantics
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    return matched.select(
        *left.columns, *[F.col("__m")[c].alias(c) for c in rcols]
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    window_us: int,
    count_col: str = "n_matches",
) -> DataFrame:
    """Per left row, the number of right rows with equal key(s) and
    ``right_time`` in the half-open window ``(left_time, left_time +
    window_us]`` (microseconds). Left rows with no matches keep 0.

    Bucketing both times by ``window_us`` means a right row can only
    affect left rows in its own or the previous bucket, so the join is
    an equi-join on (key, bucket) with a post-filter — the standard
    scalable interval-join shape (the right side is never replicated;
    each probe key hits exactly two buckets).

    The count depends ONLY on (keys, left_time), so matches are
    counted per DISTINCT (keys, left_time) and joined back on that —
    never on every left column. Grouping on the full row (the naive
    shape) zeroes counts for rows with an unrelated NULL column
    (NULL = NULL never matches the join-back) and hands duplicated
    left rows each other's inflated count. NULL-key or NULL-time left
    rows keep 0, matching an SQL equi-join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lt = ts_micros(left_time)
    rt = ts_micros(right_time)
    keyed = left.select(*keys, lt.alias("__lt")).distinct()
    probe = keyed.select(
        *keys,
        "__lt",
        F.explode(
            F.array(
                F.floor(F.col("__lt") / window_us),
                F.floor(F.col("__lt") / window_us) + 1,
            )
        ).alias("__bucket"),
    )
    build = right.select(
        *keys, rt.alias("__rt"), F.floor(rt / window_us).alias("__bucket")
    )
    hits = (
        probe.join(build, keys + ["__bucket"])
        .filter(
            (F.col("__rt") > F.col("__lt"))
            & (F.col("__rt") <= F.col("__lt") + window_us)
        )
        .groupBy(*keys, "__lt")
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return (
        left.withColumn("__lt", lt)
        .join(hits, keys + ["__lt"], "left")
        .select(
            *left.columns,
            F.coalesce(F.col(count_col), F.lit(0)).cast("bigint").alias(count_col),
        )
    )
