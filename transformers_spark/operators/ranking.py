"""Scale-safe global ranking primitives.

A plain ``row_number() OVER (ORDER BY ...)`` (or NTILE) with no
PARTITION BY compiles to a SinglePartition exchange — every row funnels
through one task's sort. Fine at thousands of rows, a cliff at
hundreds of millions. These helpers compute the SAME numbers with a
two-phase plan that stays parallel:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range, partitions in key order;
2. ``row_number`` partitioned by ``spark_partition_id()`` — a local
   sort per partition, never a global one;
3. one tiny aggregate (a row per partition) collected driver-side to
   prefix-sum the partition offsets; local rank + offset = exact
   global rank.

The sort key must be a TOTAL order (include a unique tie-break
column); with a total order the global rank is independent of where
the sampled range boundaries land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import cache

__all__ = ["global_row_number", "with_global_ntile"]


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "__rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach an exact 1-based global row number under ``order_by``
    (which must be a total order) without a single-partition sort.
    Returns ``(frame, total_row_count)`` — the count is a by-product
    of the offset collect, not an extra job.

    The returned frame is persisted (tracked via ``cache.track`` for
    release after materialization): the offset collect and the
    returned plan both consume the range partitioning, whose sampled
    boundaries are not guaranteed stable across recomputes.
    """
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = W.partitionBy("__pid").orderBy(*order_by)
    with_rn = cache.track(
        ranged.withColumn("__lrn", F.row_number().over(local)).persist()
    )
    counts = sorted(
        (r["__pid"], r["c"])
        for r in with_rn.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "`__pid` INT, `__off` BIGINT",
    )
    out = (
        with_rn.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
    return out, acc


def _ntile_expr(rn_col: str, total: int, k: int) -> Column:
    """NTILE(k) from a global row number, by the SQL-standard rule both
    Spark and DuckDB implement: with ``total = k*base + rem`` rows, the
    first ``rem`` buckets hold ``base+1`` rows, the rest ``base``.
    Integer arithmetic only (``div``) — no float floor drift."""
    base, rem = divmod(total, k)
    thr = rem * (base + 1)
    first = F.expr(f"({rn_col} + {base}) div {base + 1}")
    if base == 0:
        # total < k: every row is its own bucket 1..total
        return first.cast("int")
    second = F.lit(rem) + F.expr(f"({rn_col} - {thr} + {base - 1}) div {base}")
    return (
        F.when(F.col(rn_col) <= F.lit(thr), first).otherwise(second).cast("int")
    )


def with_global_ntile(
    df: DataFrame,
    order_by: list[Column],
    out_col: str,
    k: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``NTILE(k) OVER (ORDER BY order_by)`` — bit-identical to
    the window function, computed via :func:`global_row_number` so the
    plan has no SinglePartition exchange."""
    rn = f"__rn_{out_col}"
    ranked, total = global_row_number(
        df, order_by, out_col=rn, num_partitions=num_partitions
    )
    return ranked.withColumn(out_col, _ntile_expr(rn, total, k)).drop(rn)
