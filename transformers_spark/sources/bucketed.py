"""Bucketed-table support: shuffle-free co-located joins.

For repeated large-joins on a stable key (e.g. ``l_orderkey`` ⋈
``o_orderkey`` run every window), pre-bucketing both sides on the join
key lets Spark plan a SortMergeJoin with NO Exchange on either side —
at 100 TB that's the single biggest recurring shuffle removed.

Managed bucketed tables only (Spark's bucketing metadata lives in the
catalog); ``bucketBy`` + ``sortBy`` + ``saveAsTable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_is_shuffle_free", "exchange_count"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


import re

# case-insensitive + round-robin: plans print 'Exchange
# SinglePartition' and repartition(n) prints 'Exchange
# RoundRobinPartitioning' — a case-sensitive (hash|range|single|
# rebalance) match counted neither, so shuffle-free checks could
# pass while shuffles exist
_SHUFFLE_RE = re.compile(
    r"\bExchange (hash|range|single|rebalance|roundrobin)", re.IGNORECASE
)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan
    (BroadcastExchange doesn't move the big side and doesn't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(_SHUFFLE_RE.findall(plan))


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, left_key: str, right_key: str
) -> bool:
    """True when joining the two bucketed tables on their bucket keys
    plans a sort-merge join with no shuffle on either side."""
    l = spark.table(left).hint("merge")
    r = spark.table(right)
    joined = l.join(r, l[left_key] == r[right_key])
    return exchange_count(joined) == 0
