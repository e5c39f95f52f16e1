"""Deterministic cardinality sketches.

``approx_count_distinct`` (HLL) is the built-in answer at scale, but
its sketch is engine-private — unusable under a cross-engine oracle
gate and irreproducible run-to-run across engines. KMV (k-minimum
values, Bar-Yossef et al. 2002) estimates distinct counts from the
k-th smallest of a uniform hash: every step is exact integer/double
arithmetic over md5-derived hashes, so Spark and DuckDB agree
bit-for-bit.

    est = (k-1) * 2^32 / h_(k)      (h uniform in [0, 2^32))

Plan shape: one partial-agg shuffle dedupes (group, hash); a per-group
window keeps the k smallest; the final aggregate is k rows per group.
The shuffle is the same cost class as exact COUNT(DISTINCT) — what the
sketch buys at 100 TB is the tiny mergeable summary (k longs per
group) that downstream unions/intersections can combine without
re-touching the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .hashing import hash32

__all__ = ["kmv_distinct"]

HASH_SPACE = 1 << 32


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    hasher: str = "portable",
    est_col: str = "est_distinct",
) -> DataFrame:
    """Estimated distinct ``value_col`` per group via a k-minimum-values
    sketch. Groups with fewer than ``k`` distinct hashes report the
    exact count (the sketch is lossless below its capacity)."""
    h = hash32(hasher)(F.col(value_col).cast("string"))
    hashes = df.select(*group_cols, h.alias("__h")).distinct()
    w = W.partitionBy(*group_cols).orderBy("__h")
    kept = hashes.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__kth"))
        .select(
            *group_cols,
            F.when(F.col("__n") < k, F.col("__n"))
            .otherwise(
                F.floor(F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("__kth"))
            )
            .cast("bigint")
            .alias(est_col),
        )
    )
