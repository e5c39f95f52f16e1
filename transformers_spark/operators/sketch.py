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

from .frames import literal_frame
from .hashing import hash32

__all__ = ["kmv_distinct", "theta_sketch_setops", "count_min_frequencies"]

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
    # NULLs hash to NULL, survive distinct(), and sort FIRST ascending
    # in Spark — a null would consume a sketch slot (while max()
    # ignores it), overestimating at-capacity groups; COUNT(DISTINCT)
    # semantics ignore nulls, so drop them before hashing
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
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


def theta_sketch_setops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
    hasher: str = "portable",
) -> DataFrame:
    """Theta-sketch set operations (Dasgupta et al., the DataSketches
    theta family) between two groups' distinct-value sketches:
    estimated union / intersection / A-minus-B cardinalities and the
    sketch Jaccard.

    Each group keeps its ``k`` smallest value-hashes; its theta is the
    k-th smallest (the whole hash space below capacity — there the
    sketch is lossless and every estimate is exact). Set ops run at
    the FIXED threshold ``min(theta_a, theta_b)``: both retained sets
    are filtered to hashes below it, so intersections/differences are
    exact set algebra over uniform samples and
    ``est = |S| * 2^32 / theta`` is the standard unbiased estimator.

    Scale shape: the only data-sized cost is the (group, hash)
    dedup shuffle — same class as exact COUNT(DISTINCT) — after which
    each group is ONE row of ≤k longs; the set ops join moves a few KB
    regardless of input size. At 100 TB, persist the per-group sketch
    rows and combine them repeatedly without re-touching the data.
    """
    h = hash32(hasher)(F.col(value_col).cast("string"))
    # null values dropped for COUNT(DISTINCT) parity (see kmv_distinct)
    hashes = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), h.alias("__h"))
        .distinct()
    )
    w = W.partitionBy("grp").orderBy("__h")
    kept = hashes.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    sketches = (
        kept.groupBy("grp")
        .agg(
            F.sort_array(F.collect_list("__h")).alias("hs"),
            F.count(F.lit(1)).alias("n"),
            F.max("__h").alias("kth"),
        )
        .select(
            "grp",
            F.when(F.col("n") < k, F.lit(float(HASH_SPACE)))
            .otherwise(F.col("kth").cast("double"))
            .alias("theta"),
            "hs",
        )
    )
    # Anchor each side on a literal row so an EMPTY group (no rows, or
    # a typo'd name) yields zero-cardinality estimates instead of a
    # silently empty result: default sketch = no hashes, theta = the
    # whole hash space (the lossless below-capacity value).
    spark = df.sparkSession
    empty_hs = F.array().cast("array<bigint>")

    def side(name: str, out: str, t: str, hcol: str) -> DataFrame:
        # The anchor must be a JVM-side literal frame: createDataFrame
        # over a Python list builds a parallelized Python RDD whose
        # every evaluation launches Python workers across
        # defaultParallelism partitions, and CartesianProduct schedules
        # left x right TASKS — two such anchors made this 1x1-row
        # cross join cost ~15 s at sf0.1 (a 14x regression). range(1)
        # + lit() is pure JVM with a single partition.
        anchor = spark.range(0, 1, 1, 1).select(F.lit(name).alias(out))
        s = sketches.filter(F.col("grp") == name).select(
            F.col("grp").alias(out),
            F.col("theta").alias(t),
            F.col("hs").alias(hcol),
        )
        return anchor.join(s, out, "left").select(
            out,
            F.coalesce(F.col(t), F.lit(float(HASH_SPACE))).alias(t),
            F.coalesce(F.col(hcol), empty_hs).alias(hcol),
        )

    a = side(group_a, "group_a", "ta", "ha")
    b = side(group_b, "group_b", "tb", "hb")
    th = F.least("ta", "tb")
    joined = (
        a.crossJoin(b)  # two one-row sketch frames — trivially broadcast
        .withColumn("th", th)
        .withColumn("fa", F.filter("ha", lambda x: x.cast("double") < F.col("th")))
        .withColumn("fb", F.filter("hb", lambda x: x.cast("double") < F.col("th")))
        .withColumn("na", F.size("fa"))
        .withColumn("nb", F.size("fb"))
        .withColumn("ni", F.size(F.array_intersect("fa", "fb")))
        .withColumn("nu", F.col("na") + F.col("nb") - F.col("ni"))
    )
    scale = F.lit(float(HASH_SPACE)) / F.col("th")
    return joined.select(
        "group_a",
        "group_b",
        F.floor(F.col("nu").cast("double") * scale).cast("bigint").alias("union_est"),
        F.floor(F.col("ni").cast("double") * scale).cast("bigint").alias("intersect_est"),
        F.floor((F.col("na") - F.col("ni")).cast("double") * scale)
        .cast("bigint")
        .alias("a_not_b_est"),
        F.round(
            F.when(F.col("nu") == 0, F.lit(0.0)).otherwise(
                F.col("ni").cast("double") / F.col("nu")
            ),
            6,
        ).alias("jaccard"),
    )


def count_min_frequencies(
    df: DataFrame,
    key_col: str,
    queries: list[str],
    width: int = 256,
    depth: int = 4,
    hasher: str = "portable",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for ``queries``, plus the exact count for comparison.

    The sketch is ``depth`` hash rows x ``width`` counters: each key
    increments one counter per row (hash salted with the row index);
    a key's estimate is the MIN of its ``depth`` counters — always an
    OVERestimate (collisions only add), within eN/width with
    probability 1-(1/2)^depth. What it buys at 100 TB: the counter
    table is depth x width longs regardless of key cardinality — it
    fits in memory, merges across corpora by addition, and answers
    any later frequency query without re-touching the data, where an
    exact per-key count table scales with the vocabulary.

    Determinism: counters come from one hash-groupBy over md5-derived
    buckets (exact integer arithmetic, same plan class as a word
    count), so a DuckDB oracle reproduces every counter and estimate
    bit-for-bit. Returns (key, est_count, exact_count, overestimate).
    """
    if not queries:
        # createDataFrame([]) below would fail schema inference with an
        # opaque error AFTER the counter plan was built — fail clearly
        raise ValueError("queries must be a non-empty list of keys")
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    h = hash32(hasher)
    # ONE scan: each row explodes into its depth (row_idx, bucket)
    # coordinates inside a single projection — a per-depth select
    # union would re-read the source depth times
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("row_idx"),
                (
                    h(F.concat(F.lit(f"cms{d}:"), F.col(key_col).cast("string")))
                    % width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    all_rows = df.select(F.explode(coords).alias("rb")).select(
        F.col("rb.row_idx").alias("row_idx"), F.col("rb.bucket").alias("bucket")
    )
    counters = all_rows.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # estimates for the queried keys: their (row, bucket) coordinates
    # come from the SAME hash expression as the data side (hasher-
    # agnostic), over a tiny |queries| x depth frame, then a broadcast
    # join against the counter table
    spark = df.sparkSession
    lookup_df = literal_frame(
        spark,
        [(q, d) for q in queries for d in range(depth)],
        [("key", "string"), ("row_idx", "int")],
    )
    lookup_salted = h(
        F.concat(
            F.lit("cms"), F.col("row_idx").cast("string"), F.lit(":"), F.col("key")
        )
    )
    lookup_df = lookup_df.withColumn("bucket", lookup_salted % width)
    # broadcast the COUNTER table (depth x width rows, bounded by
    # construction): it is the build side of this left join — a hint
    # on the left/preserved side of a left-outer join is ignored
    est = (
        lookup_df.join(F.broadcast(counters), ["row_idx", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    exact = (
        df.filter(F.col(key_col).cast("string").isin(queries))
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "key", "left")
        .select(
            "key",
            "est_count",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
            (F.col("est_count") >= F.coalesce("exact_count", F.lit(0))).alias(
                "overestimate_ok"
            ),
        )
    )
