"""Round-4 catalog expansion: deeper SQL-surface constructs and
additional training-data-pipeline operators, each Spark-first with an
exact DuckDB oracle (pandas-safe output types only — see
``transformers_spark.canon``).

SQL-surface additions (SURVEY.md §2.B deepening): rolling windowed
distinct counts, global/grouped two-phase ranking consumers, YoY lag,
cohort matrices, INTERSECT/EXCEPT set algebra, UNPIVOT (stack),
correlated-average filters (TPC-H Q22 shape), ordered-set medians over
window gaps, relational division, and window-derived Gini coefficients.

Pipeline additions: rolling active users, LTV deciles, co-occurrence
lift, Bloom-filter membership sketch, per-doc top-terms, prefix-hash
dedup, scalar-quantization error audit, video frame-sampling plans,
mixture weights, and first-touch attribution.

Engine↔oracle divergence classes and their portable idioms are
consolidated in ORACLES.md (repo root) — docstrings here cite a class
number instead of restating the contract.

Numeric determinism rules (same as queries.py): never sum raw doubles —
sum exact decimals and cast to DOUBLE at the end; division happens once
on identical exact operands so both engines produce the same IEEE
result; sqrt is IEEE-correctly-rounded and therefore portable; ln/pow
are NOT portable and are avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import cache
from .queries import QuerySpec, _money
from .sources.testdata import register_tables

__all__ = ["expansion_specs"]


# ---------------------------------------------------------------------------
# Rolling / windowed analytics over the events stream table
# ---------------------------------------------------------------------------


def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. Spark-first shape:
    map-side expansion of each (active-day, user) pair to the ≤7 days
    it contributes to (sequence+explode — constant fan-out, no theta
    join), then ONE distinct aggregate; the day grid is broadcast to
    restrict output to observed days. Scales: shuffle volume is
    7x the distinct (day, user) pairs, never |days| x |events|."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    # du feeds both the explode branch and the observed-day grid;
    # persist so events is scanned and distinct-shuffled once, not 2x
    du = cache.track(
        ev.select(F.to_date("ts").alias("aday"), "user_id").distinct().persist()
    )
    expanded = du.select(
        F.explode(F.sequence(F.col("aday"), F.date_add(F.col("aday"), 6))).alias(
            "day"
        ),
        "user_id",
    )
    actual = du.select(F.col("aday").alias("day")).distinct()
    return (
        expanded.join(F.broadcast(actual), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


ORACLE_ROLLING_7D_ACTIVE_USERS = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS aday, user_id FROM events),
expanded AS (
  SELECT CAST(unnest(generate_series(aday, aday + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS day,
         user_id
  FROM du
),
actual AS (SELECT DISTINCT aday AS day FROM du)
SELECT day, COUNT(DISTINCT user_id) AS active_users_7d
FROM expanded JOIN actual USING (day)
GROUP BY day
"""


def q_user_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(10) over per-user lifetime value via the two-phase
    ranking primitive (operators/ranking.py) — no SinglePartition sort
    at any user cardinality. Sums are exact decimals."""
    from .operators.ranking import with_global_ntile

    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(_money("value")).alias("ltv_dec")
    )
    per_user = per_user.withColumn("ltv", F.col("ltv_dec").cast("double"))
    ranked = with_global_ntile(
        per_user, [F.asc("ltv"), F.asc("user_id")], "decile", k=10
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("ltv_dec").cast("double").alias("total_ltv"),
        F.min("ltv").alias("min_ltv"),
        F.max("ltv").alias("max_ltv"),
    )


ORACLE_USER_LTV_DECILES = """
WITH per_user AS (
  SELECT user_id, SUM(TRY_CAST(value AS DECIMAL(12,4))) AS ltv_dec
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT user_id, ltv_dec, CAST(ltv_dec AS DOUBLE) AS ltv,
         ntile(10) OVER (ORDER BY CAST(ltv_dec AS DOUBLE), user_id) AS decile
  FROM per_user
)
SELECT decile, COUNT(*) AS n_users,
       CAST(SUM(ltv_dec) AS DOUBLE) AS total_ltv,
       MIN(ltv) AS min_ltv, MAX(ltv) AS max_ltv
FROM ranked GROUP BY decile
"""


def q_event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift: for each unordered type pair, how
    much more often do users do both than independence predicts. The
    pair join is keyed on user_id (per-user fan-out bounded by the
    type-cardinality squared); the totals are broadcast 1-row / tiny
    aggregates. Integer products cast to double exactly once for the
    final division."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    # ut feeds four subtrees (both pair-join sides, type_counts, total);
    # persist so events is scanned and distinct-shuffled once, not 4x
    ut = cache.track(ev.select("user_id", "event_type").distinct().persist())
    a = ut.select("user_id", F.col("event_type").alias("t1"))
    b = ut.select("user_id", F.col("event_type").alias("t2"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    type_counts = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    # count("user_id") over the distinct frame skips a NULL user row,
    # matching the oracle's null-ignoring COUNT(DISTINCT user_id)
    total = ut.select("user_id").distinct().agg(
        F.count("user_id").alias("n_total")
    )
    ca = type_counts.select(
        F.col("event_type").alias("t1"), F.col("n_t").alias("n_t1")
    )
    cb = type_counts.select(
        F.col("event_type").alias("t2"), F.col("n_t").alias("n_t2")
    )
    return (
        pairs.join(F.broadcast(ca), "t1")
        .join(F.broadcast(cb), "t2")
        .crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "n_both",
            (
                # cast each operand BEFORE multiplying: a bigint product
                # of two ~3e9 counts exceeds 2^63 (silent wrap with ANSI
                # off, an overflow error in DuckDB); double x double is
                # IEEE-identical on both engines
                (F.col("n_both").cast("double") * F.col("n_total").cast("double"))
                / (F.col("n_t1").cast("double") * F.col("n_t2").cast("double"))
            ).alias("lift"),
        )
    )


ORACLE_EVENT_COOCCURRENCE_LIFT = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
tc AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM ut)
SELECT t1, t2, n_both,
       -- operands cast BEFORE the multiply, mirroring the Spark side
       -- (a BIGINT product would raise on overflow here and silently
       -- wrap there)
       (CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE))
         / (CAST(ca.n_t AS DOUBLE) * CAST(cb.n_t AS DOUBLE)) AS lift
FROM pairs
JOIN tc ca ON ca.event_type = t1
JOIN tc cb ON cb.event_type = t2
CROSS JOIN tot
"""


def q_interarrival_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: inter-arrival gap stats within each (user, type)
    stream — lag window partitioned by bounded keys, microsecond
    integers end-to-end (portable; the mean divides exact integers)."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        # sum in decimal(38,0): per-stream gaps telescope to the data's
        # time span, so SUM(bigint micros) wraps past 2^63 at ~300k
        # year-long streams with ANSI off while the oracle's HUGEINT
        # sum stays exact; both sides are exact integers cast to double
        (
            F.sum(F.col("gap_us").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


ORACLE_INTERARRIVAL_TIME_STATS = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us,
       MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


def q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: per (user, day), the day's FIRST event
    type (first_value over a bounded (user, day) window) and whether a
    purchase followed the same day; aggregated to a per-first-touch
    conversion rate. One keyed shuffle; the rate divides exact ints."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    w = (
        W.partitionBy("user_id", F.to_date("ts"))
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    tagged = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.first("event_type").over(w).alias("first_touch"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    per_day = tagged.groupBy("user_id", "day", "first_touch").agg(
        F.max("is_purchase").alias("purchased")
    )
    return per_day.groupBy("first_touch").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum("purchased").alias("n_with_purchase"),
        (
            F.sum("purchased").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("purchase_rate"),
    )


ORACLE_FIRST_TOUCH_ATTRIBUTION = """
WITH tagged AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         first_value(event_type) OVER (
           PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS first_touch,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
  FROM events
),
per_day AS (
  SELECT user_id, day, first_touch, MAX(is_purchase) AS purchased
  FROM tagged GROUP BY 1, 2, 3
)
SELECT first_touch, COUNT(*) AS n_user_days,
       CAST(SUM(purchased) AS BIGINT) AS n_with_purchase,
       CAST(SUM(purchased) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS purchase_rate
FROM per_day GROUP BY first_touch
"""


def q_viewer_purchaser_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra over user cohorts (completes the
    catalog's set-op surface next to UNION/EXCEPT ALL): users who both
    viewed and purchased, view-only, purchase-only."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    v = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )

    def tag(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("cohort"), "n_users"
        )

    return (
        tag(v.intersect(p), "both")
        .unionByName(tag(v.exceptAll(p), "view_only"))
        .unionByName(tag(p.exceptAll(v), "purchase_only"))
    )


ORACLE_VIEWER_PURCHASER_SETS = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'both' AS cohort, COUNT(*) AS n_users
FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
UNION ALL
SELECT 'view_only', COUNT(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
UNION ALL
SELECT 'purchase_only', COUNT(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM v)
"""


# ---------------------------------------------------------------------------
# TPC-H-style relational deepening
# ---------------------------------------------------------------------------


def q_orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue per order priority: decimal-exact yearly
    sums, then a lag window over the TINY aggregated frame (priorities
    x years) — the window never touches raw orders."""
    register_tables(spark, sf_dir, ("orders",))
    orders = spark.table("orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), "o_orderpriority"
    ).agg(F.sum(_money("o_totalprice")).alias("rev_dec"))
    w = W.partitionBy("o_orderpriority").orderBy("yr")
    return yearly.select(
        "yr",
        "o_orderpriority",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec") - F.lag("rev_dec").over(w))
        .cast("double")
        .alias("yoy_delta"),
    )


ORACLE_ORDERS_YOY_GROWTH = """
WITH yearly AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS rev_dec
  FROM orders GROUP BY 1, 2
)
SELECT yr, o_orderpriority,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec - lag(rev_dec) OVER (
         PARTITION BY o_orderpriority ORDER BY yr) AS DOUBLE) AS yoy_delta
FROM yearly
"""


def q_cohort_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort matrix: customers bucketed by first-order month,
    revenue tracked by order month. One custkey-keyed shuffle join
    (AQE-sized); output is the bounded month x month grid."""
    register_tables(spark, sf_dir, ("orders",))
    orders = spark.table("orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    j = orders.join(first, "o_custkey")
    om = F.date_trunc("month", "o_orderdate")
    return (
        j.groupBy(F.col("cohort_month"), om.alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money("o_totalprice")).cast("double").alias("revenue"),
        )
        .withColumn(
            "months_since",
            F.months_between(F.col("order_month"), F.col("cohort_month")).cast(
                "int"
            ),
        )
    )


ORACLE_COHORT_MONTHLY_REVENUE = """
WITH first AS (
  SELECT o_custkey,
         CAST(MIN(date_trunc('month', o_orderdate)) AS TIMESTAMP)
           AS cohort_month
  FROM orders GROUP BY o_custkey
)
SELECT cohort_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS revenue,
       date_diff('month', cohort_month,
                 CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
         AS months_since
FROM orders JOIN first USING (o_custkey)
GROUP BY 1, 2
"""


def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    recent orders (dormant since 1998). The average is a broadcast
    1-row aggregate; dormancy is a LEFT ANTI join against the
    date-filtered orders scan (filter pushed to parquet)."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    cust = spark.table("customer")
    orders = spark.table("orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_money("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(recent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_money("c_acctbal")).cast("double").alias("total_balance"),
            F.max("c_acctbal").alias("max_balance"),
        )
    )


ORACLE_DORMANT_RICH_CUSTOMERS = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_balance,
       MAX(c_acctbal) AS max_balance
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01'
  )
GROUP BY c_mktsegment
"""


def q_median_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate over window-derived gaps: median days
    between consecutive orders of a customer, by market segment. The
    lag window partitions by customer (bounded groups); the medians
    are exact discrete percentiles (engine-portable)."""
    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH gaps AS (
          SELECT o_custkey,
                 datediff(o_orderdate, lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 )) AS gap_d
          FROM orders
        )
        SELECT c_mktsegment,
               COUNT(gap_d) AS n_gaps,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_d)
                    AS DOUBLE) AS median_gap_days,
               MIN(gap_d) AS min_gap_days,
               MAX(gap_d) AS max_gap_days
        FROM gaps JOIN customer ON o_custkey = c_custkey
        WHERE gap_d IS NOT NULL
        GROUP BY c_mktsegment
        """
    )


ORACLE_MEDIAN_ORDER_GAP_DAYS = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day', lag(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ), o_orderdate) AS gap_d
  FROM orders
)
SELECT c_mktsegment,
       COUNT(gap_d) AS n_gaps,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_d)
            AS DOUBLE) AS median_gap_days,
       MIN(gap_d) AS min_gap_days,
       MAX(gap_d) AS max_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_d IS NOT NULL
GROUP BY c_mktsegment
"""


def q_nation_balance_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of supplier balances, from the rank
    formula G = (2*Σ i*x_i - (n+1)*Σx) / (n*Σx). Ranks come from the
    scale-safe grouped two-phase ROW_NUMBER (operators/ranking.py) —
    no nation ever funnels through one task — and every sum is an
    exact decimal; the single final division is portable."""
    from .operators.ranking import grouped_row_number

    register_tables(spark, sf_dir, ("supplier", "nation"))
    sup = (
        spark.table("supplier")
        .filter(F.col("s_acctbal") > 0)
        .join(
            F.broadcast(spark.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "s_acctbal", "s_suppkey")
    )
    ranked = grouped_row_number(
        sup,
        ["n_name"],
        [F.asc("s_acctbal"), F.asc("s_suppkey")],
        rn_col="i",
        total_col="n",
    )
    xdec = _money("s_acctbal")
    agg = ranked.groupBy("n_name").agg(
        F.max("n").alias("n_suppliers"),
        F.sum(F.col("i") * xdec).alias("s_ix"),
        F.sum(xdec).alias("s_x"),
    )
    num = F.lit(2) * F.col("s_ix") - (F.col("n_suppliers") + F.lit(1)) * F.col(
        "s_x"
    )
    den = F.col("n_suppliers") * F.col("s_x")
    return agg.select(
        "n_name",
        "n_suppliers",
        F.col("s_x").cast("double").alias("total_balance"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


ORACLE_NATION_BALANCE_GINI = """
WITH ranked AS (
  SELECT n_name, s_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY s_acctbal, s_suppkey) AS i,
         COUNT(*) OVER (PARTITION BY n_name) AS n
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE s_acctbal > 0
),
agg AS (
  SELECT n_name, MAX(n) AS n_suppliers,
         SUM(i * CAST(s_acctbal AS DECIMAL(12,4))) AS s_ix,
         SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS s_x
  FROM ranked GROUP BY n_name
)
SELECT n_name, n_suppliers,
       CAST(s_x AS DOUBLE) AS total_balance,
       CAST(2 * s_ix - (n_suppliers + 1) * s_x AS DOUBLE)
         / CAST(n_suppliers * s_x AS DOUBLE) AS gini
FROM agg
"""


def q_segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment (the QUALIFY / top-n-per-group
    idiom) via the grouped two-phase ROW_NUMBER: 5 segments x huge
    membership is exactly the case where the plain window is a
    single-task-sort cliff."""
    from .operators.ranking import grouped_row_number

    register_tables(spark, sf_dir, ("orders", "customer"))
    j = spark.table("orders").join(
        F.broadcast(spark.table("customer").select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    ranked = grouped_row_number(
        j.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        rn_col="rn",
        total_col="__n",
    )
    return (
        ranked.filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "rn",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
        )
    )


ORACLE_SEGMENT_TOP_ORDERS = """
SELECT c_mktsegment, rn, o_orderkey, total_price
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice AS total_price,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC NULLS LAST,
                                     o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


def q_part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack) — wide part metrics to (metric, value) rows in
    one map-side projection, then a decimal-exact profile aggregate."""
    register_tables(spark, sf_dir, ("part",))
    return (
        spark.table("part")
        .selectExpr(
            "stack(2, 'size', CAST(p_size AS DOUBLE),"
            " 'retailprice', p_retailprice) AS (metric, val)"
        )
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.col("val").cast("decimal(12,4)"))
            .cast("double")
            .alias("total"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


ORACLE_PART_METRICS_UNPIVOT = """
WITH unpivoted AS (
  SELECT 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT 'retailprice', p_retailprice FROM part
)
SELECT metric, COUNT(*) AS n_values,
       CAST(SUM(TRY_CAST(val AS DECIMAL(12,4))) AS DOUBLE) AS total,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM unpivoted GROUP BY metric
"""


def q_supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: suppliers who ship parts of ALL top-5
    brands. Top brands come from a distributed TakeOrdered (count desc,
    brand asc); the division is a distinct + count-equality aggregate,
    with the part dimension broadcast into the lineitem scan."""
    register_tables(spark, sf_dir, ("lineitem", "part"))
    part = spark.table("part")
    li = spark.table("lineitem")
    top5 = (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("p_brand"))
        .limit(5)
        .select("p_brand")
    )
    keyed = li.join(
        F.broadcast(part.join(F.broadcast(top5), "p_brand").select(
            "p_partkey", "p_brand"
        )),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_supp = (
        keyed.select("l_suppkey", "p_brand")
        .distinct()
        .groupBy("l_suppkey")
        # plain count: the frame is already distinct on (supp, brand) —
        # countDistinct here would plan a second, redundant dedup phase
        .agg(F.count(F.lit(1)).alias("n_brands"))
    )
    return per_supp.agg(
        F.count(F.lit(1)).alias("n_suppliers_with_any"),
        F.sum((F.col("n_brands") == 5).cast("int")).alias(
            "n_full_coverage_suppliers"
        ),
    )


ORACLE_SUPPLIER_PART_COVERAGE = """
WITH top5 AS (
  SELECT p_brand FROM part GROUP BY p_brand
  ORDER BY COUNT(*) DESC, p_brand LIMIT 5
),
per_supp AS (
  SELECT l_suppkey, COUNT(DISTINCT p_brand) AS n_brands
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN top5 USING (p_brand)
  GROUP BY l_suppkey
)
SELECT COUNT(*) AS n_suppliers_with_any,
       CAST(SUM(CASE WHEN n_brands = 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_coverage_suppliers
FROM per_supp
"""


# ---------------------------------------------------------------------------
# Text / documents pipeline additions
# ---------------------------------------------------------------------------


def q_text_length_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length profile with exact discrete
    quantiles (the deterministic stand-in for approx_percentile
    sketches at corpus scale)."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)
                    AS DOUBLE) AS p10_chars,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                    AS DOUBLE) AS p50_chars,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
                    AS DOUBLE) AS p90_chars
        FROM documents
        GROUP BY lang
        """
    )


ORACLE_TEXT_LENGTH_QUANTILES_BY_LANG = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)
            AS DOUBLE) AS p10_chars,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
            AS DOUBLE) AS p50_chars,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
            AS DOUBLE) AS p90_chars
FROM documents
GROUP BY lang
"""


def q_text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: aggregate type-token ratio
    computed as Σ distinct / Σ total (integer sums, ONE division —
    never an average of per-doc float ratios, which would be
    order-dependent), plus per-doc extremes."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    words = F.split(F.col("text"), " ")
    # size(split(NULL)) is -1 under non-ANSI Spark while the DuckDB
    # oracle's len(string_split(NULL)) is NULL (skipped by SUM/MIN/MAX)
    # — guard so both sides treat null text as null counts
    per_doc = docs.select(
        "lang",
        F.when(F.col("text").isNotNull(), F.size(words)).alias("n_tokens"),
        F.when(
            F.col("text").isNotNull(), F.size(F.array_distinct(words))
        ).alias("n_types"),
    )
    ttr = F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
    return (
        per_doc.withColumn("doc_ttr", ttr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_types").alias("total_types"),
            (
                F.sum("n_types").cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("aggregate_ttr"),
            F.min("doc_ttr").alias("min_doc_ttr"),
            F.max("doc_ttr").alias("max_doc_ttr"),
        )
    )


ORACLE_TEXT_TYPE_TOKEN_RATIO = """
WITH per_doc AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_types) AS BIGINT) AS total_types,
       CAST(SUM(n_types) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
         AS aggregate_ttr,
       MIN(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS min_doc_ttr,
       MAX(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS max_doc_ttr
FROM per_doc GROUP BY lang
"""


def q_text_first_position_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional term statistics for the corpus' top-10 terms: how
    early each term first appears in the documents that contain it
    (lead-bias signal for extraction heuristics). Integer positions
    end-to-end; the top-10 cut is a distributed TakeOrdered with a
    total-order tie-break."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    # 1-based positions to match DuckDB's generate_subscripts; the
    # exploded frame feeds both the first_pos and freq branches, so
    # persist it rather than exploding the whole corpus twice
    pos = cache.track(
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "word")
        )
        .select("doc_id", "word", (F.col("p0") + 1).alias("pos"))
        .persist()
    )
    first_pos = pos.groupBy("doc_id", "word").agg(
        F.min("pos").alias("first_pos")
    )
    per_word = first_pos.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("first_pos").alias("sum_first_pos"),
        F.min("first_pos").alias("min_first_pos"),
    )
    freq = pos.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    top10 = (
        freq.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(10)
    )
    return (
        per_word.join(F.broadcast(top10), "word")
        .select(
            "word",
            "n_occurrences",
            "n_docs",
            (
                F.col("sum_first_pos").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("mean_first_pos"),
            "min_first_pos",
        )
    )


ORACLE_TEXT_FIRST_POSITION_STATS = """
WITH pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
first_pos AS (
  SELECT doc_id, word, MIN(pos) AS first_pos FROM pos GROUP BY 1, 2
),
per_word AS (
  SELECT word, COUNT(*) AS n_docs, SUM(first_pos) AS sum_first_pos,
         MIN(first_pos) AS min_first_pos
  FROM first_pos GROUP BY word
),
freq AS (SELECT word, COUNT(*) AS n_occurrences FROM pos GROUP BY word),
top10 AS (
  SELECT word, n_occurrences FROM freq
  ORDER BY n_occurrences DESC, word LIMIT 10
)
SELECT word, n_occurrences, n_docs,
       CAST(sum_first_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS mean_first_pos,
       min_first_pos
FROM per_word JOIN top10 USING (word)
"""


def q_text_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by frequency (tie-break term asc),
    emitted as a joined string (driver-canon-safe). The ranking window
    partitions by doc_id — bounded groups, never a global sort — and
    the counts are pure integers (no float tie hazards)."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    counts = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("word"))
    top = counts.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    return top.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "word"))),
                lambda s: s.word,
            ),
            ",",
        ).alias("top_terms"),
        F.sum("cnt").alias("top_terms_occurrences"),
    )


ORACLE_TEXT_DOC_TOP_TERMS = """
WITH counts AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
freq AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM counts GROUP BY 1, 2
),
ranked AS (
  SELECT doc_id, word, cnt,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, word) AS rn
  FROM freq
)
SELECT doc_id,
       string_agg(word, ',' ORDER BY rn) AS top_terms,
       CAST(SUM(cnt) AS BIGINT) AS top_terms_occurrences
FROM ranked WHERE rn <= 3
GROUP BY doc_id
"""


def q_dedup_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-hash near-dup audit (cheap first-pass dedup stage): md5
    of the first 64 chars groups documents; per source, how many
    prefix groups exist and how many docs share a prefix. Map-side
    hash + one aggregate; integers only."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    grouped = (
        docs.select(
            "source", F.md5(F.substring("text", 1, 64)).alias("prefix_hash")
        )
        .groupBy("source", "prefix_hash")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grouped.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_prefix_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
            "n_dup_docs"
        ),
    )


ORACLE_DEDUP_PREFIX_CLUSTERS = """
WITH grouped AS (
  SELECT source, md5(substr(text, 1, 64)) AS prefix_hash, COUNT(*) AS n
  FROM documents GROUP BY 1, 2
)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_prefix_groups,
       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs
FROM grouped GROUP BY source
"""


# ---------------------------------------------------------------------------
# Sketches / embeddings / multimodal / curation additions
# ---------------------------------------------------------------------------

_BLOOM_M = 8192  # bits; bounded => the position set is ALWAYS broadcastable


def _bloom_pos(col, salt: str):
    """Cross-engine deterministic hash position: first 8 md5 hex chars
    parsed as an integer, mod the bit width. Identical in Spark
    (conv(...,16,10)) and DuckDB (CAST('0x'||... AS BIGINT))."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % _BLOOM_M
    )


def q_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch, relationally: the member set's
    k=2 bit positions (bounded by m=8192 — broadcastable by
    construction at ANY member cardinality) probe-join against every
    customer; reports the false-positive count against exact
    membership. At 100 TB the same plan holds: the 'filter' side never
    exceeds m distinct rows."""
    register_tables(spark, sf_dir, ("customer",))
    cust = spark.table("customer")
    members = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    # positions feeds BOTH broadcast semi-joins; persist so the member
    # union+distinct (two customer scans) runs once, not twice — the
    # frame is bounded at m=8192 rows by construction
    positions = cache.track(
        members.select(_bloom_pos(F.col("c_custkey"), "s1").alias("pos"))
        .unionByName(
            members.select(_bloom_pos(F.col("c_custkey"), "s2").alias("pos"))
        )
        .distinct()
        .persist()
    )
    probes = cust.select(
        "c_custkey",
        "c_acctbal",
        _bloom_pos(F.col("c_custkey"), "s1").alias("h1"),
        _bloom_pos(F.col("c_custkey"), "s2").alias("h2"),
    )
    p1 = positions.select(F.col("pos").alias("h1"))
    p2 = positions.select(F.col("pos").alias("h2"))
    claimed = probes.join(F.broadcast(p1), "h1", "left_semi").join(
        F.broadcast(p2), "h2", "left_semi"
    )
    return claimed.agg(
        F.count(F.lit(1)).alias("n_claimed"),
        F.sum((F.col("c_acctbal") > 9000).cast("int")).alias("n_true_members"),
        F.sum((F.col("c_acctbal") <= 9000).cast("int")).alias(
            "n_false_positives"
        ),
    )


ORACLE_SKETCH_BLOOM_MEMBERSHIP = f"""
WITH members AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
positions AS (
  SELECT DISTINCT CAST(('0x' || substr(md5('s1' || CAST(c_custkey AS VARCHAR)), 1, 8))
                       AS BIGINT) % {_BLOOM_M} AS pos FROM members
  UNION
  SELECT DISTINCT CAST(('0x' || substr(md5('s2' || CAST(c_custkey AS VARCHAR)), 1, 8))
                       AS BIGINT) % {_BLOOM_M} AS pos FROM members
),
probes AS (
  SELECT c_custkey, c_acctbal,
         CAST(('0x' || substr(md5('s1' || CAST(c_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) % {_BLOOM_M} AS h1,
         CAST(('0x' || substr(md5('s2' || CAST(c_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) % {_BLOOM_M} AS h2
  FROM customer
),
claimed AS (
  SELECT * FROM probes
  WHERE h1 IN (SELECT pos FROM positions)
    AND h2 IN (SELECT pos FROM positions)
)
SELECT COUNT(*) AS n_claimed,
       CAST(SUM(CASE WHEN c_acctbal > 9000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_members,
       CAST(SUM(CASE WHEN c_acctbal <= 9000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives
FROM claimed
"""


def q_embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization audit: quantize every embedding value
    against the global [min, max] range (a broadcast 1-row aggregate),
    reconstruct, and report per-label absolute error. The error sum is
    decimal-exact; floor/clamp arithmetic is portable (no banker's-
    rounding hazards)."""
    register_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    vals = emb.select(
        "label", F.explode("embedding").alias("xf")
    ).select("label", F.col("xf").cast("double").alias("x"))
    rng = vals.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax")
    )
    q = F.least(
        F.lit(255),
        F.greatest(
            F.lit(0),
            F.floor((F.col("x") - F.col("xmin")) / F.col("scale")).cast("int"),
        ),
    )
    with_err = (
        vals.crossJoin(F.broadcast(rng))
        .withColumn("scale", (F.col("xmax") - F.col("xmin")) / F.lit(255.0))
        .withColumn("q", q)
        .withColumn(
            "abs_err",
            F.abs(F.col("x") - (F.col("xmin") + F.col("q") * F.col("scale"))),
        )
    )
    return with_err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.col("abs_err").cast("decimal(20,12)"))
        .cast("double")
        .alias("total_abs_err"),
        F.max("abs_err").alias("max_abs_err"),
    )


ORACLE_EMBEDDING_QUANTIZATION_ERROR = """
WITH vals AS (
  SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
),
rng AS (SELECT MIN(x) AS xmin, MAX(x) AS xmax FROM vals),
q AS (
  SELECT label, x, xmin, (xmax - xmin) / 255.0 AS scale,
         LEAST(255, GREATEST(0, CAST(FLOOR((x - xmin) / ((xmax - xmin) / 255.0))
                                     AS INTEGER))) AS qv
  FROM vals, rng
),
err AS (
  SELECT label, ABS(x - (xmin + qv * scale)) AS abs_err FROM q
)
SELECT label, COUNT(*) AS n_values,
       CAST(SUM(CAST(abs_err AS DECIMAL(20,12))) AS DOUBLE) AS total_abs_err,
       MAX(abs_err) AS max_abs_err
FROM err GROUP BY label
"""


def q_multimodal_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for (stub) video assets: durations derive
    deterministically from doc_id (the decode itself is the documented
    multimodal stub — operators/multimodal.py), the plan arithmetic is
    the real Spark-side plumbing: fps by language track, frame budget
    cap, integer stride. Pure map-side integer math."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    duration = (F.lit(5) + F.col("doc_id") % 115).cast("bigint")
    fps = F.when(F.col("lang") == "en", F.lit(2)).otherwise(F.lit(1)).cast(
        "bigint"
    )
    n_frames = F.least(F.lit(64), duration * fps)
    return docs.select(
        "doc_id",
        duration.alias("duration_s"),
        fps.alias("sample_fps"),
        n_frames.alias("n_frames"),
        F.floor((duration * 1000).cast("double") / n_frames)
        .cast("bigint")
        .alias("frame_stride_ms"),
    )


ORACLE_MULTIMODAL_VIDEO_FRAME_PLAN = """
WITH plan AS (
  SELECT doc_id,
         CAST(5 + doc_id % 115 AS BIGINT) AS duration_s,
         CAST(CASE WHEN lang = 'en' THEN 2 ELSE 1 END AS BIGINT) AS sample_fps
  FROM documents
)
SELECT doc_id, duration_s, sample_fps,
       LEAST(64, duration_s * sample_fps) AS n_frames,
       CAST(FLOOR(CAST(duration_s * 1000 AS DOUBLE)
                  / LEAST(64, duration_s * sample_fps)) AS BIGINT)
         AS frame_stride_ms
FROM plan
"""


def q_curation_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weights: per-source token mass reweighted by
    sqrt (alpha=0.5 temperature — sqrt because IEEE sqrt is correctly
    rounded and therefore engine-portable, unlike pow), normalized
    against a broadcast 1-row total, with expected epochs at a fixed
    1M-token budget. Weights are decimal-cast before the exact total
    sum; the share/epoch divisions are single portable IEEE ops."""
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    # null-guard: size(split(NULL)) is -1 under non-ANSI Spark and would
    # silently subtract from the sum; the oracle's SUM skips NULLs
    per_source = docs.groupBy("source").agg(
        F.sum(
            F.when(
                F.col("text").isNotNull(),
                F.size(F.split(F.col("text"), " ")),
            )
        ).alias("n_tokens")
    )
    weighted = per_source.withColumn(
        "w", F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(20,10)")
    )
    total = weighted.agg(F.sum("w").alias("w_total"))
    share = F.col("w").cast("double") / F.col("w_total").cast("double")
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            share.alias("weight_share"),
            (
                share * F.lit(1_000_000.0) / F.col("n_tokens").cast("double")
            ).alias("epochs_at_1m_budget"),
        )
    )


ORACLE_CURATION_MIXTURE_WEIGHTS = """
WITH per_source AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n_tokens,
         CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(20,10)) AS w
  FROM per_source
),
total AS (SELECT SUM(w) AS w_total FROM weighted)
SELECT source, n_tokens,
       CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE) AS weight_share,
       CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE) * 1000000.0
         / CAST(n_tokens AS DOUBLE) AS epochs_at_1m_budget
FROM weighted, total
"""


# ---------------------------------------------------------------------------
# Spec registry
# ---------------------------------------------------------------------------


def expansion_specs() -> list[QuerySpec]:
    return [
        QuerySpec(
            "rolling_7d_active_users",
            "Trailing-7-day distinct users via map-side day expansion",
            q_rolling_7d_active_users,
            ORACLE_ROLLING_7D_ACTIVE_USERS,
        ),
        QuerySpec(
            "user_ltv_deciles",
            "Global NTILE(10) LTV deciles via two-phase ranking",
            q_user_ltv_deciles,
            ORACLE_USER_LTV_DECILES,
        ),
        QuerySpec(
            "orders_yoy_growth",
            "Year-over-year revenue lag window over tiny aggregate",
            q_orders_yoy_growth,
            ORACLE_ORDERS_YOY_GROWTH,
        ),
        QuerySpec(
            "cohort_monthly_revenue",
            "First-order-month cohort revenue matrix",
            q_cohort_monthly_revenue,
            ORACLE_COHORT_MONTHLY_REVENUE,
        ),
        QuerySpec(
            "event_cooccurrence_lift",
            "Event-type co-occurrence lift vs independence",
            q_event_cooccurrence_lift,
            ORACLE_EVENT_COOCCURRENCE_LIFT,
        ),
        QuerySpec(
            "interarrival_time_stats",
            "Per-type inter-arrival gap stats (lag window, integer us)",
            q_interarrival_time_stats,
            ORACLE_INTERARRIVAL_TIME_STATS,
        ),
        QuerySpec(
            "dormant_rich_customers",
            "TPC-H Q22 shape: above-avg balance + anti join on recent orders",
            q_dormant_rich_customers,
            ORACLE_DORMANT_RICH_CUSTOMERS,
        ),
        QuerySpec(
            "median_order_gap_days",
            "Ordered-set median over window-derived order gaps",
            q_median_order_gap_days,
            ORACLE_MEDIAN_ORDER_GAP_DAYS,
        ),
        QuerySpec(
            "nation_balance_gini",
            "Per-nation Gini from scale-safe grouped two-phase ranks",
            q_nation_balance_gini,
            ORACLE_NATION_BALANCE_GINI,
        ),
        QuerySpec(
            "segment_top_orders",
            "Top-3 per segment (QUALIFY idiom) via grouped two-phase ranking",
            q_segment_top_orders,
            ORACLE_SEGMENT_TOP_ORDERS,
        ),
        QuerySpec(
            "viewer_purchaser_sets",
            "INTERSECT / EXCEPT cohort algebra",
            q_viewer_purchaser_sets,
            ORACLE_VIEWER_PURCHASER_SETS,
        ),
        QuerySpec(
            "part_metrics_unpivot",
            "UNPIVOT (stack) to long form + profile aggregate",
            q_part_metrics_unpivot,
            ORACLE_PART_METRICS_UNPIVOT,
        ),
        QuerySpec(
            "supplier_part_coverage",
            "Relational division: suppliers covering all top-5 brands",
            q_supplier_part_coverage,
            ORACLE_SUPPLIER_PART_COVERAGE,
        ),
        QuerySpec(
            "first_touch_attribution",
            "Per-day first-touch conversion attribution",
            q_first_touch_attribution,
            ORACLE_FIRST_TOUCH_ATTRIBUTION,
        ),
        QuerySpec(
            "text_length_quantiles_by_lang",
            "Exact discrete length quantiles per language",
            q_text_length_quantiles_by_lang,
            ORACLE_TEXT_LENGTH_QUANTILES_BY_LANG,
        ),
        QuerySpec(
            "text_type_token_ratio",
            "Aggregate type-token ratio per language (int-exact)",
            q_text_type_token_ratio,
            ORACLE_TEXT_TYPE_TOKEN_RATIO,
        ),
        QuerySpec(
            "text_first_position_stats",
            "First-occurrence position stats for top-10 corpus terms",
            q_text_first_position_stats,
            ORACLE_TEXT_FIRST_POSITION_STATS,
        ),
        QuerySpec(
            "text_doc_top_terms",
            "Per-doc top-3 terms as joined string (bounded window)",
            q_text_doc_top_terms,
            ORACLE_TEXT_DOC_TOP_TERMS,
        ),
        QuerySpec(
            "dedup_prefix_clusters",
            "Prefix-hash dedup audit per source",
            q_dedup_prefix_clusters,
            ORACLE_DEDUP_PREFIX_CLUSTERS,
        ),
        QuerySpec(
            "sketch_bloom_membership",
            "Bloom membership sketch with bounded broadcast position set",
            q_sketch_bloom_membership,
            ORACLE_SKETCH_BLOOM_MEMBERSHIP,
        ),
        QuerySpec(
            "embedding_quantization_error",
            "Int8 scalar-quantization error audit per label",
            q_embedding_quantization_error,
            ORACLE_EMBEDDING_QUANTIZATION_ERROR,
        ),
        QuerySpec(
            "multimodal_video_frame_plan",
            "Deterministic video frame-sampling plan (stubbed decode)",
            q_multimodal_video_frame_plan,
            ORACLE_MULTIMODAL_VIDEO_FRAME_PLAN,
        ),
        QuerySpec(
            "curation_mixture_weights",
            "sqrt-temperature mixture weights + epochs at token budget",
            q_curation_mixture_weights,
            ORACLE_CURATION_MIXTURE_WEIGHTS,
        ),
    ]
