"""Analytic-SQL coverage beyond the reference corpus.

The reference's query surface contains no OVER-clause analytics,
grouping sets, or subquery forms (SURVEY.md §2.B) — BigQuery has them,
so a switching user expects them. Spark provides all of these
natively; each entry here is a Spark-first plan paired with a DuckDB
oracle, same determinism discipline as queries.py (decimal sums,
explicit tie-breaks, ROUND before ranking). Divergence-class contracts
live in ORACLES.md (repo root) — cite, don't restate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .sources.testdata import register_tables

__all__ = ["analytics_specs"]


def _dec(col: str):
    # Exact decimal for money/quantity math (order-independent sums).
    return F.col(col).cast("decimal(12,4)")


def _dec7(expr):
    # 1±discount style factors: small, 4 decimal places.
    return expr.cast("decimal(7,4)")


def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + lag per customer: top-2 orders by price with the
    gap since the previous order."""
    register_tables(spark, sf_dir, ("orders",))
    orders = spark.table("orders")
    by_cust = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    time_order = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,4)").cast("double").alias("price"),
            F.row_number().over(by_cust).alias("price_rank"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(time_order)
            ).alias("days_since_prev"),
        )
        .filter(F.col("price_rank") <= 2)
    )


ORACLE_WINDOW_TOP_ORDERS = """
SELECT * FROM (
  SELECT
    o_custkey,
    o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(12,4)) AS DOUBLE) AS price,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      AS price_rank,
    datediff('day',
      lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      o_orderdate) AS days_since_prev
  FROM orders
) WHERE price_rank <= 2
"""


def q_moving_window_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving aggregate over daily per-type event value (frame =
    6 preceding .. current). Exact decimal sums inside the frame; the
    average is a double division at the end."""
    register_tables(spark, sf_dir, ("events",))
    # event-time contract: rows with NULL ts are dropped — a null day
    # in the moving frame would sort FIRST here and LAST in standard
    # SQL engines (DuckDB), making the 7-row window engine-dependent
    daily = (
        spark.table("events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type"), F.col("ts").cast("date").alias("event_date")
        )
        .agg(F.sum(F.col("value").cast("decimal(12,4)")).alias("day_value"))
    )
    frame = (
        W.partitionBy("event_type").orderBy("event_date").rowsBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "event_date",
        F.col("day_value").cast("double").alias("day_value"),
        (
            F.sum("day_value").over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("moving_avg_7d"),
    )


ORACLE_MOVING_WINDOW_VALUE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         SUM(TRY_CAST(value AS DECIMAL(12,4))) AS day_value
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, event_date,
  CAST(day_value AS DOUBLE) AS day_value,
  CAST(SUM(day_value) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_7d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, status) with explicit grouping flags."""
    register_tables(spark, sf_dir, ("orders",))
    orders = spark.table("orders").select(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("price"),
    )
    return (
        orders.rollup("order_year", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("volume"),
        )
        .select(
            F.coalesce(F.col("order_year").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce(F.col("status"), F.lit("ALL")).alias("status"),
            "n_orders",
            "volume",
        )
    )


ORACLE_ROLLUP_ORDER_VOLUME = """
SELECT
  COALESCE(CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS VARCHAR), 'ALL') AS order_year,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS volume
FROM orders
GROUP BY ROLLUP (CAST(EXTRACT(YEAR FROM o_orderdate) AS INT), o_orderstatus)
HAVING COUNT(*) > 0
"""
# HAVING COUNT(*) > 0 states the Spark grouping-sets contract on EMPTY
# input: Spark expands grouping sets by duplicating input rows (Expand
# operator), so zero input rows -> zero groups -> zero output, while
# standard SQL's () grand-total set emits one count-0 row. On non-empty
# input every group has >= 1 row, so the clause is a no-op. See
# ORACLES.md (empty-input grouping sets).


def q_grouping_sets_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-hierarchical GROUPING SETS ((returnflag), (linestatus)) —
    two independent one-dimension aggregates in ONE pass over the
    data, a shape ROLLUP/CUBE can't express. Catalyst plans this as a
    single scan + Expand (one output row per grouping set per input
    row) + hash aggregate, so at 100 TB the table is read once, not
    once per breakdown; grouping flags disambiguate the NULLs."""
    register_tables(spark, sf_dir, ("lineitem",))
    li = spark.table("lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.col("l_quantity").cast("decimal(12,4)").alias("qty"),
    )
    return (
        li.groupingSets([["returnflag"], ["linestatus"]], "returnflag", "linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("double").alias("sum_qty"),
            F.grouping("returnflag").cast("int").alias("g_flag"),
            F.grouping("linestatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce(F.col("returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
            "g_flag",
            "g_status",
        )
    )


ORACLE_GROUPING_SETS_LINEITEMS = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q_nation_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern: customers above their nation's
    average balance (decorrelated into a join — same plan Catalyst
    produces for the subquery form)."""
    register_tables(spark, sf_dir, ("customer", "nation"))
    cust = spark.table("customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(12,4)").cast("double").alias("acctbal"),
        )
    )


ORACLE_NATION_ABOVE_AVG = """
WITH nation_avg AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey,
       CAST(CAST(c_acctbal AS DECIMAL(12,4)) AS DOUBLE) AS acctbal
FROM customer JOIN nation_avg USING (c_nationkey)
WHERE c_acctbal > nation_avg
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS shape)."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    cust = spark.table("customer")
    orders = spark.table("orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions + LIKE + conditional aggregation."""
    register_tables(spark, sf_dir, ("part",))
    part = spark.table("part")
    return (
        part.select(
            F.upper(F.substring("p_brand", 1, 5)).alias("brand_prefix"),
            F.length("p_name").alias("name_len"),
            F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
            F.col("p_retailprice").cast("decimal(12,4)").alias("price"),
        )
        .groupBy("brand_prefix")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("is_brass").alias("n_brass"),
            F.max("name_len").alias("max_name_len"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


ORACLE_PART_BRAND_STATS = """
SELECT
  UPPER(substr(p_brand, 1, 5)) AS brand_prefix,
  COUNT(*) AS n_parts,
  CAST(SUM(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brass,
  CAST(MAX(length(p_name)) AS BIGINT) AS max_name_len,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS DOUBLE) AS total_price
FROM part
GROUP BY 1
"""


def q_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: lag + cumulative sum of
    gap-breaks — the batch twin of streaming/windows.sessionize."""
    register_tables(spark, sf_dir, ("events",))
    # event-time contract: NULL ts rows are dropped (they sort FIRST in
    # Spark's ORDER BY and LAST in DuckDB's, so lag-gap session splits
    # would be engine-dependent; the streaming twin drops them too)
    ev = (
        spark.table("events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts")
    )
    order = W.partitionBy("user_id").orderBy("ts", "user_id")
    # Exact microseconds on BOTH sides: ts.cast('long') floors to whole
    # seconds while the oracle's epoch(ts) is fractional, so a true gap
    # in (1800, 1801)s would split sessions differently. unix_micros /
    # epoch_us are exact integers at the data's actual precision.
    micros = F.unix_micros(F.col("ts"))
    gap_break = (
        micros - F.lag(micros).over(order) > 30 * 60 * 1_000_000
    ).cast("int")
    with_session = ev.select(
        "user_id",
        "ts",
        F.sum(F.coalesce(gap_break, F.lit(0))).over(
            W.partitionBy("user_id").orderBy("ts", "user_id").rowsBetween(
                W.unboundedPreceding, 0
            )
        ).alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


ORACLE_BATCH_SESSIONIZATION = """
WITH marked AS (
  SELECT user_id, ts,
    -- epoch_us, not epoch: exact integer micros to match Spark's
    -- unix_micros (epoch() is fractional seconds; a floor-second diff
    -- on one side would split (1800,1801)s gaps differently)
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, user_id)
),
sessions AS (
  SELECT user_id, ts,
    -- CAST: DuckDB SUM(int) OVER returns HUGEINT, which the driver's
    -- pandas canonicalization coerces to float64 and hash-mismatches
    -- Spark's bigint (round-3 driver FAIL). BIGINT keeps both int64.
    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, user_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


def q_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by year."""
    register_tables(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = spark.table("nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = spark.table("nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = spark.table("lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(7,4)")
    joined = (
        li.join(spark.table("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(spark.table("supplier")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(spark.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(F.sum(revenue).cast("double").alias("volume"))


ORACLE_NATION_PAIR_VOLUME = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(7,4)))
       AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""


def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20."""
    register_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    li = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    orders = spark.table("orders")
    cust = spark.table("customer")
    nation = spark.table("nation")
    revenue = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(7,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_ITEM_LOSSES = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(7,4)))
       AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_shipping_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix per line status with boolean
    CASE counts."""
    register_tables(spark, sf_dir, ("orders", "lineitem"))
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = spark.table("orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return joined.groupBy("l_linestatus").agg(
        F.sum(high).alias("high_priority_count"),
        F.sum(1 - high).alias("low_priority_count"),
    )


ORACLE_SHIPPING_PRIORITY_MIX = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_priority_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
    AS low_priority_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate over a join — exercises
    CNF conversion and predicate pushdown through the join."""
    register_tables(spark, sf_dir, ("lineitem", "part"))
    li = spark.table("lineitem")
    part = spark.table("part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    pred = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_size") >= 40) & (F.col("l_discount") < 0.03))
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(7,4)")
    return joined.filter(pred).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(7,4)))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
   OR (p_size >= 40 AND l_discount < 0.03)
"""


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: events.props is a JSON string; pull
    ``$.k``, cast, aggregate. JVM-side get_json_object — no UDF.

    Engine contract: extraction is LENIENT — malformed JSON yields
    NULL (Spark get_json_object / BigQuery SAFE.JSON_EXTRACT
    semantics), never an error. The oracle mirrors it with a
    json_valid guard, since DuckDB's json_extract_string ERRORS on
    malformed input (found by the round-5 malformed-JSON gate)."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


ORACLE_JSON_PROPS_STATS = """
WITH ext AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
  COUNT(k) AS n_with_k,
  CAST(SUM(k) AS BIGINT) AS k_total,
  MIN(k) AS k_min,
  MAX(k) AS k_max
FROM ext
GROUP BY event_type
"""


def q_array_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic ordering: first 5 distinct
    user ids per event type, plus array functions over the result."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events")
    users = F.slice(F.sort_array(F.collect_set("user_id")), 1, 5)
    # The ARRAY stays internal (size / array_contains prove the array
    # surface); the OUTPUT column is a joined string because the driver's
    # pandas canonicalization cannot sort raw array columns (round-3
    # "unhashable numpy.ndarray" ERROR).
    return (
        ev.groupBy("event_type")
        .agg(users.alias("first_users_arr"))
        .select(
            "event_type",
            F.array_join("first_users_arr", ",").alias("first_users"),
            F.size("first_users_arr").alias("n_listed"),
            F.array_contains("first_users_arr", 0).alias("has_user_zero"),
        )
    )


ORACLE_ARRAY_AGG_USERS = """
SELECT event_type,
  array_to_string(list_sort(list(DISTINCT user_id))[1:5], ',') AS first_users,
  len(list_sort(list(DISTINCT user_id))[1:5]) AS n_listed,
  list_contains(list_sort(list(DISTINCT user_id))[1:5], 0) AS has_user_zero
FROM events
GROUP BY event_type
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles of event value per type via the WITHIN GROUP
    ordered-set aggregate. ``percentile_disc`` returns an actual data
    value (no interpolation), so the doubles are exact and
    engine-portable — the deterministic stand-in where production would
    use ``approx_percentile`` sketches at 100 TB."""
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
        """
    )


ORACLE_VALUE_QUANTILES = """
SELECT event_type,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       quantile_disc(value, 0.99) AS p99,
       CAST(count(*) AS BIGINT)   AS n_events
FROM events GROUP BY event_type
"""


def q_pivot_segment_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order volume per nation broken out by market segment.
    Spark's ``groupBy().pivot(col, values)`` with explicit pivot values
    is ONE pass (no extra distinct-values job) and compiles to a plain
    conditional aggregate — the same shape the oracle spells out, and
    the only pivot form that scales (an implicit pivot first runs a
    distinct over the pivot column)."""
    register_tables(spark, sf_dir, ("customer", "orders", "nation"))
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = (
        spark.table("orders")
        .join(F.broadcast(spark.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(spark.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    out = (
        joined.groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,4)")).cast("double"))
    )
    renames = [F.col("n_name")] + [
        F.coalesce(F.col(s), F.lit(0.0)).alias(f"vol_{s.lower()}") for s in segs
    ]
    return out.select(*renames)


ORACLE_PIVOT_SEGMENT_VOLUME = """
SELECT
  n_name,
  COALESCE(CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS vol_automobile,
  COALESCE(CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS vol_building,
  COALESCE(CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS vol_furniture,
  COALESCE(CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS vol_household,
  COALESCE(CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS vol_machinery
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery (TPC-H Q17 shape): revenue
    from lineitems whose quantity is below 20% of their part's average.
    Catalyst decorrelates the subquery into an aggregate + join; the
    per-part aggregate is tiny next to lineitem, so AQE broadcasts it.
    The 20%-of-average predicate is algebraically rearranged to
    ``5·qty·cnt < sum_qty`` so both engines compare exact decimals/
    integers (no divide, no float round-off divergence)."""
    register_tables(spark, sf_dir, ("lineitem", "part"))
    li = spark.table("lineitem")
    brand = spark.table("part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type").startswith("STANDARD"))
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == per_part.pp_partkey)
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


ORACLE_SMALL_QUANTITY_REVENUE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / 7.0 AS avg_yearly,
  COUNT(*) AS n_small
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#1' AND p_type LIKE 'STANDARD%'
  AND CAST(l.l_quantity AS DECIMAL(12,4)) * 5 * (
        SELECT COUNT(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey
      ) < (
        SELECT SUM(CAST(i.l_quantity AS DECIMAL(12,4)))
        FROM lineitem i WHERE i.l_partkey = l.l_partkey
      )
"""


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a HAVING aggregate (TPC-H Q18 shape): orders
    whose total quantity exceeds a threshold, with customer context.
    The IN-list becomes a LEFT SEMI join on o_orderkey; the heavy
    per-order aggregate happens once, before the join."""
    register_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    li = spark.table("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        spark.table("orders")
        .join(big, F.col("o_orderkey") == big.l_orderkey)
        .join(F.broadcast(spark.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(12,4)").cast("double").alias("total_price"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


ORACLE_LARGE_VOLUME_ORDERS = """
SELECT
  c_name, c_custkey, o_orderkey, o_orderdate,
  CAST(CAST(o_totalprice AS DECIMAL(12,4)) AS DOUBLE) AS total_price,
  CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(12,4))) FROM lineitem
        WHERE l_orderkey = o_orderkey) AS DOUBLE)     AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 180
)
"""


def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View + scalar MAX subquery (TPC-H Q15 shape): supplier(s) whose
    quarter revenue equals the global maximum. The revenue aggregate is
    computed once and self-compared against its own max — on a cluster
    the max is a one-row broadcast, not a second scan of lineitem.
    Equality compares exact decimals, so the tie set is well-defined."""
    register_tables(spark, sf_dir, ("supplier", "lineitem"))
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec7(F.lit(1) - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        spark.table("supplier")
        .join(revenue, F.col("s_suppkey") == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


ORACLE_TOP_REVENUE_SUPPLIERS = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(7,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment balance quartiles + re-aggregation. The total order
    (balance, then key) makes the quartile deterministic.

    Exact ``NTILE(4) OVER (PARTITION BY segment ...)`` semantics, but
    via ``operators/ranking.grouped_ntile``: a plain segment-partitioned
    window funnels each of the 5 segments through ONE task's sort — at
    100x that's five ~200M-row single-task sorts. grouped_ntile
    range-partitions on (segment, balance, key), ranks locally, and
    prefix-sums the tiny per-(partition, segment) counts distributively
    — no single-task sort, no driver collect."""
    from .operators.ranking import grouped_ntile

    register_tables(spark, sf_dir, ("customer",))
    cust = spark.table("customer").select(
        "c_mktsegment", "c_acctbal", "c_custkey"
    )
    ranked = grouped_ntile(
        cust,
        ["c_mktsegment"],
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        "quartile",
        k=4,
    )
    bal = F.col("c_acctbal").cast("decimal(12,4)")
    return ranked.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min(bal).cast("double").alias("min_bal"),
        F.max(bal).cast("double").alias("max_bal"),
        F.sum(bal).cast("double").alias("total_bal"),
    )


ORACLE_CUSTOMER_BALANCE_QUARTILES = """
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal NULLS FIRST, c_custkey) AS quartile
  FROM customer
)
SELECT c_mktsegment, quartile,
       COUNT(*) AS n_customers,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_bal
FROM ranked
GROUP BY c_mktsegment, quartile
"""


def q_cube_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (orderstatus, orderpriority): all four grouping
    combinations — (both), (status), (priority), (grand total) — in one
    scan+Expand+hash-aggregate pass; grouping flags disambiguate the
    rolled-up NULLs from data NULLs (same convention as the
    GROUPING SETS query)."""
    register_tables(spark, sf_dir, ("orders",))
    od = spark.table("orders").select(
        F.col("o_orderstatus").alias("orderstatus"),
        F.col("o_orderpriority").alias("orderpriority"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("price"),
    )
    return (
        od.cube("orderstatus", "orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
            F.grouping("orderstatus").cast("int").alias("g_status"),
            F.grouping("orderpriority").cast("int").alias("g_priority"),
        )
        .select(
            F.coalesce(F.col("orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
            "g_status",
            "g_priority",
        )
    )


ORACLE_CUBE_ORDER_MIX = """
SELECT
  COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total_price,
  CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""
# HAVING: Spark Expand-based grouping sets emit NO grand-total row on
# empty input (see ORACLE_ROLLUP_ORDER_VOLUME note / ORACLES.md).


def q_event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per event type — mean, sample stddev,
    and corr(value, hour-of-day) — computed from EXACT decimal power
    sums (n, Σx, Σx², Σy, Σy², Σxy) rather than Spark's built-in
    stddev/corr aggregates, whose double accumulation is partitioning-
    order-dependent and would never hash-match an oracle. The sums are
    one map-side-combined aggregate pass; the closed-form moments are
    a scalar projection after. Same single-shuffle cost as the
    built-ins, bit-stable at any parallelism."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events").select(
        "event_type",
        F.col("value").cast("decimal(12,4)").alias("x"),
        F.hour("ts").cast("decimal(12,4)").alias("y"),
    )
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # Degenerate groups are NULL on BOTH sides, by explicit guard: with
    # n=1 Spark's non-ANSI x/0 yields NULL while DuckDB's IEEE doubles
    # yield inf/NaN; double cancellation can also push var/corr_den
    # fractionally negative (sqrt -> NaN here, an ERROR there). The
    # oracle SQL mirrors each CASE exactly.
    var = F.when(n > 1.0, (sxx - sx * sx / n) / (n - F.lit(1.0)))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(sx / n, 6).alias("mean_value"),
        F.round(F.when(var >= 0, F.sqrt(var)), 6).alias("stddev_value"),
        F.round(
            F.when(
                (vx > 0) & (vy > 0),
                (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
            ),
            6,
        ).alias("corr_value_hour"),
    )


ORACLE_EVENT_VALUE_MOMENTS = """
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(TRY_CAST(value AS DECIMAL(12,4))) AS sx,
         SUM(TRY_CAST(value AS DECIMAL(12,4)) * TRY_CAST(value AS DECIMAL(12,4))) AS sxx,
         SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(12,4))) AS sy,
         SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(12,4))
             * CAST(EXTRACT(hour FROM ts) AS DECIMAL(12,4))) AS syy,
         SUM(TRY_CAST(value AS DECIMAL(12,4))
             * CAST(EXTRACT(hour FROM ts) AS DECIMAL(12,4))) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_value,
       CASE WHEN n > 1
             AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / (n - 1.0) >= 0
            THEN ROUND(SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                            / (n - 1.0)), 6)
       END AS stddev_value,
       CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                       6)
       END AS corr_value_hour
FROM s
"""


def q_sole_problem_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (multi-correlated EXISTS / NOT EXISTS),
    decorrelated by hand into two per-order aggregates: suppliers with
    a returned lineitem on a finished multi-supplier order where no
    OTHER supplier had a return on that order. The correlated oracle
    proves the rewrite: EXISTS(other supplier) ≡ n_suppliers ≥ 2,
    NOT EXISTS(other returner) ≡ n_returners = 1. One aggregate pass
    per flag over lineitem replaces two correlated re-scans per row —
    the shape Catalyst can't always reach on its own at this nesting
    depth, and the one that matters at 100 TB."""
    register_tables(spark, sf_dir, ("supplier", "orders", "lineitem"))
    li = spark.table("lineitem")
    finished = spark.table("orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    all_sup = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup")
    )
    returned = li.filter(F.col("l_returnflag") == "R")
    ret_sup = returned.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_ret")
    )
    qual = (
        returned.select("l_orderkey", "l_suppkey")
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(all_sup, "l_orderkey")
        .join(ret_sup, "l_orderkey")
        .filter((F.col("n_sup") >= 2) & (F.col("n_ret") == 1))
    )
    return (
        qual.join(
            F.broadcast(spark.table("supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


ORACLE_SOLE_PROBLEM_SUPPLIERS = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_event_value_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: 6-hour OHLC-style bars per event type —
    open/close are the first/last values by event time with event_id as
    the tie-break. First/last come from ``min/max(struct(ts, event_id,
    value))``: the struct's lexicographic order makes them deterministic
    where ``min_by``/``first`` are not under ties or partition order —
    one ordinary hash-aggregate pass, no window sort, resampling a
    100 TB event stream at aggregate cost."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events").select(
        "event_type",
        F.window("ts", "6 hours").alias("win"),
        F.struct(
            F.col("ts"), F.col("event_id"), F.col("value").cast("decimal(12,4)").alias("v")
        ).alias("rec"),
        F.col("value").cast("decimal(12,4)").alias("val"),
    )
    return (
        ev.groupBy("event_type", "win")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("rec")["v"].cast("double"), 4).alias("open_value"),
            F.round(F.max("rec")["v"].cast("double"), 4).alias("close_value"),
            F.round(F.min("val").cast("double"), 4).alias("low_value"),
            F.round(F.max("val").cast("double"), 4).alias("high_value"),
        )
        .select(
            "event_type",
            F.col("win.start").alias("bar_start"),
            "n_events",
            "open_value",
            "close_value",
            "low_value",
            "high_value",
        )
    )


ORACLE_EVENT_VALUE_BARS = """
WITH binned AS (
  SELECT event_type,
         make_timestamp(epoch_us(ts) // 21600000000 * 21600000000) AS bar_start,
         ts, event_id, TRY_CAST(value AS DECIMAL(12,4)) AS val
  FROM events
  -- Spark's window(ts, ...) assigns NULL ts to no bucket (row dropped);
  -- without this filter the oracle would emit a NULL-bar group
  WHERE ts IS NOT NULL
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bar_start
                            ORDER BY ts, event_id) AS rn_open,
         row_number() OVER (PARTITION BY event_type, bar_start
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM binned
)
SELECT event_type, bar_start,
       COUNT(*) AS n_events,
       ROUND(CAST(MAX(CASE WHEN rn_open = 1 THEN val END) AS DOUBLE), 4)  AS open_value,
       ROUND(CAST(MAX(CASE WHEN rn_close = 1 THEN val END) AS DOUBLE), 4) AS close_value,
       ROUND(CAST(MIN(val) AS DOUBLE), 4) AS low_value,
       ROUND(CAST(MAX(val) AS DOUBLE), 4) AS high_value
FROM ranked
GROUP BY event_type, bar_start
"""


def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of all revenue on orders
    placed by ASIA-region customers, the fraction supplied by one
    nation's suppliers, per order year. The share is a conditional
    decimal sum over the SAME aggregate pass as the total — one
    star-join + one shuffle, no second scan. All four dimension joins
    broadcast (region/nation/supplier/customer are tiny next to
    lineitem); the only shuffles are lineitem⋈orders on orderkey and
    the final year groupBy. At 100 TB the orderkey join is the cost —
    co-partitioned/bucketed layouts on orderkey make it shuffle-free."""
    register_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation", "region")
    )
    asia_nations = (
        spark.table("nation")
        .join(
            F.broadcast(spark.table("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = spark.table("nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(7,4)")
    li = spark.table("lineitem")
    joined = (
        li.join(spark.table("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(spark.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(spark.table("supplier")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
    )
    target = F.col("supp_nation") == "NATION_3"
    agg = joined.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(F.when(target, revenue).otherwise(F.lit(0).cast("decimal(12,4)"))).alias(
            "nation_rev"
        ),
        F.sum(revenue).alias("total_rev"),
    )
    return agg.select(
        "order_year",
        F.round(F.col("nation_rev").cast("double"), 4).alias("nation_revenue"),
        F.round(
            F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"), 6
        ).alias("mkt_share"),
    )


ORACLE_NATIONAL_MARKET_SHARE = """
SELECT
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
  ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(12,4))
                      * CAST(1 - l_discount AS DECIMAL(7,4))
                 ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE), 4) AS nation_revenue,
  ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(12,4))
                      * CAST(1 - l_discount AS DECIMAL(7,4))
                 ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                   * CAST(1 - l_discount AS DECIMAL(7,4))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region    ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY 1
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): per ship month, the percent
    of revenue from PROMO-type parts. part⋈lineitem broadcast; the
    conditional and total sums share one aggregate pass."""
    register_tables(spark, sf_dir, ("lineitem", "part"))
    revenue = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(7,4)")
    li = spark.table("lineitem").join(
        F.broadcast(spark.table("part")), F.col("l_partkey") == F.col("p_partkey")
    )
    # to_date: DuckDB's date_trunc('month', ts) yields DATE, Spark's a
    # midnight TIMESTAMP — align the types or the value-hash diverges
    agg = li.groupBy(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month")
    ).agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", revenue).otherwise(
                F.lit(0).cast("decimal(12,4)")
            )
        ).alias("promo_rev"),
        F.sum(revenue).alias("total_rev"),
    )
    return agg.select(
        "ship_month",
        F.round(
            F.lit(100.0)
            * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double"),
            6,
        ).alias("promo_pct"),
        F.round(F.col("total_rev").cast("double"), 4).alias("total_revenue"),
    )


ORACLE_PROMO_REVENUE_SHARE = """
SELECT
  date_trunc('month', l_shipdate) AS ship_month,
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,4))
                         * CAST(1 - l_discount AS DECIMAL(7,4))
                    ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                   * CAST(1 - l_discount AS DECIMAL(7,4))) AS DOUBLE), 6) AS promo_pct,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * CAST(1 - l_discount AS DECIMAL(7,4))) AS DOUBLE), 4) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance and NO orders since 2000 ("lapsed" — Q22's no-orders
    predicate scoped to a recent window so the dense testdata yields
    rows), grouped by market segment. The scalar AVG subquery is one
    tiny aggregate broadcast into the filter (Spark decorrelates it
    the same way BigQuery would); the NOT EXISTS is a left-anti join
    on custkey. The anti-join build side prunes orders to the custkey
    column AND the date predicate before the shuffle — at scale both
    reach the parquet scan as PushedFilters/ReadSchema."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    cutoff = "2000-01-01 00:00:00"
    cust = spark.table("customer")
    # scalar subquery: average positive balance (exact decimal sum /
    # count, divided as double at the end — deterministic both sides)
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.join(
        F.broadcast(pos), F.col("c_acctbal").cast("double") > F.col("avg_bal")
    )
    no_orders = rich.join(
        spark.table("orders")
        .filter(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp"))
        .select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return no_orders.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(12,4)"))
        .cast("double")
        .alias("total_balance"),
    )


ORACLE_GLOBAL_SALES_OPPORTUNITY = """
SELECT
  c_mktsegment AS segment,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_balance
FROM customer c
WHERE CAST(c_acctbal AS DOUBLE) > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""


def q_nation_profit_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year), adapted
    to the testdata's schema: no partsupp table, so unit cost is a
    deterministic fraction of p_retailprice. The only non-broadcast
    join is lineitem⋈orders on orderkey (orders pruned to
    orderkey+date before the shuffle); part/supplier/nation broadcast.
    Profit is one exact-decimal expression summed in a single pass."""
    register_tables(
        spark, sf_dir, ("lineitem", "orders", "part", "supplier", "nation")
    )
    li = spark.table("lineitem")
    profit = (
        F.col("l_extendedprice").cast("decimal(12,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(7,4)")
        - F.col("p_retailprice").cast("decimal(12,4)")
        * F.lit(0.1).cast("decimal(7,4)")
        * F.col("l_quantity").cast("decimal(12,4)")
    )
    joined = (
        li.join(
            spark.table("orders").select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(spark.table("part")), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(spark.table("supplier")), li.l_suppkey == F.col("s_suppkey")
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
    ).agg(F.round(F.sum(profit).cast("double"), 4).alias("profit"))


ORACLE_NATION_PROFIT_TREND = """
SELECT
  n_name AS nation,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * CAST(1 - l_discount AS DECIMAL(7,4))
               - CAST(p_retailprice AS DECIMAL(12,4))
                 * CAST(0.1 AS DECIMAL(7,4))
                 * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE), 4) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_balance_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST + full-frame LAST_VALUE per market
    segment, filtered to the top decile — the OVER-clause distribution
    functions not covered by NTILE/ROW_NUMBER elsewhere.

    The ordering (balance, custkey) is UNIQUE within a segment, so
    RANK == ROW_NUMBER and every distribution function is arithmetic
    over the grouped row number: ``percent_rank = (rn-1)/(N-1)``,
    ``cume_dist = rn/N``, and the ascending full-frame LAST_VALUE is
    the segment max. Computed via
    ``operators/ranking.grouped_row_number`` — the segment-partitioned
    window would funnel each of the 5 segments through one task's sort
    at 100x (same fix as customer_balance_quartiles). N == 1 segments
    define percent_rank = 0 (both engines)."""
    from .operators.ranking import grouped_row_number

    register_tables(spark, sf_dir, ("customer",))
    cust = spark.table("customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ranked = grouped_row_number(
        cust,
        ["c_mktsegment"],
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        rn_col="__rn",
        total_col="__n",
    )
    # the row ranked last in each segment holds the segment max (the
    # ordering is balance ASC) — no second scan of customer needed,
    # this reads the already-persisted ranked frame
    seg_max = ranked.filter(F.col("__rn") == F.col("__n")).select(
        F.col("c_mktsegment").alias("__seg"),
        F.col("c_acctbal").cast("decimal(12,4)").alias("__max_bal"),
    )
    out = (
        # null-safe: a NULL segment is an ordinary window partition and
        # must pick up its own segment max, not drop out of the join
        ranked.join(
            F.broadcast(seg_max),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg")),
        )
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").cast("decimal(12,4)").cast("double").alias("balance"),
            F.round(
                F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
                    (F.col("__rn") - 1).cast("double") / (F.col("__n") - 1)
                ),
                6,
            ).alias("pct_rank"),
            F.round(F.col("__rn").cast("double") / F.col("__n"), 6).alias("cume"),
            F.col("__max_bal").cast("double").alias("segment_max"),
        )
    )
    return out.filter(F.col("pct_rank") >= 0.9)


ORACLE_BALANCE_RANK_DISTRIBUTION = """
SELECT * FROM (
  SELECT
    c_custkey,
    c_mktsegment AS segment,
    CAST(CAST(c_acctbal AS DECIMAL(12,4)) AS DOUBLE) AS balance,
    ROUND(percent_rank() OVER w, 6) AS pct_rank,
    ROUND(cume_dist() OVER w, 6) AS cume,
    CAST(CAST(last_value(c_acctbal) OVER
         (PARTITION BY c_mktsegment
          ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS DECIMAL(12,4)) AS DOUBLE) AS segment_max
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC)
)
WHERE pct_rank >= 0.9
"""


def q_hopping_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) time windows in BATCH: 1-hour windows
    sliding every 30 minutes via ``F.window(ts, '1 hour', '30
    minutes')`` — each event lands in exactly two windows. Spark's
    window assignment is an Expand (map-only row doubling) before one
    hash aggregate; no per-window re-scan. The oracle replays the
    same assignment arithmetic with an explicit 2-row unnest."""
    register_tables(spark, sf_dir, ("events",))
    win = F.window("ts", "1 hour", "30 minutes")
    agg = (
        spark.table("events")
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


ORACLE_HOPPING_EVENT_WINDOWS = """
WITH assigned AS (
  SELECT
    make_timestamp(epoch_us(ts) // 1800000000 * 1800000000
                   - k * 1800000000) AS window_start,
    event_type,
    TRY_CAST(value AS DECIMAL(12,4)) AS val
  FROM events, unnest([0, 1]) AS u(k)
  -- Spark's window(ts, ...) drops NULL ts rows; mirror that here
  WHERE ts IS NOT NULL
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(val) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1, 2, 3
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase) per user: a user
    converts a stage only if its event happens AT OR AFTER the
    previous stage's first completion. Three running-min window
    projections share ONE shuffle (all partitioned on user_id, ordered
    by ts — Catalyst reuses the sort), then a per-user rollup and a
    single-row funnel summary. No self-joins: the classic 3-way
    event-sequence join would shuffle events three times."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events").select("user_id", "event_type", "ts", "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_view = ev.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    with_click = with_view.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("first_view").isNotNull()
                & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    with_purchase = with_click.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("first_click").isNotNull()
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = with_purchase.groupBy("user_id").agg(
        F.max(F.col("first_view").isNotNull().cast("int")).alias("did_view"),
        F.max(F.col("first_click").isNotNull().cast("int")).alias("did_click"),
        F.max(F.col("first_purchase").isNotNull().cast("int")).alias("did_purchase"),
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("did_view").cast("bigint").alias("n_view"),
        F.sum("did_click").cast("bigint").alias("n_view_click"),
        F.sum("did_purchase").cast("bigint").alias("n_view_click_purchase"),
    )
    return agg.select(
        "n_users",
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        F.round(F.col("n_view_click") / F.col("n_view"), 6).alias("click_rate"),
        F.round(
            F.col("n_view_click_purchase") / F.col("n_view_click"), 6
        ).alias("purchase_rate"),
    )


ORACLE_FUNNEL_CONVERSION = """
WITH v AS (
  SELECT user_id, event_type, ts, event_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS first_view
  FROM events
),
c AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' AND first_view IS NOT NULL
                   AND ts >= first_view THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS first_click
  FROM v
),
p AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'purchase' AND first_click IS NOT NULL
                   AND ts >= first_click THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS first_purchase
  FROM c
),
per_user AS (
  SELECT user_id,
         MAX(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS did_view,
         MAX(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS did_click,
         MAX(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS did_purchase
  FROM p GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(did_view) AS BIGINT) AS n_view,
       CAST(SUM(did_click) AS BIGINT) AS n_view_click,
       CAST(SUM(did_purchase) AS BIGINT) AS n_view_click_purchase,
       ROUND(CAST(SUM(did_click) AS DOUBLE) / SUM(did_view), 6) AS click_rate,
       ROUND(CAST(SUM(did_purchase) AS DOUBLE) / SUM(did_click), 6) AS purchase_rate
FROM per_user
"""


def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, tracked
    across subsequent weeks. Two aggregates — per-user first week
    (tiny, broadcast back) and (cohort, offset) distinct users — plus
    a window share over the small cohort matrix. Weeks are epoch-day
    div 7 buckets (engine-agnostic arithmetic; DATE_TRUNC('week')
    anchors differ between engines)."""
    register_tables(spark, sf_dir, ("events",))
    # integer div, not /7-then-cast: DuckDB casts double->int by
    # ROUNDING where Spark truncates — the repo's integer-div rule
    ev = spark.table("events").select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05").cast("date"))
            / 7
        )
        .cast("int")
        .alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = ev.join(F.broadcast(first), "user_id")
    cells = joined.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.countDistinct("user_id").alias("n_active"))
    size_w = W.partitionBy("cohort_week")
    base = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(size_w)
    return cells.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / base, 6).alias("retention"),
    )


ORACLE_WEEKLY_RETENTION = """
WITH ev AS (
  SELECT user_id,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS INT) AS week
  FROM events
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
cells AS (
  SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
         COUNT(DISTINCT e.user_id) AS n_active
  FROM ev e JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       ROUND(CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week), 6) AS retention
FROM cells
"""


def q_correlated_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT clause, submitted as
    SQL TEXT (not DataFrame calls) — exercising the spark.sql path the
    engine's pass-through queries ride. Catalyst decorrelates the
    subquery into a left outer aggregate join; per-row re-execution
    never happens (the same rewrite BigQuery applies)."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey,
               c_mktsegment AS segment,
               (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order_price,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c_acctbal > 9000.0
        """
    )


ORACLE_CORRELATED_SCALAR_SELECT = """
SELECT c_custkey,
       c_mktsegment AS segment,
       (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
        FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_order_price,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c_acctbal > 9000.0
"""


def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted (no partsupp table): distinct supplier
    count per (brand, type, size-bucket) from observed lineitem
    shipments, excluding one brand and a NOT-IN supplier subquery
    (negative-balance suppliers stand in for the complaints filter).
    The distinct agg shuffles (brand,type,bucket,supplier) once; the
    exclusion list is a tiny broadcast anti-join."""
    register_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    bad_suppliers = spark.table("supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    li = (
        spark.table("lineitem")
        .join(F.broadcast(spark.table("part")), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand") != "Brand#1")
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return li.groupBy(
        "p_brand",
        "p_type",
        (F.col("p_size") - F.col("p_size") % 10).alias("size_bucket"),
    ).agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))


ORACLE_PART_SUPPLIER_VARIETY = """
SELECT p_brand, p_type,
       p_size - p_size % 10 AS size_bucket,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
"""


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted: suppliers that shipped more than 20%
    of some part's total shipped quantity ("dominant" supply
    relationships — the excess-stock predicate re-expressed over
    observed shipments; 20% is ~2x the uniform share in this data, so
    the result is non-trivial at every scale factor). One (part, supplier) aggregate, a window
    share per part over the aggregated table (not the fact table),
    then a supplier rollup and broadcast name join."""
    register_tables(spark, sf_dir, ("lineitem", "supplier"))
    per_ps = spark.table("lineitem").groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("qty")
    )
    part_w = W.partitionBy("l_partkey")
    dominant = per_ps.withColumn(
        "part_total", F.sum("qty").over(part_w)
    ).filter(F.col("qty").cast("double") > F.lit(0.2) * F.col("part_total").cast("double"))
    per_supp = dominant.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_dominant_parts"),
        F.sum("qty").cast("double").alias("dominant_qty"),
    )
    return per_supp.join(
        F.broadcast(spark.table("supplier")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
        "n_dominant_parts",
        "dominant_qty",
    )


ORACLE_DOMINANT_PART_SUPPLIERS = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty
  FROM lineitem GROUP BY 1, 2
),
dominant AS (
  SELECT * FROM (
    SELECT l_partkey, l_suppkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
    FROM per_ps
  ) WHERE CAST(qty AS DOUBLE) > 0.2 * CAST(part_total AS DOUBLE)
),
per_supp AS (
  -- aggregate BEFORE the name join (the engine's order): a duplicated
  -- supplier row must fan out into duplicate annotated rows, not
  -- double the aggregate (duplicate-row gate; ORACLES.md #15)
  SELECT l_suppkey, COUNT(*) AS n_dominant_parts,
         CAST(SUM(qty) AS DOUBLE) AS dominant_qty
  FROM dominant GROUP BY 1
)
SELECT s_suppkey AS suppkey, s_name AS supplier,
       n_dominant_parts, dominant_qty
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
"""


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted (no partsupp): for each part shipped to
    ASIA-region customers, the supplier offering the lowest observed
    unit price (extendedprice/quantity), ties to the lowest supplier
    key. The per-part minimum is a min-STRUCT aggregate — one shuffle,
    no groupBy-then-join-back re-scan, which is the classic Q2
    correlated-subquery plan this replaces. Top 50 parts by unit price
    descending (Q2's ORDER BY ... LIMIT discipline)."""
    register_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "supplier")
    )
    asia_keys = (
        spark.table("nation")
        .join(
            F.broadcast(spark.table("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    unit_price = F.round(
        F.col("l_extendedprice").cast("decimal(12,4)").cast("double")
        / F.col("l_quantity"),
        6,
    )
    li = (
        spark.table("lineitem")
        .join(
            spark.table("orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(spark.table("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_keys), F.col("c_nationkey") == F.col("c_nk"))
        # intake contract: a "cheapest offer" needs a price, a supplier
        # and a part — NULL measurements are excluded BEFORE the
        # min-struct (a struct with a null field is not null, so the
        # aggregate would otherwise rank it, and engines disagree on
        # null-field struct ordering)
        .filter(
            (F.col("l_quantity") > 0)
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_suppkey").isNotNull()
            & F.col("l_partkey").isNotNull()
        )
    )
    best = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.min(
            F.struct(
                unit_price.alias("unit_price"), F.col("l_suppkey").alias("suppkey")
            )
        ).alias("b")
    )
    named = best.join(
        F.broadcast(spark.table("supplier")),
        F.col("b.suppkey") == F.col("s_suppkey"),
    ).select(
        "partkey",
        F.col("s_name").alias("supplier"),
        F.col("b.unit_price").alias("unit_price"),
    )
    return named.orderBy(F.desc("unit_price"), F.asc("partkey")).limit(50)


ORACLE_CHEAPEST_SUPPLIER_PER_PART = """
WITH li AS (
  SELECT l_partkey, l_suppkey,
         ROUND(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) AS DOUBLE)
               / l_quantity, 6) AS unit_price
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
  WHERE l_quantity > 0
    AND l_extendedprice IS NOT NULL
    AND l_suppkey IS NOT NULL
    AND l_partkey IS NOT NULL
),
best AS (
  SELECT l_partkey AS partkey,
         MIN(struct_pack(unit_price := unit_price, suppkey := l_suppkey)) AS b
  FROM li GROUP BY 1
)
SELECT partkey, s_name AS supplier, b.unit_price AS unit_price
FROM best JOIN supplier ON b.suppkey = s_suppkey
ORDER BY unit_price DESC, partkey ASC
LIMIT 50
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table scan with a 3-predicate range
    filter and one aggregate — the canonical predicate-pushdown probe
    (all three predicates must reach the parquet row groups; the
    whole query is one partial+final agg with no shuffle of data
    rows)."""
    register_tables(spark, sf_dir, ("lineitem",))
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").cast("decimal(7,4)").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,4)")
            * F.col("l_discount").cast("decimal(7,4)")
        )
        .cast("double")
        .alias("revenue_change"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_FORECAST_REVENUE_CHANGE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(l_discount AS DECIMAL(7,4))) AS DOUBLE) AS revenue_change,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(7,4)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_event_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection: per event type, days whose count
    deviates from the trailing-7-day mean by more than 2 trailing
    standard deviations. The daily rollup is one aggregate; the
    trailing moments come from integer power sums inside a 7-row frame
    (counts are exact integers, so mean/std are bit-stable in any
    engine — no decimal gymnastics needed); the z-filter is a map-only
    projection over the small daily table. Days with fewer than 3
    prior observations or zero variance are never flagged."""
    register_tables(spark, sf_dir, ("events",))
    # event-time contract: NULL ts rows dropped — a NULL day would sort
    # engine-dependently in the trailing-window ORDER BY
    daily = (
        spark.table("events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    frame = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)  # trailing week, EXCLUDING the current day
    )
    with_sums = daily.select(
        "event_type",
        "d",
        "n",
        F.count(F.lit(1)).over(frame).alias("w_n"),
        F.sum("n").over(frame).alias("w_sx"),
        F.sum(F.col("n") * F.col("n")).over(frame).alias("w_sxx"),
    )
    wn = F.col("w_n").cast("double")
    sx, sxx = F.col("w_sx").cast("double"), F.col("w_sxx").cast("double")
    mean = sx / wn
    var = (sxx - sx * sx / wn) / (wn - F.lit(1.0))
    scored = with_sums.filter(F.col("w_n") >= 3).select(
        "event_type",
        "d",
        "n",
        F.round(mean, 6).alias("trailing_mean"),
        F.round(
            (F.col("n") - mean) / F.sqrt(var), 6
        ).alias("z"),
        (var > 0).alias("has_var"),
    )
    return (
        scored.filter(F.col("has_var") & (F.abs(F.col("z")) > 2.0))
        .select("event_type", "d", "n", "trailing_mean", "z")
    )


ORACLE_EVENT_ANOMALY_DAYS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
sums AS (
  SELECT event_type, d, n,
         COUNT(*)    OVER w AS w_n,
         SUM(n)      OVER w AS w_sx,
         SUM(n * n)  OVER w AS w_sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, d, n,
         ROUND(CAST(w_sx AS DOUBLE) / w_n, 6) AS trailing_mean,
         (CAST(w_sxx AS DOUBLE) - CAST(w_sx AS DOUBLE) * CAST(w_sx AS DOUBLE) / w_n)
           / (w_n - 1.0) AS var,
         CAST(w_sx AS DOUBLE) / w_n AS mean_raw
  FROM sums WHERE w_n >= 3
)
SELECT event_type, d, n, trailing_mean,
       ROUND((n - mean_raw) / SQRT(var), 6) AS z
FROM scored
-- filter on the ROUNDED z exactly like the Spark side: a raw |z| in
-- (2.0, 2.0000005) rounds to 2.0 and must be excluded on both engines
WHERE var > 0 AND ABS(ROUND((n - mean_raw) / SQRT(var), 6)) > 2.0
"""


def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the query run BEFORE choosing a join
    strategy at scale: the distribution of per-key group sizes for
    lineitem's two big join keys (orderkey, partkey), bucketed by
    power of two, plus each bucket's share of total rows. Two
    aggregates per key (key-count, then size-histogram — the second
    over the already-aggregated key table) and a window share over
    the tiny histogram. A heavy tail here is what argues for salting
    or AQE skew splits; this testdata's uniform keys show none."""
    register_tables(spark, sf_dir, ("lineitem",))
    li = spark.table("lineitem")

    def histogram(key: str, label: str) -> DataFrame:
        per_key = li.groupBy(key).agg(F.count(F.lit(1)).alias("k_rows"))
        bucketed = per_key.select(
            F.lit(label).alias("join_key"),
            # power-of-two bucket via exact integer BIT LENGTH —
            # floor(log2(n)) through floating log2 can be off by one
            # at exact powers across libm implementations
            (F.length(F.bin(F.col("k_rows"))) - 1).alias("log2_bucket"),
            "k_rows",
        )
        return bucketed.groupBy("join_key", "log2_bucket").agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("k_rows").cast("bigint").alias("n_rows"),
        )
    hist = histogram("l_orderkey", "orderkey").unionByName(
        histogram("l_partkey", "partkey")
    )
    share_w = W.partitionBy("join_key")
    return hist.select(
        "join_key",
        "log2_bucket",
        "n_keys",
        "n_rows",
        F.round(F.col("n_rows") / F.sum("n_rows").over(share_w), 6).alias(
            "row_share"
        ),
    )


ORACLE_JOIN_KEY_SKEW_REPORT = """
WITH ok AS (
  SELECT 'orderkey' AS join_key,
         CAST(LENGTH(BIN(COUNT(*))) - 1 AS INT) AS log2_bucket,
         COUNT(*) AS k_rows
  FROM lineitem GROUP BY l_orderkey
),
pk AS (
  SELECT 'partkey' AS join_key,
         CAST(LENGTH(BIN(COUNT(*))) - 1 AS INT) AS log2_bucket,
         COUNT(*) AS k_rows
  FROM lineitem GROUP BY l_partkey
),
hist AS (
  SELECT join_key, log2_bucket, COUNT(*) AS n_keys,
         CAST(SUM(k_rows) AS BIGINT) AS n_rows
  FROM (SELECT * FROM ok UNION ALL SELECT * FROM pk)
  GROUP BY 1, 2
)
SELECT join_key, log2_bucket, n_keys, n_rows,
       ROUND(CAST(n_rows AS DOUBLE)
             / SUM(n_rows) OVER (PARTITION BY join_key), 6) AS row_share
FROM hist
"""


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix
    (prev_type → next_type counts and row-normalized probabilities)
    over each user's time-ordered stream. One lag window on the
    user_id shuffle, one small aggregate, a window share over the
    25-cell matrix — the Markov-chain build behind next-action
    prediction and funnel-drop diagnostics."""
    register_tables(spark, sf_dir, ("events",))
    # event-time contract: NULL ts rows dropped — their position in the
    # per-user ORDER BY is engine-dependent, so the (prev, next) pairs
    # on either side of such a row would differ across engines
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        spark.table("events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    cells = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_w = W.partitionBy("prev_type")
    return cells.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_w), 6).alias("p"),
    )


ORACLE_EVENT_TRANSITION_MATRIX = """
WITH pairs AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events WHERE ts IS NOT NULL
),
cells AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM cells
"""


def q_value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized value statistics per event type: clip at the exact
    [p05, p95] discrete percentiles, then re-aggregate — the standard
    outlier-robust feature prep. percentile_disc picks ACTUAL data
    values (engine-portable, unlike interpolated percentile_cont whose
    arithmetic can drift); the clip + re-aggregate is one more pass
    over the same single shuffle key."""
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events").select("event_type", "value")
    pcts = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
    )
    clipped = ev.join(F.broadcast(pcts), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value"))).alias("v"),
        (F.col("value") < F.col("p05")).cast("int").alias("clip_lo"),
        (F.col("value") > F.col("p95")).cast("int").alias("clip_hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.round(F.max("p05"), 6).alias("p05"),
        F.round(F.max("p95"), 6).alias("p95"),
        F.round(
            F.sum(F.col("v").cast("decimal(12,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
        F.sum("clip_lo").cast("bigint").alias("n_clipped_low"),
        F.sum("clip_hi").cast("bigint").alias("n_clipped_high"),
    )


ORACLE_VALUE_WINSORIZED_STATS = """
WITH pcts AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS p05,
         quantile_disc(value, 0.95) AS p95
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type, p.p05, p.p95,
         GREATEST(p.p05, LEAST(p.p95, e.value)) AS v,
         CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END AS clip_hi
  FROM events e JOIN pcts p USING (event_type)
)
SELECT event_type,
       ROUND(MAX(p05), 6) AS p05,
       ROUND(MAX(p95), 6) AS p95,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean,
       CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high
FROM clipped
GROUP BY event_type
"""


def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (decimal-summed spend), each quartiled over fully deterministic
    orderings (custkey tie-breaks), rolled up to segment-level counts.

    The quartiles are exact NTILE(4) semantics but computed via
    ``operators/ranking.with_global_ntile`` — range-partitioned local
    ranks + prefix-summed offsets — because a bare ``NTILE OVER (ORDER
    BY ...)`` funnels the whole per-customer table through ONE task's
    sort; at 100× scale that table is hundreds of millions of rows and
    this query would do it three times."""
    register_tables(spark, sf_dir, ("orders",))
    orders = spark.table("orders")
    # LAZY corpus max via a broadcast 1-row cross join — an eager
    # collect here would run a full scan just to BUILD the plan (and
    # crash on an empty table); this stays a plan until an action runs
    max_date = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("__max_date")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(14,4)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(max_date))
        .select(
            "o_custkey",
            F.datediff(F.col("__max_date"), F.col("__last")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from .operators.ranking import ntiles_wide

    # One fused two-phase pass ranks all three dimensions (DESC encoded
    # by negation; recency/frequency/monetary are all exactly
    # double-representable here — ints and decimal(14,4) sums well
    # under 2^53).
    scored = ntiles_wide(
        per_cust,
        "o_custkey",
        [
            ("r_quartile", F.col("recency_days")),
            ("f_quartile", -F.col("frequency")),
            ("m_quartile", -F.col("monetary")),
        ],
        k=4,
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


ORACLE_CUSTOMER_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT o_custkey,
         (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
           - MAX(CAST(o_orderdate AS DATE)) AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_quartile
  FROM per_cust
)
SELECT r_quartile, f_quartile, m_quartile, COUNT(*) AS n_customers
FROM scored GROUP BY 1, 2, 3
"""


def q_discount_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-sensitivity probe: corr(discount, quantity) per part type
    from EXACT decimal power sums (the event_value_moments discipline —
    built-in corr's double accumulation is partitioning-order-dependent
    and can never hash-match an oracle). Broadcast part join + one
    map-side-combined aggregate; degenerate groups are NULL on both
    sides by the same explicit guards."""
    register_tables(spark, sf_dir, ("lineitem", "part"))
    li = spark.table("lineitem").join(
        F.broadcast(spark.table("part")), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "p_type",
        F.col("l_discount").cast("decimal(12,4)").alias("x"),
        F.col("l_quantity").cast("decimal(12,4)").alias("y"),
    )
    sums = li.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    return sums.select(
        "p_type",
        F.col("n").cast("bigint").alias("n_items"),
        F.round(
            F.when(
                (vx > 0) & (vy > 0),
                (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
            ),
            6,
        ).alias("corr_discount_qty"),
    )


ORACLE_DISCOUNT_QUANTITY_CORRELATION = """
WITH s AS (
  SELECT p_type,
         COUNT(*) AS n,
         SUM(CAST(l_discount AS DECIMAL(12,4))) AS sx,
         SUM(CAST(l_discount AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(12,4))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS syy,
         SUM(CAST(l_discount AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS sxy
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type
)
SELECT p_type,
       CAST(n AS BIGINT) AS n_items,
       CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                       6)
       END AS corr_discount_qty
FROM s
"""


def analytics_specs() -> list:
    from .queries import QuerySpec as QS

    return [
        QS("value_quantiles", "Ordered-set percentile_disc quantiles per event type", q_value_quantiles, ORACLE_VALUE_QUANTILES),
        QS("window_top_orders", "row_number + lag per customer (OVER clause)", q_window_top_orders, ORACLE_WINDOW_TOP_ORDERS),
        QS("moving_window_value", "7-row moving aggregate frame", q_moving_window_value, ORACLE_MOVING_WINDOW_VALUE),
        QS("rollup_order_volume", "ROLLUP grouping sets with totals", q_rollup_order_volume, ORACLE_ROLLUP_ORDER_VOLUME),
        QS("grouping_sets_lineitems", "Non-hierarchical GROUPING SETS: one-pass multi-breakdown", q_grouping_sets_lineitems, ORACLE_GROUPING_SETS_LINEITEMS),
        QS("nation_above_avg_customers", "Correlated-aggregate decorrelation", q_nation_above_avg_customers, ORACLE_NATION_ABOVE_AVG),
        QS("customers_without_orders", "Anti join / NOT EXISTS", q_customers_without_orders, ORACLE_CUSTOMERS_WITHOUT_ORDERS),
        QS("part_brand_stats", "String functions + LIKE + conditional agg", q_part_brand_stats, ORACLE_PART_BRAND_STATS),
        QS("batch_sessionization", "Gap-based sessionization via window functions", q_batch_sessionization, ORACLE_BATCH_SESSIONIZATION),
        QS("nation_pair_volume", "TPC-H Q7-shape nation-pair volume", q_nation_pair_volume, ORACLE_NATION_PAIR_VOLUME),
        QS("returned_item_losses", "TPC-H Q10-shape top-20 lost revenue", q_returned_item_losses, ORACLE_RETURNED_ITEM_LOSSES),
        QS("shipping_priority_mix", "TPC-H Q12-shape CASE counting", q_shipping_priority_mix, ORACLE_SHIPPING_PRIORITY_MIX),
        QS("disjunctive_revenue", "TPC-H Q19-shape OR-of-ANDs predicate", q_disjunctive_revenue, ORACLE_DISJUNCTIVE_REVENUE),
        QS("json_props_stats", "JSON extraction from a string column (get_json_object)", q_json_props_stats, ORACLE_JSON_PROPS_STATS),
        QS("array_agg_users", "Deterministic array aggregation + array functions", q_array_agg_users, ORACLE_ARRAY_AGG_USERS),
        QS("pivot_segment_volume", "PIVOT with explicit values → one-pass conditional aggregate", q_pivot_segment_volume, ORACLE_PIVOT_SEGMENT_VOLUME),
        QS("cube_order_mix", "Full CUBE with grouping flags (one Expand pass)", q_cube_order_mix, ORACLE_CUBE_ORDER_MIX),
        QS("event_value_moments", "Exact stddev/corr from decimal power sums", q_event_value_moments, ORACLE_EVENT_VALUE_MOMENTS),
        QS("sole_problem_suppliers", "TPC-H Q21-shape double-correlated EXISTS, hand-decorrelated", q_sole_problem_suppliers, ORACLE_SOLE_PROBLEM_SUPPLIERS),
        QS("event_value_bars", "6h OHLC resampling: deterministic first/last via struct min/max", q_event_value_bars, ORACLE_EVENT_VALUE_BARS),
        QS("small_quantity_revenue", "TPC-H Q17-shape correlated scalar-aggregate subquery", q_small_quantity_revenue, ORACLE_SMALL_QUANTITY_REVENUE),
        QS("large_volume_orders", "TPC-H Q18-shape IN-subquery over HAVING aggregate", q_large_volume_orders, ORACLE_LARGE_VOLUME_ORDERS),
        QS("top_revenue_suppliers", "TPC-H Q15-shape view + scalar MAX subquery", q_top_revenue_suppliers, ORACLE_TOP_REVENUE_SUPPLIERS),
        QS("customer_balance_quartiles", "NTILE quartiles + re-aggregation", q_customer_balance_quartiles, ORACLE_CUSTOMER_BALANCE_QUARTILES),
        QS("national_market_share", "TPC-H Q8-shape conditional-share over a star join", q_national_market_share, ORACLE_NATIONAL_MARKET_SHARE),
        QS("promo_revenue_share", "TPC-H Q14-shape promo revenue percent per month", q_promo_revenue_share, ORACLE_PROMO_REVENUE_SHARE),
        QS("global_sales_opportunity", "TPC-H Q22-shape scalar-avg filter + NOT EXISTS", q_global_sales_opportunity, ORACLE_GLOBAL_SALES_OPPORTUNITY),
        QS("nation_profit_trend", "TPC-H Q9-shape profit by supplier nation and year", q_nation_profit_trend, ORACLE_NATION_PROFIT_TREND),
        QS("balance_rank_distribution", "PERCENT_RANK/CUME_DIST/full-frame LAST_VALUE top decile", q_balance_rank_distribution, ORACLE_BALANCE_RANK_DISTRIBUTION),
        QS("hopping_event_windows", "Batch hopping windows (1h width, 30min slide) via F.window", q_hopping_event_windows, ORACLE_HOPPING_EVENT_WINDOWS),
        QS("funnel_conversion", "Ordered view->click->purchase funnel, one shuffle, no self-joins", q_funnel_conversion, ORACLE_FUNNEL_CONVERSION),
        QS("weekly_retention", "Cohort retention matrix by first-activity week", q_weekly_retention, ORACLE_WEEKLY_RETENTION),
        QS("correlated_scalar_select", "SELECT-clause correlated scalar subqueries via spark.sql", q_correlated_scalar_select, ORACLE_CORRELATED_SCALAR_SELECT),
        QS("part_supplier_variety", "TPC-H Q16-shape distinct-supplier counts with NOT IN", q_part_supplier_variety, ORACLE_PART_SUPPLIER_VARIETY),
        QS("dominant_part_suppliers", "TPC-H Q20-shape dominant-share-of-part-quantity", q_dominant_part_suppliers, ORACLE_DOMINANT_PART_SUPPLIERS),
        QS("cheapest_supplier_per_part", "TPC-H Q2-shape min-per-group via min-struct (no re-scan)", q_cheapest_supplier_per_part, ORACLE_CHEAPEST_SUPPLIER_PER_PART),
        QS("forecast_revenue_change", "TPC-H Q6-shape range-filter aggregate (pushdown probe)", q_forecast_revenue_change, ORACLE_FORECAST_REVENUE_CHANGE),
        QS("event_anomaly_days", "Trailing-window z-score anomaly days per event type", q_event_anomaly_days, ORACLE_EVENT_ANOMALY_DAYS),
        QS("join_key_skew_report", "Per-key group-size histogram (pre-join skew diagnosis)", q_join_key_skew_report, ORACLE_JOIN_KEY_SKEW_REPORT),
        QS("event_transition_matrix", "Markov transition matrix over per-user event streams", q_event_transition_matrix, ORACLE_EVENT_TRANSITION_MATRIX),
        QS("value_winsorized_stats", "Winsorized stats: clip at exact p05/p95, re-aggregate", q_value_winsorized_stats, ORACLE_VALUE_WINSORIZED_STATS),
        QS("customer_rfm_segments", "RFM quartile segmentation with deterministic NTILE ties", q_customer_rfm_segments, ORACLE_CUSTOMER_RFM_SEGMENTS),
        QS("discount_quantity_correlation", "Exact corr(discount, quantity) per part type", q_discount_quantity_correlation, ORACLE_DISCOUNT_QUANTITY_CORRELATION),
    ]
