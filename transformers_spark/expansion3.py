"""Round-6 catalog expansion: fifteen analytics/pipeline operators,
each Spark-first with an exact DuckDB oracle.

* token rank curve — top-20 tokens with CUMULATIVE occurrence share
  (the head of the Zipf curve; rank via the scale-safe two-phase
  global row number, cumulation over the ≤20-row head only).
* doc length buckets — fixed-threshold length histogram per source
  with share-of-source (corpus shape diagnostics).
* brand top parts — per-brand top-3 parts by exact decimal revenue
  (two-phase WindowGroupLimit top-k after a broadcast dim join).
* weekday activity matrix — event_type × weekday PIVOT (weekday from
  pure epoch-day integer arithmetic — no locale, no engine dow()).
* supplier fulfillment lag — order→ship latency per supplier nation
  (the big orders⋈lineitem shuffle join + two broadcast dims).
* embedding dim range — per-dimension count/min/max across vectors
  (posexplode; min/max are order-independent, so floats are safe).
* segment repeat rate — repeat-buyer fraction per market segment.
* nation trade balance — supply-side vs buy-side volume per nation
  (two independent aggregates LEFT JOINed onto the nation dim).
* monthly revenue cumshare — within-year cumulative revenue share
  (running EXACT decimal sum; one double division per row).
* word byte-length profile — token length histogram per language in
  BYTES (octet_length/strlen: byte semantics are identical across
  engines, unlike character counts under combining marks).
* HLL register rollup — portable md5-based HyperLogLog registers:
  per-day sketches merged register-wise == the direct global sketch,
  bit-exact (max is associative) — the mergeable-rollup companion to
  sketch_kmv_rollup, at the register level a 100 TB rollup stores.
* session conversion rate — lag+cumsum sessionization composed with a
  per-day funnel rollup.
* char class profile — digit/whitespace/punctuation fractions per
  source from length-difference projections (map-only).
* embedding norm profile — norm² buckets per label (rounded fold,
  decimal thresholds) — the normalization audit.
* source dedup rate — dedup-pipeline verdicts rolled up by provenance.

Numeric determinism rules (same as queries.py): exact integer/decimal
aggregates; at most ONE double division on identical exact operands
per output column; no ln/pow. Engine↔oracle divergence classes and
their idioms: see ORACLES.md (this module uses #1 null ordering,
#7 event-time nulls, #9 percentile-free rollups, #11 decimal-exact
sums, #13 parameter frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.specs import DUCK_TOKENS
from .sources.testdata import register_tables

__all__ = ["expansion3_specs"]

TOKEN_CURVE_K = 20
BRAND_TOP_N = 3


def _money(col: str):
    return F.col(col).cast("decimal(12,4)")


def _frac(expr):
    return expr.cast("decimal(7,4)")


# ---------------------------------------------------------------------------
# token rank curve — the head of the Zipf curve
# ---------------------------------------------------------------------------


def q_token_rank_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by corpus frequency with cumulative occurrence
    share — the Zipf head that decides stopword lists and tokenizer
    specials.

    Scale shape: one token-count aggregate (map-side combined), the
    two-phase global ROW_NUMBER (operators/ranking — no
    SinglePartition sort over the vocabulary), then the cumulation
    window runs over the ≤20-row HEAD only (bounded frame, not the
    corpus). The grand total is an exact int crossed in via broadcast.
    Share = exact cum / exact total, one double division per row.
    """
    from .operators.ranking import global_row_number

    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    counts = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("bigint").alias("n_total"))
    ranked = global_row_number(
        counts, [F.desc("c"), F.asc("tok")], out_col="rank"
    )
    head = ranked.filter(F.col("rank") <= TOKEN_CURVE_K)
    cum_w = W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        head.withColumn("cum", F.sum("c").over(cum_w))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "tok",
            F.col("c").cast("bigint").alias("n_occurrences"),
            F.col("cum").cast("bigint").alias("cum_occurrences"),
            (
                F.col("cum").cast("double") / F.col("n_total").cast("double")
            ).alias("cum_share"),
        )
    )


def _oracle_token_rank_curve() -> str:
    return f"""
WITH toks AS (
  SELECT unnest({DUCK_TOKENS}) AS tok FROM documents WHERE text IS NOT NULL
),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank
  FROM counts
),
head AS (SELECT * FROM ranked WHERE rank <= {TOKEN_CURVE_K})
SELECT CAST(rank AS INT) AS rank, tok,
       CAST(c AS BIGINT) AS n_occurrences,
       CAST(SUM(c) OVER (ORDER BY rank
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occurrences,
       CAST(SUM(c) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / (SELECT CAST(SUM(c) AS DOUBLE) FROM counts) AS cum_share
FROM head
"""


# ---------------------------------------------------------------------------
# doc length buckets — corpus shape histogram
# ---------------------------------------------------------------------------

def _len_bucket_spark():
    # built lazily — Column construction needs an active SparkContext
    return (
        F.when(F.col("n_chars").isNull(), "unknown")
        .when(F.col("n_chars") < 100, "lt_100")
        .when(F.col("n_chars") < 1000, "100_999")
        .when(F.col("n_chars") < 10000, "1k_9999")
        .otherwise("ge_10k")
    )

_LEN_BUCKET_DUCK = """CASE WHEN n_chars IS NULL THEN 'unknown'
         WHEN n_chars < 100 THEN 'lt_100'
         WHEN n_chars < 1000 THEN '100_999'
         WHEN n_chars < 10000 THEN '1k_9999'
         ELSE 'ge_10k' END"""


def q_doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram per source with fixed thresholds and
    share-of-source — the first chart of any corpus audit (and the
    input to packing / truncation budget decisions).

    Scale shape: ONE hash aggregate on (source, bucket) — the bucket
    is a map-side CASE projection, never a data-dependent quantile —
    then per-source totals broadcast back in (|sources| × 5 rows).
    Exact int counts; one double division. NULL source / NULL n_chars
    stay as their own groups (both engines group NULLs identically).
    """
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(
        "source", _len_bucket_spark().alias("len_bucket")
    )
    counts = docs.groupBy("source", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source_docs")
    )
    return counts.join(
        F.broadcast(totals), counts.source.eqNullSafe(totals.source)
    ).select(
        counts.source.alias("source"),
        "len_bucket",
        "n_docs",
        "n_source_docs",
        (F.col("n_docs").cast("double") / F.col("n_source_docs").cast("double"))
        .alias("share"),
    )


ORACLE_DOC_LENGTH_BUCKETS = f"""
WITH b AS (
  SELECT source, {_LEN_BUCKET_DUCK} AS len_bucket FROM documents
),
counts AS (
  SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM b GROUP BY 1, 2
),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source_docs
  FROM b GROUP BY 1
)
SELECT c.source, c.len_bucket, c.n_docs, t.n_source_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE) AS share
FROM counts c JOIN totals t ON c.source IS NOT DISTINCT FROM t.source
"""


# ---------------------------------------------------------------------------
# brand top parts — grouped top-k by exact revenue
# ---------------------------------------------------------------------------


def q_brand_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by lineitem revenue — the grouped-top-k
    merchandising rollup.

    Scale shape: lineitem ⋈ broadcast(part) (dim stays map-side), one
    (brand, part) hash aggregate of the EXACT decimal revenue, then
    ``row_number() <= 3`` over the brand partitioning — Spark compiles
    the slice to the two-phase WindowGroupLimit (map-side partial
    top-k before the brand exchange). Ranking compares the exact
    decimal (ties break on p_partkey); the double cast happens only in
    the final projection. NULL l_partkey rows drop at the inner join
    in both engines.
    """
    register_tables(spark, sf_dir, ("lineitem", "part"))
    li = spark.table("lineitem")
    part = spark.table("part").select("p_partkey", "p_brand")
    revenue = _money("l_extendedprice") * _frac(F.lit(1) - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(revenue).alias("rev_exact"))
    )
    w = W.partitionBy("p_brand").orderBy(
        F.desc("rev_exact"), F.asc("p_partkey")
    )
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BRAND_TOP_N)
        .select(
            "p_brand",
            "p_partkey",
            F.col("rev_exact").cast("double").alias("revenue"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


ORACLE_BRAND_TOP_PARTS = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST(1 - l_discount AS DECIMAL(7,4))) AS rev_exact
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT p_brand, p_partkey, rev_exact,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY rev_exact DESC, p_partkey ASC) AS rk
  FROM per_part
)
SELECT p_brand, p_partkey, CAST(rev_exact AS DOUBLE) AS revenue,
       CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {BRAND_TOP_N}
"""


# ---------------------------------------------------------------------------
# weekday activity matrix — pivot on portable weekday arithmetic
# ---------------------------------------------------------------------------

# 1970-01-05 was a Monday: dow 0 = Monday .. 6 = Sunday, from pure
# integer epoch-day arithmetic — identical in every engine and locale
# (engine dayofweek()/dow() start days differ; ORACLES.md #1 family).
_DOW_EPOCH_MONDAY = "1970-01-05"


def q_weekday_activity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts as an event_type × weekday matrix (PIVOT) — the
    weekly-seasonality heatmap.

    Scale shape: weekday is a map-side integer projection; Spark PIVOT
    with an EXPLICIT value list compiles to one hash aggregate with 7
    conditional counts (single shuffle on event_type, no second pivot
    pass — same plan as the oracle's FILTER aggregates). Event-time
    contract: NULL ts (and NULL event_type) drop at intake.
    """
    register_tables(spark, sf_dir, ("events",))
    ev = (
        spark.table("events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.pmod(
                F.datediff(F.to_date("ts"), F.lit(_DOW_EPOCH_MONDAY).cast("date")),
                F.lit(7),
            ).alias("dow"),
        )
    )
    pivoted = (
        ev.groupBy("event_type")
        .pivot("dow", list(range(7)))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "event_type",
        *[
            F.coalesce(F.col(str(d)), F.lit(0))
            .cast("bigint")
            .alias(f"dow_{d}")
            for d in range(7)
        ],
    )


def _oracle_weekday_activity_matrix() -> str:
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE dow = {d}) AS BIGINT) AS dow_{d}"
        for d in range(7)
    )
    return f"""
WITH ev AS (
  SELECT event_type,
         ((datediff('day', DATE '{_DOW_EPOCH_MONDAY}', CAST(ts AS DATE))
           % 7) + 7) % 7 AS dow
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT event_type,
       {cols}
FROM ev GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# supplier fulfillment lag — order→ship latency per supplier nation
# ---------------------------------------------------------------------------


def q_supplier_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier nation: lineitem count, average and max days from
    order placement to line shipment — the fulfillment-SLA rollup.

    Scale shape: orders ⋈ lineitem is the one big shuffle join (both
    sides partition on orderkey; AQE sizes it); supplier and nation
    broadcast. Lag is exact integer days; avg = exact int sum /
    exact count, ONE double division. NULL l_suppkey (null wave 3)
    drops at the supplier join in both engines.
    """
    register_tables(
        spark, sf_dir, ("orders", "lineitem", "supplier", "nation")
    )
    orders = spark.table("orders").select("o_orderkey", "o_orderdate")
    li = spark.table("lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = spark.table("supplier").select("s_suppkey", "s_nationkey")
    nation = spark.table("nation").select("n_nationkey", "n_name")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("n_name", lag.alias("lag_days"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            (
                F.sum("lag_days").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_lag_days"),
            F.max("lag_days").cast("int").alias("max_lag_days"),
        )
    )


ORACLE_SUPPLIER_FULFILLMENT_LAG = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(datediff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_lag_days,
       CAST(MAX(datediff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE))) AS INT) AS max_lag_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# embedding dim range — per-dimension sanity envelope
# ---------------------------------------------------------------------------


def q_embedding_dim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension count/min/max across all embedding vectors — the
    envelope check that catches dead dimensions, un-normalized
    batches, and clipped exports before any model sees them.

    Scale shape: posexplode fans each vector into (dim, value) rows —
    a map-side operation — then ONE hash aggregate on dim (64 groups).
    Only min/max/count: all ORDER-INDEPENDENT, so raw floats are safe
    to aggregate (a float SUM would be partition-order-dependent and
    never hash-match; ORACLES.md #11). NULL vectors produce no rows
    in either engine (explode/unnest of NULL).
    """
    register_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    dims = emb.select(
        F.posexplode("embedding").alias("dim0", "val")
    ).select((F.col("dim0") + 1).alias("dim"), "val")
    return dims.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.min("val").cast("double").alias("min_val"),
        F.max("val").cast("double").alias("max_val"),
    ).select(F.col("dim").cast("int").alias("dim"),
             "n_values", "min_val", "max_val")


ORACLE_EMBEDDING_DIM_RANGE = """
WITH dims AS (
  -- parallel unnests in one SELECT zip positionally in DuckDB (the
  -- WITH ORDINALITY equivalent; Spark side is posexplode)
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(embedding) AS val
  FROM embeddings
)
SELECT CAST(dim AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(MIN(val) AS DOUBLE) AS min_val,
       CAST(MAX(val) AS DOUBLE) AS max_val
FROM dims GROUP BY dim
"""


# ---------------------------------------------------------------------------
# segment repeat rate — repeat-buyer fraction
# ---------------------------------------------------------------------------


def q_segment_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: buyers, repeat buyers (≥2 orders), and the
    repeat rate — the simplest retention KPI.

    Scale shape: per-customer order counts are ONE hash aggregate on
    o_custkey; the join to customer re-shuffles on the same key; the
    segment rollup is a handful of groups. Exact ints, one double
    division. NULL o_custkey (null wave 3) drops at the join.
    """
    register_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    cust = spark.table("customer").select("c_custkey", "c_mktsegment")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
            F.sum((F.col("n_orders") >= 2).cast("bigint"))
            .cast("bigint")
            .alias("n_repeat_buyers"),
        )
        .select(
            "c_mktsegment",
            "n_buyers",
            "n_repeat_buyers",
            (
                F.col("n_repeat_buyers").cast("double")
                / F.col("n_buyers").cast("double")
            ).alias("repeat_rate"),
        )
    )


ORACLE_SEGMENT_REPEAT_RATE = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
FROM per_cust JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# nation trade balance — supply-side vs buy-side volume
# ---------------------------------------------------------------------------


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: volume SUPPLIED (lineitem revenue via its
    suppliers) vs volume BOUGHT (order totals via its customers), and
    the supply/buy ratio — two independent fact aggregates stitched
    onto the nation dimension.

    Scale shape: each side is one fact-table aggregate (lineitem ⋈
    broadcast supplier; orders ⋈ customer shuffles on custkey), each
    reduced to ≤25 rows BEFORE the final join — the nation frame never
    multiplies fact rows. LEFT JOINs from nation keep nations with no
    suppliers or no buyers (coalesced to exact 0; ratio NULL when the
    buy side is 0 — stated in both engines). Decimal-exact sums;
    one double division.
    """
    register_tables(
        spark, sf_dir, ("nation", "supplier", "customer", "orders", "lineitem")
    )
    nation = spark.table("nation").select("n_nationkey", "n_name")
    supp = spark.table("supplier").select("s_suppkey", "s_nationkey")
    revenue = _money("l_extendedprice") * _frac(F.lit(1) - F.col("l_discount"))
    supplied = (
        spark.table("lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(revenue).alias("supplied_exact"))
    )
    cust = spark.table("customer").select("c_custkey", "c_nationkey")
    bought = (
        spark.table("orders")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(_money("o_totalprice")).alias("bought_exact"))
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        nation.join(
            supplied, nation.n_nationkey == supplied.s_nationkey, "left"
        )
        .join(bought, nation.n_nationkey == bought.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce(F.col("supplied_exact"), zero)
            .cast("double")
            .alias("supplied_volume"),
            F.coalesce(F.col("bought_exact"), zero)
            .cast("double")
            .alias("bought_volume"),
            F.when(
                F.coalesce(F.col("bought_exact"), zero) > 0,
                F.coalesce(F.col("supplied_exact"), zero).cast("double")
                / F.col("bought_exact").cast("double"),
            ).alias("supply_buy_ratio"),
        )
    )


ORACLE_NATION_TRADE_BALANCE = """
WITH supplied AS (
  SELECT s_nationkey AS nk,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST(1 - l_discount AS DECIMAL(7,4))) AS supplied_exact
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
),
bought AS (
  SELECT c_nationkey AS nk,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS bought_exact
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT n_name,
       CAST(COALESCE(supplied_exact, 0) AS DOUBLE) AS supplied_volume,
       CAST(COALESCE(bought_exact, 0) AS DOUBLE) AS bought_volume,
       CASE WHEN COALESCE(bought_exact, 0) > 0
            THEN CAST(COALESCE(supplied_exact, 0) AS DOUBLE)
                 / CAST(bought_exact AS DOUBLE)
       END AS supply_buy_ratio
FROM nation
LEFT JOIN supplied ON n_nationkey = supplied.nk
LEFT JOIN bought ON n_nationkey = bought.nk
"""


# ---------------------------------------------------------------------------
# monthly revenue cumshare — within-year cumulative distribution
# ---------------------------------------------------------------------------


def q_monthly_revenue_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (year, month): order revenue, and the cumulative share of
    that YEAR's revenue realized through the month — the
    seasonality/run-rate curve.

    Scale shape: one (year, month) hash aggregate over orders reduces
    the data to ≤12 rows/year BEFORE any window; the running sum and
    the year total are windows over those tiny frames, partitioned by
    year (never SinglePartition over data). Cumulation is an EXACT
    decimal running sum; each output casts to double once for the one
    division.
    """
    register_tables(spark, sf_dir, ("orders",))
    monthly = (
        spark.table("orders")
        .select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            _money("o_totalprice").alias("price"),
        )
        .groupBy("year", "month")
        .agg(F.sum("price").alias("rev_exact"))
    )
    cum_w = (
        W.partitionBy("year")
        .orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("year")
    return (
        monthly.withColumn("cum_exact", F.sum("rev_exact").over(cum_w))
        .withColumn("year_exact", F.sum("rev_exact").over(tot_w))
        .select(
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("int").alias("month"),
            F.col("rev_exact").cast("double").alias("month_revenue"),
            (
                F.col("cum_exact").cast("double")
                / F.col("year_exact").cast("double")
            ).alias("cum_share"),
        )
    )


ORACLE_MONTHLY_REVENUE_CUMSHARE = """
WITH monthly AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
         EXTRACT(MONTH FROM o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS rev_exact
  FROM orders GROUP BY 1, 2
)
SELECT CAST(year AS INT) AS year, CAST(month AS INT) AS month,
       CAST(rev_exact AS DOUBLE) AS month_revenue,
       CAST(SUM(rev_exact) OVER (PARTITION BY year ORDER BY month
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(SUM(rev_exact) OVER (PARTITION BY year) AS DOUBLE)
         AS cum_share
FROM monthly
"""


# ---------------------------------------------------------------------------
# word byte-length profile — per-language token length histogram
# ---------------------------------------------------------------------------

def _wlen_bucket_spark():
    # built lazily — Column construction needs an active SparkContext
    return (
        F.when(F.col("blen") <= 3, "b_1_3")
        .when(F.col("blen") <= 7, "b_4_7")
        .when(F.col("blen") <= 12, "b_8_12")
        .otherwise("b_13_up")
    )

_WLEN_BUCKET_DUCK = """CASE WHEN strlen(tok) <= 3 THEN 'b_1_3'
         WHEN strlen(tok) <= 7 THEN 'b_4_7'
         WHEN strlen(tok) <= 12 THEN 'b_8_12'
         ELSE 'b_13_up' END"""


def q_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token length histogram per language, in BYTES, with
    share-of-language — the fertility-adjacent diagnostic that
    separates CJK/emoji-heavy text from ASCII prose.

    Byte length (octet_length ↔ strlen), NOT character length:
    character counting under combining marks diverges between
    engines' unicode tables, while UTF-8 byte length is definitionally
    identical (ORACLES.md #5 family). Scale shape: explode is
    map-side; ONE (lang, bucket) hash aggregate; per-language totals
    broadcast back (|langs| rows). Exact ints, one double division.
    NULL text drops (no tokens); NULL lang stays as its own group.
    """
    register_tables(spark, sf_dir, ("documents",))
    toks = (
        spark.table("documents")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .select("lang", F.octet_length("tok").alias("blen"))
        .select("lang", _wlen_bucket_spark().alias("len_bucket"))
    )
    counts = toks.groupBy("lang", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    totals = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lang_tokens")
    )
    return counts.join(
        F.broadcast(totals), counts.lang.eqNullSafe(totals.lang)
    ).select(
        counts.lang.alias("lang"),
        "len_bucket",
        "n_tokens",
        "n_lang_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.col("n_lang_tokens").cast("double")
        ).alias("share"),
    )


ORACLE_WORD_LENGTH_PROFILE = f"""
WITH toks AS (
  SELECT lang, unnest({DUCK_TOKENS}) AS tok
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT lang, {_WLEN_BUCKET_DUCK} AS len_bucket FROM toks
),
counts AS (
  SELECT lang, len_bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM b GROUP BY 1, 2
),
totals AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang_tokens
  FROM b GROUP BY 1
)
SELECT c.lang, c.len_bucket, c.n_tokens, t.n_lang_tokens,
       CAST(c.n_tokens AS DOUBLE) / CAST(t.n_lang_tokens AS DOUBLE) AS share
FROM counts c JOIN totals t ON c.lang IS NOT DISTINCT FROM t.lang
"""


def expansion3_specs() -> list:
    from .queries import QuerySpec

    return [
        QuerySpec(
            "token_rank_curve",
            "Top-20 tokens with cumulative occurrence share (Zipf head)",
            q_token_rank_curve,
            _oracle_token_rank_curve(),
        ),
        QuerySpec(
            "doc_length_buckets",
            "Fixed-threshold doc-length histogram per source with share",
            q_doc_length_buckets,
            ORACLE_DOC_LENGTH_BUCKETS,
        ),
        QuerySpec(
            "brand_top_parts",
            "Per-brand top-3 parts by exact decimal revenue (grouped top-k)",
            q_brand_top_parts,
            ORACLE_BRAND_TOP_PARTS,
        ),
        QuerySpec(
            "weekday_activity_matrix",
            "event_type x weekday PIVOT via epoch-day arithmetic",
            q_weekday_activity_matrix,
            _oracle_weekday_activity_matrix(),
        ),
        QuerySpec(
            "supplier_fulfillment_lag",
            "Order-to-ship latency per supplier nation (big shuffle join)",
            q_supplier_fulfillment_lag,
            ORACLE_SUPPLIER_FULFILLMENT_LAG,
        ),
        QuerySpec(
            "embedding_dim_range",
            "Per-dimension count/min/max envelope over embeddings",
            q_embedding_dim_range,
            ORACLE_EMBEDDING_DIM_RANGE,
        ),
        QuerySpec(
            "segment_repeat_rate",
            "Repeat-buyer fraction per market segment",
            q_segment_repeat_rate,
            ORACLE_SEGMENT_REPEAT_RATE,
        ),
        QuerySpec(
            "nation_trade_balance",
            "Supply-side vs buy-side volume per nation (two-fact stitch)",
            q_nation_trade_balance,
            ORACLE_NATION_TRADE_BALANCE,
        ),
        QuerySpec(
            "monthly_revenue_cumshare",
            "Within-year cumulative revenue share (exact running decimal)",
            q_monthly_revenue_cumshare,
            ORACLE_MONTHLY_REVENUE_CUMSHARE,
        ),
        QuerySpec(
            "word_length_profile",
            "Per-language token BYTE-length histogram with share",
            q_word_length_profile,
            ORACLE_WORD_LENGTH_PROFILE,
        ),
        QuerySpec(
            "sketch_hll_rollup",
            "Portable HLL registers: per-day merge == direct, bit-exact",
            q_sketch_hll_rollup,
            _oracle_sketch_hll_rollup(),
        ),
        QuerySpec(
            "session_conversion_rate",
            "Per-day session conversion rate over lag+cumsum sessions",
            q_session_conversion_rate,
            ORACLE_SESSION_CONVERSION_RATE,
        ),
        QuerySpec(
            "text_char_class_profile",
            "Per-source digit/space/punct character-class fractions",
            q_text_char_class_profile,
            ORACLE_TEXT_CHAR_CLASS_PROFILE,
        ),
        QuerySpec(
            "embedding_norm_profile",
            "Per-label norm-squared bucket histogram (normalization audit)",
            q_embedding_norm_profile,
            ORACLE_EMBEDDING_NORM_PROFILE,
        ),
        QuerySpec(
            "source_dedup_rate",
            "Near-duplicate rate per source (dedup verdicts by provenance)",
            q_source_dedup_rate,
            _oracle_source_dedup_rate(),
        ),
    ]


# ---------------------------------------------------------------------------
# HLL register rollup — mergeable-sketch algebra, portable registers
# ---------------------------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709              # engine constant for m=64 (documented literal)


def q_sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users via PORTABLE HyperLogLog registers, two ways:
    per-day register sketches MERGED (register-wise max) vs the direct
    global sketch. Register max is associative, so merged == direct
    BIT-EXACT — the oracle checks the merge algebra itself, alongside
    the raw estimate and the exact count (the KMV-rollup companion;
    sketch_hll_users covers Spark's built-in approx_count_distinct —
    this one is the register-level algebra a 100 TB rollup table
    stores).

    ``est_users`` is the RAW HLL estimator — deliberately no
    small-range (linear-counting) correction, because that correction
    needs ln(), which is not bit-portable across engines (same reason
    the catalog is log-free everywhere, ORACLES.md #11); the bias at
    tiny cardinalities is documented contract, and ``exact_users``
    rides alongside. Production pairs the registers with whatever
    correction its serving layer wants — the REGISTERS (the thing a
    rollup table stores and this query gates bit-exactly) are
    correction-agnostic.

    Portability: h = md5-h32(user), bucket = h % 64, rho = leading
    zeros of the remaining 26 bits + 1 computed as 27 - length(bin(r))
    — bin() emits the same minimal binary string in both engines.
    2^-M terms are exact binary fractions (1.0 / (1 << M)), so their
    64-term sum is EXACT in a double and order-independent; the one
    estimate division happens on identical operands. Missing registers
    come from a 64-row literal frame (ORACLES.md #13).

    Scale shape: one (day, bucket) max-aggregate (map-side combined),
    then a <= 64x|days| rollup — the pre-aggregate-once, merge-forever
    pattern. Null contract: NULL user_id / NULL ts drop at intake.
    """
    register_tables(spark, sf_dir, ("events",))
    from .operators.hashing import h32

    ev = spark.table("events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    base = ev.select(
        F.to_date("ts").alias("day"),
        h32(F.col("user_id").cast("string")).alias("h"),
    ).select(
        "day",
        (F.col("h") % HLL_M).alias("bucket"),
        F.floor(F.col("h") / HLL_M).cast("long").alias("r"),
    ).select(
        "day",
        "bucket",
        F.when(F.col("r") == 0, F.lit(27))
        .otherwise(F.lit(27) - F.length(F.bin("r")))
        .cast("int")
        .alias("rho"),
    )
    daily = base.groupBy("day", "bucket").agg(F.max("rho").alias("m_day"))
    merged = daily.groupBy("bucket").agg(F.max("m_day").alias("m_merged"))
    direct = base.groupBy("bucket").agg(F.max("rho").alias("m_direct"))
    slots = spark.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    regs = (
        slots.join(merged, "bucket", "left")
        .join(direct, "bucket", "left")
        .select(
            F.coalesce(F.col("m_merged"), F.lit(0)).alias("mm"),
            F.coalesce(F.col("m_direct"), F.lit(0)).alias("md"),
        )
    )
    # shiftleft's python wrapper takes a literal int for numBits; the
    # SQL form accepts a column — 1<<M is the exact binary fraction
    # 2^-M's denominator (M <= 27, no precision concerns)
    inv_mm = F.expr("1.0 / cast(shiftleft(1L, mm) as double)")
    exact = ev.agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        regs.agg(
            F.sum("mm").cast("bigint").alias("merged_reg_sum"),
            F.sum("md").cast("bigint").alias("direct_reg_sum"),
            (
                F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.sum(inv_mm)
            ).alias("est_users"),
        )
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(n_days))
    )


def _oracle_sketch_hll_rollup() -> str:
    from .operators.hashing import duck_h32

    h = duck_h32("CAST(user_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
base AS (
  SELECT CAST(ts AS DATE) AS day,
         ({h}) % {HLL_M} AS bucket,
         ({h}) // {HLL_M} AS r
  FROM ev
),
rho AS (
  SELECT day, bucket,
         CASE WHEN r = 0 THEN 27 ELSE 27 - length(bin(r)) END AS rho
  FROM base
),
daily AS (SELECT day, bucket, MAX(rho) AS m_day FROM rho GROUP BY 1, 2),
merged AS (SELECT bucket, MAX(m_day) AS m_merged FROM daily GROUP BY 1),
direct AS (SELECT bucket, MAX(rho) AS m_direct FROM rho GROUP BY 1),
slots AS (SELECT unnest(range(0, {HLL_M})) AS bucket),
regs AS (
  SELECT COALESCE(m_merged, 0) AS mm, COALESCE(m_direct, 0) AS md
  FROM slots LEFT JOIN merged USING (bucket) LEFT JOIN direct USING (bucket)
)
SELECT CAST(SUM(mm) AS BIGINT) AS merged_reg_sum,
       CAST(SUM(md) AS BIGINT) AS direct_reg_sum,
       {HLL_ALPHA * HLL_M * HLL_M!r} / SUM(1.0 / CAST(1 << mm AS DOUBLE))
         AS est_users,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev)
         AS exact_users,
       (SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) FROM ev)
         AS n_days
FROM regs
"""


# ---------------------------------------------------------------------------
# session conversion rate — sessionization composed with a funnel rollup
# ---------------------------------------------------------------------------

SESSION_GAP_US_BATCH = 30 * 60 * 1_000_000


def q_session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day (of session start): sessions, converting sessions (those
    containing a purchase), and the conversion rate — the rollup a
    growth dashboard runs on top of sessionization.

    Scale shape: the lag+cumsum sessionization is ONE (user) window
    pass on exact integer microseconds (same discipline as
    batch_sessionization; ties in ts produce gap 0 so session ids are
    tie-order-independent); the per-session reduce and per-day rollup
    are ordinary hash aggregates. Exact ints; one double division.
    Null contract: NULL ts / user_id / event_type drop at intake
    (ORACLES.md #1, #7).
    """
    register_tables(spark, sf_dir, ("events",))
    ev = spark.table("events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select("user_id", "ts", "event_id", "event_type")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    brk = (
        micros - F.lag(micros).over(order) > SESSION_GAP_US_BATCH
    ).cast("int")
    sess = ev.withColumn(
        "sid",
        F.sum(F.coalesce(brk, F.lit(0))).over(
            order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.min(F.to_date("ts")).alias("day"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("conv").cast("bigint").alias("n_converting"),
        (
            F.sum("conv").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


ORACLE_SESSION_CONVERSION_RATE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_US_BATCH} THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
per_session AS (
  SELECT user_id, sid, MIN(CAST(ts AS DATE)) AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM sess GROUP BY 1, 2
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(conv) AS BIGINT) AS n_converting,
       CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS conversion_rate
FROM per_session GROUP BY day
"""


# ---------------------------------------------------------------------------
# char class profile — byte-exact composition diagnostics
# ---------------------------------------------------------------------------


def q_text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: character-class composition (digit / whitespace /
    sentence-punctuation fractions of all characters) — the cheap
    first-pass signal for boilerplate, tables-as-text, and code-vs-
    prose separation.

    Scale shape: class counts are map-side length-difference
    projections (length(text) - length(regexp_replace(...))) — no
    explode, no shuffle beyond the per-source rollup. Exact int sums;
    one double division per fraction. NULL text drops; NULL source is
    its own group.
    """
    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents").filter(F.col("text").isNotNull())
    cls = lambda pat: F.length("text") - F.length(
        F.regexp_replace(F.col("text"), pat, "")
    )
    per = docs.select(
        "source",
        F.length("text").alias("n"),
        cls(r"[0-9]").alias("nd"),
        # explicit class, NOT \s: Java regex \s is [ \t\n\x0B\f\r] while
        # DuckDB's RE2 \s adds no \x0B — a vertical tab would silently
        # diverge engine vs oracle (ORACLES.md class 16)
        cls(r"[ \t\n\x0B\f\r]").alias("nw"),
        cls(r"[.,;:!?]").alias("np"),
    )
    agg = per.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_chars"),
        F.sum("nd").cast("bigint").alias("n_digits"),
        F.sum("nw").cast("bigint").alias("n_spaces"),
        F.sum("np").cast("bigint").alias("n_punct"),
    )
    frac = lambda c: F.when(
        F.col("n_chars") > 0,
        F.col(c).cast("double") / F.col("n_chars").cast("double"),
    )
    return agg.select(
        "source", "n_chars",
        frac("n_digits").alias("digit_frac"),
        frac("n_spaces").alias("space_frac"),
        frac("n_punct").alias("punct_frac"),
    )


ORACLE_TEXT_CHAR_CLASS_PROFILE = """
WITH per AS (
  SELECT source,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nd,
         length(text) - length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS nw,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np
  FROM documents WHERE text IS NOT NULL
),
agg AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS n_chars,
         CAST(SUM(nd) AS BIGINT) AS n_digits,
         CAST(SUM(nw) AS BIGINT) AS n_spaces,
         CAST(SUM(np) AS BIGINT) AS n_punct
  FROM per GROUP BY source
)
SELECT source, n_chars,
       CASE WHEN n_chars > 0
            THEN CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) END
         AS digit_frac,
       CASE WHEN n_chars > 0
            THEN CAST(n_spaces AS DOUBLE) / CAST(n_chars AS DOUBLE) END
         AS space_frac,
       CASE WHEN n_chars > 0
            THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END
         AS punct_frac
FROM agg
"""


# ---------------------------------------------------------------------------
# embedding norm profile — bucketed L2 envelope per label
# ---------------------------------------------------------------------------


def q_embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (label, norm²-bucket): vector counts and share-of-label —
    the normalization audit (un-normalized batches and zero vectors
    land in distinct buckets).

    Determinism: norm² is the SAME sequential left-to-right float fold
    in both engines (F.aggregate ↔ list_dot_product — the established
    cosine convention), rounded to 6 before bucketing so a last-ulp
    wobble cannot flip a bucket edge; thresholds are exact decimal
    literals. NULL embeddings drop at intake (ORACLES.md #7); exact
    int counts, one division.
    """
    from .operators.similarity import _dot

    register_tables(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings").filter(F.col("embedding").isNotNull())
    n2 = F.round(_dot(F.col("embedding"), F.col("embedding")), 6)
    bucket = (
        F.when(n2 < 0.5, "lt_0_5")
        .when(n2 < 1.0, "0_5_1")
        .when(n2 < 2.0, "1_2")
        .otherwise("ge_2")
    )
    b = emb.select("label", bucket.alias("norm_bucket"))
    counts = b.groupBy("label", "norm_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    totals = b.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label_vectors")
    )
    return counts.join(
        F.broadcast(totals), counts.label.eqNullSafe(totals.label)
    ).select(
        counts.label.alias("label"),
        "norm_bucket",
        "n_vectors",
        "n_label_vectors",
        (
            F.col("n_vectors").cast("double")
            / F.col("n_label_vectors").cast("double")
        ).alias("share"),
    )


ORACLE_EMBEDDING_NORM_PROFILE = """
WITH n AS (
  SELECT label,
         ROUND(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6)
           AS n2
  FROM embeddings WHERE embedding IS NOT NULL
),
b AS (
  SELECT label,
         CASE WHEN n2 < 0.5 THEN 'lt_0_5'
              WHEN n2 < 1.0 THEN '0_5_1'
              WHEN n2 < 2.0 THEN '1_2'
              ELSE 'ge_2' END AS norm_bucket
  FROM n
),
counts AS (
  SELECT label, norm_bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM b GROUP BY 1, 2
),
totals AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label_vectors
  FROM b GROUP BY 1
)
SELECT c.label, c.norm_bucket, c.n_vectors, t.n_label_vectors,
       CAST(c.n_vectors AS DOUBLE) / CAST(t.n_label_vectors AS DOUBLE)
         AS share
FROM counts c JOIN totals t ON c.label IS NOT DISTINCT FROM t.label
"""


# ---------------------------------------------------------------------------
# source dedup rate — pipeline verdicts rolled up by provenance
# ---------------------------------------------------------------------------


def q_source_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: documents, near-duplicates (dedup-pipeline verdict),
    and the dup rate — the provenance-level duplication report that
    decides which sources get aggressive dedup before mixing.

    Scale shape: the verdict set is the dedup pipeline's OUTPUT
    (bounded by the duplicate count, not the corpus); the rollup joins
    it to documents on doc_id and hash-aggregates per source. Verdict
    frame is DISTINCT per doc_id, so duplicated physical rows fan out
    row-for-row, never multiplicatively (ORACLES.md #15). Exact ints;
    one division.
    """
    from .operators.dedup import dedup_pipeline
    from .operators.specs import DEMO_BANDS, DEMO_NUM_PERM

    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    verdicts = dedup_pipeline(
        docs, num_perm=DEMO_NUM_PERM, bands=DEMO_BANDS
    ).select("doc_id", "is_duplicate").distinct()
    joined = docs.select("doc_id", "source").join(verdicts, "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.coalesce(F.col("is_duplicate").cast("bigint"), F.lit(0)))
        .cast("bigint")
        .alias("n_duplicates"),
        (
            F.sum(F.coalesce(F.col("is_duplicate").cast("bigint"), F.lit(0)))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


def _oracle_source_dedup_rate() -> str:
    from .operators.specs import _oracle_dedup_pipeline

    verdicts = _oracle_dedup_pipeline().strip().rstrip(";")
    return f"""
WITH verdicts0 AS ({verdicts}),
verdicts AS (SELECT DISTINCT doc_id, is_duplicate FROM verdicts0)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN v.is_duplicate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicates,
       CAST(SUM(CASE WHEN v.is_duplicate THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM documents d LEFT JOIN verdicts v ON d.doc_id = v.doc_id
GROUP BY d.source
"""
