"""Relational query catalog (SURVEY §2.3-§2.7 operators) over the
driver's TPC-H-ish tables, each with a DuckDB oracle SQL string.

Every query is a (spark, sf_dir) -> DataFrame callable whose output
column names match the oracle exactly (the driver's hash compare sorts
columns by name). Floating aggregates are rounded on both sides;
timestamps are emitted as strings so value hashing is engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from las_vpe_platform_spark.compat import pround

from las_vpe_platform_spark.operators.aggregates import completeness_check
from las_vpe_platform_spark.operators.joins import full_outer_assemble
from las_vpe_platform_spark.operators.routing import demux, term_sig_filter
from las_vpe_platform_spark.operators.sampling import even_spaced_sample
from las_vpe_platform_spark.operators.windows import last_n, topk_per_group


from las_vpe_platform_spark.sources.tables import load_table as _t  # noqa: E402


# --- q01: pricing summary (A1 wide aggregate; TPC-H Q1 shape) ---------------
# The reference's 125-column attribute AVG (DeepMARCaffe2Native.java:169-179)
# is this plan shape: one grouped multi-column partial+final hash aggregate.

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # money sums in DECIMAL: exact, summation-order independent, so the
    # rounded output can never straddle a boundary differently per engine
    dec = lambda c: F.col(c).cast("decimal(18,6)")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,6)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            pround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE AS sum_base_price,
       round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))), 2)::DOUBLE AS sum_disc_price,
       round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6)) * (1 + l_tax::DECIMAL(18,6))), 2)::DOUBLE AS sum_charge,
       floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0                                    AS avg_qty,
       floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                               AS avg_price,
       floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q02: top-k per group (W1 ranked-neighbor analog) -----------------------

def q02_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    top = topk_per_group(
        joined,
        group_cols=["n_name"],
        order_col="c_acctbal",
        k=3,
        tiebreak_cols=["c_custkey"],
    )
    return top.select(
        "n_name",
        "c_custkey",
        "c_name",
        pround("c_acctbal", 2).alias("acctbal"),
        "rank",
    )


Q02_SQL = """
SELECT n_name, c_custkey, c_name, floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal,
       row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rank
FROM customer JOIN nation ON c_nationkey = n_nationkey
QUALIFY rank <= 3
"""


# --- q03: shipping priority (TPC-H Q3 shape: 3-way join + agg + top-k) ------

def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10).select(
        "l_orderkey",
        "revenue",
        F.col("o_orderdate").cast("string").alias("orderdate"),
        "o_orderpriority",
    )


Q03_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))), 2)::DOUBLE AS revenue,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q04: regional revenue (TPC-H Q5 shape: 6-way star join) ----------------

def q04_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )


Q04_SQL = """
SELECT n_name, round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --- q05: full outer join (J1/J6 assembly shape) ----------------------------

def q05_daily_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    return full_outer_assemble(orders, shipped, on=["day"])


Q05_SQL = """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
), s AS (
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, count(*) AS n_shipped
  FROM lineitem GROUP BY 1
)
SELECT coalesce(o.day, s.day) AS day, n_orders, n_shipped
FROM o FULL OUTER JOIN s ON o.day = s.day
"""


# --- q06: anti join (P4 kill-pool / termination filter shape) ---------------

def q06_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # anti-join against a filtered set (customers with no 2001 orders)
    # — non-trivial at every scale factor, unlike "no orders at all"
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return term_sig_filter(cust, recent, key="c_custkey").select("c_custkey", "c_name")


Q06_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
"""


# --- q07: point lookup (J8/S9 MATCH-by-id shape) ----------------------------

def q07_order_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    min_key = orders.agg(F.min("o_orderkey").alias("l_orderkey"))
    return (
        li.join(F.broadcast(min_key), on="l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            pround("l_quantity", 2).alias("quantity"),
            pround("l_extendedprice", 2).alias("extendedprice"),
        )
    )


Q07_SQL = """
SELECT l_orderkey, l_linenumber, floor((l_quantity) * 100.0 + 0.5) / 100.0 AS quantity,
       floor((l_extendedprice) * 100.0 + 0.5) / 100.0 AS extendedprice
FROM lineitem
WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
"""


# --- q08: completeness check (A2 HAR-packing trigger shape) -----------------

def q08_order_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return completeness_check(li, group_col="l_orderkey", expected_col="l_linenumber").select(
        "l_orderkey", "actual_count", "expected_count"
    )


Q08_SQL = """
SELECT l_orderkey, count(*) AS actual_count, max(l_linenumber) AS expected_count
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) = max(l_linenumber)
"""


# --- q09: last-n ring buffer (W3 TERM_SIG last-100 shape) -------------------

def q09_last_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return last_n(ev, order_col="ts", n=100, tiebreak_cols=["event_id"]).select(
        "event_id",
        F.col("ts").cast("string").alias("ts_str"),
        "event_type",
        pround("value", 4).alias("value"),
    )


Q09_SQL = """
SELECT event_id, CAST(ts AS VARCHAR) AS ts_str, event_type, floor((value) * 10000.0 + 0.5) / 10000.0 AS value
FROM events ORDER BY ts DESC, event_id LIMIT 100
"""


# --- q10: time bucketing (F6 time-tree collapse) ----------------------------

def q10_events_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("minute", "ts").cast("string").alias("minute"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 4).alias("sum_value"),
        )
    )


Q10_SQL = """
SELECT CAST(date_trunc('minute', ts) AS VARCHAR) AS minute, event_type,
       count(*) AS n_events, floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
FROM events GROUP BY 1, 2
"""


# --- q11: JSON extraction (F9 Gson encode/decode parity) --------------------

def q11_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.avg("value"), 4).alias("avg_value"),
        )
    )


Q11_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       count(*) AS n, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events GROUP BY 1
"""


# --- q12: demux + union (P2 type fan-out, §2.7 set ops) ---------------------

def q12_events_demux_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    streams = demux(ev, "event_type", ["click", "purchase"])
    unioned = streams["click"].unionByName(streams["purchase"])
    return unioned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum("value"), 4).alias("sum_value"),
    )


Q12_SQL = """
SELECT event_type, count(*) AS n, floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
FROM (
  SELECT * FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT * FROM events WHERE event_type = 'purchase'
)
GROUP BY event_type
"""


# --- q13: even-spaced sampling (P9/W4 Tracklet.sample shape) ----------------

def q13_sampled_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) alone is not unique in the generated
    # data; partkey+suppkey make the sample order a total order
    sampled = even_spaced_sample(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey"], every_k=2
    )
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


Q13_SQL = """
WITH sampled AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
  FROM lineitem
  QUALIFY (rn - 1) % 2 = 0
)
SELECT l_returnflag, count(*) AS n_sampled, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty
FROM sampled GROUP BY l_returnflag
"""


# --- q14: key synthesis + parse round trip (F7/F8) --------------------------

def q14_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    keyed = ev.withColumn(
        "tracklet_key",
        F.concat(F.lit("EV"), F.col("user_id").cast("string"), F.lit("_tarid"), (F.col("event_id") % 97).cast("string")),
    )
    parsed = keyed.withColumn(
        "serial", F.regexp_extract("tracklet_key", r"_tarid(\d+)$", 1).cast("int")
    )
    return parsed.groupBy("serial").agg(F.count(F.lit(1)).alias("n"))


Q14_SQL = """
SELECT CAST(regexp_extract('EV' || CAST(user_id AS VARCHAR) || '_tarid' || CAST(event_id % 97 AS VARCHAR),
            '_tarid(\\d+)$', 1) AS INTEGER) AS serial,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- q15: frame-index time arithmetic (F5 calTrackletStartTime) -------------

def q15_frame_time_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frame duration at 12.5 fps = exactly 80_000 microseconds; integer
    # micros arithmetic keeps both engines bit-identical.
    ev = _t(spark, sf_dir, "events")
    with_ts = ev.withColumn(
        "frame_ts",
        # wall-clock add on NTZ (session-TZ free); 80_000 us per frame,
        # exact through the Decimal(18,6) secs conversion
        F.col("ts")
        + F.make_interval(secs=((F.col("event_id") % 1000) * 80000).cast("double") / F.lit(1e6)),
    )
    return (
        with_ts.groupBy(F.date_trunc("hour", "frame_ts").cast("string").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q15_SQL = """
SELECT CAST(date_trunc('hour', make_timestamp(epoch_us(ts) + (event_id % 1000) * 80000)) AS VARCHAR) AS hour,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- q16: pivot (conditional aggregation fan-out) ---------------------------

def q16_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


Q16_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'view')     AS view,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'error')    AS error
FROM events GROUP BY 1
"""


# --- q17: rollup (hierarchical aggregate) -----------------------------------

def q17_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


Q17_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- q18: sessionization (lag window + gap cumsum) --------------------------

def q18_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)  # NTZ difference -> interval
    flagged = ev.withColumn(
        "new_session",
        F.when(gap > F.expr("INTERVAL 1800 SECONDS"), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        (F.sum("new_session") + 1).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q18_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, (sum(new_session) + 1)::BIGINT AS n_sessions, count(*) AS n_events
FROM flagged GROUP BY user_id
"""


# --- q19: union of entity sources (§2.7) ------------------------------------

def q19_entity_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("entity_type"),
        pround("c_acctbal", 2).alias("acctbal"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier").alias("entity_type"),
        pround("s_acctbal", 2).alias("acctbal"),
    )
    return cust.unionByName(supp)


Q19_SQL = """
SELECT c_custkey AS entity_id, 'customer' AS entity_type, floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
FROM customer
UNION ALL
SELECT s_suppkey AS entity_id, 'supplier' AS entity_type, floor((s_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
FROM supplier
"""


# --- q33: as-of join (point-in-time; DuckDB native ASOF as oracle) ----------

def q33_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from las_vpe_platform_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedupe right side per (user, ts) so ties are impossible in either engine
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        tolerance_seconds=3600,
        right_value_cols=["click_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        F.col("click_id_right").alias("click_id"),
        F.col("ts_right").cast("string").alias("click_ts"),
    )


Q33_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), matched AS (
  SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.click_id, c.ts AS click_ts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT event_id, user_id, CAST(purchase_ts AS VARCHAR) AS purchase_ts,
       CASE WHEN epoch_us(purchase_ts) - epoch_us(click_ts) <= 3600::BIGINT * 1000000
            THEN click_id END AS click_id,
       CASE WHEN epoch_us(purchase_ts) - epoch_us(click_ts) <= 3600::BIGINT * 1000000
            THEN CAST(click_ts AS VARCHAR) END AS click_ts
FROM matched
"""


# --- q34: exact percentiles (interpolated median per group) -----------------

def q34_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        pround(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        pround(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


Q34_SQL = """
SELECT event_type,
       floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0  AS p50,
       floor((quantile_cont(value, 0.95)) * 1000000.0 + 0.5) / 1000000.0 AS p95,
       count(*) AS n
FROM events GROUP BY event_type
"""


# --- q35: semi join (EXISTS) ------------------------------------------------

def q35_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(urgent, on="c_custkey", how="left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


Q35_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# --- q36: decorrelated min-per-group (TPC-H Q2 shape) -----------------------

def q36_cheapest_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # decorrelated form of: WHERE c_acctbal = (SELECT min(...) per nation)
    mins = cust.groupBy("c_nationkey").agg(F.min("c_acctbal").alias("min_bal"))
    return (
        cust.join(F.broadcast(mins), on="c_nationkey")
        .filter(F.col("c_acctbal") == F.col("min_bal"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_name", pround("c_acctbal", 2).alias("acctbal"))
    )


Q36_SQL = """
SELECT n_name, c_custkey, c_name, floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal = (SELECT min(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
"""


# --- q37: bilateral shipping volume (TPC-H Q7 shape) ------------------------

def q37_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    # DECIMAL, not double: with ~3000 output groups, double partial-sum
    # ordering noise lands on rounding boundaries; decimal sums are
    # exact and order-independent in every engine
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(F.round(F.sum(rev), 2).cast("double").alias("volume"))


Q37_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(l_extendedprice::DECIMAL(18,6) * (1 - l_discount::DECIMAL(18,6))), 2)::DOUBLE AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --- q38: window frames (running sum + centered moving average) -------------

def q38_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0))
    moving = F.avg("value").over(w.rowsBetween(-2, 2))
    return ev.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        pround(running, 4).alias("running_sum"),
        pround(moving, 4).alias("moving_avg5"),
    )


Q38_SQL = """
SELECT user_id, event_id,
       floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING)) * 10000.0 + 0.5) / 10000.0 AS running_sum,
       floor((avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) * 10000.0 + 0.5) / 10000.0 AS moving_avg5
FROM events WHERE user_id < 20
"""


# --- q39: navigation functions (lag/lead/first/last) ------------------------

def q39_event_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(wf).alias("first_event"),
        F.last("event_id").over(wf).alias("last_event"),
    )


Q39_SQL = """
SELECT user_id, event_id,
       lag(event_id)  OVER w AS prev_event,
       lead(event_id) OVER w AS next_event,
       first(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       last(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- q40: string function battery (incl. edit distance) ---------------------

def q40_part_name_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.levenshtein(F.col("p_name"), F.lit("standard brushed steel")).alias("edit_dist"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


Q40_SQL = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_prefix,
       levenshtein(p_name, 'standard brushed steel') AS edit_dist,
       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
       reverse(p_brand) AS brand_rev
FROM part
"""


# --- q41: intersect / except (set-op coverage beyond unions) ----------------

def q41_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(urgent).withColumn("set_op", F.lit("both"))
    only_building = building.exceptAll(urgent).withColumn("set_op", F.lit("building_only"))
    return both.unionByName(only_building)


Q41_SQL = """
SELECT c_custkey, 'both' AS set_op FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT c_custkey, 'building_only' AS set_op FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT ALL
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


# --- q46: multi-distinct aggregation (Expand-based plan) --------------------

def q46_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q46_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- q47: null semantics over outer joins (coalesce / null-safe eq) ---------

def q47_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    joined = cust.join(recent, cust.c_custkey == recent.o_custkey, "left")
    return joined.select(
        "c_custkey",
        F.coalesce("n_recent", F.lit(0)).alias("n_recent_orders"),
        F.col("n_recent").isNull().cast("int").alias("is_inactive"),
        # null-safe equality: 0-order customers vs null marker
        (F.col("n_recent").eqNullSafe(F.lit(None).cast("long"))).cast("int").alias("null_eq_null"),
    )


Q47_SQL = """
WITH recent AS (
  SELECT o_custkey, count(*) AS n_recent FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' GROUP BY o_custkey
)
SELECT c_custkey,
       coalesce(n_recent, 0) AS n_recent_orders,
       CAST(n_recent IS NULL AS INT) AS is_inactive,
       CAST(n_recent IS NOT DISTINCT FROM NULL AS INT) AS null_eq_null
FROM customer LEFT JOIN recent ON c_custkey = o_custkey
"""


# --- q52: point-in-interval range join (bucketized) -------------------------
# Clicks landing inside any same-user 30-minute purchase window. The
# operator turns the non-equi BETWEEN join into an equi-join on
# (user, time-bucket) — see operators/joins.py::range_join.


def q52_purchase_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from las_vpe_platform_spark.operators.joins import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    pairs = range_join(
        clicks,
        purchases,
        left_point="ts",
        right_start="p_start",
        right_end="p_end",
        by=["user_id"],
        bucket_seconds=1800,
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks"),
        F.countDistinct("purchase_id").alias("n_purchases"),
    )


def q72_hourly_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate with gap filling: hourly
    event counts per type over a DENSE hour spine — hours with no
    events appear as explicit zero rows (the time_bucket_gapfill
    shape TimescaleDB popularized, as a generated spine + left join).

    Scale shape: the aggregate is one grouped count; the spine is
    sequence()-generated from the (tiny, broadcast) global min/max —
    spine rows = hours x types, independent of event volume, so the
    gap-fill join broadcasts the aggregate side only if small,
    otherwise shuffles spine-side (bounded by the calendar, not the
    data).
    """
    ev = _t(spark, sf_dir, "events")
    hours = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    )
    agg = hours.groupBy("hour", "event_type").agg(F.count(F.lit(1)).alias("n"))
    bounds = hours.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    types = ev.select("event_type").distinct()
    spine = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
        .crossJoin(types)
    )
    return (
        spine.join(agg, on=["hour", "event_type"], how="left")
        .select(
            F.col("hour").cast("string").alias("hour"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


Q72_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, event_type FROM events
), agg AS (
  SELECT hour, event_type, count(*) AS n FROM h GROUP BY hour, event_type
), bounds AS (
  SELECT min(hour) AS lo, max(hour) AS hi FROM h
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour, t.event_type
  FROM bounds CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT CAST(s.hour AS VARCHAR) AS hour, s.event_type,
       coalesce(a.n, 0)::BIGINT AS n
FROM spine s LEFT JOIN agg a ON s.hour = a.hour AND s.event_type = a.event_type
"""


Q52_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_start,
         ts + INTERVAL 30 MINUTE AS p_end
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.user_id, count(*) AS n_pairs,
       count(DISTINCT c.click_id) AS n_clicks,
       count(DISTINCT p.purchase_id) AS n_purchases
FROM c JOIN p ON c.user_id = p.user_id
             AND c.ts >= p.p_start AND c.ts <= p.p_end
GROUP BY c.user_id
"""


# --- q56: deterministic HLL distinct sketch ---------------------------------
# Per-event-type distinct users both exactly and via the portable
# HyperLogLog sketch (operators/aggregates.py::hll_distinct) — the
# sketch the scale path uses when exact COUNT(DISTINCT) across 100 TB
# would shuffle every key. Deterministic construction means the sketch
# itself is oracle-verified register-for-register, not just "close".


def q56_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from las_vpe_platform_spark.operators.aggregates import hll_distinct

    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    sketch = hll_distinct(ev, ["event_type"], "user_id", m=64)
    return exact.join(sketch, "event_type")


def _q56_sql() -> str:
    from las_vpe_platform_spark.operators.aggregates import hll_sql

    return f"""
WITH _exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
), _hll AS ({hll_sql(["event_type"], "user_id", "events", m=64)})
SELECT _exact.event_type, n_exact, hll_sum, n_zero, hll_est
FROM _exact JOIN _hll USING (event_type)
"""


Q56_SQL = _q56_sql()


# --- q58: hopping (sliding) window aggregation ------------------------------
# 5-minute windows advancing every minute — each event lands in 5
# overlapping windows. Spark expresses this natively with F.window's
# slideDuration (the Structured Streaming hop-window primitive, usable
# identically in batch); the oracle replays the semantics by exploding
# each event into its 5 containing window starts. At scale this is one
# explode (5x row amplification, map-side) + one hash aggregate — no
# self-join, no window function over a global sort.


def q58_hopping_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            pround(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )


Q58_SQL = """
WITH _win AS (
  SELECT date_trunc('minute', ts) - k.k * INTERVAL 1 MINUTE AS window_start,
         user_id, value
  FROM events, generate_series(0, 4) AS k(k)
)
SELECT CAST(window_start AS VARCHAR) AS window_start,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
FROM _win GROUP BY 1
"""


# --- q63: Bloom-filter semi-join with measured false positives --------------
# Build a deterministic Bloom filter from high-balance customers,
# probe every order WITHOUT shuffling the orders table (k broadcast
# block-joins), and tally bloom-pass vs exact-match per priority —
# the false-positive column is the filter's measured error, identical
# in both engines because the bit positions are portable md5 hashes.

# m sized to ~2.5 bits/key at sf0.01 so the false-positive columns are
# nonzero and must match exactly — a bigger m only proves the happy path
BLOOM_M = 1024
BLOOM_K = 4
BLOOM_ACCTBAL = 9000.0


def q63_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from las_vpe_platform_spark.operators.bloom import bloom_build, bloom_probe

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") >= BLOOM_ACCTBAL).select("c_custkey")
    blocks = bloom_build(rich, "c_custkey", m=BLOOM_M, k=BLOOM_K)
    probed = bloom_probe(orders, "o_custkey", blocks, m=BLOOM_M, k=BLOOM_K)
    truth = rich.withColumnRenamed("c_custkey", "o_custkey").withColumn(
        "_true", F.lit(True)
    )
    return (
        probed.join(F.broadcast(truth), "o_custkey", "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probed"),
            F.sum(F.col("bloom_pass").cast("bigint")).alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("_true"), F.lit(False)).cast("bigint")).alias(
                "n_true_match"
            ),
            F.sum(
                (F.col("bloom_pass") & F.col("_true").isNull()).cast("bigint")
            ).alias("n_false_pos"),
        )
    )


def _q63_sql() -> str:
    from las_vpe_platform_spark.operators.bloom import BITS_PER_BLOCK, bloom_sql_bit

    build_bits = " UNION ALL ".join(
        f"SELECT {bloom_sql_bit('c_custkey', j, BLOOM_M)} AS bit"
        f" FROM customer WHERE c_acctbal >= {BLOOM_ACCTBAL}"
        for j in range(BLOOM_K)
    )
    probe_joins = "\n".join(
        f"LEFT JOIN blocks b{j} ON b{j}.block = "
        f"({bloom_sql_bit('o.o_custkey', j, BLOOM_M)} // {BITS_PER_BLOCK})"
        for j in range(BLOOM_K)
    )
    hit = " AND ".join(
        f"coalesce((b{j}.mask & (1::BIGINT << "
        f"({bloom_sql_bit('o.o_custkey', j, BLOOM_M)} % {BITS_PER_BLOCK})::INT))"
        f" = (1::BIGINT << ({bloom_sql_bit('o.o_custkey', j, BLOOM_M)} % {BITS_PER_BLOCK})::INT), FALSE)"
        for j in range(BLOOM_K)
    )
    return f"""
WITH bits AS ({build_bits}),
blocks AS (
  SELECT bit // {BITS_PER_BLOCK} AS block,
         bit_or(1::BIGINT << (bit % {BITS_PER_BLOCK})::INT) AS mask
  FROM bits GROUP BY 1
),
truth AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal >= {BLOOM_ACCTBAL}
),
probed AS (
  SELECT o.o_orderpriority,
         ({hit}) AS bloom_pass,
         t.c_custkey IS NOT NULL AS true_match
  FROM orders o
  {probe_joins}
  LEFT JOIN truth t ON t.c_custkey = o.o_custkey
)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_probed,
       sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pass,
       sum(CASE WHEN true_match THEN 1 ELSE 0 END)::BIGINT AS n_true_match,
       sum(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)::BIGINT AS n_false_pos
FROM probed GROUP BY o_orderpriority
"""


Q63_SQL = _q63_sql()


# --- q76: LOCF (last-observation-carried-forward) backfill ------------------
# The other half of q72's gap handling: q72 fills SILENT buckets with
# zeros (additive metrics); gauge-style metrics instead carry the last
# observed value forward. Per user, every event row is annotated with
# the most recent click's value at-or-before it — the classic
# time-series backfill (TimescaleDB locf(), pandas ffill) as one
# running window: F.last(ignorenulls) over rows-unbounded-preceding.
# Scale shape: ONE shuffle on user_id + an in-partition sort — the
# same cost envelope as the as-of join (q33), with no spine join and
# no state beyond the running scalar; values pass through untouched so
# parity is bit-exact.


def q76_locf_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicked = F.when(F.col("event_type") == "click", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(clicked, ignorenulls=True).over(w).alias("filled_click_value"),
    )


Q76_SQL = """
SELECT event_id, user_id, event_type,
       last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_click_value
FROM events
"""



# --- q108: event-sequence mining (top behavioral trigrams) -------------------
# Sequential-pattern analytics the funnel (q98) cannot express: the
# funnel fixes a stage list up front; this DISCOVERS the dominant
# behavior paths by counting consecutive event-type trigrams over each
# user's time-ordered stream. One per-user window (lead x2, the only
# data-sized exchange — same partitioning q18's sessionizer already
# needs) then a hash aggregate on the trigram; top-k compiles to
# TakeOrderedAndProject. Tie-broken by event_id so both engines order
# identically at equal timestamps.

SEQ_TOPK = 15


def q108_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(SEQ_TOPK)
    )


Q108_SQL = f"""
WITH tri AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT {SEQ_TOPK}
"""


# --- q109: cohort retention --------------------------------------------------
# Classic cohort analysis: users grouped by first-activity day, then
# the fraction still active k days later. Shape: first-seen per user
# (one user-keyed hash agg with map-side partials), events join their
# user's cohort on user_id — a shuffle equi-join at scale (AQE picks
# broadcast at small sf; the user dimension is NOT broadcastable at
# 10^9 users and the plan does not force it) — then one
# (cohort_day, age_days) count. Only the retention DENOMINATORS
# re-enter via an explicit broadcast: cohort_day is calendar-bounded,
# so that side stays KB-sized at any corpus size.

def q109_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    aged = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("age_days"),
        )
        .distinct()
    )
    sizes = aged.filter(F.col("age_days") == 0).groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        aged.groupBy("cohort_day", "age_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.col("age_days").cast("bigint").alias("age_days"),
            "n_active",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            pround(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


Q109_SQL = """
WITH ev AS (
  SELECT user_id, ts::DATE AS day FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
), aged AS (
  SELECT DISTINCT ev.user_id, cohort_day,
         datediff('day', cohort_day, day) AS age_days
  FROM ev JOIN first USING (user_id)
), sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM aged WHERE age_days = 0 GROUP BY cohort_day
)
SELECT cohort_day::VARCHAR AS cohort_day, age_days::BIGINT AS age_days,
       count(*)::BIGINT AS n_active, any_value(cohort_size)::BIGINT AS cohort_size,
       floor((count(*)::DOUBLE / any_value(cohort_size)) * 1000000.0 + 0.5) / 1000000.0 AS retention
FROM aged JOIN sizes USING (cohort_day)
GROUP BY cohort_day, age_days
"""



# --- q110: portable approximate quantiles (bottom-hash sample sketch) --------
# Completes the engine-portable sketch family (HLL q56 = distinct,
# CMS q81 = frequency, this = quantiles): `approx_percentile` is the
# production call but its t-digest is engine-private, so — like HLL —
# this builds a quantile estimate BOTH engines reproduce bit-for-bit:
# a deterministic bottom-k-by-md5 uniform sample per group, exact
# percentiles over the sample.
#
# Scale shape (the point): the FULL data never shuffles. Per-group
# counts are a map-side-partial aggregate (groups-sized), the
# acceptance threshold ~ 2*k/n is a per-row FILTER against the
# broadcast counts, and only the ~2k-row survivor set pays the
# rank-trim window + percentile. Sample size k bounds the error
# (standard order-statistics confidence ~ 1/sqrt(k)); groups smaller
# than the slack accept everything and the estimate is exact.
# Threshold arithmetic is (2^60 div n) * 2k in exact integers —
# associativity chosen so both engines round identically.

SQ_K = 256
_SQ_HASH60 = (
    "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT)"
)


def q110_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # small groups take the accept-all branch FIRST: for n <= 2k the
    # product (2^60 div n) * 2k exceeds BIGINT (review r5: n <= 64
    # overflowed under ANSI before the OR could save the row), and the
    # CASE short-circuits per row so the multiplication never runs
    thr = F.expr(
        f"CASE WHEN n <= {2 * SQ_K} THEN 1152921504606846976L"
        f" ELSE (1152921504606846976L div n) * {2 * SQ_K} END"
    )
    survivors = (
        ev.join(F.broadcast(counts), "event_type")
        .withColumn("_h", F.expr(_SQ_HASH60))
        .filter(F.col("_h") < thr)
    )
    w = W.partitionBy("event_type").orderBy("_h", "event_id")
    sample = survivors.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= SQ_K
    )
    return sample.groupBy("event_type").agg(
        F.first("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("sample_n"),
        pround(F.expr("percentile(value, 0.5)"), 6).alias("p50_est"),
        pround(F.expr("percentile(value, 0.9)"), 6).alias("p90_est"),
        pround(F.expr("percentile(value, 0.99)"), 6).alias("p99_est"),
    )


Q110_SQL = f"""
WITH counts AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
), hashed AS (
  SELECT e.event_type, e.event_id, e.value, c.n,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS _h
  FROM events e JOIN counts c USING (event_type)
), survivors AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY _h, event_id) AS _rn
  FROM hashed
  WHERE _h < (CASE WHEN n <= {2 * SQ_K} THEN 1152921504606846976
              ELSE (1152921504606846976 // n) * {2 * SQ_K} END)
)
SELECT event_type, any_value(n)::BIGINT AS n, count(*)::BIGINT AS sample_n,
       floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50_est,
       floor((quantile_cont(value, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90_est,
       floor((quantile_cont(value, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS p99_est
FROM survivors WHERE _rn <= {SQ_K}
GROUP BY event_type
"""



# --- q115: Markov transition entropy (next-event predictability) -------------
# The predictability face of q108's sequence mining: the first-order
# Markov transition matrix over per-user event streams, collapsed to
# one row per source state with its Shannon entropy H(next|state) and
# modal next state. Shape: the SAME user-keyed sort window q108/q18
# already pay (one data-sized exchange), one (e1, e2) hash aggregate
# (≤ types² rows after map-side partials — sketch-sized), then
# entropy/argmax over the tiny matrix. Entropy terms sum over ≤ types
# rows; aggregation-order drift ~1e-16 is absorbed by the 1e-6
# rounding.

def q115_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("e1").agg(F.sum("c").alias("n_total"))
    probs = pairs.join(F.broadcast(tot), "e1").withColumn(
        "p", F.col("c").cast("double") / F.col("n_total")
    )
    w2 = W.partitionBy("e1").orderBy(F.desc("c"), F.asc("e2"))
    modal = (
        probs.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .select("e1", F.col("e2").alias("modal_next"), F.col("p").alias("modal_p"))
    )
    ent = probs.groupBy("e1").agg(
        (-F.sum(F.col("p") * F.log2("p"))).alias("entropy_bits"),
        F.count(F.lit(1)).cast("bigint").alias("n_next_types"),
        F.first("n_total").cast("bigint").alias("n_transitions"),
    )
    return ent.join(modal, "e1").select(
        "e1",
        "n_transitions",
        "n_next_types",
        pround("entropy_bits", 6).alias("entropy_bits"),
        "modal_next",
        pround("modal_p", 6).alias("modal_p"),
    )


Q115_SQL = """
WITH pairs AS (
  SELECT e1, e2, count(*) AS c FROM (
    SELECT event_type AS e1,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
    FROM events
  ) WHERE e2 IS NOT NULL
  GROUP BY e1, e2
), tot AS (
  SELECT e1, sum(c) AS n_total FROM pairs GROUP BY e1
), probs AS (
  SELECT pairs.e1, e2, c, n_total, c::DOUBLE / n_total AS p
  FROM pairs JOIN tot USING (e1)
), modal AS (
  SELECT e1, e2 AS modal_next, p AS modal_p FROM (
    SELECT *, row_number() OVER (PARTITION BY e1 ORDER BY c DESC, e2) AS _rn
    FROM probs
  ) WHERE _rn = 1
), ent AS (
  SELECT e1, -sum(p * log2(p)) AS entropy_bits,
         count(*)::BIGINT AS n_next_types,
         any_value(n_total)::BIGINT AS n_transitions
  FROM probs GROUP BY e1
)
SELECT e1, n_transitions, n_next_types,
       floor(entropy_bits * 1000000.0 + 0.5) / 1000000.0 AS entropy_bits,
       modal_next,
       floor(modal_p * 1000000.0 + 0.5) / 1000000.0 AS modal_p
FROM ent JOIN modal USING (e1)
"""



# --- q117: incremental aggregate maintenance (materialized-view delta) -------
# The aggregate-level half of warehouse incrementality next to q102's
# row-level MERGE: a stored per-type aggregate is brought current by
# signed-folding a CDC changelog (inserts + deletes) and merging with
# ONE full-outer join on the group key — the base facts are never
# rescanned, so at 100 TB the maintenance job is sized by the delta
# and the aggregate table alone (operators/maintenance.py::
# maintain_aggregate). Base = events outside the insert slice; the
# changelog inserts the event_id % 20 slice and deletes the % 17
# slice of base, deletes carrying their original values (the CDC
# contract that makes counts reach exact zero).

def q117_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from las_vpe_platform_spark.operators.maintenance import maintain_aggregate

    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 20 != 0)
    stored = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    inserts = ev.filter(F.col("event_id") % 20 == 0).select(
        "event_type", F.lit("I").alias("op"), "value"
    )
    deletes = base.filter(F.col("event_id") % 17 == 0).select(
        "event_type", F.lit("D").alias("op"), "value"
    )
    maintained = maintain_aggregate(
        stored,
        inserts.unionByName(deletes),
        group_cols=["event_type"],
        count_col="n",
        sum_cols={"total": "value"},
    )
    return maintained.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        pround("total", 6).alias("total"),
        pround(F.col("total") / F.col("n"), 6).alias("avg_value"),
    )


Q117_SQL = """
WITH base AS (
  SELECT * FROM events WHERE event_id % 20 != 0
), stored AS (
  SELECT event_type, count(*) AS n, sum(value) AS total
  FROM base GROUP BY event_type
), changes AS (
  SELECT event_type, 'I' AS op, value FROM events WHERE event_id % 20 = 0
  UNION ALL
  SELECT event_type, 'D' AS op, value FROM base WHERE event_id % 17 = 0
), delta AS (
  SELECT event_type,
         sum(CASE WHEN op = 'I' THEN 1 ELSE -1 END) AS _dn,
         sum((CASE WHEN op = 'I' THEN 1 ELSE -1 END)::DOUBLE * value) AS _dtotal
  FROM changes GROUP BY event_type
), merged AS (
  SELECT coalesce(stored.event_type, delta.event_type) AS event_type,
         coalesce(n, 0) + coalesce(_dn, 0) AS n,
         coalesce(total, 0.0) + coalesce(_dtotal, 0.0) AS total
  FROM stored FULL OUTER JOIN delta USING (event_type)
)
SELECT event_type, n::BIGINT AS n,
       floor(total * 1000000.0 + 0.5) / 1000000.0 AS total,
       floor((total / n) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
FROM merged WHERE n > 0
"""


RELATIONAL_QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_top_customers_per_nation": (q02_top_customers_per_nation, Q02_SQL),
    "q03_shipping_priority": (q03_shipping_priority, Q03_SQL),
    "q04_regional_revenue": (q04_regional_revenue, Q04_SQL),
    "q05_daily_activity_full_outer": (q05_daily_activity_full_outer, Q05_SQL),
    "q06_customers_without_recent_orders": (q06_customers_without_recent_orders, Q06_SQL),
    "q07_order_point_lookup": (q07_order_point_lookup, Q07_SQL),
    "q08_order_completeness": (q08_order_completeness, Q08_SQL),
    "q09_last_events": (q09_last_events, Q09_SQL),
    "q10_events_minutely": (q10_events_minutely, Q10_SQL),
    "q11_events_json_props": (q11_events_json_props, Q11_SQL),
    "q12_events_demux_union": (q12_events_demux_union, Q12_SQL),
    "q13_sampled_lineitems": (q13_sampled_lineitems, Q13_SQL),
    "q14_key_roundtrip": (q14_key_roundtrip, Q14_SQL),
    "q15_frame_time_arithmetic": (q15_frame_time_arithmetic, Q15_SQL),
    "q16_event_type_pivot": (q16_event_type_pivot, Q16_SQL),
    "q17_rollup_returnflag": (q17_rollup_returnflag, Q17_SQL),
    "q18_user_sessions": (q18_user_sessions, Q18_SQL),
    "q19_entity_union": (q19_entity_union, Q19_SQL),
    "q33_asof_last_click": (q33_asof_last_click, Q33_SQL),
    "q34_value_percentiles": (q34_value_percentiles, Q34_SQL),
    "q35_customers_with_urgent_orders": (q35_customers_with_urgent_orders, Q35_SQL),
    "q36_cheapest_customer_per_nation": (q36_cheapest_customer_per_nation, Q36_SQL),
    "q37_bilateral_volume": (q37_bilateral_volume, Q37_SQL),
    "q38_running_user_value": (q38_running_user_value, Q38_SQL),
    "q39_event_navigation": (q39_event_navigation, Q39_SQL),
    "q40_part_name_strings": (q40_part_name_strings, Q40_SQL),
    "q41_segment_set_ops": (q41_segment_set_ops, Q41_SQL),
    "q46_multi_distinct": (q46_multi_distinct, Q46_SQL),
    "q47_null_semantics": (q47_null_semantics, Q47_SQL),
    "q52_purchase_window_clicks": (q52_purchase_window_clicks, Q52_SQL),
    "q56_distinct_sketch": (q56_distinct_sketch, Q56_SQL),
    "q58_hopping_window_stats": (q58_hopping_window_stats, Q58_SQL),
    "q63_bloom_semi_join": (q63_bloom_semi_join, Q63_SQL),
    "q72_hourly_rollup_gapfill": (q72_hourly_rollup_gapfill, Q72_SQL),
    "q76_locf_backfill": (q76_locf_backfill, Q76_SQL),
    "q108_event_trigrams": (q108_event_trigrams, Q108_SQL),
    "q109_cohort_retention": (q109_cohort_retention, Q109_SQL),
    "q110_sampled_quantiles": (q110_sampled_quantiles, Q110_SQL),
    "q115_transition_entropy": (q115_transition_entropy, Q115_SQL),
    "q117_incremental_agg": (q117_incremental_agg, Q117_SQL),
}
