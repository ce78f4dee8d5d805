"""Gold-layer analytics queries (reference: spark/batch_gold.py).

The reference builds four gold tables from the silver e-commerce model:
``orders_enriched`` (batch_gold.py:42-160), ``daily_sales_summary``
(:162-186), ``customer_segments`` (:188-222), ``product_performance``
(:224-256). Here the same shapes are transposed onto the TPC-H-ish test
tables (orders/lineitem/customer/part play orders/order_items/customers/
products — see FIXTURES.md §3) and re-expressed as declarative DataFrame
plans: Catalyst handles partial aggregation, join selection and column
pruning; AQE re-plans at runtime.

Determinism upgrades over the reference (SURVEY.md §4 "quirks to not
copy"): no bare ``first()`` (batch_gold.py:92) or ``dropDuplicates``
(batch_gold.py:97) — winners are chosen by total orders. Money aggregates
use exact scaled-integer sums (see plans/parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.dates import isodow
from .parity import exact_avg, exact_sum, o_avg, o_sum
from .registry import register

# ---------------------------------------------------------------------------
# orders_enriched — the flagship: per-order item rollup (A1) ⟕ orders ⟕
# customer (J1) with derived date parts and money rollups (P9).
# Scale notes: the groupBy(l_orderkey) agg is a partial+final hash agg;
# orders⟕items shuffles both sides on the same key (exchange reuse);
# customer is the small side and broadcasts under AQE at any SF where it
# fits, else shuffles by key after Catalyst prunes it to 4 columns.
# ---------------------------------------------------------------------------

ORDERS_ENRICHED_ORACLE = f"""
WITH items AS (
    SELECT
        l_orderkey,
        COUNT(*) AS item_count,
        SUM(l_quantity) AS total_qty,
        {o_sum('l_extendedprice', 'gross_revenue')},
        {o_sum('l_extendedprice * (1 - l_discount)', 'net_revenue')},
        COUNT(DISTINCT l_partkey) AS distinct_parts,
        COUNT(DISTINCT l_suppkey) AS distinct_suppliers
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT
    o.o_orderkey,
    o.o_custkey,
    o.o_orderstatus,
    o.o_orderpriority,
    o.o_totalprice AS order_total,
    CAST(o.o_orderdate AS DATE) AS order_date,
    CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
    CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
    CAST(isodow(o.o_orderdate) AS INTEGER) AS order_dow,
    c.c_name AS customer_name,
    c.c_mktsegment AS customer_segment,
    c.c_nationkey AS customer_nation,
    COALESCE(i.item_count, 0) AS item_count,
    COALESCE(i.total_qty, 0.0) AS total_qty,
    COALESCE(i.gross_revenue, 0.0) AS gross_revenue,
    COALESCE(i.net_revenue, 0.0) AS net_revenue,
    COALESCE(i.distinct_parts, 0) AS distinct_parts,
    COALESCE(i.distinct_suppliers, 0) AS distinct_suppliers
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
"""


def build_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    orders = spread(table(spark, sf_dir, "orders"), spark)
    customer = table(spark, sf_dir, "customer")

    items = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("item_count"),
        F.sum("l_quantity").alias("total_qty"),
        exact_sum("l_extendedprice", "gross_revenue"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net_revenue"),
        # r12 OPTIMIZATION (guide §2.3/§2.4): COUNT(DISTINCT) via a
        # bounded collect_set instead of the multi-distinct rewrite. Two
        # distinct aggs mixed with non-distinct ones made Catalyst Expand
        # every lineitem row 3× into the shuffle (2 Exchanges + 4
        # HashAggregates — plans/r12/orders_enriched_before.txt). The
        # per-order distinct domain is bounded by items-per-order (≤7 in
        # the TPC-H data model at ANY scale factor), so the per-group set
        # buffer is O(1) and one partial+final hash agg on l_orderkey
        # suffices. size() yields INT; the cast keeps the oracle's BIGINT.
        F.size(F.collect_set("l_partkey")).cast("long").alias("distinct_parts"),
        F.size(F.collect_set("l_suppkey")).cast("long").alias("distinct_suppliers"),
    )

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(items, orders.o_orderkey == items.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_totalprice").alias("order_total"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            isodow("o_orderdate").alias("order_dow"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("customer_segment"),
            F.col("c_nationkey").alias("customer_nation"),
            F.coalesce("item_count", F.lit(0)).alias("item_count"),
            F.coalesce("total_qty", F.lit(0.0)).alias("total_qty"),
            F.coalesce("gross_revenue", F.lit(0.0)).alias("gross_revenue"),
            F.coalesce("net_revenue", F.lit(0.0)).alias("net_revenue"),
            F.coalesce("distinct_parts", F.lit(0)).alias("distinct_parts"),
            F.coalesce("distinct_suppliers", F.lit(0)).alias("distinct_suppliers"),
        )
    )


register(
    "orders_enriched",
    oracle=ORDERS_ENRICHED_ORACLE,
    doc="Flagship: per-order lineitem rollup ⟕ orders ⟕ customer "
    "(reference batch_gold.py:42-160 transposed).",
    tags=("gold", "join", "agg", "flagship"),
)(build_orders_enriched)


# ---------------------------------------------------------------------------
# daily_sales_summary — group by order date (reference batch_gold.py:162-186).
# ---------------------------------------------------------------------------

DAILY_SALES_ORACLE = f"""
SELECT
    strftime(o_orderdate, '%Y-%m-%d') AS order_date,
    COUNT(*) AS total_orders,
    COUNT(DISTINCT o_custkey) AS unique_customers,
    {o_sum('o_totalprice', 'total_revenue')},
    {o_avg('o_totalprice', 'avg_order_value')},
    MAX(o_totalprice) AS max_order_value,
    MIN(o_totalprice) AS min_order_value
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY 1
"""


def build_daily_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    return (
        orders.filter(F.col("o_orderstatus") != "F")  # P4: status filter
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            exact_sum("o_totalprice", "total_revenue"),
            exact_avg("o_totalprice", "avg_order_value"),
            F.max("o_totalprice").alias("max_order_value"),
            F.min("o_totalprice").alias("min_order_value"),
        )
        .orderBy("order_date")  # O1: global sort (range-partitioned exchange)
    )


register(
    "daily_sales_summary",
    oracle=DAILY_SALES_ORACLE,
    doc="Daily sales rollup with status filter (batch_gold.py:162-186).",
    tags=("gold", "agg"),
)(build_daily_sales_summary)


# ---------------------------------------------------------------------------
# customer_rfm_segments — RFM metrics + CASE segmentation (batch_gold.py:
# 188-222). The global max date is fetched as a driver-side scalar (S12,
# batch_gold.py:195) — one row over the wire, fine at any scale.
# ---------------------------------------------------------------------------

RFM_ORACLE = f"""
WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_date FROM orders),
rfm AS (
    SELECT
        o_custkey,
        CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)), (SELECT max_date FROM maxd))
             AS INTEGER) AS recency_days,
        COUNT(*) AS frequency,
        {o_sum('o_totalprice', 'monetary')},
        {o_avg('o_totalprice', 'avg_order_value')},
        MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
        MAX(CAST(o_orderdate AS DATE)) AS last_order_date
    FROM orders
    GROUP BY o_custkey
)
SELECT
    *,
    CASE
        WHEN recency_days <= 180 AND frequency >= 12 THEN 'champion'
        WHEN recency_days <= 365 AND frequency >= 6 THEN 'loyal'
        WHEN recency_days <= 730 THEN 'active'
        WHEN recency_days <= 1460 THEN 'at_risk'
        ELSE 'hibernating'
    END AS segment
FROM rfm
"""


def build_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark).withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    max_date = orders.agg(F.max("order_date")).first()[0]  # S12 scalar fetch

    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(max_date), F.max("order_date")).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        exact_sum("o_totalprice", "monetary"),
        exact_avg("o_totalprice", "avg_order_value"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )
    # 4-way CASE segmentation (batch_gold.py:210-216 pattern, TPC-H date span)
    segment = (
        F.when((F.col("recency_days") <= 180) & (F.col("frequency") >= 12), "champion")
        .when((F.col("recency_days") <= 365) & (F.col("frequency") >= 6), "loyal")
        .when(F.col("recency_days") <= 730, "active")
        .when(F.col("recency_days") <= 1460, "at_risk")
        .otherwise("hibernating")
    )
    return rfm.withColumn("segment", segment)


register(
    "customer_rfm_segments",
    oracle=RFM_ORACLE,
    doc="RFM customer segmentation with CASE buckets (batch_gold.py:188-222).",
    tags=("gold", "agg", "case"),
)(build_customer_rfm_segments)


# ---------------------------------------------------------------------------
# product_performance — per-part sales rollup joined to part attributes
# (batch_gold.py:224-256). part joins un-hinted: AQE auto-broadcasts it
# while it fits the threshold and key-partitions beyond — an explicit hint
# would be honored even at 100 TB and OOM the driver.
# ---------------------------------------------------------------------------

PRODUCT_PERF_ORACLE = f"""
SELECT
    p.p_partkey,
    p.p_name,
    p.p_brand,
    p.p_type,
    COUNT(*) AS times_sold,
    COUNT(DISTINCT l.l_orderkey) AS distinct_orders,
    SUM(l.l_quantity) AS total_qty,
    {o_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
    {o_avg('l.l_extendedprice', 'avg_price')},
    {o_avg('l.l_discount', 'avg_discount')}
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name, p.p_brand, p.p_type
"""


def build_product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    part = table(spark, sf_dir, "part")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)  # J3
        .groupBy("p_partkey", "p_name", "p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("times_sold"),
            F.countDistinct("l_orderkey").alias("distinct_orders"),
            F.sum("l_quantity").alias("total_qty"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_discount"),
        )
    )


register(
    "product_performance",
    oracle=PRODUCT_PERF_ORACLE,
    doc="Per-product sales metrics, AQE-broadcast dim join (batch_gold.py:224-256).",
    tags=("gold", "agg", "broadcast"),
)(build_product_performance)


# ---------------------------------------------------------------------------
# payments_rollup — per-user event rollup with a DETERMINISTIC first()
# (reference batch_gold.py:90-94 used bare first(); here min_by over a
# total order (ts, event_id) — same single-shuffle aggregation).
# ---------------------------------------------------------------------------

PAYMENTS_ROLLUP_ORACLE = f"""
WITH firsts AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
agg AS (
    SELECT
        user_id,
        COUNT(*) AS event_count,
        {o_sum('value', 'total_value')},
        MAX(value) AS max_value,
        MAX(ts) AS last_event_ts
    FROM events
    GROUP BY user_id
)
SELECT a.user_id, a.event_count, a.total_value, a.max_value,
       f.event_type AS first_event_type, a.last_event_ts
FROM agg a
JOIN firsts f ON a.user_id = f.user_id AND f.rn = 1
"""


def build_payments_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        exact_sum("value", "total_value"),
        F.max("value").alias("max_value"),
        F.min_by("event_type", F.struct("ts", "event_id")).alias("first_event_type"),
        F.max("ts").alias("last_event_ts"),
    )


register(
    "payments_rollup",
    oracle=PAYMENTS_ROLLUP_ORACLE,
    doc="Per-user rollup with deterministic first() via min_by "
    "(batch_gold.py:90-94, determinism upgrade).",
    tags=("gold", "agg", "deterministic-first"),
)(build_payments_rollup)


# ---------------------------------------------------------------------------
# revenue_share_by_nation — ratio-to-report: each nation's revenue share of
# the grand total via an unpartitioned window sum over the (tiny) nation
# aggregate. The window runs over ≤25 rows, so the single-partition window
# is free; shares divide exact integer cent sums (one division, both
# engines identical).
# ---------------------------------------------------------------------------

REVENUE_SHARE_ORACLE = """
WITH n AS (
    SELECT n_name,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rev_c AS DOUBLE) / SUM(rev_c) OVER () AS revenue_share
FROM n
"""


def build_revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark)
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(scaled_long("o_totalprice")).alias("rev_c"))
    )
    w = Window.partitionBy()  # 25-row aggregate: single-partition is the plan
    return n.select(
        "n_name",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.col("rev_c").cast("double") / F.sum("rev_c").over(w)).alias(
            "revenue_share"
        ),
    )


register(
    "revenue_share_by_nation",
    oracle=REVENUE_SHARE_ORACLE,
    doc="Ratio-to-report: nation revenue share via window total over the "
    "25-row nation aggregate (exact cent sums, one division).",
    tags=("gold", "window", "bi"),
)(build_revenue_share_by_nation)


# ---------------------------------------------------------------------------
# yoy_monthly_growth — year-over-year monthly revenue growth via a
# (y-1, m) self-join on the monthly series (calendar-correct even when a
# month is absent — a row-offset lag(12) would silently misalign there).
# Growth divides exact cent integers; months without a prior-year
# counterpart get NULL growth on both engines.
# ---------------------------------------------------------------------------

YOY_ORACLE = """
WITH m AS (
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS y,
           CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS m,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders GROUP BY 1, 2
)
SELECT cur.y, cur.m,
       CAST(cur.rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(cur.rev_c - prev.rev_c AS DOUBLE) / prev.rev_c AS yoy_growth
FROM m cur
LEFT JOIN m prev ON prev.y = cur.y - 1 AND prev.m = cur.m
"""


def build_yoy_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    orders = table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).alias("y"),
        F.month(F.col("o_orderdate").cast("date")).alias("m"),
    ).agg(F.sum(scaled_long("o_totalprice")).alias("rev_c"))
    # self-join on (y-1, m), not lag(12): a row-offset lag silently pairs
    # the wrong months whenever a calendar month is absent from the data.
    # The monthly aggregate is calendar-sized, so the join broadcasts.
    prev = m.select(
        (F.col("y") + 1).alias("y"),
        F.col("m").alias("m"),
        F.col("rev_c").alias("prev_rev_c"),
    )
    return m.join(F.broadcast(prev), ["y", "m"], "left").select(
        "y",
        "m",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (
            (F.col("rev_c") - F.col("prev_rev_c")).cast("double")
            / F.col("prev_rev_c")
        ).alias("yoy_growth"),
    )


register(
    "yoy_monthly_growth",
    oracle=YOY_ORACLE,
    doc="Year-over-year growth: lag(12) over the monthly revenue series "
    "(exact cent integers; NULL where no prior-year month).",
    tags=("gold", "window", "bi"),
)(build_yoy_monthly_growth)


# ---------------------------------------------------------------------------
# cumulative_customer_reach — running distinct customers per day WITHOUT a
# distinct-in-window (which neither engine does scalably): flag each
# customer's FIRST order via row_number, count first-orders per day, then
# a running sum — the standard decomposition that turns an O(n·days)
# distinct scan into two hash aggregates + a calendar-sized window.
# ---------------------------------------------------------------------------

REACH_ORACLE = """
WITH firsts AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
    FROM orders
),
daily AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS new_customers
    FROM firsts WHERE rn = 1 GROUP BY d
)
SELECT d, new_customers,
       CAST(SUM(new_customers) OVER (
           ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS total_reach
FROM daily
"""


def build_cumulative_customer_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w_first = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    firsts = orders.select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w_first).alias("rn"),
    ).filter(F.col("rn") == 1)
    daily = firsts.groupBy("d").agg(F.count(F.lit(1)).alias("new_customers"))
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "d",
        "new_customers",
        F.sum("new_customers").over(w_run).cast("long").alias("total_reach"),
    )


register(
    "cumulative_customer_reach",
    oracle=REACH_ORACLE,
    doc="Running distinct customers decomposed as first-order flags + "
    "daily counts + running sum (no distinct-in-window; two hash aggs "
    "and a calendar-sized window).",
    tags=("gold", "window", "bi"),
)(build_cumulative_customer_reach)


# ---------------------------------------------------------------------------
# customer_pareto — revenue concentration (the 80/20 curve): customers
# ranked by revenue, each with its cumulative share of the total. Two
# exact-integer aggregates + one rank window over the customer aggregate
# (orders-sized shuffle only in the first agg).
# ---------------------------------------------------------------------------

PARETO_ORACLE = """
WITH c AS (
    SELECT o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS revenue_rank,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(SUM(rev_c) OVER (
            ORDER BY rev_c DESC, o_custkey ASC
            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / SUM(rev_c) OVER () AS cum_share
FROM c
WINDOW w AS (ORDER BY rev_c DESC, o_custkey ASC)
"""


def build_customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import global_rank_cumsum
    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark)
    c = orders.groupBy("o_custkey").agg(
        F.sum(scaled_long("o_totalprice")).alias("rev_c")
    )
    # VERDICT r4 task 1: the rank AND the running revenue sum both ran in
    # ONE no-partition window over ALL customers — the 100 TB cliff.
    # global_rank_cumsum distributes both: value-range buckets on the
    # negated cent revenue (DESC order as an ASC sort), bucket-local
    # window + broadcast count/sum offsets; the cum-share denominator
    # falls out of the same bucket-sized collect.
    c = c.withColumn("_neg_rev", (-F.col("rev_c")).cast("double"))
    ranked, _, total_rev = global_rank_cumsum(
        c,
        ["_neg_rev", "o_custkey"],
        sum_col="rev_c",
        out_col="revenue_rank",
        cumsum_col="_cum_rev",
    )
    return ranked.select(
        "o_custkey",
        F.col("revenue_rank").cast("long").alias("revenue_rank"),
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (
            F.col("_cum_rev").cast("double") / F.lit(total_rev).cast("double")
        ).alias("cum_share"),
    )


register(
    "customer_pareto",
    oracle=PARETO_ORACLE,
    doc="Revenue concentration curve: rank + cumulative share over the "
    "customer aggregate (exact cent integers; total order tie-break).",
    tags=("gold", "window", "bi"),
)(build_customer_pareto)


# ---------------------------------------------------------------------------
# basket_part_pairs — market-basket pair mining: parts co-occurring in the
# same order, top 20 pairs. The self-join is keyed on the order and order
# sizes are small (≤7 items), so pair fan-out is bounded per key — the
# same boundedness argument as the dedup candidate joins, with the pair
# count as the mined signal rather than a similarity score.
# ---------------------------------------------------------------------------

BASKET_ORACLE = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part1, b.l_partkey AS part2,
       CAST(COUNT(*) AS BIGINT) AS n_orders_together
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders_together DESC, part1 ASC, part2 ASC
LIMIT 20
"""


def build_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part1")
    )
    b = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part2")
    )
    return (
        a.join(b, "k")
        .filter(F.col("part1") < F.col("part2"))
        .groupBy("part1", "part2")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .orderBy(
            F.col("n_orders_together").desc(),
            F.col("part1").asc(),
            F.col("part2").asc(),
        )
        .limit(20)
    )


register(
    "basket_part_pairs",
    oracle=BASKET_ORACLE,
    doc="Market-basket pair mining: order-keyed self-join (pair fan-out "
    "bounded by basket size), deterministic top-20 co-occurrences.",
    tags=("gold", "join", "bi"),
)(build_basket_part_pairs)


# ---------------------------------------------------------------------------
# cohort_ltv_triangle — the LTV triangle: customers grouped by first-order
# month (cohort), revenue accumulated by months-since-first (age). Two
# aggregates + one window: first-order month per customer (min), revenue
# per (cohort, age) cell, then the running LTV along each cohort row.
# Exact cent integers throughout; age arithmetic on integer month counts.
# ---------------------------------------------------------------------------

LTV_ORACLE = """
WITH firsts AS (
    SELECT o_custkey,
           MIN(CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) * 12
               + CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) - 1)
               AS cohort_m
    FROM orders GROUP BY o_custkey
),
cells AS (
    SELECT f.cohort_m,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) * 12
               + CAST(month(CAST(o.o_orderdate AS DATE)) AS BIGINT) - 1
               - f.cohort_m AS age_months,
           SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
)
SELECT cohort_m, age_months,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(SUM(rev_c) OVER (
           PARTITION BY cohort_m ORDER BY age_months
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS cum_ltv
FROM cells
"""


def build_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark)
    month_num = (
        F.year(F.col("o_orderdate").cast("date")).cast("long") * 12
        + F.month(F.col("o_orderdate").cast("date")).cast("long")
        - 1
    )
    firsts = orders.groupBy("o_custkey").agg(F.min(month_num).alias("cohort_m"))
    cells = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_m", (month_num - F.col("cohort_m")).alias("age_months")
        )
        .agg(F.sum(scaled_long("o_totalprice")).alias("rev_c"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_m",
        "age_months",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.sum("rev_c").over(w).cast("double") / 100.0).alias("cum_ltv"),
    )


register(
    "cohort_ltv_triangle",
    oracle=LTV_ORACLE,
    doc="Cohort LTV triangle: first-order-month cohorts x months-since "
    "age, running revenue along each cohort (exact cents; integer month "
    "arithmetic).",
    tags=("gold", "window", "bi"),
)(build_cohort_ltv_triangle)


# ---------------------------------------------------------------------------
# nation_share_of_region — hierarchical percent-of-parent: each nation's
# revenue as a share of its region (two-level rollup ratio). The window
# partitions over the 25-row nation aggregate — free; the only real
# shuffle is the orders aggregation.
# ---------------------------------------------------------------------------

NATION_SHARE_ORACLE = """
WITH n AS (
    SELECT r_name, n_name,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rev_c AS DOUBLE) / SUM(rev_c) OVER (PARTITION BY r_name)
           AS share_of_region
FROM n
"""


def build_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark)
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    n = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(scaled_long("o_totalprice")).alias("rev_c"))
    )
    w = Window.partitionBy("r_name")
    return n.select(
        "r_name",
        "n_name",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.col("rev_c").cast("double") / F.sum("rev_c").over(w)).alias(
            "share_of_region"
        ),
    )


register(
    "nation_share_of_region",
    oracle=NATION_SHARE_ORACLE,
    doc="Hierarchical percent-of-parent: nation revenue share within its "
    "region via a partitioned window over the 25-row aggregate.",
    tags=("gold", "window", "bi"),
)(build_nation_share_of_region)


# ---------------------------------------------------------------------------
# brand_rank_stability — rank-over-time comparison: each brand's revenue
# rank per year vs its previous-year rank (self-join on year-1, the
# calendar-correct form, as in yoy_monthly_growth). Rank deltas are what
# a category manager actually reads off the YoY numbers.
# ---------------------------------------------------------------------------

RANK_STABILITY_ORACLE = """
WITH b AS (
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS y,
           p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS rev_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
r AS (
    SELECT y, p_brand, rev_c,
           CAST(RANK() OVER (PARTITION BY y ORDER BY rev_c DESC, p_brand ASC)
                AS BIGINT) AS rnk
    FROM b
)
SELECT cur.y, cur.p_brand,
       CAST(cur.rev_c AS DOUBLE) / 100.0 AS revenue,
       cur.rnk AS rank_now,
       prev.rnk AS rank_prev,
       prev.rnk - cur.rnk AS rank_delta
FROM r cur
LEFT JOIN r prev ON prev.y = cur.y - 1 AND prev.p_brand = cur.p_brand
"""


def build_brand_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    b = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y"), "p_brand"
        )
        .agg(F.sum(scaled_long("l_extendedprice")).alias("rev_c"))
    )
    w = Window.partitionBy("y").orderBy(F.col("rev_c").desc(), F.col("p_brand").asc())
    r = b.withColumn("rnk", F.rank().over(w).cast("long"))
    prev = r.select(
        (F.col("y") + 1).alias("y"),
        F.col("p_brand"),
        F.col("rnk").alias("rank_prev"),
    )
    return r.join(F.broadcast(prev), ["y", "p_brand"], "left").select(
        "y",
        "p_brand",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        F.col("rnk").alias("rank_now"),
        "rank_prev",
        (F.col("rank_prev") - F.col("rnk")).alias("rank_delta"),
    )


register(
    "brand_rank_stability",
    oracle=RANK_STABILITY_ORACLE,
    doc="Rank-over-time: per-year brand revenue rank vs previous year "
    "((y-1) self-join, total-order rank tie-break) with rank deltas.",
    tags=("gold", "window", "bi"),
)(build_brand_rank_stability)


# ---------------------------------------------------------------------------
# customer_wallet_share — share-of-wallet: the fraction of each
# customer's spend captured by their top brand (per-(customer, brand)
# sums, then a per-customer window max over the small aggregate). The
# loyalty metric; winner brand is total-order deterministic.
# ---------------------------------------------------------------------------

WALLET_ORACLE = """
WITH cb AS (
    SELECT o_custkey, p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS rev_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
r AS (
    SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY rev_c DESC, p_brand ASC) AS rn,
           SUM(rev_c) OVER (PARTITION BY o_custkey) AS total_c
    FROM cb
)
SELECT o_custkey,
       p_brand AS top_brand,
       CAST(rev_c AS DOUBLE) / 100.0 AS top_brand_spend,
       CAST(total_c AS DOUBLE) / 100.0 AS total_spend,
       CAST(rev_c AS DOUBLE) / total_c AS wallet_share
FROM r WHERE rn = 1
"""


def build_customer_wallet_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .parity import scaled_long

    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    cb = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "p_brand")
        .agg(F.sum(scaled_long("l_extendedprice")).alias("rev_c"))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("rev_c").desc(), F.col("p_brand").asc()
    )
    wt = Window.partitionBy("o_custkey")
    r = cb.withColumn("rn", F.row_number().over(w)).withColumn(
        "total_c", F.sum("rev_c").over(wt)
    )
    return r.filter(F.col("rn") == 1).select(
        "o_custkey",
        F.col("p_brand").alias("top_brand"),
        (F.col("rev_c").cast("double") / 100.0).alias("top_brand_spend"),
        (F.col("total_c").cast("double") / 100.0).alias("total_spend"),
        (F.col("rev_c").cast("double") / F.col("total_c")).alias("wallet_share"),
    )


register(
    "customer_wallet_share",
    oracle=WALLET_ORACLE,
    doc="Share-of-wallet: each customer's top brand and its spend share "
    "(deterministic winner, per-customer window over the small "
    "aggregate).",
    tags=("gold", "window", "bi"),
)(build_customer_wallet_share)


# ---------------------------------------------------------------------------
# supplier_hhi_by_type — market concentration (Herfindahl–Hirschman
# index) of suppliers within each part type: HHI = Σ share_i². Computed
# on whole-dollar integer revenues (cents div 100 — identical on both
# engines) so the squared sums stay inside BIGINT at scale; one division
# at the end.
# ---------------------------------------------------------------------------

HHI_ORACLE = """
WITH s AS (
    SELECT p_type, l_suppkey,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) // 100 AS dollars
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
a AS (
    SELECT p_type, l_suppkey, CAST(SUM(dollars) AS BIGINT) AS rev_d
    FROM s GROUP BY 1, 2
)
SELECT p_type,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev_d) AS BIGINT) AS total_dollars,
       CAST(SUM(rev_d * rev_d) AS DOUBLE)
           / (CAST(SUM(rev_d) AS DOUBLE) * SUM(rev_d)) AS hhi
FROM a GROUP BY p_type
"""


def build_supplier_hhi_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    part = table(spark, sf_dir, "part")
    s = lineitem.join(part, lineitem.l_partkey == part.p_partkey).select(
        "p_type",
        "l_suppkey",
        F.expr(
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) div 100"
        ).alias("dollars"),
    )
    a = s.groupBy("p_type", "l_suppkey").agg(F.sum("dollars").alias("rev_d"))
    return a.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_d").alias("total_dollars"),
        (
            F.sum(F.col("rev_d") * F.col("rev_d")).cast("double")
            / (F.sum("rev_d").cast("double") * F.sum("rev_d"))
        ).alias("hhi"),
    )


register(
    "supplier_hhi_by_type",
    oracle=HHI_ORACLE,
    doc="Market concentration per part type: Herfindahl index on whole-"
    "dollar integer revenues (squared sums stay in BIGINT; one final "
    "division).",
    tags=("gold", "agg", "bi"),
)(build_supplier_hhi_by_type)


# ---------------------------------------------------------------------------
# supplier_geo_reach — distribution reach: how many distinct customer
# nations each supplier ships to, plus order volume. countDistinct over
# the 3-way join; dims broadcast, the fact join shuffles once.
# ---------------------------------------------------------------------------

GEO_REACH_ORACLE = """
SELECT s_suppkey, s_name,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_customer_nations,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY s_suppkey, s_name
"""


def build_supplier_geo_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spread(table(spark, sf_dir, "lineitem"), spark)
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.countDistinct("c_nationkey").alias("n_customer_nations"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


register(
    "supplier_geo_reach",
    oracle=GEO_REACH_ORACLE,
    doc="Supplier distribution reach: distinct customer nations + orders "
    "served (multi-countDistinct over the broadcast-dim fact join).",
    tags=("gold", "agg", "bi"),
)(build_supplier_geo_reach)


# ---------------------------------------------------------------------------
# size_price_correlation — EXACT-input Pearson r per brand: all five
# moments (Σx, Σy, Σxy, Σx², Σy²) are exact integer sums (size is a
# small int, price in cents), and r is assembled with the IDENTICAL
# expression on both engines — sqrt is IEEE-correctly-rounded, so the
# doubles agree bit-for-bit. The builtin corr() accumulates in floats
# and is order-sensitive; this decomposition is not.
# ---------------------------------------------------------------------------

CORRELATION_ORACLE = """
WITH m AS (
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p_size) AS BIGINT) AS sx,
           CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM(p_size * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
                AS BIGINT) AS sxy,
           CAST(SUM(p_size * p_size) AS BIGINT) AS sxx,
           CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)
                    * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS syy
    FROM part GROUP BY p_brand
)
SELECT p_brand, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
FROM m
"""


def build_size_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    part = spread(table(spark, sf_dir, "part"), spark)
    cents = scaled_long("p_retailprice")
    m = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p_size").cast("long")).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(F.col("p_size").cast("long") * cents).alias("sxy"),
        F.sum(F.col("p_size").cast("long") * F.col("p_size")).alias("sxx"),
        F.sum(cents * cents).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select("p_brand", "n", (num / den).alias("pearson_r"))


register(
    "size_price_correlation",
    oracle=CORRELATION_ORACLE,
    doc="Exact-input Pearson r per brand: five integer moments + the "
    "identical sqrt expression on both engines (order-insensitive, "
    "unlike float-accumulating corr()).",
    tags=("gold", "agg", "stats"),
)(build_size_price_correlation)


# ---------------------------------------------------------------------------
# revenue_gini — Gini concentration coefficient of customer revenue per
# nation (the inequality number next to customer_pareto's curve). The
# rank-sum identity G = (2*Σ rnk·x − (n+1)·Σx) / (n·Σx) over cents
# integers: every accumulation is an exact int (rnk·cents stays under
# int64 up to ~1e6 customers/nation at these revenue magnitudes — shard
# the partition or rescale beyond that), and the single final division
# is the same IEEE op on both engines. Rank is total-ordered
# (cents, custkey), so ties are deterministic.
# Scale shape: one agg on o_custkey, one window partitioned by nation,
# one final agg — all on uniform keys.
# ---------------------------------------------------------------------------

REVENUE_GINI_ORACLE = """
WITH rev AS (
    SELECT o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
),
j AS (
    SELECT n_name, c_custkey, cents
    FROM rev
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
),
r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY n_name ORDER BY cents, c_custkey
    ) AS rnk
    FROM j
)
SELECT
    n_name,
    CAST(COUNT(*) AS BIGINT) AS n_customers,
    CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue,
    CAST(2 * SUM(rnk * cents) - (COUNT(*) + 1) * SUM(cents) AS DOUBLE)
        / CAST(COUNT(*) * SUM(cents) AS DOUBLE) AS gini
FROM r
GROUP BY n_name
"""


def build_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .parity import scaled_long

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(scaled_long("o_totalprice")).alias("cents")
    )
    j = (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "cents")
    )
    r = j.withColumn(
        "rnk",
        F.row_number().over(W.partitionBy("n_name").orderBy("cents", "c_custkey")),
    )
    n = F.count(F.lit(1))
    tot = F.sum("cents")
    s = F.sum(F.col("rnk") * F.col("cents"))
    return r.groupBy("n_name").agg(
        n.alias("n_customers"),
        (tot.cast("double") / 100.0).alias("total_revenue"),
        (
            (2 * s - (n + 1) * tot).cast("double") / (n * tot).cast("double")
        ).alias("gini"),
    )


register(
    "revenue_gini",
    oracle=REVENUE_GINI_ORACLE,
    doc="Per-nation Gini coefficient of customer revenue via the exact "
    "integer rank-sum identity (deterministic tie order; single final "
    "division).",
    tags=("gold", "agg", "stats", "window"),
)(build_revenue_gini)
