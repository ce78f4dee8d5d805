"""The 7 materialized-view aggregates (clickhouse_init/04_materialized_views.sql).

The reference pre-aggregates its star schema into 7 SummingMergeTree MVs
(daily, monthly, category, state, seller, payment, hourly — 04:11-126).
In this engine each MV is a declarative Spark aggregation: batch = Catalyst
partial+final hash agg (the SummingMergeTree analogue — map-side partials
merge per key); the streaming variant of the same queries lives in
``streaming/aggregates.py`` (watermarked windowed aggregation,
outputMode=update).

Dims join before grouping exactly as the MVs do (J5: fact ⟕ dim on key;
dims broadcast — they are orders of magnitude smaller than facts at every
scale, which is what makes these plans survive 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.dates import isodow
from .parity import exact_avg, exact_sum, o_avg, o_sum
from .registry import register

# ---------------------------------------------------------------------------
# A9 — mv_daily_sales (04_materialized_views.sql:11-25) on lineitem grain.
#
# r13 MEASURED AND REJECTED (guide §1.1 "a fresh implementation of the
# ideal plan is usually slower at first"): splitting the two
# countDistincts out of this aggregate (and mv_seller_performance's and
# mv_daily_sales_approx's exact leg) into independent no-Expand legs
# null-safe-joined back on the group grain. The Expand does triple the
# rows entering the widest shuffle — the 100 TB argument is real — but
# the interleaved bench A/B at sf0.1 read the split STRICTLY SLOWER
# (medians: daily 2.42 vs 2.04 s, seller 3.57 vs 2.73 s, approx 3.31 vs
# 3.05 s; oracle-exact at 3 SFs before reverting): per-pass plan
# compilation of 3 aggregation subtrees + 2 extra joins + re-scanning /
# re-joining the fact per leg outweighs the Expand at this data size,
# and even the 10x in-process probe was only ~1.1x in the split's
# favor. Revisit only with a cluster-scale measurement where the
# Expand's 3x shuffle rows dominate plan/stage fixed costs. (The fused
# HLL+exact variant of the approx query WAS split in r12 — that one
# measured 26x/decade pathological, a different regime: HLL sketch
# buffers inside the Expand, megabytes per group.)
# ---------------------------------------------------------------------------

MV_DAILY_ORACLE = f"""
SELECT
    CAST(l_shipdate AS DATE) AS ship_date,
    COUNT(*) AS n_items,
    COUNT(DISTINCT l_orderkey) AS n_orders,
    COUNT(DISTINCT l_partkey) AS n_parts,
    SUM(l_quantity) AS total_qty,
    {o_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
    {o_avg('l_extendedprice', 'avg_price')},
    {o_avg('l_discount', 'avg_discount')}
FROM lineitem
GROUP BY 1
"""


def build_mv_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    return li.groupBy(F.col("l_shipdate").cast("date").alias("ship_date")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("l_quantity").alias("total_qty"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        exact_avg("l_extendedprice", "avg_price"),
        exact_avg("l_discount", "avg_discount"),
    )


register(
    "mv_daily_sales",
    oracle=MV_DAILY_ORACLE,
    doc="Daily item-grain MV (04_materialized_views.sql:11-25).",
    tags=("mv", "agg"),
)(build_mv_daily_sales)


# ---------------------------------------------------------------------------
# A10 — mv_monthly_sales (04:30-42), delivered-only analog filter.
# ---------------------------------------------------------------------------

MV_MONTHLY_ORACLE = f"""
SELECT
    CAST(year(o_orderdate) AS INTEGER) AS y,
    CAST(month(o_orderdate) AS INTEGER) AS m,
    COUNT(*) AS n_orders,
    COUNT(DISTINCT o_custkey) AS n_customers,
    {o_sum('o_totalprice', 'revenue')},
    {o_avg('o_totalprice', 'avg_order_value')}
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY 1, 2
"""


def build_mv_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            exact_sum("o_totalprice", "revenue"),
            exact_avg("o_totalprice", "avg_order_value"),
        )
    )


register(
    "mv_monthly_sales",
    oracle=MV_MONTHLY_ORACLE,
    doc="Monthly MV with delivered-analog filter (04_materialized_views.sql:30-42).",
    tags=("mv", "agg"),
)(build_mv_monthly_sales)


# ---------------------------------------------------------------------------
# A11 — mv_category_sales (04:47-59): join product dim, group by category.
# p_type plays the category; part joins un-hinted — AQE broadcasts it
# under the auto threshold, key-partitions at scale (J5).
# ---------------------------------------------------------------------------

MV_CATEGORY_ORACLE = f"""
SELECT
    p.p_type AS category,
    COUNT(*) AS n_items,
    COUNT(DISTINCT l.l_orderkey) AS n_orders,
    SUM(l.l_quantity) AS total_qty,
    {o_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
    {o_avg('l.l_extendedprice * (1 - l.l_discount)', 'avg_item_revenue')}
FROM lineitem l
LEFT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
"""


def build_mv_category_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    part = table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey, "left")
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum("l_quantity").alias("total_qty"),
            exact_sum(net, "revenue"),
            exact_avg(net, "avg_item_revenue"),
        )
    )


register(
    "mv_category_sales",
    oracle=MV_CATEGORY_ORACLE,
    doc="Category MV: AQE-broadcast dim join then group (04_materialized_views.sql:47-59).",
    tags=("mv", "agg", "broadcast"),
)(build_mv_category_sales)


# ---------------------------------------------------------------------------
# A12 — mv_state_sales (04:64-76): customer geo dim, group by nation.
# ---------------------------------------------------------------------------

MV_STATE_ORACLE = f"""
SELECT
    n.n_name AS nation,
    r.r_name AS region,
    COUNT(*) AS n_orders,
    COUNT(DISTINCT o.o_custkey) AS n_customers,
    {o_sum('o.o_totalprice', 'revenue')},
    {o_avg('o.o_totalprice', 'avg_order_value')}
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


def build_mv_state_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            exact_sum("o_totalprice", "revenue"),
            exact_avg("o_totalprice", "avg_order_value"),
        )
    )


register(
    "mv_state_sales",
    oracle=MV_STATE_ORACLE,
    doc="Geo MV: snowflaked dims then group (04_materialized_views.sql:64-76).",
    tags=("mv", "agg", "broadcast"),
)(build_mv_state_sales)


# ---------------------------------------------------------------------------
# A13 — mv_seller_performance (04:81-96): multi-col seller grouping.
# ---------------------------------------------------------------------------

MV_SELLER_ORACLE = f"""
SELECT
    s.s_suppkey,
    s.s_name,
    n.n_name AS nation,
    COUNT(*) AS n_items,
    COUNT(DISTINCT l.l_orderkey) AS n_orders,
    COUNT(DISTINCT l.l_partkey) AS n_parts,
    {o_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
    {o_avg('l.l_discount', 'avg_discount')}
FROM lineitem l
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY s.s_suppkey, s.s_name, n.n_name
"""


def build_mv_seller_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey, "left")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            exact_avg("l_discount", "avg_discount"),
        )
    )


register(
    "mv_seller_performance",
    oracle=MV_SELLER_ORACLE,
    doc="Seller MV: multi-column grouping after dim joins "
    "(04_materialized_views.sql:81-96).",
    tags=("mv", "agg", "broadcast"),
)(build_mv_seller_performance)


# ---------------------------------------------------------------------------
# A14 — mv_payment_analysis (04:101-112): events play payments.
# ---------------------------------------------------------------------------

MV_PAYMENT_ORACLE = f"""
SELECT
    event_type,
    COUNT(*) AS n_events,
    COUNT(DISTINCT user_id) AS n_users,
    {o_sum('value', 'total_value')},
    {o_avg('value', 'avg_value')},
    MIN(value) AS min_value,
    MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


def build_mv_payment_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum("value", "total_value"),
        exact_avg("value", "avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


register(
    "mv_payment_analysis",
    oracle=MV_PAYMENT_ORACLE,
    doc="Payment-type MV on the event stream (04_materialized_views.sql:101-112).",
    tags=("mv", "agg"),
)(build_mv_payment_analysis)


# ---------------------------------------------------------------------------
# A15 — mv_hourly_pattern (04:117-126): (hour, iso dow) grid.
# ---------------------------------------------------------------------------

MV_HOURLY_ORACLE = f"""
SELECT
    CAST(hour(ts) AS INTEGER) AS hr,
    CAST(isodow(ts) AS INTEGER) AS dow_mon1,
    COUNT(*) AS n_events,
    COUNT(DISTINCT user_id) AS n_users,
    {o_sum('value', 'total_value')},
    {o_avg('value', 'avg_value')}
FROM events
GROUP BY 1, 2
"""


def build_mv_hourly_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    return events.groupBy(
        F.hour("ts").alias("hr"),
        isodow("ts").alias("dow_mon1"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum("value", "total_value"),
        exact_avg("value", "avg_value"),
    )


register(
    "mv_hourly_pattern",
    oracle=MV_HOURLY_ORACLE,
    doc="Hour×ISO-dow pattern MV (04_materialized_views.sql:117-126; "
    "ClickHouse toDayOfWeek parity via weekday()+1).",
    tags=("mv", "agg"),
)(build_mv_hourly_pattern)


# ---------------------------------------------------------------------------
# mv_daily_sales_approx — the 100 TB variant of mv_daily_sales: HLL
# approx_count_distinct replaces the exact distincts in the serving path,
# removing the Expand (3x row inflation) and the per-key distinct state.
# Oracled as a CONTRACT CHECK (VERDICT r8 task 1, the hll_vocab_report
# pattern): the engine-specific sketch value never enters the output —
# instead the query emits the exact distincts (the audit side) and a
# tolerance boolean per sketch, which is deterministically TRUE (the 10%
# tolerance is >5 sigma for rsd=0.02), so DuckDB can verify every
# column. At 100 TB production serves the HLL side; this registered
# report IS the validation query that certifies it.
# ---------------------------------------------------------------------------

_MV_HLL_RSD = 0.02
_MV_HLL_TOL = 0.10
_MV_HLL_ABS = 5.0


def build_mv_daily_sales_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    day = F.col("l_shipdate").cast("date").alias("ship_date")
    # The exact and HLL legs run as SEPARATE aggregations joined on the
    # day key (r12; caught by the 10x suite anchor). Mixing them in one
    # agg puts the HLL buffers inside the multiple-distinct Expand
    # rewrite: every (day, orderkey)/(day, partkey) partial-agg group —
    # ~2 rows per input row — then carries the full aggregation buffer
    # INCLUDING two ~4K-register HLL sketches, megabytes of state per
    # day turned into gigabytes of hashed/spilled partials. Measured at
    # 10x: 180.5 s fused vs ~6 s split (the exact leg prices like
    # mv_daily_sales, 3.1 s; the HLL leg is a single no-Expand pass).
    # The join key is |distinct ship_date| rows (~2.5k at any SF) so
    # the join is broadcast-trivial, and the HLL-only leg IS the 100 TB
    # serving plan this query exists to certify.
    exact = li.groupBy(day).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.sum("l_quantity").alias("total_qty"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )
    hll = li.groupBy(day).agg(
        F.approx_count_distinct("l_orderkey", rsd=_MV_HLL_RSD).alias("ao"),
        F.approx_count_distinct("l_partkey", rsd=_MV_HLL_RSD).alias("ap"),
    )
    agg = exact.join(F.broadcast(hll), "ship_date")

    def within(approx, exact):
        # combined bound: relative for large groups, absolute floor for
        # tiny ones (Spark's HLL++ has no exact sparse mode — a ~20-
        # distinct day can be off by 2-3 registers, breaching a pure 10%;
        # probed margins at sf0.001/0.01/0.1: worst abs err 3 vs floor 5,
        # worst large-group err well under 10%)
        return F.abs(F.col(approx) - F.col(exact)) <= F.greatest(
            F.col(exact) * F.lit(_MV_HLL_TOL), F.lit(_MV_HLL_ABS)
        )

    return agg.select(
        "ship_date",
        "n_items",
        "exact_orders",
        "exact_parts",
        within("ao", "exact_orders").alias("orders_within_tol"),
        within("ap", "exact_parts").alias("parts_within_tol"),
        "total_qty",
        "revenue",
    )


MV_DAILY_APPROX_ORACLE = f"""
SELECT
    CAST(l_shipdate AS DATE) AS ship_date,
    COUNT(*) AS n_items,
    COUNT(DISTINCT l_orderkey) AS exact_orders,
    COUNT(DISTINCT l_partkey) AS exact_parts,
    TRUE AS orders_within_tol,
    TRUE AS parts_within_tol,
    SUM(l_quantity) AS total_qty,
    {o_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
GROUP BY 1
"""


register(
    "mv_daily_sales_approx",
    oracle=MV_DAILY_APPROX_ORACLE,
    doc="mv_daily_sales with HLL approx_count_distinct (rsd=0.02) — the "
    "no-Expand scale variant, oracled as a contract check: exact "
    "distincts + a max(10%, abs 5)-tolerance boolean per sketch "
    "(deterministically TRUE) instead of the engine-specific estimate.",
    tags=("mv", "agg", "approx"),
)(build_mv_daily_sales_approx)


# ---------------------------------------------------------------------------
# value_dispersion_stats — variance/stddev done exactly: integer sums
# (S1, S2) are order-independent; the final (n*S2 - S1^2)/n^2 runs the
# identical IEEE sequence on both engines -> bit-identical doubles with
# no tolerance. (Reference uses no dispersion aggregates; engine
# completeness for the MV family.)
# ---------------------------------------------------------------------------

DISPERSION_ORACLE = """
WITH s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s1,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
               * CAST(ROUND(value * 100, 0) AS BIGINT)) AS s2
    FROM events GROUP BY event_type
)
SELECT
    event_type,
    n,
    (CAST(s1 AS DOUBLE) / 100.0) / n AS mean_value,
    ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0 AS var_pop,
    sqrt(((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 100.0 AS stddev_pop
FROM s
"""


def build_value_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    var_cents = ((nd * s2d) - (s1d * s1d)) / (nd * nd)
    return s.select(
        "event_type",
        "n",
        ((s1d / 100.0) / F.col("n")).alias("mean_value"),
        (var_cents / 10000.0).alias("var_pop"),
        (F.sqrt(var_cents) / 100.0).alias("stddev_pop"),
    )


register(
    "value_dispersion_stats",
    oracle=DISPERSION_ORACLE,
    doc="Exact population variance/stddev per event type via integer "
    "S1/S2 sums + identical IEEE finishing sequence.",
    tags=("mv", "agg", "dispersion"),
)(build_value_dispersion_stats)


# ---------------------------------------------------------------------------
# salted_status_rollup — the skew-safe two-phase aggregation from
# operators/skew.py in the oracle-checked surface: o_orderstatus is a
# 3-value key (maximal skew — each key is a third of the table), exactly the
# shape where single-phase groupBy funnels everything to 3 reducers.
# The salted plan's result is algebraically identical to the plain
# GROUP BY, which is what the oracle asserts.
# ---------------------------------------------------------------------------

SALTED_ROLLUP_ORACLE = """
SELECT
    o_orderstatus,
    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
        AS revenue_exact_cents,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    MIN(o_orderkey) AS min_orderkey,
    MAX(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_orderstatus
"""


def build_salted_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import salted_aggregate
    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark).withColumn(
        "_cents", scaled_long("o_totalprice")
    )
    out = salted_aggregate(
        orders,
        ["o_orderstatus"],
        {
            "revenue_cents": ("_cents", "sum"),
            "n_orders": ("o_orderkey", "count"),
            "min_orderkey": ("o_orderkey", "min"),
            "max_orderkey": ("o_orderkey", "max"),
        },
        n_salts=8,
    )
    return out.select(
        "o_orderstatus",
        (F.col("revenue_cents").cast("double") / 100.0).alias("revenue_exact_cents"),
        "n_orders",
        "min_orderkey",
        "max_orderkey",
    )


register(
    "salted_status_rollup",
    oracle=SALTED_ROLLUP_ORACLE,
    doc="Two-phase salted aggregation on a 3-value (maximally skewed) key; "
    "oracle asserts algebraic equality with the plain GROUP BY.",
    tags=("mv", "agg", "skew"),
)(build_salted_status_rollup)


# ---------------------------------------------------------------------------
# salted_customer_join — operators/skew.salted_join in the oracle-checked
# surface: the left (fact) side is salted S ways and the dim side
# replicated S times, spreading any hot key over S reducers; the rewrite is
# algebraic, so the oracle is the PLAIN left join — equality is the claim.
# ---------------------------------------------------------------------------

SALTED_JOIN_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


def build_salted_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import salted_join

    orders = spread(table(spark, sf_dir, "orders"), spark)
    customer = table(spark, sf_dir, "customer")
    left = orders.select("o_orderkey", "o_custkey")
    right = customer.select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return salted_join(left, right, "o_custkey", n_salts=8, how="left")


CROSSPRODUCT_PAIRS_ORACLE = """
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ROUND(v.value * 100, 0) AS BIGINT)
                * CAST(ROUND(p.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS value_product_sum
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY v.user_id
"""


def build_user_pair_stats_algebraic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.crossproduct_aggregate in the oracle-checked
    surface: per-user view x purchase pair count and pair value-product
    sum, computed WITHOUT materializing pairs (product-of-sums identity;
    exact integer cents). The oracle is the LITERAL pair join — equality
    is the algebra's proof, and at 100 TB this formulation is the only
    one that survives a hot user (BASELINE.md round-4 100x rehearsal:
    the literal join emits ~2.7e10 pairs on one key and never finishes)."""
    from ..operators import crossproduct_aggregate

    ev = spread(table(spark, sf_dir, "events"), spark).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    return crossproduct_aggregate(
        views,
        buys,
        "user_id",
        {"n_pairs": ("1", "1"), "value_product_sum": ("cents", "cents")},
    )


register(
    "user_pair_stats_algebraic",
    oracle=CROSSPRODUCT_PAIRS_ORACLE,
    doc="Per-key cross-product aggregates via the product-of-sums "
    "identity (no pair materialization - the only formulation that "
    "survives a quadratic-output hot key); oracle is the literal join.",
    tags=("join", "skew", "algebraic"),
)(build_user_pair_stats_algebraic)


register(
    "salted_customer_join",
    oracle=SALTED_JOIN_ORACLE,
    doc="Skew-safe salted equi-join (salt left 8 ways, replicate dim 8x); "
    "oracle asserts exact equality with the plain LEFT JOIN.",
    tags=("join", "skew"),
)(build_salted_customer_join)


# ---------------------------------------------------------------------------
# mv_incremental_refresh — SummingMergeTree-style incremental maintenance
# IN the oracle surface (A16's batch analog): the stored MV state is the
# partial aggregate of the base slice; an append re-aggregates ONLY the
# union of stored partials + new partials, never the base fact. The
# oracle is the full recompute — proving merge(partials) == recompute.
# ---------------------------------------------------------------------------

INCR_CUTOFF = "1999-01-01"  # ship dates >= this are "the new batch"

MV_INCR_ORACLE = f"""
SELECT
    CAST(l_shipdate AS DATE) AS ship_date,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    SUM(l_quantity) AS total_qty,
    {o_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
GROUP BY 1
"""


def _daily_partials(li: DataFrame) -> DataFrame:
    cents = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100, 0
    ).cast("long")
    return li.groupBy(F.col("l_shipdate").cast("date").alias("ship_date")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("total_qty"),
        F.sum(cents).alias("cents"),
    )


def build_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only summable metrics (counts, sums of exact ints) — the metrics a
    SummingMergeTree can actually merge; countDistinct needs sketch state
    and lives in mv_daily_sales_approx. At 100 TB the base partials are a
    tiny stored table; each refresh shuffles only the new batch."""
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    base = _daily_partials(li.filter(F.col("l_shipdate").cast("date") < F.lit(INCR_CUTOFF)))
    incr = _daily_partials(li.filter(F.col("l_shipdate").cast("date") >= F.lit(INCR_CUTOFF)))
    merged = (
        base.unionByName(incr)
        .groupBy("ship_date")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("total_qty").alias("total_qty"),
            F.sum("cents").alias("cents"),
        )
    )
    return merged.select(
        "ship_date",
        "n_items",
        "total_qty",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
    )


register(
    "mv_incremental_refresh",
    oracle=MV_INCR_ORACLE,
    doc="Incremental MV maintenance (SummingMergeTree merge semantics, "
    "A16 batch analog): stored base partials + new-batch partials "
    "re-aggregated; oracle is the full recompute.",
    tags=("mv", "agg", "incremental"),
)(build_mv_incremental_refresh)
