"""TPC-H classic query shapes over the test star schema.

The reference's relational surface (joins + grouped aggregates over the
Olist schema — batch_gold.py, load_warehouse.py) is exercised throughout
plans/gold.py and plans/star.py; this module adds the canonical TPC-H
multi-join/agg shapes the test tables support (no partsupp /
commitdate / shipmode columns, so Q2/Q4/Q12-style queries are out of
scope). Q1 lives in plans/relational.py.

Each query is the standard published TPC-H formulation re-expressed as a
DataFrame plan; constants are adapted to the driver testdata's date range
(orders 1995-2001). Scale notes per query:

- Dimension sides (region, nation, supplier, part at these SFs; customer
  for Q3/Q10) are broadcast — no shuffle for the dim joins. At 100 TB the
  fact-fact join (orders ⋈ lineitem) hash-shuffles on the join key and
  AQE picks the final partitioning.
- Aggregates are partial+final (map-side combine) Catalyst hash
  aggregates on scaled integers (plans/parity.py) for cross-engine
  exactness.
- Top-k outputs (Q3, Q10, Q18) sort by a TOTAL order (unique key last)
  so LIMIT is deterministic, and compile to TakeOrderedAndProject —
  per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .parity import exact_sum, o_sum
from .registry import register

_O_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _dt(col: str):
    return F.col(col).cast("date")


# ---------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, grouped revenue, deterministic top 10.
# ---------------------------------------------------------------------------

Q3_ORACLE = f"""
SELECT
    l_orderkey,
    CAST(o_orderdate AS DATE) AS order_date,
    {o_sum(_O_REVENUE, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate  AS DATE) > DATE '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
LIMIT 10
"""


def build_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(_dt("o_orderdate") < F.lit("1998-03-15"))
    li = table(spark, sf_dir, "lineitem").filter(_dt("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", _dt("o_orderdate").alias("order_date"))
        .agg(exact_sum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_date").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


register(
    "tpch_q3",
    oracle=Q3_ORACLE,
    doc="TPC-H Q3 shipping priority: filtered 3-way join, grouped revenue, "
    "deterministic top-10 (TakeOrderedAndProject).",
    tags=("relational", "join", "tpch"),
)(build_tpch_q3)


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join with the c/s nation equality.
# ---------------------------------------------------------------------------

Q5_ORACLE = f"""
SELECT
    n_name,
    {o_sum(_O_REVENUE, 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


def build_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact side: orders ⋈ lineitem shuffle on the order key; every dim
    (customer, supplier, nation, region) broadcasts. The n/r filter
    prunes suppliers BEFORE the fact join, so only ASIA rows shuffle."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (_dt("o_orderdate") >= F.lit("1996-01-01")) & (_dt("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(asia_supp),
            (li.l_suppkey == asia_supp.s_suppkey)
            & (cust.c_nationkey == asia_supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(exact_sum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc())
    )


register(
    "tpch_q5",
    oracle=Q5_ORACLE,
    doc="TPC-H Q5 local supplier volume: 6-way join (4 broadcast dims + "
    "one fact shuffle), nation-equality predicate, grouped revenue.",
    tags=("relational", "join", "tpch"),
)(build_tpch_q5)


# ---------------------------------------------------------------------------
# Q6 — forecast revenue: pure scan-filter-agg (everything pushes down).
# ---------------------------------------------------------------------------

Q6_ORACLE = f"""
SELECT
    {o_sum('l_extendedprice * l_discount', 'revenue', scale=10000)}
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def build_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (_dt("l_shipdate") >= F.lit("1996-01-01"))
        & (_dt("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", scale=10000)
    )


register(
    "tpch_q6",
    oracle=Q6_ORACLE,
    doc="TPC-H Q6 forecast revenue: scan + conjunctive filter + single "
    "global aggregate — the maximal-pushdown shape (price*discount is 4dp "
    "so the exact sum uses scale 10000).",
    tags=("relational", "agg", "tpch"),
)(build_tpch_q6)


# ---------------------------------------------------------------------------
# Q10 — returned item reporting: quarter of 'R' lineitems per customer.
# ---------------------------------------------------------------------------

Q10_ORACLE = f"""
SELECT
    c_custkey,
    c_name,
    {o_sum(_O_REVENUE, 'revenue')},
    c_acctbal,
    n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def build_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").filter(
        (_dt("o_orderdate") >= F.lit("1997-01-01")) & (_dt("o_orderdate") < F.lit("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(_revenue(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


register(
    "tpch_q10",
    oracle=Q10_ORACLE,
    doc="TPC-H Q10 returned items: one-quarter window, 'R' lineitems, "
    "4-way join, per-customer revenue, deterministic top-20.",
    tags=("relational", "join", "tpch"),
)(build_tpch_q10)


# ---------------------------------------------------------------------------
# Q14 — promo effect: conditional-aggregate ratio over a part join.
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT
    100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)
        ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT))
             AS DOUBLE) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
"""


def build_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sums are exact scaled-integer sums over the SAME quantized
    rows, so the final ratio is one identical double division on both
    engines — no rounding tolerance needed."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (_dt("l_shipdate") >= F.lit("1997-09-01")) & (_dt("l_shipdate") < F.lit("1997-10-01"))
    )
    cents = F.round(_revenue() * 100, 0).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(cents).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


register(
    "tpch_q14",
    oracle=Q14_ORACLE,
    doc="TPC-H Q14 promo effect: broadcast part join + conditional "
    "aggregate ratio (single output row).",
    tags=("relational", "agg", "tpch"),
)(build_tpch_q14)


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING on a re-joined fact aggregate.
# ---------------------------------------------------------------------------

Q18_QTY = 250  # testdata max per-order qty ≈ 475 at sf0.1; 250 selects at every SF

Q18_ORACLE = f"""
SELECT
    c_name,
    c_custkey,
    o_orderkey,
    CAST(o_orderdate AS DATE) AS order_date,
    o_totalprice,
    SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def build_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING subquery is one partial+final agg over lineitem; its
    surviving keys (a tiny fraction of orders) broadcast back onto the
    fact join, so the big table is scanned twice but shuffled once."""
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _dt("o_orderdate").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


register(
    "tpch_q18",
    oracle=Q18_ORACLE,
    doc="TPC-H Q18 large-volume customers: HAVING-filtered fact aggregate "
    "broadcast back onto the orders/customer join, deterministic top-100.",
    tags=("relational", "join", "tpch"),
)(build_tpch_q18)
