"""Star-schema warehouse builders (reference: spark/load_warehouse.py +
clickhouse_init/02_dim_tables.sql, 03_fact_tables.sql).

3 dims + 3 facts, derived exactly as the reference does — surrogate hash
keys, enum/bucket derivations, date keys, money casts — but Spark-first:
dims broadcast into facts, fact grain columns are pruned to what the scan
needs, and keys use md5 (cross-engine checkable; ``F.xxhash64`` is the
cheaper Spark-native alternative noted per query).

dim_customer lives in plans/relational.py (``dim_customer_keys``);
dim_date is ``time_dimension`` there. Here: dim_product, dim_supplier,
fact_orders, fact_order_items, fact_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.dates import date_key, isodow
from .registry import register

# ---------------------------------------------------------------------------
# dim_product — part + size-bucket CASE (load_warehouse.py:130-151; the
# weight buckets at :146-149 become p_size buckets here).
# ---------------------------------------------------------------------------

DIM_PRODUCT_ORACLE = """
SELECT
    md5(CAST(p_partkey AS VARCHAR)) AS product_key,
    p_partkey,
    p_name,
    p_brand,
    COALESCE(p_type, 'unknown') AS category,
    p_size,
    CASE
        WHEN p_size < 10 THEN 'small'
        WHEN p_size < 30 THEN 'medium'
        ELSE 'large'
    END AS size_category,
    p_retailprice
FROM part
"""


def build_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select(
        F.md5(F.col("p_partkey").cast("string")).alias("product_key"),
        "p_partkey",
        "p_name",
        "p_brand",
        F.coalesce("p_type", F.lit("unknown")).alias("category"),
        "p_size",
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_category"),
        "p_retailprice",
    )


register(
    "dim_product",
    oracle=DIM_PRODUCT_ORACLE,
    doc="Product dim with size buckets (load_warehouse.py:130-151).",
    tags=("star", "dim"),
)(build_dim_product)


# ---------------------------------------------------------------------------
# dim_supplier — geo snowflake like dim_customer (load_warehouse.py:158-178).
# ---------------------------------------------------------------------------

DIM_SUPPLIER_ORACLE = """
SELECT
    md5(CAST(s.s_suppkey AS VARCHAR)) AS supplier_key,
    s.s_suppkey,
    s.s_name,
    s.s_acctbal,
    COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
    COALESCE(r.r_name, 'UNKNOWN') AS region_name
FROM supplier s
LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def build_dim_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            F.md5(F.col("s_suppkey").cast("string")).alias("supplier_key"),
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
        )
    )


register(
    "dim_supplier",
    oracle=DIM_SUPPLIER_ORACLE,
    doc="Supplier dim, snowflaked geo (load_warehouse.py:158-178 analog).",
    tags=("star", "dim"),
)(build_dim_supplier)


# ---------------------------------------------------------------------------
# fact_orders — order grain (load_warehouse.py:188-245, 03_fact_tables.sql:
# 13-55): surrogate keys, date key, status flags, money.
# ---------------------------------------------------------------------------

FACT_ORDERS_ORACLE = """
SELECT
    md5(CAST(o_orderkey AS VARCHAR)) AS order_key,
    md5(CAST(o_custkey AS VARCHAR)) AS customer_key,
    CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
    o_orderkey,
    o_totalprice AS order_total,
    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS order_total_cents,
    o_orderstatus,
    CAST(o_orderstatus = 'F' AS BOOLEAN) AS is_finished,
    CAST(o_orderstatus = 'O' AS BOOLEAN) AS is_open,
    CASE o_orderpriority
        WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
        WHEN '4-NOT SPECIFIED' THEN 4 ELSE 5
    END AS priority_rank
FROM orders
"""


def build_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    return orders.select(
        F.md5(F.col("o_orderkey").cast("string")).alias("order_key"),
        F.md5(F.col("o_custkey").cast("string")).alias("customer_key"),
        date_key("o_orderdate").alias("date_key"),
        "o_orderkey",
        F.col("o_totalprice").alias("order_total"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("order_total_cents"),
        "o_orderstatus",
        (F.col("o_orderstatus") == "F").alias("is_finished"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
        .alias("priority_rank"),
    )


register(
    "fact_orders",
    oracle=FACT_ORDERS_ORACLE,
    doc="Order-grain fact with surrogate keys, date key, flags "
    "(load_warehouse.py:188-245).",
    tags=("star", "fact"),
)(build_fact_orders)


# ---------------------------------------------------------------------------
# fact_order_items — item grain with order-side enrichment (J3,
# load_warehouse.py:200). The reference broadcasts its order projection;
# here the join is deliberately UN-hinted: orders is a fact that grows
# with the data, and an explicit F.broadcast() hint is honored regardless
# of size (AQE never overrides a hint — it only auto-selects broadcast
# for un-hinted joins under spark.sql.autoBroadcastJoinThreshold). At
# local SF the narrow 3-column projection still physically broadcasts via
# the auto threshold; at 100 TB AQE picks a key-partitioned join on
# l_orderkey instead of OOMing the driver on a forced broadcast.
# ---------------------------------------------------------------------------

FACT_ORDER_ITEMS_ORACLE = """
SELECT
    md5(CAST(l.l_orderkey AS VARCHAR) || '-' || CAST(l.l_linenumber AS VARCHAR)
        || '-' || CAST(l.l_partkey AS VARCHAR) || '-' || CAST(l.l_suppkey AS VARCHAR))
        AS item_key,
    md5(CAST(l.l_orderkey AS VARCHAR)) AS order_key,
    md5(CAST(l.l_partkey AS VARCHAR)) AS product_key,
    md5(CAST(l.l_suppkey AS VARCHAR)) AS supplier_key,
    CAST(strftime(l.l_shipdate, '%Y%m%d') AS INTEGER) AS ship_date_key,
    l.l_orderkey,
    l.l_linenumber,
    l.l_quantity,
    l.l_extendedprice AS gross_price,
    CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
        AS net_price_cents,
    l.l_discount,
    o.o_orderstatus AS order_status,
    CAST(o.o_orderdate AS DATE) AS order_date,
    CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
         AS INTEGER) AS days_to_ship
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def build_fact_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .select(
            F.md5(
                F.concat_ws(
                    "-", s("l_orderkey"), s("l_linenumber"), s("l_partkey"), s("l_suppkey")
                )
            ).alias("item_key"),
            F.md5(s("l_orderkey")).alias("order_key"),
            F.md5(s("l_partkey")).alias("product_key"),
            F.md5(s("l_suppkey")).alias("supplier_key"),
            date_key("l_shipdate").alias("ship_date_key"),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_extendedprice").alias("gross_price"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
            .alias("net_price_cents"),
            "l_discount",
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_ship"),
        )
    )


register(
    "fact_order_items",
    oracle=FACT_ORDER_ITEMS_ORACLE,
    doc="Item-grain fact with order enrichment (J3, un-hinted: AQE "
    "auto-broadcasts under threshold, partitions beyond it; "
    "load_warehouse.py:200; 03_fact_tables.sql).",
    tags=("star", "fact"),
)(build_fact_order_items)


# ---------------------------------------------------------------------------
# fact_events — event grain (the payments/reviews fact analog,
# load_warehouse.py:247-283): date/hour keys, typed payload extract.
# ---------------------------------------------------------------------------

FACT_EVENTS_ORACLE = """
SELECT
    md5(CAST(event_id AS VARCHAR)) AS event_key,
    md5(CAST(user_id AS VARCHAR)) AS user_key,
    CAST(strftime(ts, '%Y%m%d') AS INTEGER) AS date_key,
    CAST(hour(ts) AS INTEGER) AS hour_of_day,
    CAST(isodow(ts) AS INTEGER) AS dow_mon1,
    event_id,
    event_type,
    value,
    CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents,
    CAST(json_extract(props, '$.k') AS INTEGER) AS prop_k,
    value >= 50 AS is_high_value
FROM events
"""


def build_fact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    return events.select(
        F.md5(F.col("event_id").cast("string")).alias("event_key"),
        F.md5(F.col("user_id").cast("string")).alias("user_key"),
        date_key("ts").alias("date_key"),
        F.hour("ts").alias("hour_of_day"),
        isodow("ts").alias("dow_mon1"),
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        F.from_json("props", "k INT").getField("k").alias("prop_k"),
        (F.col("value") >= 50).alias("is_high_value"),
    )


register(
    "fact_events",
    oracle=FACT_EVENTS_ORACLE,
    doc="Event-grain fact (payments/reviews analog, load_warehouse.py:247-283).",
    tags=("star", "fact"),
)(build_fact_events)
