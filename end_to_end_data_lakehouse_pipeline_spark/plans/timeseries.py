"""Temporal join operators: AS-OF join and range join.

Spark has no ASOF JOIN operator (DuckDB/Pandas do; kdb's aj is the
archetype), but the semantics decompose into Spark-native shapes that
scale:

- **as-of**: union the two streams with a kind marker, sort within each
  user partition by (time, kind), and carry the last non-null right-side
  attributes forward with ``last(..., ignorenulls=True)`` over a running
  ROWS window. ONE shuffle on the join key, no range explosion, state =
  one row of carried attributes — the same mechanics a 100 TB backfill
  wants (and the batch analog of streaming state stores). The oracle is
  DuckDB's native ASOF LEFT JOIN.
- **range join**: equi-join on the entity key with the time bound as a
  residual predicate — Catalyst keeps the join keyed (SortMergeJoin on
  user), the range is a post-join filter, so cost is per-user pair counts,
  never a cartesian. At 100 TB bucket both sides by the entity key.

Determinism: orders are pre-reduced to one row per (customer, day) with
max_by before the as-of, so carried attributes have a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from .parity import o_sum
from .registry import register

# ---------------------------------------------------------------------------
# events_asof_last_order — each event annotated with the customer's most
# recent order on or before the event's day.
# ---------------------------------------------------------------------------

ASOF_ORACLE = """
WITH ord AS (
    SELECT o_custkey,
           CAST(o_orderdate AS DATE) AS od,
           MAX(o_orderkey) AS last_orderkey,
           arg_max(o_totalprice, o_orderkey) AS last_totalprice
    FROM orders GROUP BY 1, 2
),
ev AS (
    SELECT event_id, user_id, CAST(ts AS DATE) AS event_date FROM events
)
SELECT e.event_id, e.user_id, e.event_date, o.last_orderkey, o.last_totalprice
FROM ev e
ASOF LEFT JOIN ord o
  ON e.user_id = o.o_custkey AND e.event_date >= o.od
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    carry: list[str],
) -> DataFrame:
    """Generic scalable as-of: for each left row, the right row with the
    greatest right_time <= left_time per key. Right must be unique per
    (key, right_time). Returns left columns + carried right columns."""
    r = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_kind"),
        *[F.col(c) for c in carry],
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns if c not in (key,)],
    )
    l = left.select(
        F.col(key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_kind"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in carry],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in (key,)],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        key,
        "_t",
        "_kind",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
        *[F.col(f"_l_{c}") for c in left.columns if c not in (key,)],
    )
    return carried.filter(F.col("_kind") == 1).select(
        key,
        *[F.col(f"_l_{c}").alias(c) for c in left.columns if c not in (key,)],
        *carry,
    )


def build_events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    orders = table(spark, sf_dir, "orders")
    ord_day = orders.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("date").alias("od"),
    ).agg(
        F.max("o_orderkey").alias("last_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_totalprice"),
    )
    ev = events.select(
        "user_id", "event_id", F.col("ts").cast("date").alias("event_date")
    )
    out = asof_join(
        ev,
        ord_day,
        key="user_id",
        left_time="event_date",
        right_time="od",
        carry=["last_orderkey", "last_totalprice"],
    )
    return out.select(
        "event_id", "user_id", "event_date", "last_orderkey", "last_totalprice"
    )


register(
    "events_asof_last_order",
    oracle=ASOF_ORACLE,
    doc="AS-OF join (no native Spark operator): union + kind-ordered "
    "running window carries the latest order attributes to each event — "
    "one shuffle, no range explosion; oracle is DuckDB ASOF LEFT JOIN.",
    tags=("timeseries", "join", "asof"),
)(build_events_asof_last_order)


# ---------------------------------------------------------------------------
# order_events_7d — range join: activity in the 7 days from order date.
# ---------------------------------------------------------------------------

RANGE_JOIN_ORACLE = f"""
SELECT
    o.o_orderkey,
    COUNT(e.event_id) AS n_events,
    {o_sum('COALESCE(e.value, 0)', 'total_value')}
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND CAST(e.ts AS DATE) >= CAST(o.o_orderdate AS DATE)
 AND CAST(e.ts AS DATE) < CAST(o.o_orderdate AS DATE) + INTERVAL 7 DAY
GROUP BY o.o_orderkey
"""


def build_order_events_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    orders = spread(table(spark, sf_dir, "orders"), spark)
    events = table(spark, sf_dir, "events")
    od = F.col("o_orderdate").cast("date")
    ed = F.col("ts").cast("date")
    joined = orders.join(
        events,
        (events.user_id == orders.o_custkey)
        & (ed >= od)
        & (ed < F.date_add(od, 7)),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events"),
        (
            F.sum(scaled_long(F.coalesce(F.col("value"), F.lit(0.0)))).cast("double")
            / 100.0
        ).alias("total_value"),
    )


register(
    "order_events_7d",
    oracle=RANGE_JOIN_ORACLE,
    doc="Range join: per-order event count/value within [orderdate, +7d) — "
    "equi-key join with residual time predicate (never a cartesian; bucket "
    "by user at scale).",
    tags=("timeseries", "join", "range"),
)(build_order_events_7d)


# ---------------------------------------------------------------------------
# daily_revenue_gapfill — gap-filled daily series with forward fill (the
# ClickHouse ORDER BY ... WITH FILL / INTERPOLATE analog). A date spine is
# generated with sequence()+explode from the observed min/max (two-row
# driver fetch, S12 shape), left-joined to the daily aggregate, and
# missing days carry the last observed revenue forward via
# last(ignorenulls) over a running window.
#
# Scale notes: the spine is tiny (one row per calendar day — years fit in
# one partition) and broadcast-joins to the daily aggregate; the forward
# fill is one window over day order. For multi-entity gap-fill, partition
# the window by the entity key — same plan shape.
# ---------------------------------------------------------------------------

GAPFILL_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           {o_sum('o_totalprice', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
),
spine AS (
    SELECT unnest(generate_series((SELECT MIN(d) FROM daily),
                                  (SELECT MAX(d) FROM daily),
                                  INTERVAL 1 DAY))::DATE AS d
),
j AS (
    SELECT spine.d, daily.revenue, daily.n_orders,
           CASE WHEN daily.d IS NULL THEN 0 ELSE 1 END AS observed
    FROM spine LEFT JOIN daily ON spine.d = daily.d
)
SELECT d,
       observed,
       COALESCE(n_orders, 0) AS n_orders,
       LAST_VALUE(revenue IGNORE NULLS) OVER (
           ORDER BY d ROWS UNBOUNDED PRECEDING) AS revenue_filled
FROM j
"""


def build_daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import exact_sum

    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        exact_sum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    lo, hi = daily.agg(F.min("d"), F.max("d")).first()  # S12 scalar fetch
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(lo).cast("date"),
                F.lit(hi).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    j = spine.join(F.broadcast(daily), "d", "left").select(
        "d",
        F.when(F.col("n_orders").isNull(), 0).otherwise(1).alias("observed"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "revenue",
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return j.select(
        "d",
        "observed",
        "n_orders",
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
    )


register(
    "daily_revenue_gapfill",
    oracle=GAPFILL_ORACLE,
    doc="Gap-filled daily revenue: sequence()+explode date spine, broadcast "
    "left join, forward fill via last(ignorenulls) running window "
    "(ClickHouse WITH FILL analog).",
    tags=("timeseries", "window"),
)(build_daily_revenue_gapfill)
