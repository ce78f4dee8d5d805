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


# ---------------------------------------------------------------------------
# rolling_median_7d — exact rolling median of daily revenue over a trailing
# 7-CALENDAR-DAY range frame (not 7 rows: missing days shrink the window,
# which is what an ops dashboard means by "7-day median").
#
# Exactness contract: the median is computed over integer CENTS and emitted
# as cents (interpolated even-count medians are x.5 — exactly representable
# in double), so there is NO floating division or rounding anywhere and the
# two engines agree bit-for-bit. Scale: the windowed series is one row per
# calendar day (calendar-bounded, same envelope as the other daily
# windows); the heavy lifting is the one partial+final daily aggregate.
# ---------------------------------------------------------------------------

ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS dord,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1, 2
)
SELECT d, n_orders,
       CAST(rev_cents AS DOUBLE) AS revenue_cents,
       CAST(MEDIAN(rev_cents) OVER (
           ORDER BY dord RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS median_revenue_cents_7d,
       CAST(COUNT(*) OVER (
           ORDER BY dord RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS days_in_window
FROM daily
"""


def build_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(scaled_long("o_totalprice")).alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    ).withColumn("dord", F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long"))
    w = Window.orderBy("dord").rangeBetween(-6, 0)
    return daily.select(
        "d",
        "n_orders",
        F.col("rev_cents").cast("double").alias("revenue_cents"),
        F.percentile("rev_cents", F.lit(0.5)).over(w).cast("double")
            .alias("median_revenue_cents_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


register(
    "rolling_median_7d",
    oracle=ROLLING_MEDIAN_ORACLE,
    doc="Exact rolling median over a trailing 7-calendar-day RANGE frame "
    "(integer-cents percentile — no float rounding on either engine).",
    tags=("timeseries", "window"),
)(build_rolling_median_7d)


# ---------------------------------------------------------------------------
# cusum_changepoint — CUSUM shift detection on the daily revenue series:
# s_t = sum_{i<=t}(x_i - mean(x)); the |s| peak marks the most likely
# changepoint (Page's cumulative-sum statistic).
#
# Exactness: the naive form subtracts a fractional mean per day and
# accumulates doubles — order-sensitive, hash-unstable. Multiply out
# instead: s_t * N == S_t * N - t * S_N  (all integers). Cents sums reach
# ~1e15 at 100 TB and N(days) ~1e4, so the products cross 2^63 — both
# sides compute in DECIMAL(38,0) (same lesson as revenue_autocorrelation's
# bigint overflow at the 10x rehearsal). The emitted statistic stays the
# exact integer `cusum_scaled = s_t * N` in cents.
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
c AS (
    SELECT d, x,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                AS DECIMAL(38,0)) AS s_t,
           CAST(ROW_NUMBER() OVER (ORDER BY d) AS DECIMAL(38,0)) AS t,
           CAST(SUM(CAST(x AS DECIMAL(38,0))) OVER () AS DECIMAL(38,0)) AS s_n,
           CAST(COUNT(*) OVER () AS DECIMAL(38,0)) AS n
    FROM daily
),
s AS (
    SELECT d, x, CAST(s_t * n - t * s_n AS DECIMAL(38,0)) AS cusum_scaled FROM c
)
SELECT d,
       CAST(x AS DOUBLE) AS revenue_cents,
       CAST(cusum_scaled AS DOUBLE) AS cusum_scaled,
       CAST(ABS(cusum_scaled) = MAX(ABS(cusum_scaled)) OVER () AS BOOLEAN)
           AS is_changepoint
FROM s
"""


def build_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(scaled_long("o_totalprice")).alias("x")
    )
    dec = "decimal(38,0)"
    run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = daily.select(
        "d",
        "x",
        F.sum(F.col("x").cast(dec)).over(run).cast(dec).alias("s_t"),
        F.row_number().over(Window.orderBy("d")).cast(dec).alias("t"),
        F.sum(F.col("x").cast(dec)).over(whole).cast(dec).alias("s_n"),
        F.count(F.lit(1)).over(whole).cast(dec).alias("n"),
    )
    s = c.select(
        "d",
        "x",
        (F.col("s_t") * F.col("n") - F.col("t") * F.col("s_n")).cast(dec).alias("cusum_scaled"),
    )
    # the peak test runs on the EXACT decimal; only the emitted column is
    # cast down (DECIMAL output dtypes diverge across engines — registry
    # convention), losing precision identically on both sides past 2^53
    return s.select(
        "d",
        F.col("x").cast("double").alias("revenue_cents"),
        F.col("cusum_scaled").cast("double").alias("cusum_scaled"),
        (F.abs("cusum_scaled") == F.max(F.abs("cusum_scaled")).over(whole))
            .alias("is_changepoint"),
    )


register(
    "cusum_changepoint",
    oracle=CUSUM_ORACLE,
    doc="Page's CUSUM changepoint statistic on daily revenue, multiplied "
    "out to exact DECIMAL(38,0) integer arithmetic (no fractional-mean "
    "accumulation; overflow-safe past bigint).",
    tags=("timeseries", "window", "anomaly"),
)(build_cusum_changepoint)


# ---------------------------------------------------------------------------
# interpolate_purchase_daily — linear interpolation of per-user daily gaps.
# The missing-value imputation operator every feature/training pipeline
# needs: per-entity day spine + two running windows (last/next non-null)
# — everything partitions by the entity key, so at 100 TB this is one
# shuffle on user_id and per-user state, never a global pass. The spine
# explode is bounded by each user's own [min_day, max_day] span.
# ---------------------------------------------------------------------------

INTERPOLATE_ORACLE = """
WITH obs AS (
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS vc
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
spine AS (
    SELECT user_id,
           CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE) AS day
    FROM obs GROUP BY user_id
),
j AS (
    SELECT s.user_id, s.day, o.vc,
           CASE WHEN o.vc IS NOT NULL THEN s.day END AS od
    FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.day = s.day
),
f AS (
    SELECT user_id, day, vc,
           last_value(vc IGNORE NULLS) OVER w1 AS pv,
           last_value(od IGNORE NULLS) OVER w1 AS pd,
           first_value(vc IGNORE NULLS) OVER w2 AS nv,
           first_value(od IGNORE NULLS) OVER w2 AS nd
    FROM j
    WINDOW w1 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
-- interpolation entirely in integer cents: numer/d2 rounded half-up via
-- (2*numer + d2) // (2*d2) — bit-identical across engines, no double
-- rounding at .xx5 boundaries
g AS (
    SELECT user_id, day, vc,
           pv * date_diff('day', pd, nd) + (nv - pv) * date_diff('day', pd, day) AS numer,
           date_diff('day', pd, nd) AS d2
    FROM f
)
SELECT user_id, day,
       CAST(CASE WHEN vc IS NOT NULL THEN vc
                 ELSE (2 * numer + d2) // (2 * d2)
            END AS DOUBLE) / 100.0 AS value_filled,
       vc IS NULL AS is_interpolated
FROM g
ORDER BY user_id, day
"""


def build_interpolate_purchase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    events = spread(table(spark, sf_dir, "events"), spark)
    obs = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(scaled_long("value")).alias("vc"))
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    j = spine.join(obs, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "vc",
        F.when(F.col("vc").isNotNull(), F.col("day")).alias("od"),
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    f = j.select(
        "user_id",
        "day",
        "vc",
        F.last("vc", ignorenulls=True).over(w1).alias("pv"),
        F.last("od", ignorenulls=True).over(w1).alias("pd"),
        F.first("vc", ignorenulls=True).over(w2).alias("nv"),
        F.first("od", ignorenulls=True).over(w2).alias("nd"),
    )
    # all-integer interpolation: cents = round_half_up(numer / d2) done as
    # (2*numer + d2) div (2*d2) — bit-identical to the oracle, no double
    # rounding at .xx5 boundaries
    d1 = F.datediff("day", "pd").cast("long")
    d2 = F.datediff("nd", "pd").cast("long")
    numer = F.col("pv") * d2 + (F.col("nv") - F.col("pv")) * d1
    num2 = F.lit(2) * numer + d2
    den2 = F.lit(2) * d2
    cents = ((num2 - num2 % den2) / den2).cast("long")
    return f.select(
        "user_id",
        "day",
        (
            F.when(F.col("vc").isNotNull(), F.col("vc"))
            .otherwise(cents)
            .cast("double")
            / F.lit(100.0)
        ).alias("value_filled"),
        F.col("vc").isNull().alias("is_interpolated"),
    ).orderBy("user_id", "day")


register(
    "interpolate_purchase_daily",
    oracle=INTERPOLATE_ORACLE,
    doc="Missing-value imputation: per-user daily purchase series, gap "
    "days filled by linear interpolation between neighboring observations "
    "(last/next-non-null running windows, all partitioned by user_id — "
    "one shuffle at any scale). Endpoints are observed by construction "
    "(spine spans each user's own min..max).",
    tags=("timeseries", "window", "impute"),
)(build_interpolate_purchase_daily)


# ---------------------------------------------------------------------------
# rolling_distinct_users_7d — sliding-window COUNT DISTINCT, the window
# aggregate Spark has no native operator for (count(DISTINCT) OVER a
# RANGE frame is unsupported). The scalable rewrite: each (user, day)
# activity CONTRIBUTES to the 7 days [day, day+6], so explode the
# bounded contribution range, dedup (user, window-day), and hash-count
# per day — one shuffle keyed by day, no range self-join, no per-day
# rescan. The explode factor equals the window length (bounded), which
# beats the range join's data-sized probe side at any scale. Oracle is
# the literal range join + COUNT(DISTINCT).
# ---------------------------------------------------------------------------

ROLLING_DISTINCT_ORACLE = """
WITH act AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM act)
SELECT days.d AS day,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users_7d
FROM days JOIN act a ON a.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
ORDER BY day
"""


def build_rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    act = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = act.select("d").distinct()
    contrib = act.select(
        "user_id",
        F.explode(F.sequence("d", F.date_add("d", 6))).alias("day"),
    ).distinct()
    return (
        days.join(contrib, days.d == contrib.day)
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


register(
    "rolling_distinct_users_7d",
    oracle=ROLLING_DISTINCT_ORACLE,
    doc="Sliding 7-day COUNT DISTINCT via bounded contribution explode "
    "(each activity feeds its 7 window days) + hash aggregate — no "
    "range self-join, no unsupported distinct-over-window; oracle is "
    "the literal range join.",
    tags=("timeseries", "window", "agg", "behavior"),
)(build_rolling_distinct_users_7d)
