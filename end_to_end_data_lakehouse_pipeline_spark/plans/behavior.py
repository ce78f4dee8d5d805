"""Behavioral analytics over the event stream: funnel, retention, histogram.

The ClickHouse-style product-analytics family (the reference's event tables
feed dashboards; these are the standard queries such dashboards run),
expressed as exact-arithmetic Spark aggregations:

- **funnel**: ordered-step conversion (view -> click -> purchase) computed
  from per-user MIN timestamps per step — one hash aggregate over the
  events scan + per-user step comparisons; no self-joins, no window over
  the raw stream, so the shuffle carries one row per (user, step-mins).
- **retention**: classic cohort grid — first-activity day per user (one
  agg) joined back and bucketed by day offset; both aggregates are exact
  integer counts.
- **histogram**: fixed-width value buckets per event type — pure integer
  floor bucketing, pushes the entire computation into one partial+final
  hash aggregate.

All timestamps resolve through catalog.table's UTC pinning, so day
arithmetic agrees with the UTC-naive oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register

# ---------------------------------------------------------------------------
# event_funnel — per-user ordered conversion view -> click -> purchase.
# ---------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH m AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
),
f AS (
    SELECT user_id,
           t_view IS NOT NULL AS s1,
           t_view IS NOT NULL AND t_click > t_view AS s2,
           t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click AS s3
    FROM m
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
    CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
    CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase,
    ROUND(CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE)
          / SUM(CASE WHEN s1 THEN 1 ELSE 0 END), 6) AS view_to_purchase_rate
FROM f
"""


def build_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    m = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    f = m.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    one = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        one("s1").alias("reached_view"),
        one("s2").alias("reached_click"),
        one("s3").alias("reached_purchase"),
        F.round(
            one("s3").cast("double") / one("s1"), 6
        ).alias("view_to_purchase_rate"),
    )


register(
    "event_funnel",
    oracle=FUNNEL_ORACLE,
    doc="Ordered-step funnel (view->click->purchase) from per-user MIN "
    "timestamps per step — one aggregate over the scan, no self-joins.",
    tags=("behavior", "agg", "funnel"),
)(build_event_funnel)


# ---------------------------------------------------------------------------
# retention_cohorts — users by first-activity day × day offset.
# ---------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH first_day AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
    FROM events e JOIN first_day f ON e.user_id = f.user_id
)
SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
"""


def build_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    ed = F.col("ts").cast("date")
    first_day = events.groupBy("user_id").agg(F.min(ed).alias("cohort_day"))
    activity = (
        events.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(ed, F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


register(
    "retention_cohorts",
    oracle=RETENTION_ORACLE,
    doc="Cohort retention grid: first-activity day per user joined back "
    "and bucketed by day offset (<=7); exact integer counts.",
    tags=("behavior", "agg", "join"),
)(build_retention_cohorts)


# ---------------------------------------------------------------------------
# value_histogram — fixed-width buckets per event type.
# ---------------------------------------------------------------------------

HIST_WIDTH = 10  # value in [0, ~100): 10 buckets

HISTOGRAM_ORACLE = f"""
SELECT
    event_type,
    CAST(FLOOR(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
    CAST(FLOOR(value / {HIST_WIDTH}) AS BIGINT) * {HIST_WIDTH} AS bucket_lo,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS bucket_value
FROM events
WHERE value IS NOT NULL
GROUP BY event_type, bucket
"""


def build_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    bucket = F.floor(F.col("value") / HIST_WIDTH).cast("long")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
                / 100.0
            ).alias("bucket_value"),
        )
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("bucket_lo"),
            "n",
            "bucket_value",
        )
    )


register(
    "value_histogram",
    oracle=HISTOGRAM_ORACLE,
    doc="Fixed-width value histogram per event type — one partial+final "
    "hash aggregate, exact integer bucketing and cent sums.",
    tags=("behavior", "agg", "histogram"),
)(build_value_histogram)


# ---------------------------------------------------------------------------
# above_customer_avg_orders — the canonical correlated scalar subquery
# ("orders above this customer's average"), decorrelated the way Catalyst
# and every modern optimizer executes it: one per-customer aggregate, one
# equi-join back to the fact, one residual comparison. Exact integer
# average (cents) on both engines.
# ---------------------------------------------------------------------------

ABOVE_AVG_ORACLE = """
WITH a AS (
    SELECT o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS sum_c,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       CAST(a.sum_c AS DOUBLE) / 100.0 / a.n AS cust_avg
FROM orders o
JOIN a ON o.o_custkey = a.o_custkey
WHERE CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) * a.n > a.sum_c
"""


def build_above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import scaled_long

    orders = table(spark, sf_dir, "orders")
    a = orders.groupBy("o_custkey").agg(
        F.sum(scaled_long("o_totalprice")).alias("sum_c"),
        F.count(F.lit(1)).alias("n"),
    )
    o = table(spark, sf_dir, "orders").alias("o")
    # the comparison is exact: price_cents * n > sum_cents (no division)
    return (
        o.join(a.withColumnRenamed("o_custkey", "ck"), F.col("o.o_custkey") == F.col("ck"))
        .filter(scaled_long(F.col("o.o_totalprice")) * F.col("n") > F.col("sum_c"))
        .select(
            "o.o_orderkey",
            "o.o_custkey",
            "o.o_totalprice",
            (F.col("sum_c").cast("double") / 100.0 / F.col("n")).alias("cust_avg"),
        )
    )


register(
    "above_customer_avg_orders",
    oracle=ABOVE_AVG_ORACLE,
    doc="Correlated scalar subquery decorrelated into agg + equi-join "
    "(orders above their customer's average); the comparison multiplies "
    "through by n so it stays in exact integers.",
    tags=("relational", "join", "subquery"),
)(build_above_customer_avg_orders)


# ---------------------------------------------------------------------------
# purchase_gap_histogram — distribution of days between consecutive orders
# per customer: lag window then fixed-width bucketing. The sequence-mining
# primitive behind churn/frequency models.
# ---------------------------------------------------------------------------

GAP_HIST_ORACLE = """
WITH g AS (
    SELECT o_custkey,
           date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER w,
               CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
)
SELECT CAST(gap_days // 30 AS BIGINT) AS gap_bucket_30d,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_gap,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1
"""


def build_purchase_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    g = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return g.groupBy(
        F.expr("gap_days div 30").cast("long").alias("gap_bucket_30d")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
    )


register(
    "purchase_gap_histogram",
    oracle=GAP_HIST_ORACLE,
    doc="Inter-purchase interval distribution: per-customer lag window, "
    "30-day integer buckets (one keyed shuffle + one hash agg).",
    tags=("relational", "window", "behavior"),
)(build_purchase_gap_histogram)


# ---------------------------------------------------------------------------
# status_transition_matrix — consecutive order-status transition counts per
# customer ordered by time: the Markov-chain transition-count primitive
# (sessionized state machines, CDC state audits). Same single-shuffle lag
# shape as the gap histogram.
# ---------------------------------------------------------------------------

TRANSITION_ORACLE = """
WITH t AS (
    SELECT o_custkey,
           LAG(o_orderstatus) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS from_status,
           o_orderstatus AS to_status
    FROM orders
)
SELECT from_status, to_status, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM t WHERE from_status IS NOT NULL
GROUP BY from_status, to_status
"""


def build_status_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    t = orders.select(
        F.lag("o_orderstatus").over(w).alias("from_status"),
        F.col("o_orderstatus").alias("to_status"),
    ).filter(F.col("from_status").isNotNull())
    return t.groupBy("from_status", "to_status").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


register(
    "status_transition_matrix",
    oracle=TRANSITION_ORACLE,
    doc="Markov transition counts over per-customer status sequences "
    "(lag window + hash agg; state-machine audit primitive).",
    tags=("relational", "window", "behavior"),
)(build_status_transition_matrix)


# ---------------------------------------------------------------------------
# dau_wau_stickiness — multi-grain engagement: daily and weekly active
# users plus the DAU/WAU "stickiness" ratio per ISO week. Two exact
# countDistinct aggregates at different grains joined on the week key;
# the ratio divides exact integers (avg daily actives via summed DAU /
# days observed in the week).
# ---------------------------------------------------------------------------

STICKINESS_ORACLE = """
WITH d AS (
    SELECT CAST(ts AS DATE) AS day,
           yearweek(CAST(ts AS DATE)) AS wk,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM events GROUP BY 1, 2
),
w AS (
    SELECT yearweek(CAST(ts AS DATE)) AS wk,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM events GROUP BY 1
)
SELECT d.wk AS wk,
       CAST(COUNT(*) AS BIGINT) AS days_observed,
       CAST(SUM(d.dau) AS BIGINT) AS dau_sum,
       CAST(MAX(w.wau) AS BIGINT) AS wau,
       CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / MAX(w.wau) AS stickiness
FROM d JOIN w ON d.wk = w.wk
GROUP BY d.wk
"""


def build_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spread(table(spark, sf_dir, "events"), spark)
    day = F.col("ts").cast("date")
    # yearweek parity: DuckDB yearweek() = ISO year*100 + ISO week
    wk = (F.expr("extract(yearofweek FROM CAST(ts AS DATE))") * 100
          + F.weekofyear(day)).cast("long")
    d = events.groupBy(day.alias("day"), wk.alias("wk")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    w = events.groupBy(wk.alias("wk")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        d.join(w, "wk")
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("days_observed"),
            F.sum("dau").alias("dau_sum"),
            F.max("wau").alias("wau"),
            (
                F.sum("dau").cast("double")
                / F.count(F.lit(1))
                / F.max("wau")
            ).alias("stickiness"),
        )
    )


register(
    "dau_wau_stickiness",
    oracle=STICKINESS_ORACLE,
    doc="DAU/WAU stickiness per ISO week: two exact countDistinct grains "
    "joined on the week key, one final ratio division.",
    tags=("behavior", "agg", "bi"),
)(build_dau_wau_stickiness)


# ---------------------------------------------------------------------------
# session_funnel_paths — top user journeys: the first 3 event types of
# every 30-minute-gap session, ranked by frequency. The path is built
# with a deterministic array_sort(collect_list(struct(ts, event_id,
# event_type))) — NOT an ordered-window collect_list, whose ordering is
# an implementation accident — so the (ts, event_id) total order makes
# the journey string bit-identical cross-engine.
# Scale shape: the gaps-and-islands pass is two windows partitioned by
# user (uniform keys); the path agg is one groupBy (user, session) with
# map-side partials; the final path rollup groups by a short string.
# ---------------------------------------------------------------------------

_SFP_GAP_MIN = 30
_SFP_LEN = 3
_SFP_TOP = 20

SESSION_FUNNEL_PATHS_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {_SFP_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING
    ) AS sid
    FROM flagged
),
paths AS (
    SELECT user_id, sid,
           array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{_SFP_LEN}], '>'
           ) AS path
    FROM numbered
    GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_SFP_TOP}
"""


def build_session_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = table(spark, sf_dir, "events").select(
        "user_id",
        # unix_micros needs TIMESTAMP (ltz); session tz is pinned UTC by
        # the catalog so the ntz->ltz cast preserves oracle parity
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > _SFP_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "sid",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    paths = (
        numbered.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.transform(
                    F.slice("evs", 1, _SFP_LEN), lambda s: s["event_type"]
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_SFP_TOP)
    )


register(
    "session_funnel_paths",
    oracle=SESSION_FUNNEL_PATHS_ORACLE,
    doc="Top user journeys: first-3-event paths of 30-min-gap sessions, "
    "deterministic struct-sort path assembly, total-order top-20.",
    tags=("behavior", "window", "bi"),
)(build_session_funnel_paths)
