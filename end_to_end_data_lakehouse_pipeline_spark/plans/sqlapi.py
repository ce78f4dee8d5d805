"""Spark SQL text surface (§3.4, the BI/serving path).

The reference serves dashboards by running SQL against ClickHouse views
(superset_config.py:63-72 -> 04_materialized_views.sql). The Spark-native
equivalent is ``spark.sql(...)`` over registered views — same optimizer,
same physical plans as the DataFrame API, so the SQL surface is free. One
representative query is declared here end-to-end through ``spark.sql`` to
pin that surface; its oracle is near-verbatim the same text (the point:
the engine speaks ANSI SQL, not just DataFrame calls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from .parity import o_sum
from .registry import register

_SQL = """
SELECT
    n.n_name AS nation,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    {revenue}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus <> 'F'
GROUP BY n.n_name
"""

# Spark expresses the exact money sum with its own function names; DuckDB
# side comes from parity.o_sum. Both reduce to sum(round(x*100)) / 100.
_SPARK_REVENUE = (
    "CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 "
    "AS revenue"
)

SQL_NATION_ORACLE = _SQL.format(revenue=o_sum("o.o_totalprice", "revenue"))


def build_sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_SQL.format(revenue=_SPARK_REVENUE))


register(
    "sql_nation_revenue",
    oracle=SQL_NATION_ORACLE,
    doc="Open-order revenue by nation, declared as SQL text through "
    "spark.sql over registered views (§3.4 serving surface).",
    tags=("sql", "agg", "join"),
)(build_sql_nation_revenue)


# ---------------------------------------------------------------------------
# The 7 MV aggregates as SQL text through spark.sql — the BI/serving surface
# the reference actually exposes (Superset runs SQL against the ClickHouse
# MVs, 04_materialized_views.sql:11-126). The exact-arithmetic oracle SQL is
# engine-shared ANSI: Spark executes the SAME text DuckDB verifies, except
# hourly where DuckDB's isodow() becomes Spark's weekday()+1. Each shares
# the DataFrame MV's oracle, so the two surfaces are pinned equal.
# ---------------------------------------------------------------------------

from . import mv as _mv  # noqa: E402

_SPARK_HOURLY_SQL = _mv.MV_HOURLY_ORACLE.replace(
    "CAST(isodow(ts) AS INTEGER)", "CAST(weekday(ts) + 1 AS INTEGER)"
)

_SQL_MVS: dict[str, tuple[tuple[str, ...], str, str, str]] = {
    # name -> (tables, spark SQL text, oracle SQL, reference lines)
    "sql_mv_daily_sales": (
        ("lineitem",), _mv.MV_DAILY_ORACLE, _mv.MV_DAILY_ORACLE, "04:11-25"
    ),
    "sql_mv_monthly_sales": (
        ("orders",), _mv.MV_MONTHLY_ORACLE, _mv.MV_MONTHLY_ORACLE, "04:30-42"
    ),
    "sql_mv_category_sales": (
        ("lineitem", "part"), _mv.MV_CATEGORY_ORACLE, _mv.MV_CATEGORY_ORACLE, "04:47-59"
    ),
    "sql_mv_state_sales": (
        ("orders", "customer", "nation", "region"),
        _mv.MV_STATE_ORACLE, _mv.MV_STATE_ORACLE, "04:64-76",
    ),
    "sql_mv_seller_performance": (
        ("lineitem", "supplier", "nation"),
        _mv.MV_SELLER_ORACLE, _mv.MV_SELLER_ORACLE, "04:81-96",
    ),
    "sql_mv_payment_analysis": (
        ("events",), _mv.MV_PAYMENT_ORACLE, _mv.MV_PAYMENT_ORACLE, "04:101-112"
    ),
    "sql_mv_hourly_pattern": (
        ("events",), _SPARK_HOURLY_SQL, _mv.MV_HOURLY_ORACLE, "04:117-126"
    ),
}


def _make_sql_mv(tables: tuple[str, ...], sql_text: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        return spark.sql(sql_text)

    return build


for _name, (_tables, _spark_sql, _oracle, _ref) in _SQL_MVS.items():
    register(
        _name,
        oracle=_oracle,
        doc=f"{_name[7:]} served as SQL text via spark.sql over registered "
        f"views (04_materialized_views.sql {_ref}); shares the DataFrame "
        "MV's oracle.",
        tags=("sql", "mv", "agg"),
    )(_make_sql_mv(_tables, _spark_sql))


# ---------------------------------------------------------------------------
# sql_tpch_q5 — a full TPC-H classic through ONE engine-shared ANSI text:
# the string below runs verbatim in Spark (spark.sql over registered
# views) AND as the DuckDB oracle. No dialect split at all — the
# strongest form of the serving-surface claim for a 6-way join + agg.
# ---------------------------------------------------------------------------

_SQL_Q5_SHARED = """
SELECT
    n_name,
    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         AS DOUBLE) / 100.0 AS revenue
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


def build_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark,
        sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    return spark.sql(_SQL_Q5_SHARED)


register(
    "sql_tpch_q5",
    oracle=_SQL_Q5_SHARED,
    doc="TPC-H Q5 as ONE shared ANSI text: the identical string executes "
    "in Spark (spark.sql) and as the DuckDB oracle — zero dialect split "
    "(serving-surface proof for the 6-way join).",
    tags=("sql", "join", "tpch"),
)(build_sql_tpch_q5)


# ---------------------------------------------------------------------------
# sql_window_funnel — the windowFunnel family through the SQL-text serving
# surface: Spark executes the SAME engine-shared ANSI text DuckDB verifies
# (chained conditional-min CTEs; INTERVAL arithmetic is portable).
# ---------------------------------------------------------------------------

def build_sql_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .advanced import WINDOW_FUNNEL_ORACLE

    register_views(spark, sf_dir, ("events",))
    return spark.sql(WINDOW_FUNNEL_ORACLE)


def _sql_window_funnel_oracle() -> str:
    from .advanced import WINDOW_FUNNEL_ORACLE

    return WINDOW_FUNNEL_ORACLE


register(
    "sql_window_funnel",
    oracle=_sql_window_funnel_oracle(),
    doc="windowFunnel levels as engine-shared SQL text through spark.sql "
    "(the BI/serving surface twin of window_funnel_levels).",
    tags=("sql", "behavior", "clickhouse-parity"),
)(build_sql_window_funnel)
