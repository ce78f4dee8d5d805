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
