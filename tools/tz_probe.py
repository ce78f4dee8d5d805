"""Session-timezone sensitivity probe.

The driver imports __spark_entry__ with its OWN SparkSession, whose
session timezone we don't control — so every date/timestamp-producing
query must give identical answers regardless of spark.sql.session
.timeZone. This probe runs the tz-sensitive names in a VANILLA
SparkSession pinned to America/Sao_Paulo (UTC-3, with historical DST
transitions — a zone that breaks naive date arithmetic) and compares
exact values against the UTC-naive DuckDB oracle using diffcheck's
own normalize/compare. A pass means the engine's timestamp semantics
don't leak the session zone (catalog pins UTC at parquet-read time).

Usage:  python tools/tz_probe.py [sf_dir] [name ...]
        defaults: /root/testdata/sf0.01, the 30-name tz-sensitive set
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import SparkSession
import duckdb
from diffcheck import load_oracle, compare

NAMES = [
    "date_functions", "time_dimension", "mv_daily_sales",
    "mv_monthly_sales", "mv_hourly_pattern", "daily_sales_summary",
    "retention_cohorts", "window_funnel_levels", "rolling_median_7d",
    "rolling_revenue_7d", "rolling_distinct_users_7d",
    "dau_wau_stickiness", "event_burst_minutes", "hopping_event_counts",
    "interpolate_purchase_daily", "weekday_adjusted_anomaly",
    "yoy_monthly_growth", "user_weekday_bitmask", "view_to_purchase_1h",
    "events_asof_last_order", "interval_join_attribution",
    "order_day_streaks", "purchase_gap_histogram", "weekly_value_psi",
    "revenue_ewma", "cusum_changepoint", "daily_revenue_gapfill",
    "batch_sessions", "user_recency", "scd2_user_tier",
]

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
if len(sys.argv) > 2:
    NAMES = sys.argv[2:]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/Sao_Paulo")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
import __spark_entry__ as e
qs = e.queries(); osql = e.oracle_sql()
con = duckdb.connect(); load_oracle(con, SF)

failed = []
for name in NAMES:
    if name not in qs:
        print(f"skip {name}: not registered"); continue
    t0 = time.time()
    try:
        spark_pdf = qs[name](spark, SF).toPandas()
        oracle_pdf = con.execute(osql[name]).df()
        problems = compare(name, spark_pdf, oracle_pdf)
    except Exception as ex:
        problems = [f"error {ex!r}"]
    if problems:
        print(f"FAIL {name}: {problems[:3]} [{time.time()-t0:.1f}s]")
        failed.append(name)
    else:
        print(f"ok   {name}: rows={len(spark_pdf)} match [{time.time()-t0:.1f}s]")

print(f"\n{len(NAMES)-len(failed)}/{len(NAMES)} tz-probe pass; failed: {failed}")
sys.exit(1 if failed else 0)
