"""Bucketed co-located join: same bucketing on both sides -> no exchange.

At 100 TB the lineitem-orders join is the dominant shuffle; bucketing both
tables by the join key at write time removes it entirely. This test pins
the plan property: a join of two equally-bucketed tables contains NO
Exchange (only per-partition sorts)."""

from __future__ import annotations

from end_to_end_data_lakehouse_pipeline_spark.sources.lakehouse import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(1000).selectExpr("id AS k", "id * 2 AS lv")
        right = spark.range(500).selectExpr("id AS k", "id * 3 AS rv")
        write_bucketed(left, "b_left", 4, ["k"], sort_cols=["k"])
        write_bucketed(right, "b_right", 4, ["k"], sort_cols=["k"])

        joined = spark.table("b_left").join(spark.table("b_right"), "k")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        assert joined.count() == 500

        # same bucketing also absorbs the groupBy shuffle
        agg = spark.table("b_left").groupBy("k").count()
        aplan = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in aplan, aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
