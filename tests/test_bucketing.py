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


def test_bucketed_order_revenue_plan_is_exchange_free(spark, sf_dir):
    """The REGISTERED query (not just the primitive): join + groupBy on
    the bucket key must plan with ZERO exchanges after the bucketed
    writes — the property that deletes the dominant 100 TB shuffle."""
    from end_to_end_data_lakehouse_pipeline_spark.plans.relational import (
        build_bucketed_order_revenue,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = build_bucketed_order_revenue(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
