"""Bucketed co-located join: same bucketing on both sides -> no exchange.

At 100 TB the lineitem-orders join is the dominant shuffle; bucketing both
tables by the join key at write time removes it entirely. This test pins
the plan property: a join of two equally-bucketed tables contains NO
Exchange (only per-partition sorts)."""

from __future__ import annotations

import os

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


def test_bucketed_order_profile_reuses_tables_exchange_free(spark, sf_dir):
    """The write-once consumer: ensure-only must NOT rewrite a
    fingerprint-matched bucketed pair, and its different join+agg on the
    bucket key must still plan with zero exchanges."""
    import os

    from end_to_end_data_lakehouse_pipeline_spark.plans.relational import (
        _bucketed_pair,
        build_bucketed_order_profile,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_ord, t_li = _bucketed_pair(spark, sf_dir)  # simulate the writer ran
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {t_li}")
            .filter("col_name = 'Location'")
            .first()["data_type"]
        ).replace("file:", "")
        before = os.stat(os.path.join(loc, "_SUCCESS")).st_mtime_ns

        df = build_bucketed_order_profile(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert df.count() > 0
        after = os.stat(os.path.join(loc, "_SUCCESS")).st_mtime_ns
        assert after == before, "ensure-only consumer rewrote the bucketed pair"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_corpus_fingerprint_tracks_content(tmp_path):
    """A regenerated corpus at the SAME path must change the store key
    (the ADVICE r8 stale-cache hazard)."""
    from end_to_end_data_lakehouse_pipeline_spark.plans.workspace import (
        corpus_fingerprint,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"aaaa")
    f1 = corpus_fingerprint(str(d))
    assert corpus_fingerprint(str(d)) == f1  # stable while untouched
    (d / "part-0.parquet").write_bytes(b"bbbbbb")  # regenerate in place
    f2 = corpus_fingerprint(str(d))
    assert f2 != f1
    (d / "_SUCCESS").write_bytes(b"")  # sidecars don't count
    assert corpus_fingerprint(str(d)) == f2
    # same sizes + restored mtimes must STILL change the key (the cp -p /
    # tar -x aliasing hazard) — the stamp samples content, not just stat
    st = os.stat(d / "part-0.parquet")
    (d / "part-0.parquet").write_bytes(b"cccccc")
    os.utime(d / "part-0.parquet", ns=(st.st_atime_ns, st.st_mtime_ns))
    assert corpus_fingerprint(str(d)) != f2
