"""Physical-plan property checks — the scale contract, enforced.

Correctness says WHAT comes out; these tests pin HOW it executes: filters
reach the parquet scan, projections prune columns, small dims broadcast,
no accidental cartesian products, aggregates keep partial (map-side)
phases. A plan regression at sf0.01 is the same regression at 100 TB,
just 10^4 times more expensive.
"""

from __future__ import annotations

import pytest

from end_to_end_data_lakehouse_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = plans.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_predicates")
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not just the empty list
    assert "PushedFilters: []" not in plan.split("PushedFilters:", 1)[1][:200]


def test_projection_pruning_narrow_readschema(spark):
    plan = _plan(spark, "top_orders_with_customer")
    # lineitem never referenced; orders scan must not read o_comment-ish width
    scan_schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert scan_schemas, "no scans found"
    assert all(len(s.split(",")) <= 8 for s in scan_schemas), scan_schemas


def test_dim_joins_broadcast_not_shuffle(spark):
    for name in ("mv_category_sales", "mv_seller_performance", "dim_supplier"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_no_cartesian_products_anywhere(spark):
    # knn/* use broadcast nested loop against a 1-row query side by design;
    # everything else must be keyed.
    for name, spec in plans.specs().items():
        if "similarity" in spec.tags:
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_aggregates_keep_partial_phase(spark):
    plan = _plan(spark, "mv_daily_sales")
    # partial_ prefix marks map-side combine before the exchange
    assert "partial_" in plan
    assert "HashAggregate" in plan


def test_window_dedup_single_shuffle_with_group_limit(spark):
    plan = _plan(spark, "cdc_latest_state_per_key")
    # exactly one hash exchange for the window partitioning...
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    # ...and Spark 4's map-side top-1 pruning before it (rank <= k pushed
    # below the exchange -> shuffle carries one row per key per mapper)
    assert "WindowGroupLimit" in plan


def test_anti_and_semi_joins_planned_as_such(spark):
    assert "LeftAnti" in _plan(spark, "customers_without_events")
    assert "LeftSemi" in _plan(spark, "customers_with_open_orders")


def test_whole_stage_codegen_on_hot_paths(spark):
    # Under AQE the codegen subtrees only form as stages materialize, so
    # compile the non-adaptive plan for the assertion (the fused pipelines
    # are identical once AQE finalizes each stage).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("fact_order_items", "scalar_functions"):
            df = plans.queries()[name](spark, SF)
            s = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
            )
            assert "WholeStageCodegen subtrees" in s, name
            assert "Found 0 WholeStageCodegen" not in s, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


@pytest.mark.parametrize("name", ["orders_enriched", "fact_order_items"])
def test_flagship_join_strategy(spark, name):
    plan = _plan(spark, name)
    # joins must be hash-based (broadcast or shuffled-hash/sort-merge on
    # keys) — never nested-loop on a fact table
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_exact_avg_null_semantics(spark):
    # exact_avg must use COUNT(col): nulls are excluded, matching SQL AVG
    # (VERDICT r1 item 10 — the COUNT(*) variant deflated nullable columns).
    from pyspark.sql import functions as F

    from end_to_end_data_lakehouse_pipeline_spark.plans.parity import exact_avg

    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0)], ["k", "x"]
    )
    out = df.groupBy("k").agg(exact_avg("x", "avg_x")).first()
    assert out.avg_x == 15.0  # not 10.0 (COUNT(*)=3 would give 30/3)


def test_corpus_pipeline_broadcasts(spark):
    # contamination: the benchmark shingle set broadcasts; vocab: the top-K
    # vocabulary broadcasts; recall: the ANN candidate list broadcasts —
    # in each case the corpus-sized side must never be the build side.
    for name in ("contamination_ngrams", "vocab_oov_rate", "ann_recall_lsh"):
        plan = _plan(spark, name)
        assert "BroadcastExchange" in plan, name


def test_multimodal_stage_is_arrow_map_in_pandas(spark):
    # the binary feature-extract stage must compile to MapInPandas (Arrow
    # batches), never a row-at-a-time PythonUDF eval
    plan = _plan(spark, "multimodal_byte_stats")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_gapfill_spine_join_broadcasts(spark):
    # the calendar spine joins the daily aggregate via broadcast — the
    # series never shuffles for the join
    plan = _plan(spark, "daily_revenue_gapfill")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_csv_bulk_write_roundtrip(spark, tmp_path):
    """S11: the distributed CSV bulk-writer path, exercised end-to-end —
    multi-file write, schema-first read-back, exact row/value parity."""
    from pyspark.sql import functions as F

    from end_to_end_data_lakehouse_pipeline_spark.sources.readers import (
        read_csv,
        write_csv_bulk,
    )

    df = spark.range(0, 10_000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 13).cast("int").alias("bucket"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id").cast("double") / 7.0).alias("ratio"),
    )
    out = str(tmp_path / "bulk_csv")
    write_csv_bulk(df, out, n_files=8)
    import glob

    assert len(glob.glob(f"{out}/part-*.csv")) == 8  # distributed files
    back = read_csv(spark, out, df.schema)
    assert back.count() == 10_000
    assert back.agg(F.sum("pk")).first()[0] == sum(range(10_000))
    assert (
        back.select("pk", "bucket", "name").exceptAll(
            df.select("pk", "bucket", "name")
        ).count() == 0
    )


def test_gumbel_resample_uses_take_ordered(spark):
    """The top-k selection must plan as TakeOrderedAndProject (per-
    partition top-k + K-row merge), never a global Sort of the corpus."""
    plan = _plan(spark, "dsir_gumbel_resample")
    assert "TakeOrderedAndProject" in plan
    assert "lr_q" not in plan or "BroadcastExchange" in plan  # bucket table broadcast


def test_kmeans_assign_is_mapside_argmin(spark):
    """The Lloyd assignment is a pure map-side argmin over driver-held
    centroid literals (r12 rewrite, similarity.py): there is NO join of
    any kind in the plan — a shuffled join here would shuffle the corpus
    once per iteration, and even the old broadcast crossJoin
    materialized K x N rows plus a row_number window."""
    plan = _plan(spark, "kmeans_embeddings")
    assert "Join" not in plan  # covers SortMerge/BroadcastHash/BNLJ
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_waterfill_scan_is_aggregated_before_windows(spark):
    """The only data-sized pass is the per-source token aggregate; the
    waterfill windows run on the post-agg source table (partial agg
    phase present; no window directly over the document scan)."""
    plan = _plan(spark, "mixture_token_waterfill")
    assert "partial_" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan
