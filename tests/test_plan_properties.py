"""Plan-property regression tests: scale-safety invariants of the
physical/logical plans, independent of result correctness.

The key invariant (VERDICT r2 finding #1): explicit ``F.broadcast()``
hints are honored by Spark REGARDLESS of actual size — AQE only
auto-selects broadcast for un-hinted joins under
``spark.sql.autoBroadcastJoinThreshold``. A hint on a table that grows
with the data (customer / part / supplier / orders and any keyed subset
of them) therefore OOMs at 100× even though it is fast at sf0.1. These
tests fail if such a hint is ever reintroduced, while proving that the
genuinely-bounded sides (nation / region, scalar re-aggregates, capped
candidate sets) still physically broadcast.
"""

from __future__ import annotations

import contextlib
import os
import re

import pytest

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "end_to_end_data_lakehouse_pipeline_spark",
)

# Every F.broadcast(<first-arg>) in the package must name a side that is
# bounded INDEPENDENT of data volume:
#   nation/region        — constant-size reference tables
#   prev/m1/m2           — per-month / per-brand re-aggregates (domain-bounded)
#   total/mx/avg_bal     — scalar (1-row) re-aggregates
#   probes/query/cand/seeds/cent/cent_df/lut/coeffs — K-row ANN/k-means state
#   lsh/ivf/pq           — per-query top-k candidate sets (capped by k)
#   bench_g              — contamination benchmark shingles (fixed benchmark)
#   vocab/top_terms/tot/cp — capped vocab / per-language totals
#   dim                  — stream-dim join helper (contract: caller passes a
#                          bounded dim; documented in its docstring)
#   daily                — per-day re-aggregate (calendar-bounded)
#   keys                 — GDPR erasure subject list (request-batch-bounded)
ALLOWED_BROADCAST_ARGS = {
    "nation",
    "region",
    "prev",
    "m1",
    "m2",
    "probes",
    "total",
    "mx",
    "avg_bal",
    "query",
    "cand",
    "seeds",
    # runtime_filters.bloom_probe: the Bloom map is <= N_WORDS entries
    # (~8 KB) by construction, REGARDLESS of how many dim keys went in —
    # bounded-broadcast is the operator's entire reason to exist
    "bf",
    "cent",
    "cent_df",
    "lut",
    "coeffs",
    # bm25_bench_retrieval: `stats` is the 1-row (n_docs, sum_dl)
    # corpus-totals aggregate — bounded at any volume
    "stats",
    # dpp_partitioned_month_join: `top` is the top-DPP_TOP_MONTHS (5)
    # month rows — K-row by construction, and the broadcast IS the DPP
    # pruning source
    "top",
    "lsh",
    "ivf",
    "pq",
    "bench_g",
    "vocab",
    "top_terms",
    "tot",
    "cp",
    "dim",
    "daily",
    "keys",
    "subject_keys",  # GDPR erasure subject list (request-batch-bounded)
    "ma",  # PMI marginals — bounded by the capped vocab (|V| rows)
    "mb",  # PMI marginals — bounded by the capped vocab (|V| rows)
    "n_docs",  # scalar (1-row) corpus count
    "n_orders",  # scalar (1-row) basket count
    # txnlog merge candidate ranges: O(#files) rows of (name,min,max) —
    # ~10 MB at 100 TB with 1 GB files; the same metadata Delta's own log
    # replay holds driver-side. The join's BIG side is `updates`.
    "ranges_df",
    # DSIR per-bucket log-ratio table: exactly DSIR_BUCKETS (4096) rows
    # by construction, regardless of corpus size
    "lr",
    "bins",  # PSI bin grid: spark.range(_PSI_BINS) — 10 literal rows
    "scales",  # int8 quantization per-dimension scales — EMB_DIM rows
    "sketch",  # Count-Min counters — at most CMS_ROWS*CMS_WIDTH cells
    # Pareto frontier: strictly increasing in BOTH dims, so its size is
    # bounded by min(|price grid|, |size domain|) — domain-, not
    # data-proportional
    "fr",
    "bounds",  # winsorize cut points — one row per group key value
    "sb",  # CMS sketch side B — at most JCMS_ROWS*JCMS_WIDTH cells
    # mv_daily_sales_approx HLL leg: one row per distinct ship_date —
    # calendar-bounded (~2.5k/decade of data), not volume-bounded
    "hll",
    "est",  # CMS join-size estimate — single row
}

FORBIDDEN = {"customer", "part", "supplier", "orders", "lineitem", "cust", "supp"}


def test_no_broadcast_hint_on_data_proportional_tables():
    hint_re = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                src = f.read()
            for m in hint_re.finditer(src):
                arg = m.group(1)
                line = src[: m.start()].count("\n") + 1
                # a driver-side K-row literal DF is bounded by construction
                if "createDataFrame" in src[m.start() : m.start() + 120]:
                    continue
                if arg in FORBIDDEN:
                    offenders.append(f"{path}:{line} F.broadcast({arg})")
                elif arg not in ALLOWED_BROADCAST_ARGS:
                    offenders.append(
                        f"{path}:{line} F.broadcast({arg}) — not in the "
                        "bounded-side allowlist; add it there ONLY if it is "
                        "bounded independent of data volume"
                    )
    assert not offenders, "\n".join(offenders)


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name", ["fact_order_items", "product_performance", "orders_enriched"]
)
def test_fact_joins_not_forced_broadcast(spark, sf_dir, name):
    # With the auto-threshold disabled, NOTHING may broadcast in these
    # plans — proving no explicit hint forces a data-proportional side.
    from end_to_end_data_lakehouse_pipeline_spark import plans

    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        plan = _initial_plan(plans.queries()[name](spark, sf_dir))
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bounded_dims_still_broadcast_by_hint(spark, sf_dir):
    # nation/region keep their hints (genuinely constant-size): even with
    # the auto-threshold disabled they must still physically broadcast.
    from end_to_end_data_lakehouse_pipeline_spark import plans

    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        plan = _initial_plan(plans.queries()["dim_supplier"](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") == 2, plan


def test_fact_joins_auto_broadcast_under_threshold(spark, sf_dir):
    # At local SF the un-hinted order projection is far under the session
    # threshold, so the engine still picks a physical broadcast on its
    # own — removing the hint costs nothing where broadcast is right.
    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _initial_plan(plans.queries()["fact_order_items"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q3",       # c_mktsegment + date range predicates
        "tpch_q6",       # pure scan-filter-agg: the canonical pushdown shape
        "tpch_q14",      # shipdate range on the fact scan
        "tpch_q20",      # shipdate window
    ],
)
def test_filters_reach_the_scan(spark, sf_dir, name):
    # A predicate that exists in the query must appear as PushedFilters on
    # at least one parquet scan — an unpushed filter reads 100 TB to drop
    # most of it post-scan.
    import re as _re

    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _formatted_plan(plans.queries()[name](spark, sf_dir))
    pushed = _re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(p.strip() for p in pushed), f"{name}: no non-empty PushedFilters\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "mv_daily_sales",
        "mv_monthly_sales",
        "mv_seller_performance",
        "mv_hourly_pattern",
        "mv_category_sales",
    ],
)
def test_mv_aggregates_have_mapside_partial(spark, sf_dir, name):
    # Every MV aggregate must combine map-side (partial_*) before its
    # exchange — a final-only agg shuffles raw fact rows.
    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _formatted_plan(plans.queries()[name](spark, sf_dir))
    assert "partial_" in plan, f"{name}: no map-side partial aggregation\n{plan}"


def test_no_cartesian_product_anywhere(spark, sf_dir):
    # CartesianProduct = an un-broadcast cross join: quadratic at scale.
    # (BroadcastNestedLoopJoin over a 1-row/K-row side is acceptable and
    # used deliberately by the scalar-enrichment queries.)
    import bench

    from end_to_end_data_lakehouse_pipeline_spark import plans

    qs = plans.queries()
    offenders = []
    for name in bench.HEADLINE + bench.HEAVY:
        if name not in qs:
            continue
        plan = _formatted_plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_window_funnel_single_user_partitioning(spark, sf_dir):
    # The three chained window mins and the per-user agg must share ONE
    # hashpartitioning(user_id) — re-shuffling between chained windows on
    # the same key would triple the funnel's shuffle volume.
    import re as _re

    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _initial_plan(plans.queries()["window_funnel_levels"](spark, sf_dir))
    user_exchanges = len(
        _re.findall(r"Exchange hashpartitioning\(user_id", plan)
    )
    assert user_exchanges == 1, f"expected 1 user_id exchange, saw {user_exchanges}\n{plan}"


def test_scd2_single_key_partitioning(spark, sf_dir):
    # lag-flag, cumulative run ids, per-run collapse and lead-close all
    # ride one user_id hash partitioning (operators/scd.py contract).
    import re as _re

    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _initial_plan(plans.queries()["scd2_user_tier"](spark, sf_dir))
    user_exchanges = len(
        _re.findall(r"Exchange hashpartitioning\(user_id", plan)
    )
    assert user_exchanges == 1, f"expected 1 user_id exchange, saw {user_exchanges}\n{plan}"


def test_heavy_hitter_candidates_broadcast(spark, sf_dir):
    # Phase 2 recount joins the token stream against the BOUNDED candidate
    # set — that side must physically broadcast (a shuffle join here would
    # shuffle the full token stream, defeating the sketch).
    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _initial_plan(plans.queries()["heavy_hitter_terms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan, plan


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # one Exchange: all three ranking fns share a single window pass
        ("brand_percentile_ranks", 1),
        # daily groupBy shuffle + the calendar-bounded global window
        ("rolling_median_7d", 2),
        ("cusum_changepoint", 2),
        # nation broadcast + QI groupBy shuffle + domain-bounded window
        ("k_anonymity_audit", 3),
    ],
)
def test_round3_wave3_shuffle_budget(spark, sf_dir, name, max_exchanges):
    """New window/agg queries must not regress past their audited shuffle
    counts (PLANS.md round-3 wave 3): an extra Exchange here means a
    window lost its shared partitioning or an agg lost its partial."""
    from end_to_end_data_lakehouse_pipeline_spark import plans

    plan = _initial_plan(plans.queries()[name](spark, sf_dir))
    got = plan.count("Exchange")
    assert got <= max_exchanges, f"{name}: {got} Exchanges\n{plan}"


def test_mad_median_windows_over_value_domain(spark, sf_dir):
    """mad_length_outliers' discrete-median windows must consume the
    grouped (source, value) tallies, never raw document rows (VERDICT r9
    task 1): a per-source row-sized window is one task per source — tens
    of TB through a single sort at 100 TB. The value-domain reduction
    pins every Window node directly above an Aggregate in the optimized
    plan, so the data-sized stage is always the partial-aggregating
    groupBy."""
    from end_to_end_data_lakehouse_pipeline_spark import plans

    df = plans.queries()["mad_length_outliers"](spark, sf_dir)
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    windows = [i for i, ln in enumerate(lines) if "Window [" in ln]
    assert windows, "expected Window nodes in the median plan"
    for i in windows:
        # the cum/cnt pair stacks (Window over Window); the bottom of every
        # stack must be the value-domain Aggregate, never the raw scan
        assert "Aggregate" in lines[i + 1] or "Window" in lines[i + 1], (
            f"Window at optimized-plan line {i} not fed by an Aggregate:\n"
            + "\n".join(lines)
        )


def test_dpp_month_join_prunes_partitions(spark, sf_dir):
    """dpp_partitioned_month_join's fact scan must carry a
    dynamicpruningexpression PartitionFilter — the join-driven partition
    skip is the query's entire reason to exist."""
    from end_to_end_data_lakehouse_pipeline_spark.plans.relational import (
        build_dpp_partitioned_month_join,
    )

    df = build_dpp_partitioned_month_join(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression" in plan, plan
    assert df.count() > 0
