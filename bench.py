#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the `noop` sink (runs the whole
physical plan — scans, shuffles, aggs — without driver-side collect
overhead). `value` is the sum of per-query wall seconds for the headline
set; lower is better. Run directly: `python bench.py`.

The JSON self-adjudicates host contention: `calibration` carries two
fixed-probe stamp series (latency + throughput, 5 stamps each), their
max/min `*_band_ratio`s, and a `contended` verdict (either band >3x) —
so a hot run is identifiable from one field without a re-run. Per-query
values are cross-pass MEDIANS over interleaved round-robin passes;
queries with >3x cross-pass spread emit raw per-pass times under
`pass_spreads_gt3x`, and `value_min` (sum of per-query minimum passes)
is the steal-robust lower bound — a large value/value_min gap flags
contention bursts shorter than the stamp interval.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_data_lakehouse_pipeline_spark import plans, session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one or more representatives per operator family in
# SURVEY.md §2 plus the LLM-pipeline extensions. Kept to a set that
# finishes in a few minutes at sf0.1 while exercising every shuffle shape
# (multi-way join, windowed dedup, groupBy rollup, pivot, MinHash/LSH
# self-join, brute-force + bucketed ANN).
HEADLINE = [
    "orders_enriched",        # flagship: rollups + 5-way left join
    "daily_sales_summary",    # date-bucketed agg over the join output
    "customer_rfm_segments",  # two-pass agg + CASE segmentation
    "product_performance",    # per-part agg + dim join
    "mv_daily_sales",         # MV corpus: daily
    "mv_monthly_sales",       # MV corpus: year/month
    "mv_category_sales",      # MV corpus: join + categorical agg
    "mv_seller_performance",  # MV corpus: multi-col groupBy
    "mv_hourly_pattern",      # MV corpus: hour/dow matrix
    "fact_order_items",       # star schema: broadcast dim joins + hash keys
    "window_analytics",       # rank/lag/lead/frames
    "cdc_latest_state_per_key",  # last-write-wins window dedup
    "top_orders_with_customer",  # global sort + limit + join
    "rollup_sales",           # GROUPING SETS / ROLLUP
    "pivot_status_by_year",   # pivot
    "dedup_exact",            # exact dedup over documents
    "dedup_minhash_lsh",      # shingle → minhash → band → bucket join
    "text_stats",             # tokenization + quality metrics
    "token_count_bpe",        # BPE-ish regex tokenizer counts
    "term_frequencies",       # corpus top-k terms (explode + count + top-k)
    "mv_daily_sales_approx",  # HLL no-Expand variant of mv_daily_sales
    "hash_sample",            # deterministic hash sampling
    "knn_bruteforce_cosine",  # exact ANN baseline over embeddings
    "knn_lsh_bucketed",       # banded multi-table LSH ANN scale path
    "knn_ivf",                # IVF cell-restricted ANN (seeded, nprobe)
    # round-2 additions
    "dedup_components",       # near-dup clusters: iterative min-label CC
    "events_asof_last_order", # AS-OF join via union + running window
    "stratified_sample",      # per-language hash-threshold sampling
    "event_funnel",           # ordered-step conversion funnel
    "retention_cohorts",      # first-activity cohort grid
    "tfidf_top_terms",        # per-doc tf-idf top-k (explode + window)
    "tpch_q5",                # 6-way join, 4 broadcast dims + fact shuffle
    "tpch_q18",               # HAVING-agg broadcast back onto fact join
    "quality_gate",           # corpus filter chain with reject reasons
    "contamination_ngrams",   # broadcast benchmark-overlap decontamination
    "contamination_minhash",  # fuzzy LSH benchmark decontamination
    "dsir_importance_weights",  # DSIR target-domain importance scores
    # round-3 additions
    "window_funnel_levels",   # chained window mins on one user partitioning
    "purchase_attribution",   # ignore-nulls last over user window
    "brand_price_regression", # per-group OLS from exact sufficient stats
    "revenue_ewma",           # grouped-map recursion over post-agg series
    # round-3 wave-3 additions
    "rolling_median_7d",      # exact percentile over a RANGE frame
    "cusum_changepoint",      # integer-exact CUSUM with global-window peak
    "k_anonymity_audit",      # privacy audit: QI groupBy + domain window
    "t_closeness_audit",      # privacy triad closer: per-group EMD vs global
    # round-4 additions: the ACID/connector/streaming-drain families in
    # the headline rotation so driver CORRECTNESS samples draw them
    "txnlog_merge_reconcile",  # ACID write path: append -> file MERGE -> read
    "sql_merge_into",          # same workload through the SQL DML parser
    "txnlog_cdf_mv_refresh",   # CDF-driven incremental MV refresh
    "duckdb_source_roundtrip", # Python DataSource warehouse round-trip
    "streaming_daily_sales_drain",  # multi-batch watermarked agg drain
    "streaming_scd2_drain",    # multi-batch SCD2 foreachBatch convergence
    "lake_catalog_sql",        # named-catalog CREATE/MERGE/SELECT story
    "bloom_prejoin_lineitem",  # pure-Catalyst runtime Bloom semi-join
    "duplicate_span_coverage", # repeated-span token coverage (Lee et al.)
    "span_dedup_rewrite",      # exact-substring dedup rewrite (cleaned corpus)
    "chunk_exact_dedup",       # aligned-window chunk dedup (one hash shuffle)
    "embedding_quantize_int8", # per-dim int8 quantization + recon error
    "span_top_repeats",        # boilerplate report: top repeated spans
    "user_pair_stats_algebraic",  # cross-product aggs w/o pair materialization
    # round-4 wave-3 additions
    "equidepth_histogram_orders",  # distributed global rank + exact NTILE
    "interpolate_purchase_daily",  # per-user linear gap imputation
    "winsorized_totalprice_stats",  # robust means, exact integer clipping
    "countmin_term_counts",    # Count-Min sketch error report
    "media_resize_report",     # multimodal block-resize via mapInPandas
    "rolling_distinct_users_7d",  # sliding COUNT DISTINCT via explode
    "join_size_estimate_cms",  # CMS inner-product join-size estimate
    "streaming_running_totals_drain",  # ValueState emission-history drain
    "cogroup_user_ledger",     # cogrouped-map pandas reconciliation
    "label_propagation_communities",  # oracled 3-round LPA
    "streaming_session_window_drain",  # native session_window drain
    "txnlog_pushdown_scan",    # DataSource pushFilters file skipping
    "balanced_class_sample",   # exactly-k-per-class deterministic sample
    # round-5 additions
    "sql_merge_residual_on",   # non-equi ON residual (upsert-if-newer)
    "lake_catalog_time_travel",  # RESTORE/CLONE/VERSION AS OF/TABLE_CHANGES
    "ivm_join_mv_refresh",     # signed-delta JOIN-MV maintenance from CDF
    "document_chunking",       # map-only overlapping token windows
    # round-7 additions (bpe_train_merges already runs in the heavy tier)
    "kafka_envelope_project",  # bronze Kafka-envelope cast path, wire fixture
    "txnlog_partitioned_prune",  # hive-partitioned log, exact month pruning
    "pareto_frontier_parts",   # skyline via distributed exclusive cummax
    "medallion_e2e_drain",     # full bronze->silver->gold composition, oracled
    "interval_join_attribution",  # grid-bucketed point-in-interval range join
    # round-8 additions
    "dsir_gumbel_resample",    # Gumbel-top-k importance selection
    "embedding_covariance_suffstats",  # exact PCA second moments, tall
    "kmeans_embeddings",       # 3 Lloyd rounds, broadcast assign (oracled)
    "dedup_semantic_clusters",  # SemDeDup on the kmeans assignment
    "bucketed_order_revenue",  # co-bucketed fact-fact join, zero exchanges
    "mixture_token_waterfill",  # closed-form token-budget allocation plan
    "orc_roundtrip_scan",      # ORC format round-trip + pushed predicate
    "lake_catalog_optimize_vacuum",  # OPTIMIZE bin-pack + VACUUM via SQL
    # round-9 additions
    "bucketed_order_profile",  # write-once consumer of the bucketed pair
    "bm25_bench_retrieval",    # DF-capped inverted-index BM25 top-k
    "packing_padding_waste",   # seq-len packing efficiency report
    "txnlog_merge_schema_evolution",  # ACID MERGE with union-schema evolution
    "dpp_partitioned_month_join",  # join-driven dynamic partition pruning
    "mad_length_outliers",     # robust median+MAD per-source length gate
    "jsonl_corpus_roundtrip",  # JSONL file source, schema-on-read
    "variant_props_analytics",  # Spark 4 VARIANT parse-once/extract-many
    "csv_bulk_roundtrip",      # S10/S11 schema-first CSV load end-to-end
]

# Heavy tier: the composed multi-stage reports too expensive for the
# per-iteration headline loop but where scale regressions would otherwise
# be invisible (VERDICT r2 task 6). Timed once (no best-of-N), reported
# under a separate "heavy" key so the headline series stays comparable
# across rounds. Skip with SPARK_GRAFT_BENCH_HEAVY=0 for quick local runs.
HEAVY = [
    "curation_funnel_report",  # full corpus curation pipeline, composed
    "training_manifest",       # dedup + gate + split + pack composition
    "corpus_pack_chunks",      # per-source running-sum packing
    "vocab_growth_curve",      # cumulative distinct-vocab curve
    "dedup_ngram_jaccard",     # shingle inverted-index self-join
    # round-3 additions
    "doc_lm_perplexity",       # bigram-LM scoring: two fact-fact joins
    "heavy_hitter_terms",      # Misra-Gries sketch + exact recount
    "copurchase_triangle_count",  # pair mining + triangle self-joins
    "term_pmi_top_pairs",      # vocab-capped co-occurrence PMI
    "pagerank_copurchase",     # 10-iteration power method on arc set
    # round-4 additions
    "streaming_dedup_admission_drain",  # 3-batch gated admission (near-dup)
    "bpe_train_merges",        # iterative tokenizer training (10 rounds)
    "bpe_apply_merges",        # train->apply tokenizer round-trip
    "quality_logit_fit",       # IRLS logistic trainer (4 driver rounds)
    # round-8 additions
    "quality_logit_suffstats",  # the trainer's oracled statistics face
    "streaming_left_join_drain",  # outer stream-stream join: eviction flush batches make it the costliest drain
    # round-9 additions
    "streaming_full_join_drain",  # both null-padded expiry classes, min-policy watermark
    "streaming_watermark_dedup_drain",  # ST4 echo-drop through the state store
    "streaming_checkpoint_resume_drain",  # ST2 two-run resume, exactly-once sink
    "streaming_fanout_drain",  # S2 per-topic independent bronze queries
    "overwrite_publish_scan",  # S6 staging-swap gold publish, cleanup-checked
]

# Median-of-N per query damps single-JVM jitter (GC pauses showed 5-10x
# outliers on identical plans; r9's driver single-shot ran 1.32x on
# UNTOUCHED code — contended host). VERDICT r9 task 4: the headline tier
# reports per-query MEDIANS like the heavy tier, so a noisy round is
# adjudicable from the bench line alone. NOTE (round-over-round):
# r1-r9 headline numbers were best-of-N — the median switch shifts the
# series up slightly; r10+ medians are the comparable sequence.
# VERDICT r10 task 1: repeats are INTERLEAVED round-robin (pass 1 over
# the whole headline set, then pass 2, ...) rather than back-to-back per
# query, so a transient host-contention window cannot poison every
# repeat of the same query — a bad minute now lands on DIFFERENT queries
# in different passes and the cross-pass median recovers. A fixed
# calibration query is timed at the start, middle, and end of the
# headline block and the three readings are emitted under "calibration"
# as a host-band stamp: if those three differ by >~2x, the window was
# contended and per-query outliers are adjudicable from the JSON alone.
# Plan-shape note (ADVICE r9): since r9, mv_daily_sales_approx also
# computes two exact countDistinct contract legs — its timing measures
# the validation query, not the no-Expand serving path, and is not
# comparable with r1-r8 rounds.
# Default is 3 passes (r11): with 2, the median is the midpoint and
# still absorbs HALF of a bad pass; with 3 the median discards the worst
# pass entirely. Measured on this host: first executions in a session
# spike 5-25x under bursty co-tenant steal (dedup_components
# 160.7/17.0/6.4 s standalone back-to-back), so a midpoint median read
# 50.9 s for a steady-state 6-17 s query; the 3-pass median reads the
# steady state while keeping one cold pass's sensitivity in the spread.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

# Host-band calibration probes, timed at the start, middle, and end of
# the headline block and around the heavy tier. TWO probes because the
# two contention modes differ (measured r11: a window where every heavy
# query ran 2-4x slow moved the latency probe only 1.5x):
#   - latency probe: projection + cast + rename over one parquet scan,
#     no shuffle — tracks scheduler/JVM responsiveness;
#   - throughput probe: full-scan hash aggregation (TPC-H Q1 shape),
#     ~1 s of sustained 32-way CPU — tracks the co-tenant steal that
#     actually hits the long queries.
# Same plans every time — spread between stamps of the SAME probe is
# host contention, not engine regression.
CALIBRATION_QUERY = "projection_cast_rename"
CALIBRATION_THROUGHPUT_QUERY = "tpch_q1"


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import statistics

    spark = session.get_spark("bench")
    qs = plans.queries()
    names = [n for n in HEADLINE if n in qs]
    heavy_pool = [n for n in HEAVY if n in qs]
    # Local-iteration / harness-test filter: run only the named queries
    # (comma-separated), applied to both tiers.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",")}
        names = [n for n in names if n in keep]
        heavy_pool = [n for n in heavy_pool if n in keep]
        # Registered queries outside both tiers run in the headline tier,
        # so ad-hoc anchors (e.g. the 100x dedup re-anchors, VERDICT r11
        # task 2) go through the SAME interleaved median-of-N + stamps
        # protocol instead of hand-rolled timing loops.
        tiered = set(names) | set(heavy_pool)
        names += [n for n in sorted(keep) if n in qs and n not in tiered]

    # Warm the JVM / file listings once with the cheapest query so the
    # first timed entry doesn't absorb session start-up cost.
    _force(qs["distinct_segments"](spark, SF_DIR))
    # Warm both calibration plans (twice — codegen compiles on the
    # first run, JIT settles on the second): their stamps must measure
    # host conditions, not plan compilation.
    for _ in range(2):
        _force(qs[CALIBRATION_QUERY](spark, SF_DIR))
        _force(qs[CALIBRATION_THROUGHPUT_QUERY](spark, SF_DIR))

    def _timed(name: str) -> float:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        return time.perf_counter() - t0

    calibration: list[float] = []
    calibration_tp: list[float] = []

    def _stamp() -> None:
        calibration.append(round(_timed(CALIBRATION_QUERY), 3))
        calibration_tp.append(round(_timed(CALIBRATION_THROUGHPUT_QUERY), 3))

    # Interleaved round-robin passes (VERDICT r10 task 1a): every query
    # runs once per pass, so back-to-back repeats of one query can never
    # share a single contention window. Calibration stamps (task 1b)
    # bracket the block: start, middle (between passes, or mid-pass for
    # REPEATS=1), end.
    n_passes = max(REPEATS, 1)
    _stamp()
    runs_by_name: dict[str, list[float]] = {n: [] for n in names}
    mid_stamped = False
    for pass_i in range(n_passes):
        for qi, name in enumerate(names):
            runs_by_name[name].append(_timed(name))
            # Mid-block stamp: halfway through the full run sequence.
            total_done = pass_i * len(names) + qi + 1
            if total_done == (n_passes * len(names)) // 2:
                _stamp()
                mid_stamped = True
    if not mid_stamped:
        # Degenerate slices (n_passes*len(names) < 2, e.g. a one-query
        # SPARK_GRAFT_BENCH_ONLY with REPEATS=1) never hit the halfway
        # index — emit the mid stamp here so the JSON always carries the
        # documented 5-stamp calibration shape (ADVICE r11).
        _stamp()
    _stamp()
    timings = {
        name: round(statistics.median(runs), 3)
        for name, runs in runs_by_name.items()
    }
    # Steal-robust lower bound: the per-query MINIMUM across passes is
    # the best estimate of uncontended cost (CPU steal only ever adds
    # time). Sum-of-minima ≈ sum-of-medians on a clean host; a large
    # gap between the two is contention the per-stamp probes may have
    # missed (bursts shorter than the stamp interval — observed r12:
    # a contended=false run carried two queries whose minima sat at
    # their anchors while their medians read 2-5x).
    min_timings = {
        name: round(min(runs), 3) for name, runs in runs_by_name.items()
    }
    # Outlier forensics: for any query whose cross-pass spread exceeds 3x,
    # emit the raw per-pass times so a hot median is attributable from the
    # JSON alone (which pass, how bad) without a re-run.
    spreads = {
        name: [round(r, 3) for r in runs]
        for name, runs in runs_by_name.items()
        if len(runs) > 1 and max(runs) > 3 * min(runs)
    }

    # Heavy tier defaults to THREE interleaved passes (r12; was 2 in
    # r11, single-shot before that). A midpoint-of-2 absorbs only HALF
    # of a bad pass — r11's driver heavy read 135.9 s vs the 75.4 s
    # clean anchor purely because single spikes (admission drain raw
    # [17.65, 75.53]) pulled midpoints up — while a median-of-3 discards
    # a lone spike entirely, exactly as it did for the headline tier.
    # Costs ~+90 s of bench wall; the spread rows still expose raw
    # per-pass values and the bracketing stamps date any contention.
    heavy_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_REPEATS", "3"))
    heavy_timings: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY", "1") != "0":
        heavy_names = heavy_pool
        heavy_runs: dict[str, list[float]] = {n: [] for n in heavy_names}
        # Same interleaving as the headline tier; calibration stamps
        # bracket the block.
        _stamp()
        for _ in range(max(heavy_repeats, 1)):
            for name in heavy_names:
                heavy_runs[name].append(_timed(name))
        _stamp()
        heavy_timings = {
            name: round(statistics.median(runs), 3)
            for name, runs in heavy_runs.items()
        }
        heavy_min_total = round(
            sum(min(runs) for runs in heavy_runs.values()), 3
        )
        spreads.update(
            {
                name: [round(r, 3) for r in runs]
                for name, runs in heavy_runs.items()
                if len(runs) > 1 and max(runs) > 3 * min(runs)
            }
        )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "value_min": round(sum(min_timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # Host-band stamp (VERDICT r10 task 1b): wall seconds of the fixed
        # calibration plan at [headline start, headline middle, headline
        # end, heavy start, heavy end]. Same plan every time — spread
        # between stamps is host contention, not engine regression.
        "calibration": {
            "query": CALIBRATION_QUERY,
            "stamps_sec": calibration,
            "throughput_query": CALIBRATION_THROUGHPUT_QUERY,
            "throughput_stamps_sec": calibration_tp,
        },
    }
    # Self-adjudication (r12): fold the stamp arrays into explicit band
    # ratios and a verdict so a consumer reading ONE field knows whether
    # this window was clean — max/min over each probe's stamps; >3x on
    # either probe marks the run contended (same threshold as the raw
    # pass-spread forensics). The r11 driver run would have read
    # latency_band 127.9 / contended=true from its 0.29->37.08 spike.
    lat_band = round(max(calibration) / max(min(calibration), 1e-9), 1)
    tp_band = round(max(calibration_tp) / max(min(calibration_tp), 1e-9), 1)
    out["calibration"]["latency_band_ratio"] = lat_band
    out["calibration"]["throughput_band_ratio"] = tp_band
    out["calibration"]["contended"] = bool(lat_band > 3 or tp_band > 3)
    if spreads:
        out["pass_spreads_gt3x"] = spreads
    if heavy_timings:
        out["heavy"] = {
            "metric": "heavy_tier_total_sec",
            "value": round(sum(heavy_timings.values()), 3),
            "value_min": heavy_min_total,
            "queries": heavy_timings,
        }
    print(json.dumps(out))
    # VERDICT r4 task 5: the full line above carries ~80 per-query times
    # and the driver's capture keeps only the TAIL of stdout — round 4's
    # headline total was truncated out of BENCH_r04.json. Emit a compact
    # totals-only summary LAST so tail-truncation always preserves the
    # round's primary metric (consumers keep parsing the first line; the
    # summary is self-describing via "summary": true).
    summary = {
        "metric": "headline_queries_total_sec",
        "value": out["value"],
        "value_min": out["value_min"],
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_val,
        "summary": True,
        # VERDICT r12 task 2: the driver parses the LAST line, and two
        # rounds of per-query ground truth were lost because the dict
        # lived only on the (tail-truncated) first line. Carry the full
        # per-query timings here too — additive, ~5 KB, still one line.
        "queries": timings,
        "calibration_stamps_sec": calibration,
        "calibration_throughput_stamps_sec": calibration_tp,
        "contended": out["calibration"]["contended"],
    }
    if heavy_timings:
        summary["heavy_total"] = out["heavy"]["value"]
        summary["heavy_total_min"] = out["heavy"]["value_min"]
        summary["n_heavy"] = len(heavy_timings)
        summary["heavy"] = {"queries": heavy_timings}
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
