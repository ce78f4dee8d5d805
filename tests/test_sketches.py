"""Count-Min / HLL sketch operators: invariants + oracle parity."""

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans.sketches import (
    CMS_ROWS,
    CMS_TOP_K,
    CMS_WIDTH,
    build_countmin_term_counts,
    build_hll_vocab_report,
)


def test_countmin_never_underestimates(spark, sf_dir):
    rows = build_countmin_term_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= CMS_TOP_K
    for r in rows:
        # CMS is additive over colliding terms: estimate >= exact always.
        assert r.overestimate >= 0, r
        assert r.cms_estimate == r.exact_freq + r.overestimate


def test_countmin_exact_freqs_match_direct_count(spark, sf_dir):
    from end_to_end_data_lakehouse_pipeline_spark.catalog import table
    from end_to_end_data_lakehouse_pipeline_spark.plans.text import tokens_col

    docs = table(spark, sf_dir, "documents")
    direct = dict(
        docs.select(F.explode(tokens_col()).alias("t"))
        .select(F.lower("t").alias("term"))
        .groupBy("term")
        .count()
        .collect()
    )
    for r in build_countmin_term_counts(spark, sf_dir).collect():
        assert direct[r.term] == r.exact_freq


def test_countmin_sketch_size_is_bounded(spark, sf_dir):
    # The sketch itself never exceeds D*W cells regardless of corpus size.
    from end_to_end_data_lakehouse_pipeline_spark.catalog import table
    from end_to_end_data_lakehouse_pipeline_spark.plans.sketches import _bucket_col
    from end_to_end_data_lakehouse_pipeline_spark.plans.text import tokens_col

    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens_col()).alias("t"))
        .select(F.lower("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    probes = wc.select(
        F.posexplode(
            F.array(*[_bucket_col(r).cast("long") for r in range(CMS_ROWS)])
        ).alias("r", "bucket")
    )
    n_cells = probes.distinct().count()
    assert n_cells <= CMS_ROWS * CMS_WIDTH


def test_hll_within_tolerance_everywhere(spark, sf_dir):
    rows = build_hll_vocab_report(spark, sf_dir).collect()
    assert rows, "expected at least one source"
    for r in rows:
        assert r.within_tol is True, r
        assert r.exact_vocab <= r.n_tokens


# Oracle parity for both queries rides tests/test_oracle_parity.py's
# parametrized sweep over the registry — no duplicate here.


def test_join_size_cms_never_underestimates(spark, sf_dir):
    from end_to_end_data_lakehouse_pipeline_spark.plans.sketches import (
        build_join_size_estimate_cms,
    )

    row = build_join_size_estimate_cms(spark, sf_dir).collect()[0]
    assert row.exact_size > 0
    assert row.overestimate >= 0
    assert row.cms_estimate == row.exact_size + row.overestimate
    # 4x1024 grid on these key cardinalities: estimate should be tight
    assert row.rel_error_ppm < 250_000
