"""embedding_pca_variance properties: trace preservation, ordering,
partitioning-invariance (exact integer partials), and the oracled
contract-check face (VERDICT r9 task 2)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans.registry import queries
from end_to_end_data_lakehouse_pipeline_spark.plans.similarity import (
    pca_spectrum,
    quantized,
)
from end_to_end_data_lakehouse_pipeline_spark.catalog import table


@pytest.fixture(scope="module")
def spectrum_rows(spark, sf_dir):
    q = table(spark, sf_dir, "embeddings").select(quantized().alias("qa"))
    return pca_spectrum(q, spark).collect()


def test_spectrum_shape_and_order(spectrum_rows):
    assert len(spectrum_rows) == 64
    ev = [r.eigenvalue for r in spectrum_rows]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert all(e >= -1e-9 for e in ev)  # covariance is PSD
    assert spectrum_rows[-1].cum_ratio == pytest.approx(1.0, abs=1e-6)


def test_trace_equals_total_variance(spark, sf_dir, spectrum_rows):
    """Sum of eigenvalues == sum of per-dimension variances (trace
    preservation) — computed independently via a Catalyst aggregate."""
    emb = table(spark, sf_dir, "embeddings").select(quantized().alias("qa"))
    d = 64
    per_dim = emb.select(
        *[F.element_at("qa", i + 1).alias(f"x{i}") for i in range(d)]
    )
    row = per_dim.agg(
        *[F.var_samp(f"x{i}").alias(f"v{i}") for i in range(d)]
    ).first()
    trace = sum(row[f"v{i}"] for i in range(d)) / 1e12
    assert sum(r.eigenvalue for r in spectrum_rows) == pytest.approx(
        trace, rel=1e-6
    )


def test_pca_contract_check(spark, sf_dir, spectrum_rows):
    """The registered query is now a contract check: D rows, every eigh
    invariant boolean deterministically TRUE, and the exact integer trace
    numerator consistent with the spectrum's eigenvalue sum."""
    rows = queries()["embedding_pca_variance"](spark, sf_dir).collect()
    assert len(rows) == 64
    assert [r.component for r in rows] == list(range(1, 65))
    for r in rows:
        assert r.eig_sum_matches_trace and r.eig_nonneg and r.eig_sorted_desc
        assert r.ratio_in_unit and r.cum_ratio_monotone and r.ratios_sum_to_one
    n = rows[0].n
    assert n == table(spark, sf_dir, "embeddings").count()
    trace = int(rows[0].trace_num) / (n * (n - 1)) / 1e12
    # spectrum eigenvalues are presented on a 1e-9 grid: 64 roundings
    # bound the sum error at 3.2e-8 absolute
    assert sum(r.eigenvalue for r in spectrum_rows) == pytest.approx(
        trace, rel=1e-6
    )


def test_partitioning_invariance(spark, sf_dir):
    """Exact int64 partials: the spectrum is bit-identical no matter how
    the rows are partitioned (the property double partials would lose)."""
    q = table(spark, sf_dir, "embeddings").select(quantized().alias("qa"))
    one = pca_spectrum(q.repartition(1), spark).collect()
    many = pca_spectrum(q.repartition(13, "qa"), spark).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_suffstats_empty_corpus_and_chunk_invariance(spark, sf_dir, tmp_path):
    """ADVICE r8: (a) an empty embeddings table returns the oracle-shaped
    n=0 row instead of IndexError; (b) the int64-overflow chunking emits
    values identical to the unchunked path (driver re-sums exactly)."""
    from end_to_end_data_lakehouse_pipeline_spark.plans.similarity import (
        build_embedding_covariance_suffstats,
    )

    # (a) empty corpus under a synthetic sf_dir
    empty_dir = tmp_path / "sf_empty"
    empty_dir.mkdir()
    table(spark, sf_dir, "embeddings").limit(0).write.parquet(
        str(empty_dir / "embeddings.parquet")
    )
    rows = build_embedding_covariance_suffstats(spark, str(empty_dir)).collect()
    assert [tuple(r) for r in rows] == [("n", 0, 0, "0")]

    # the contract query mirrors its oracle on the degenerate corpus:
    # D rows, NULL trace, TRUE booleans
    crows = queries()["embedding_pca_variance"](spark, str(empty_dir)).collect()
    assert len(crows) == 64
    assert crows[0].n == 0 and crows[0].trace_num is None

    # (b) chunking is value-invariant: force tiny Arrow batches so every
    # partition splits, and compare against the one-batch run
    base = build_embedding_covariance_suffstats(spark, sf_dir).collect()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        chunked = build_embedding_covariance_suffstats(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert [tuple(r) for r in base] == [tuple(r) for r in chunked]
