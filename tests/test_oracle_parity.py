"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (row count + schema + order-
insensitive values) but stricter: exact value equality after sorting.
"""

import pytest

from end_to_end_data_lakehouse_pipeline_spark import plans

SPECS = plans.specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from diffcheck import compare

    spec = SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check: plan executes
        return
    oracle_pdf = duck.execute(spec.oracle).df()
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
