"""Self-measurement reports: the sketch must honor its own error
contract on the driver testdata."""

from end_to_end_data_lakehouse_pipeline_spark.plans.registry import queries


def test_approx_quantile_error_within_contract(spark, sf_dir):
    rows = queries()["approx_quantile_error_report"](spark, sf_dir).collect()
    assert len(rows) == 9  # 3 tables x 3 quantiles
    for r in rows:
        assert r.within_bound, (
            f"{r.table_name}.{r.column_name} q={r.q}: rank error over "
            f"bound {r.rank_error_bound}"
        )
        # the exact side is now the DISCRETE quantile (value at rank
        # ceil(q*n)) — present in the column and positive on this data
        assert r.exact_value > 0
        assert r.n > 0 and r.rank_error_bound == r.n / 1000 + 1
