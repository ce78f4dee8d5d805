"""Self-measurement reports: the sketch must honor its own error
contract on the driver testdata."""

from end_to_end_data_lakehouse_pipeline_spark.plans.registry import queries


def test_approx_quantile_error_within_contract(spark, sf_dir):
    rows = queries()["approx_quantile_error_report"](spark, sf_dir).collect()
    assert len(rows) == 9  # 3 tables x 3 quantiles
    for r in rows:
        assert r.within_bound, (
            f"{r.table_name}.{r.column_name} q={r.q}: rank_error "
            f"{r.rank_error} > bound {r.rank_error_bound}"
        )
        # sanity: approx is a real element from the column, so it cannot
        # stray far from exact in value either on this data
        assert r.approx_value <= r.exact_value * 1.5 + 1
