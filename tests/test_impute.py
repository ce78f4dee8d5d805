"""Linear-interpolation imputation invariants."""

from end_to_end_data_lakehouse_pipeline_spark.plans.timeseries import (
    build_interpolate_purchase_daily,
)


def test_interpolation_fills_every_spine_day(spark, sf_dir):
    rows = build_interpolate_purchase_daily(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r.value_filled is not None
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        days = [r.day for r in user_rows]
        # contiguous daily spine per user
        assert (max(days) - min(days)).days + 1 == len(days)
        # endpoints are observed, never interpolated
        assert user_rows[0].is_interpolated is False
        assert user_rows[-1].is_interpolated is False


def test_interpolated_values_between_neighbors(spark, sf_dir):
    rows = build_interpolate_purchase_daily(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for user_rows in by_user.values():
        obs = [(i, r.value_filled) for i, r in enumerate(user_rows) if not r.is_interpolated]
        for (i0, v0), (i1, v1) in zip(obs, obs[1:]):
            lo, hi = min(v0, v1), max(v0, v1)
            for r in user_rows[i0 + 1 : i1]:
                assert lo - 0.01 <= r.value_filled <= hi + 0.01, (r, v0, v1)
                checked += 1
    assert checked > 0
