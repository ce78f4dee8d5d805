"""Salted operators must be algebraically equal to their unsalted forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.operators import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture()
def skewed(spark):
    # one hot key (h carries 80% of rows) + a long tail
    rows = [("h", i, float(i % 7)) for i in range(400)] + [
        (f"k{i%25}", i, float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "id", "v"])


def test_salted_aggregate_equals_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.sum("v").alias("sv"),
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("mn"),
            F.max("id").alias("mx"),
        )
    )
    salted = salted_aggregate(
        skewed,
        ["k"],
        {"sv": ("v", "sum"), "n": ("id", "count"), "mn": ("id", "min"), "mx": ("id", "max")},
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, skewed, how):
    dim = spark.createDataFrame(
        [("h", "hot-dim"), ("k3", "d3"), ("zz", "unused")], ["k", "label"]
    )
    plain = skewed.join(dim, "k", how).select("k", "id", "v", "label")
    salted = salted_join(skewed, dim, "k", n_salts=4, how=how).select(
        "k", "id", "v", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_rejects_nondecomposable(spark, skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"a": ("v", "avg")})


def test_crossproduct_aggregate_equals_literal_join(spark):
    from end_to_end_data_lakehouse_pipeline_spark.operators import (
        crossproduct_aggregate,
    )

    left = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 5), (3, 7)], ["k", "x"]
    )
    right = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (4, 40)], ["k", "y"]
    )
    got = {
        r.k: (r.n_pairs, r.xy_sum)
        for r in crossproduct_aggregate(
            left, right, "k", {"n_pairs": ("1", "1"), "xy_sum": ("x", "y")}
        ).collect()
    }
    lit = (
        left.join(right, "k")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x") * F.col("y")).alias("s"),
        )
    )
    want = {r.k: (r.n, r.s) for r in lit.collect()}
    assert got == want
    assert got[1] == (4, (2 + 3) * (10 + 20))  # product-of-sums identity
    assert 3 not in got and 4 not in got  # inner-match semantics
