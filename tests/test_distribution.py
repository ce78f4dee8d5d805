"""Distributed ranking, equi-depth histogram, and Pareto skyline tests."""

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.catalog import table
from end_to_end_data_lakehouse_pipeline_spark.functions.ranking import (
    global_row_number,
    ntile_from_rank,
)
from end_to_end_data_lakehouse_pipeline_spark.plans.distribution import (
    N_BUCKETS,
    build_equidepth_histogram_orders,
    build_pareto_frontier_parts,
)


def test_global_row_number_is_exact_permutation(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, total = global_row_number(
        orders, ["o_totalprice", "o_orderkey"], num_partitions=7
    )
    assert total == orders.count()
    rns = [r.rn for r in ranked.select("rn").collect()]
    assert sorted(rns) == list(range(1, total + 1))
    # rank order == sort order
    rows = ranked.orderBy("rn").collect()
    keys = [(r.o_totalprice, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_global_row_number_stable_across_actions(spark, sf_dir):
    # Regression: partition-id offsets drifted between jobs under AQE;
    # value-defined buckets must give identical ranks on re-execution.
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, _ = global_row_number(orders, ["o_totalprice", "o_orderkey"])
    a = {r.o_orderkey: r.rn for r in ranked.collect()}
    b = {r.o_orderkey: r.rn for r in ranked.collect()}
    assert a == b


def test_ntile_formula_matches_sql_semantics(spark):
    # 10 rows into 3 buckets -> sizes 4, 3, 3 (first total%n get q+1).
    df = spark.range(1, 11).select((F.col("id")).alias("rn"))
    out = df.select("rn", ntile_from_rank(F.col("rn"), 10, 3).alias("b")).collect()
    got = {r.rn: r.b for r in out}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3, 10: 3}


def test_equidepth_bucket_sizes_differ_by_at_most_one(spark, sf_dir):
    rows = build_equidepth_histogram_orders(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, N_BUCKETS + 1))
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # buckets tile the value range in order
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_total <= hi.min_total


def test_pareto_frontier_dominance(spark, sf_dir, duck):
    rows = build_pareto_frontier_parts(spark, sf_dir).collect()
    assert rows
    # NOT EXISTS probe: no part strictly dominates any frontier point.
    for r in rows:
        dominated = duck.execute(
            """
            SELECT COUNT(*) FROM part
            WHERE p_retailprice <= ? AND p_size >= ?
              AND (p_retailprice < ? OR p_size > ?)
            """,
            [r.price, r.size, r.price, r.size],
        ).fetchone()[0]
        assert dominated == 0, (r, dominated)
    # frontier is strictly increasing in size as price increases
    for lo, hi in zip(rows, rows[1:]):
        assert lo.price < hi.price and lo.size < hi.size


def test_global_row_number_low_cardinality_leading_key(spark):
    # ntile-by-status shape: constant leading key must NOT collapse to a
    # single-partition window — the sub-bucket refinement splits it.
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(
        F.lit(1.0).alias("k"), F.col("id").cast("double").alias("t")
    )
    ranked, total = global_row_number(df, ["k", "t"], num_partitions=8)
    rows = ranked.orderBy("rn").collect()
    assert total == 5000
    assert [r.rn for r in rows] == list(range(1, 5001))
    assert [r.t for r in rows] == sorted(r.t for r in rows)


def test_global_row_number_hot_bucket_multivalued_leading_key(spark):
    """ADVICE r4 medium (ranking.py): a hot bucket is a key RANGE — a
    heavy-hitter value PLUS continuous neighbors can share one quantile
    interval. Sub-splitting such a bucket on the second column alone
    reordered rows across leading-key values (larger k, small t ranked
    before smaller k, large t). The fix splits only the dominant value's
    rows; neighbors take boundary sub-buckets. Rank must equal exact
    (k, t) sort order."""
    from pyspark.sql import functions as F

    # 6000 rows at k=5.0 (the heavy hitter) + 3000 continuous neighbors
    # in (4.9990, 5.0010) — with 8 target buckets the hitter's bucket is
    # hot AND multi-valued on k.
    hot = spark.range(0, 6000).select(
        F.lit(5.0).alias("k"), F.col("id").cast("double").alias("t")
    )
    neighbors = spark.range(0, 3000).select(
        (F.lit(4.999) + (F.col("id") % 200) * F.lit(0.00001)).alias("k"),
        (F.lit(10000) + F.col("id")).cast("double").alias("t"),
    )
    df = hot.unionAll(neighbors)
    ranked, total = global_row_number(df, ["k", "t"], num_partitions=8)
    assert total == 9000
    rows = ranked.orderBy("rn").collect()
    assert [r.rn for r in rows] == list(range(1, 9001))
    keys = [(r.k, r.t) for r in rows]
    assert keys == sorted(keys)


def test_ntile_formula_property(spark, duck):
    """Closed-form NTILE from rank == the engines' own NTILE for random
    (total, n) — including total < n, total % n != 0, n = 1."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        total=st.integers(min_value=1, max_value=400),
        n=st.integers(min_value=1, max_value=17),
    )
    def check(total, n):
        got = {
            r.rn: r.b
            for r in spark.range(1, total + 1)
            .select(F.col("id").alias("rn"))
            .select("rn", ntile_from_rank(F.col("rn"), total, n).alias("b"))
            .collect()
        }
        want = {
            rn: b
            for rn, b in duck.execute(
                f"SELECT rn, CAST(NTILE({n}) OVER (ORDER BY rn) AS INT) "
                f"FROM (SELECT unnest(generate_series(1, {total})) AS rn)"
            ).fetchall()
        }
        assert got == want, (total, n)

    check()


def test_sequence_gaps_finds_in_bucket_and_seam_gaps(spark, duck):
    """orderkey_gaps' distributed core: gaps inside a bucket AND gaps
    that straddle bucket seams must both surface (oracle = DuckDB lead()
    over the same keys)."""
    from end_to_end_data_lakehouse_pipeline_spark.functions.ranking import (
        sequence_gaps,
    )

    keys = [k for k in range(1, 5001) if k % 97 != 0 and not 2000 <= k < 2300]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint").repartition(16)
    got = sorted(
        (r.gap_start, r.gap_end, r.gap_len)
        for r in sequence_gaps(df, "k").collect()
    )
    duck.execute("CREATE OR REPLACE TEMP TABLE seqk AS SELECT unnest(?) AS k", [keys])
    want = sorted(
        duck.execute(
            """
            WITH s AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nk FROM seqk)
            SELECT k + 1, nk - 1, nk - k - 1 FROM s WHERE nk - k > 1
            """
        ).fetchall()
    )
    assert got == want and len(got) > 10


def test_global_rank_cumsum_matches_python_prefix_sums(spark):
    from end_to_end_data_lakehouse_pipeline_spark.functions.ranking import (
        global_rank_cumsum,
    )

    df = spark.range(0, 3000).select(
        ((F.col("id") * 37) % 501).cast("double").alias("v"),
        F.col("id").alias("k"),
        ((F.col("id") % 13) + 1).alias("amt"),
    )
    out, total, total_sum = global_rank_cumsum(
        df, ["v", "k"], sum_col="amt", out_col="rn", cumsum_col="cs",
        num_partitions=8,
    )
    rows = sorted(
        ((r.v, r.k, r.amt, r.rn, r.cs) for r in out.collect()),
        key=lambda x: (x[0], x[1]),
    )
    assert total == 3000
    run = 0
    for i, (v, k, amt, rn, cs) in enumerate(rows, start=1):
        run += amt
        assert rn == i and cs == run, (i, rn, cs, run)
    assert total_sum == run


def test_global_running_max_matches_single_partition_window(spark):
    """global_running_max == the exclusive-frame MAX window, at any
    bucket count (partition-invariance of the distributed construction)."""
    import random

    from pyspark.sql import Window

    from end_to_end_data_lakehouse_pipeline_spark.functions.ranking import (
        global_running_max,
    )

    rng = random.Random(7)
    rows = [(float(i) + rng.random() * 0.5, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "price double, best int").repartition(7)
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("prev_max", F.max("best").over(w))
    for parts in (1, 4, 32):
        got = global_running_max(df, "price", "best", num_partitions=parts)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
