"""Hive-style partition columns on TransactionLogTable (reference
streaming_bronze.py:102 partitionBy + 03_fact_tables.sql:53 PARTITION BY
toYYYYMM): one partition-value tuple per staged file, the tuple recorded
on the add action, exact pruning through the existing stats machinery,
and the invariant preserved across DML rewrites."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.catalog import table
from end_to_end_data_lakehouse_pipeline_spark.sources.lake_catalog import LakeCatalog
from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
    TransactionLogTable,
)


@pytest.fixture()
def monthly_orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("o_month"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )


@pytest.fixture()
def part_table(spark, tmp_path, monthly_orders):
    t = TransactionLogTable(
        spark,
        str(tmp_path / "t"),
        stats_cols=("o_orderkey",),
        partition_by=("o_month",),
    )
    t.append(monthly_orders, sort_by=["o_orderkey"])
    return t


def test_one_partition_value_per_file_and_recorded(part_table):
    snap = part_table.snapshot()
    months = set()
    for entry in snap.values():
        st = entry["stats"]["o_month"]
        assert st["min"] == st["max"], "file spans partition values"
        assert entry["partition"] == {"o_month": st["min"]}
        months.add(st["min"])
    assert len(snap) >= len(months) >= 2


def test_exact_partition_pruning(spark, part_table, monthly_orders):
    months = sorted(
        e["partition"]["o_month"] for e in part_table.snapshot().values()
    )
    lo, hi = months[1], months[3]
    pruned = part_table.pruned_files("o_month", lo, hi)
    # exact: every kept file's value is in range, count == months in range
    in_range = [m for m in months if lo <= m <= hi]
    assert len(pruned) == len(in_range)
    got = part_table.read_pruned("o_month", lo, hi).count()
    want = monthly_orders.filter(F.col("o_month").between(lo, hi)).count()
    assert got == want


def test_dml_rewrite_touches_only_matching_partition(part_table):
    months = sorted(
        e["partition"]["o_month"] for e in part_table.snapshot().values()
    )
    target = months[2]
    before = dict(part_table.snapshot())
    part_table.delete_where(f"o_month = {target} AND price_cents > 0")
    after = part_table.snapshot()
    # untouched partitions keep their exact files; rewritten files stay
    # single-valued on the partition column
    for name, entry in after.items():
        if entry["partition"]["o_month"] != target:
            assert name in before, "file outside the partition was rewritten"
        st = entry["stats"]["o_month"]
        assert st["min"] == st["max"]
    assert part_table.read().filter(F.col("o_month") == target).count() == 0


def test_catalog_ctas_partitioned_by_and_inference(spark, tmp_path, monthly_orders):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    monthly_orders.createOrReplaceTempView("orders_src")
    try:
        cat.sql(
            "CREATE TABLE op STATS ON (o_orderkey) PARTITIONED BY (o_month) "
            "AS SELECT * FROM orders_src"
        )
    finally:
        spark.catalog.dropTempView("orders_src")
    t = cat.table("op")
    assert all("partition" in e for e in t.snapshot().values())
    # a FRESH catalog instance (no in-memory state) infers the partition
    # spec from the log meta, so its appends keep the invariant
    cat2 = LakeCatalog(spark, str(tmp_path / "lake"))
    t2 = cat2.table("op")
    assert t2.partition_by == ("o_month",)
    extra = monthly_orders.limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000)
    )
    t2.append(extra)
    for e in t2.snapshot().values():
        st = e["stats"]["o_month"]
        assert st["min"] == st["max"]


def test_streaming_sink_into_partitioned_table(spark, tmp_path, monthly_orders):
    """The exactly-once streaming sink composes with partition_by: every
    micro-batch's staged files keep the one-value-per-file invariant (the
    reference's streaming partitionBy bronze, streaming_bronze.py:102)."""
    from end_to_end_data_lakehouse_pipeline_spark.streaming.txn_sink import (
        txnlog_append_sink,
    )

    in_dir = tmp_path / "in"
    monthly_orders.repartitionByRange(3, F.col("o_orderkey")).write.parquet(
        str(in_dir)
    )
    schema = spark.read.parquet(str(in_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    t = TransactionLogTable(
        spark,
        str(tmp_path / "t"),
        stats_cols=("o_orderkey",),
        partition_by=("o_month",),
    )
    q = txnlog_append_sink(
        stream,
        t,
        app_id="orders_ingest",
        checkpoint_path=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    snap = t.snapshot()
    for e in snap.values():
        st = e["stats"]["o_month"]
        assert st["min"] == st["max"] and e["partition"]["o_month"] == st["min"]
    assert t.read().count() == monthly_orders.count()
    # month pruning works on the streamed table
    months = sorted({e["partition"]["o_month"] for e in snap.values()})
    m = months[0]
    assert all(
        e["partition"]["o_month"] == m
        for n, e in snap.items()
        if os.path.join(t.path, n) in t.pruned_files("o_month", m, m)
    )
