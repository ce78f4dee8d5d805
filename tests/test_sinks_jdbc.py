"""Live JDBC sink tests (S8/S9) against embedded Derby.

The reference loads ClickHouse over JDBC (load_warehouse.py:73-87,
batchsize 20000) after a TRUNCATE (S9). pyspark bundles the Derby
driver (for its Hive metastore), so the exact writer code paths —
batched append and truncate-refresh — execute a real ``save()`` here
and are verified by reading the table back over JDBC.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.sources.sinks import (
    jdbc_append,
    warehouse_refresh,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/wh;create=true"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def test_jdbc_append_and_readback(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").alias("pk"), (F.col("id") % 7).alias("v")
    )
    jdbc_append(df, derby_url, "t_append", driver=DRIVER, num_partitions=2)
    assert _read(spark, derby_url, "t_append").count() == 100
    # S8 is APPEND semantics: a second load adds, never replaces
    jdbc_append(df, derby_url, "t_append", driver=DRIVER)
    out = _read(spark, derby_url, "t_append")
    assert out.count() == 200
    assert out.agg(F.sum("v")).first()[0] == 2 * sum(i % 7 for i in range(100))


def test_warehouse_refresh_truncates_not_drops(spark, derby_url):
    df1 = spark.range(0, 80).select(F.col("id").alias("pk"))
    jdbc_append(df1, derby_url, "t_refresh", driver=DRIVER)
    assert _read(spark, derby_url, "t_refresh").count() == 80
    # refresh replaces contents via TRUNCATE + batched insert (S9+S8)
    df2 = spark.range(1000, 1050).select(F.col("id").alias("pk"))
    warehouse_refresh(df2, derby_url, "t_refresh", driver=DRIVER)
    out = _read(spark, derby_url, "t_refresh")
    assert out.count() == 50
    assert out.agg(F.min("pk")).first()[0] == 1000


def test_jdbc_batchsize_smaller_than_rows(spark, derby_url):
    # batchsize below row count forces multiple executeBatch round trips
    df = spark.range(0, 500).select(F.col("id").alias("pk"))
    jdbc_append(df, derby_url, "t_batch", driver=DRIVER, batchsize=64)
    assert _read(spark, derby_url, "t_batch").count() == 500
