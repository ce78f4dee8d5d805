"""External sinks (S8, load_warehouse.py:73-87).

The reference appends DataFrames to ClickHouse over JDBC with
batchsize=20000, preceded by an out-of-band HTTP TRUNCATE (S9). No
ClickHouse exists in this container, but the writers are LIVE-EXERCISED
end-to-end against embedded Derby (the JDBC driver pyspark ships for
its Hive metastore) in tests/test_sinks_jdbc.py — append, batched
write, and the truncate-refresh path all execute a real ``save()`` and
are read back over JDBC. Against a real warehouse only the URL/driver
options change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

DEFAULT_BATCHSIZE = 20_000  # load_warehouse.py:85


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = DEFAULT_BATCHSIZE,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrameWriter:
    """Configured JDBC writer (call ``.save()`` to execute).

    ``numPartitions`` caps parallel connections to the warehouse —
    executors each open one; 1000 executors hammering a warehouse is an
    outage, so cap explicitly at scale.
    """
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if num_partitions is not None:
        w = w.option("numPartitions", str(num_partitions))
    for k, v in options.items():
        w = w.option(k, v)
    return w


def jdbc_append(df: DataFrame, url: str, table: str, **kw) -> None:
    """S8: append df to a warehouse table (load_warehouse.py:73-87)."""
    jdbc_writer(df, url, table, **kw).save()


def warehouse_refresh(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = DEFAULT_BATCHSIZE,
    **options: str,
) -> None:
    """S9+S8: the reference's TRUNCATE-then-bulk-load warehouse refresh
    (load_warehouse.py:61-87 issues an out-of-band TRUNCATE, then the
    batched JDBC append). Spark-idiomatic form: ``overwrite`` with
    ``truncate=true`` makes the JDBC writer issue TRUNCATE TABLE —
    preserving the table's DDL, grants and engine settings, exactly why
    the reference truncates instead of dropping — followed by the same
    batched INSERT, as ONE operation with no side-channel client."""
    jdbc_writer(
        df, url, table, mode="overwrite", batchsize=batchsize,
        truncate="true", **options,
    ).save()
