"""External sinks (S8, load_warehouse.py:73-87).

The reference appends DataFrames to ClickHouse over JDBC with
batchsize=20000, preceded by an out-of-band HTTP TRUNCATE (S9). No
warehouse exists in this container, so this module is the tested-shape
writer: the option plumbing is exercised by constructing the writer; the
actual ``save()`` needs a live JDBC URL.
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
