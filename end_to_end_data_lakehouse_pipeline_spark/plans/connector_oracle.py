"""Oracle-checked drives of the Python DataSource connectors.

Same motivation as streaming_oracle.py / txnlog_oracle.py: the
connectors (sources/duckdb_source.py, sources/txnlog_source.py) are the
engine's S-family extension surface — if they are pytest-only, the
driver's differential gate never exercises them. These entries run the
REAL read paths — `format("duckdb")` partitioned Arrow reads out of an
embedded warehouse, and `format("txnlog")` streaming change-feed drain —
and return aggregates a pure SQL twin reproduces over the same base
tables. `ensure_shipped` zips the package onto the executors at runtime
so the entries hold in ANY harness session, not just ones launched with
PYTHONPATH set (reference anchor: load_warehouse.py:61-87, the
partitioned JDBC warehouse read these connectors re-express)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_read_confs
from ..sources.shiplib import ensure_shipped
from .parity import o_sum
from .registry import register
from .workspace import session_dir

DUCKDB_ROUNDTRIP_ORACLE = f"""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {o_sum('o_totalprice', 'revenue')}
FROM orders
GROUP BY 1
"""


def build_duckdb_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the warehouse connector: load orders into an
    embedded DuckDB file, read it back via ``format("duckdb")`` with
    4-way stride partitioning (pushdown off: works under any session
    conf), aggregate in Spark. The oracle aggregates the same parquet
    directly — any row lost/duplicated by the stride predicates or
    mistyped by the Arrow transport breaks the exact-cents totals."""
    import duckdb

    from ..sources.duckdb_source import DuckDBDataSource

    ensure_shipped(spark)
    try:
        spark.dataSource.register(DuckDBDataSource)
    except Exception:
        pass  # already registered in this session
    ws = session_dir("duckdb_roundtrip")
    db = os.path.join(ws, "wh.duckdb")
    con = duckdb.connect(db)
    src = f"{sf_dir}/orders.parquet"
    if os.path.isdir(src):  # scaled replicas are multi-file tables
        src = f"{src}/*.parquet"
    con.sql(
        "CREATE TABLE orders AS SELECT o_orderkey, o_orderstatus, "
        f"o_totalprice FROM read_parquet('{src}')"
    )
    con.close()
    df = (
        spark.read.format("duckdb")
        .option("database", db)
        .option("table", "orders")
        .option("pushdown", "false")
        .option("partition_column", "o_orderkey")
        .option("num_partitions", "4")
        .load()
    )
    out = df.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("revenue"),
    )
    return out  # distributed: workspace is session-scoped


register(
    "duckdb_source_roundtrip",
    oracle=DUCKDB_ROUNDTRIP_ORACLE,
    doc="Warehouse-connector round-trip: orders -> embedded DuckDB -> "
    "format('duckdb') 4-way stride-partitioned Arrow read -> exact-cents "
    "aggregate equals the direct oracle aggregation.",
    tags=("connector", "source", "duckdb"),
)(build_duckdb_source_roundtrip)


TXNLOG_STREAM_FEED_ORACLE = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
"""


def build_txnlog_stream_feed_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming change feed end-to-end: documents land in a txnlog table
    across TWO commits, ``readStream.format("txnlog")`` drains both
    micro-batch version ranges via availableNow into a parquet sink, and
    the drained corpus aggregates to exactly the base table's per-source
    totals — a dropped or re-emitted file breaks the counts."""
    from ..sources.txnlog import TransactionLogTable
    from ..sources.txnlog_source import TxnlogDataSource

    ensure_shipped(spark)
    try:
        spark.dataSource.register(TxnlogDataSource)
    except Exception:
        pass
    ensure_read_confs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    ws = session_dir("txnlog_feed")
    t = TransactionLogTable(spark, os.path.join(ws, "t"), stats_cols=("doc_id",))
    t.append(docs.filter(F.col("doc_id") % 2 == 0), sort_by=["doc_id"])
    t.append(docs.filter(F.col("doc_id") % 2 == 1), sort_by=["doc_id"])
    out_dir, ckpt = os.path.join(ws, "out"), os.path.join(ws, "ck")
    q = (
        spark.readStream.format("txnlog")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    agg = (
        spark.read.parquet(out_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return agg  # distributed: workspace is session-scoped


register(
    "txnlog_stream_feed_drain",
    oracle=TXNLOG_STREAM_FEED_ORACLE,
    doc="format('txnlog') streaming change feed drained via availableNow "
    "over a two-commit table; per-source totals equal the base table's.",
    tags=("connector", "streaming", "txnlog", "drain"),
)(build_txnlog_stream_feed_drain)
