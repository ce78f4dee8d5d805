"""Runnable medallion pipeline (the reference's four jobs in one CLI).

Mirrors streaming_bronze.py -> batch_silver.py -> batch_gold.py as one
operable flow on a local lakehouse root:

    python -m end_to_end_data_lakehouse_pipeline_spark.jobs /tmp/lake --seconds 10

1. bronze: rate-source synthetic CDC (streaming/generator.py) streamed
   through the foreachBatch append sink for ``--seconds``.
2. silver: typed envelope parse + dead-letter split + MERGE upsert
   (last-write-wins, delete-filtered).
3. gold: daily revenue aggregate, overwritten atomically.

Each stage is also importable for orchestration (Airflow-style callers
use run_bronze/run_silver/run_gold directly).
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sources import LakehouseTable, parse_cdc_envelope
from .sources.cdc import split_corrupt_cdc
from .sources.txnlog import TransactionLogTable
from .streaming.bronze import process_cdc_stream
from .streaming.generator import synthetic_cdc_stream

ORDER_PAYLOAD = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("order_status", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def run_bronze(spark: SparkSession, lake: str, seconds: float, rows_per_second: int = 200) -> None:
    stream = synthetic_cdc_stream(spark, rows_per_second=rows_per_second)
    q = process_cdc_stream(
        stream,
        "orders",
        f"{lake}/bronze/orders",
        f"{lake}/_checkpoints/bronze_orders",
        trigger="1 seconds",
    )
    deadline = time.time() + seconds
    while time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)


def _table(spark: SparkSession, path: str, acid: bool):
    """Silver/gold table factory. ``acid=True`` (default) routes through
    the transaction log — the reference's production posture
    (batch_silver.py:146-159 is DeltaTable.merge; TransactionLogTable is
    this engine's log-backed equivalent: atomic commits, snapshot
    isolation, file-level merge, time travel). ``acid=False`` keeps the
    dir-swap LakehouseTable for environments where the plain-parquet
    layout must stay directly readable by other tools."""
    if acid:
        return TransactionLogTable(spark, path, stats_cols=("order_id",))
    return LakehouseTable(spark, path)


def run_silver(spark: SparkSession, lake: str, acid: bool = True) -> tuple[int, int]:
    bronze = LakehouseTable(spark, f"{lake}/bronze/orders").read().select(
        F.col("_raw_value").alias("value")
    )
    ok, bad = split_corrupt_cdc(bronze, ORDER_PAYLOAD)
    if not bad.isEmpty():
        LakehouseTable(spark, f"{lake}/quarantine/orders").append(bad)
    parsed = parse_cdc_envelope(ok, ORDER_PAYLOAD)
    silver = _table(spark, f"{lake}/silver/orders", acid)
    silver.merge(parsed, pks=["order_id"], order_col="_event_ts")
    return silver.read().count(), bad.count()


def run_gold(spark: SparkSession, lake: str, acid: bool = True) -> int:
    silver = _table(spark, f"{lake}/silver/orders", acid).read()
    daily = silver.groupBy("order_status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("amount").alias("revenue"),
    )
    gold = _table(spark, f"{lake}/gold/status_summary", acid)
    gold.overwrite(daily)
    if acid:
        # gold is a SERVING table: vacuum superseded files right away so a
        # consumer that (wrongly but commonly) reads the directory with
        # plain spark.read.parquet sees only the live snapshot instead of
        # every refresh's files side by side. The trade is no gold time
        # travel — silver keeps its full history for that. retention 0 is
        # safe only because this pipeline is gold's sole writer.
        gold.vacuum(retain_versions=0, retention_seconds=0)
    return gold.read().count()


def run_medallion(
    spark: SparkSession, lake: str, seconds: float = 10.0, acid: bool = True
) -> dict[str, int]:
    run_bronze(spark, lake, seconds)
    n_silver, n_quarantined = run_silver(spark, lake, acid)
    n_gold = run_gold(spark, lake, acid)
    return {"silver_rows": n_silver, "quarantined": n_quarantined, "gold_rows": n_gold}


def main() -> None:
    from .session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("lake", help="lakehouse root directory")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument(
        "--no-acid",
        action="store_true",
        help="use dir-swap parquet tables instead of the transaction log",
    )
    args = ap.parse_args()
    spark = get_spark("medallion")
    stats = run_medallion(spark, args.lake, args.seconds, acid=not args.no_acid)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
