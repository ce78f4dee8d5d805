"""Rate-limited synthetic CDC generator (SURVEY.md §7.1: replaces the
reference's driver-side Python generator, scripts/data_generator.py).

The reference emits ~10 orders/min from a single-threaded Python loop
into Postgres (data_generator.py:25-26, 375-384). Spark-first, the
generator IS a streaming source: the ``rate`` source produces (timestamp,
value) rows at a configured rows/sec entirely inside the engine, and a
deterministic projection turns each tick into a Debezium-shaped CDC
envelope — insert / update / delete mix controlled by hash buckets
(reference probabilities: 0.3 update, data_generator.py:25-26). Plug the
result straight into streaming.bronze.process_cdc_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UPDATE_PCT = 30  # data_generator.py:25: UPDATE_PROBABILITY = 0.3
DELETE_PCT = 5


def synthetic_cdc_stream(
    spark: SparkSession,
    rows_per_second: int = 10,
    n_keys: int = 1000,
) -> DataFrame:
    """Streaming DataFrame of CDC envelope JSON in a ``value`` column.

    Deterministic given the tick number: key = value % n_keys, op chosen
    by hash bucket, payload derived from the tick — so tests can assert
    exact outputs and checkpoint replays regenerate identical batches.
    """
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    tick = F.col("value")
    key = F.concat(F.lit("o"), (tick % n_keys).cast("string"))
    bucket = F.pmod(F.xxhash64(tick), F.lit(100))
    op = (
        F.when(bucket < DELETE_PCT, "d")
        .when(bucket < DELETE_PCT + UPDATE_PCT, "u")
        .otherwise("c")
    )
    status = F.element_at(
        F.array(F.lit("created"), F.lit("approved"), F.lit("shipped"), F.lit("delivered")),
        (F.pmod(F.xxhash64(tick, F.lit(1)), F.lit(4)) + 1).cast("int"),
    )
    amount = F.round(F.pmod(F.xxhash64(tick, F.lit(2)), F.lit(100000)) / 100.0, 2)
    image = F.to_json(
        F.struct(
            key.alias("order_id"),
            status.alias("order_status"),
            amount.alias("amount"),
        )
    )
    envelope = F.concat(
        F.lit('{"before": '),
        F.when(op == "d", image).otherwise(F.lit("null")),
        F.lit(', "after": '),
        F.when(op == "d", F.lit("null")).otherwise(image),
        F.lit(', "op": "'),
        op,
        F.lit('", "source_ts_ms": '),
        (F.unix_timestamp("timestamp") * 1000).cast("string"),
        F.lit("}"),
    )
    return rate.select(
        F.col("timestamp"),
        envelope.alias("value"),
    )
