"""Typed CDC envelope parsing (Debezium-shaped).

The reference parses CDC JSON as ``Map<String,String>`` and casts late
(batch_silver.py:60-82), which string-types every silver column. Here the
envelope is a typed ``from_json`` over an explicit StructType per table —
the upgrade SURVEY.md §1.3 calls for. Envelope shape per
FIXTURES.md §2 / debezium/connector_config.json:22-24:

- ``before`` / ``after``: row images (table-specific payload struct);
  deletes carry ``after = null`` and the image in ``before``
  (batch_silver.py:78-82).
- ``op``: c / u / d / r.
- ``source_ts_ms``: epoch millis; payload timestamps arrive as epoch
  MICROS longs (``time.precision.mode=adaptive_time_microseconds``,
  connector_config.json:24) — decode with ``timestamp_micros``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


CDC_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("snapshot", T.StringType(), True),
    ]
)


def CDC_ENVELOPE_SCHEMA(payload: T.StructType) -> T.StructType:
    """Envelope schema parameterized by the per-table payload struct.

    Includes the Debezium ``source`` block (connector/table/lsn metadata —
    the reference's topic parsing at batch_silver.py:60-82 relies on it for
    multi-table routing); producers that omit it parse fine (nullable)."""
    return T.StructType(
        [
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("source_ts_ms", T.LongType(), True),
            T.StructField("source", CDC_SOURCE_SCHEMA, True),
        ]
    )


def micros_to_ts(col: Column | str) -> Column:
    """Debezium adaptive_time_microseconds long -> timestamp
    (batch_gold.py:60-64 divides by 1e6; integer micros keeps precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(c.cast("long"))


def split_corrupt_cdc(
    raw: DataFrame,
    payload: T.StructType,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: (parseable, corrupt). A malformed JSON value (or
    one missing the op field) silently nulls through ``from_json``; at
    scale silent nulls become silent data loss, so corrupt rows are routed
    to a quarantine table for replay instead. Both outputs are lazy
    filters over one parse — Catalyst evaluates from_json once per side,
    no extra shuffle."""
    env = F.from_json(F.col(value_col), CDC_ENVELOPE_SCHEMA(payload))
    ok = env.isNotNull() & env.getField("op").isNotNull()
    return raw.filter(ok), raw.filter(~ok | F.col(value_col).isNull())


def parse_cdc_envelope(
    raw: DataFrame,
    payload: T.StructType,
    value_col: str = "value",
    order_col: str = "_event_ts",
) -> DataFrame:
    """Raw JSON strings -> one typed row per change event.

    Output: payload columns (delete events use the ``before`` image,
    batch_silver.py:78-82), plus ``_op``, ``_deleted``
    (batch_silver.py:66-70), ``order_col`` (the last-write-wins
    ordering key; the reference uses ``_kafka_timestamp``,
    batch_silver.py:107), and the source-metadata columns
    ``_source_table`` / ``_source_lsn`` (Debezium ``source`` block —
    multi-table routing and total ordering within a transaction log,
    batch_silver.py:60-82; null when the producer omits the block).
    """
    env = raw.withColumn("_env", F.from_json(F.col(value_col), CDC_ENVELOPE_SCHEMA(payload)))
    image = F.when(
        F.col("_env.op") == "d", F.col("_env.before")
    ).otherwise(F.col("_env.after"))
    out = env.select(
        *[c for c in raw.columns if c != value_col],
        image.alias("_image"),
        F.col("_env.op").alias("_op"),
        (F.col("_env.op") == "d").alias("_deleted"),
        F.timestamp_millis(F.col("_env.source_ts_ms")).alias(order_col),
        F.col("_env.source.table").alias("_source_table"),
        F.col("_env.source.lsn").alias("_source_lsn"),
    )
    return out.select(
        *[F.col(f"_image.{f.name}").alias(f.name) for f in payload.fields],
        *[c for c in out.columns if c != "_image"],
    )
