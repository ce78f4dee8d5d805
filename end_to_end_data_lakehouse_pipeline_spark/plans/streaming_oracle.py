"""Oracle-checked streaming drains (VERDICT r2 task 4).

The streaming surface (streaming/aggregates.py, streaming/sessionize.py)
was pytest-only: exercised by unit tests but absent from the registered,
DuckDB-diffed query surface. These entries drive the REAL streaming
operators — file-source ``readStream`` → watermarked stateful transform →
``trigger(availableNow=True)`` drain — and return the drained result as a
batch DataFrame, so the driver's oracle compare covers the streaming
execution path end-to-end (reference anchor: streaming_bronze.py:95-110's
micro-batch machinery, upgraded with the ST4-ST6 stateful operators).

Determinism notes:
- One parquet file per table → availableNow processes it as one
  micro-batch; results are a pure function of the input file.
- Money/value sums stream as scaled-integer cents (plans/parity.py
  convention) — long sums are exact under any execution order, unlike
  double sums.
- Fresh uuid-named checkpoints/sinks per call: no state leaks between
  runs, every call recomputes from scratch.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.aggregates import streaming_daily_sales, trending_topk_sink
from ..streaming.sessionize import sessionize
from .advanced import SCD2_ORACLE, user_tier_changes
from .registry import register

_GAP_MINUTES = 30
_TOPK_K = 3


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table with the same nanos->
    timestamp conversion catalog.table() applies to the batch scan."""
    from ..catalog import ensure_read_confs

    # BEFORE the probe read: on a vanilla (driver-harness) session the
    # probe itself throws on INT64 TIMESTAMP(NANOS) parquet unless
    # nanosAsLong is already set. Idempotent — no per-query conf mutation
    # once the session is pinned.
    ensure_read_confs(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")  # schema probe
    # the file stream source requires a DIRECTORY: stream the sf dir with
    # a glob filter selecting just the events table file
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dtypes = dict(stream.dtypes)
    if dtypes.get("ts") == "bigint":  # TIMESTAMP(NANOS) read as long
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dtypes.get("ts") == "timestamp_ntz":
        # watermarks require TIMESTAMP (ltz); session tz is pinned UTC so
        # the naive->instant interpretation matches the UTC-naive oracle
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _drain_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """availableNow drain into a uniquely-named memory sink; returns the
    sink contents as a batch DataFrame.

    The sink table and checkpoint dir are torn down before returning —
    repeated invocations (diffcheck loops, bench REPEATS) must not pin
    every drained result in driver memory or grow /tmp without bound. The
    result is localized first (it is a bounded AGGREGATE output — daily
    rows / closed sessions — the S12 driver-fetch shape, not raw data)."""
    spark = df.sparkSession
    name = f"drain_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sink = spark.table(name)
        return spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)


STREAMING_DAILY_SALES_ORACLE = """
SELECT
    CAST(ts AS DATE) AS day,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
        AS total_value,
    ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
          / COUNT(*) / 100.0, 6) AS avg_value
FROM events
GROUP BY 1
"""


def streaming_daily_sales_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 through the real streaming path: watermark + 1-day event-time
    window maintained by the state store, drained with availableNow into
    a complete-mode memory sink. Values stream as cents (exact long sums);
    the final select converts back and recomputes avg from the exact sum."""
    events = _events_stream(spark, sf_dir).withColumn(
        "value_cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    daily = streaming_daily_sales(events, value_col="value_cents")
    out = _drain_to_memory(daily, "complete")
    return out.select(
        "day",
        "n_events",
        (F.col("total_value").cast("double") / 100.0).alias("total_value"),
        F.round(
            F.col("total_value").cast("double") / F.col("n_events") / 100.0, 6
        ).alias("avg_value"),
    )


register(
    "streaming_daily_sales_drain",
    oracle=STREAMING_DAILY_SALES_ORACLE,
    doc="ST5 watermarked daily window agg drained via availableNow; exact "
    "cents sums (streaming/aggregates.py:29; 04_materialized_views.sql:11-25).",
    tags=("streaming", "agg", "drain"),
)(streaming_daily_sales_drain)


SESSIONIZE_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {_GAP_MINUTES} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
    SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS UNBOUNDED PRECEDING
    ) AS sid
    FROM flagged
),
sessions AS (
    SELECT user_id, sid,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value,
           MAX(MAX(sid)) OVER (PARTITION BY user_id) AS max_sid
    FROM numbered
    GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events, total_value
FROM sessions
WHERE sid < max_sid  -- the final session per user is still OPEN in-stream
"""


def streaming_sessionize_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 through the real streaming path: gap-based sessionization via
    applyInPandasWithState, drained with availableNow. Emits CLOSED
    sessions only (each user's last session stays open in state) — the
    oracle is the gaps-and-islands SQL minus each user's final island.
    Values stream as integral cents-doubles so the in-state accumulation
    is exact in any order."""
    events = _events_stream(spark, sf_dir).select(
        "user_id",
        "ts",
        (F.round(F.col("value") * 100, 0)).alias("value"),  # integral double
    )
    sessions = sessionize(events, gap_minutes=_GAP_MINUTES)
    out = _drain_to_memory(sessions, "append")
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        (F.col("total_value") / 100.0).alias("total_value"),
    )


register(
    "streaming_sessionize_drain",
    oracle=SESSIONIZE_ORACLE,
    doc="ST6 applyInPandasWithState sessionization drained via availableNow; "
    "gaps-and-islands oracle (streaming/sessionize.py:47).",
    tags=("streaming", "stateful", "drain"),
)(streaming_sessionize_drain)


TRENDING_TOPK_ORACLE = f"""
WITH counts AS (
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY window_start
        ORDER BY n_events DESC, event_type ASC
    ) AS rnk
    FROM counts
)
SELECT window_start, event_type, n_events
FROM ranked
WHERE rnk <= {_TOPK_K}
"""


def streaming_trending_topk_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-k through the full serving pipeline: windowed counts in
    the state store → update-mode foreachBatch merge into a persisted
    counts table → per-window re-rank with dynamic partition overwrite
    (streaming/aggregates.py merge_topk_batch — the multi-batch-correct
    path, exercised here under the driver's oracle compare)."""
    events = _events_stream(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="topk_drain_")
    counts_path = os.path.join(base, "counts")
    topk_path = os.path.join(base, "topk")
    q = trending_topk_sink(
        events,
        counts_path,
        topk_path,
        os.path.join(base, "ckpt"),
        k=_TOPK_K,
        window="1 hour",
        available_now=True,
    )
    q.awaitTermination()
    try:
        res = spark.read.parquet(topk_path).select(
            "window_start", "event_type", "n_events"
        )
        # localize (k rows per window — bounded serving table) so the
        # backing /tmp tree can be removed before returning
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


register(
    "streaming_trending_topk_drain",
    oracle=TRENDING_TOPK_ORACLE,
    doc="Hourly trending top-k through the update-mode merge+re-rank serving "
    "sink (streaming/aggregates.py merge_topk_batch).",
    tags=("streaming", "topk", "drain"),
)(streaming_trending_topk_drain)


def streaming_scd2_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC -> SCD2 dimension maintenance through the real
    foreachBatch path: each micro-batch lands in bronze, only the touched
    keys' intervals are recomputed, and only the touched PK-hash buckets
    of the dimension are rewritten (streaming/scd2.py). The drained
    dimension must equal the batch SCD2 transform — same oracle as
    scd2_user_tier."""
    from ..streaming.scd2 import Scd2DimensionSink

    changes = user_tier_changes(_events_stream(spark, sf_dir))
    base = tempfile.mkdtemp(prefix="scd2_drain_")
    sink = Scd2DimensionSink(
        spark,
        bronze_path=os.path.join(base, "bronze"),
        dim_path=os.path.join(base, "dim"),
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        value="tier",
    )
    try:
        q = sink.sink(changes, checkpoint_path=os.path.join(base, "ckpt"))
        q.awaitTermination()
        res = sink.read_dim()
        # localize (one row per validity interval — dimension-sized) so
        # the backing /tmp tree can be removed before returning
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


register(
    "streaming_scd2_drain",
    oracle=SCD2_ORACLE,
    doc="SCD Type-2 dimension maintained by the streaming foreachBatch "
    "sink (bronze landing + touched-key partial recompute + touched-"
    "bucket dynamic overwrite); must equal the batch SCD2 transform.",
    tags=("streaming", "scd", "lakehouse", "drain"),
)(streaming_scd2_drain)


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (same shape as
    _events_stream: schema probe + glob filter on the sf directory)."""
    from ..catalog import ensure_read_confs

    ensure_read_confs(spark)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


STREAMING_DEDUP_ADMISSION_ORACLE = r"""
WITH f AS (
    SELECT doc_id, text,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
    FROM documents
),
ranked AS (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM f
)
SELECT doc_id, text FROM ranked WHERE rn = 1
"""


def streaming_dedup_admission_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming dedup admission gate (streaming/dedup_stream.py)
    driven end-to-end: documents stream -> foreachBatch gate -> corpus
    landing dirs. With one micro-batch over an empty corpus the admitted
    set is exactly the within-batch exact-dedup winners (min doc_id per
    normalized fingerprint) — the oracle above. Multi-batch and
    redelivery behavior is covered by the dedicated pytest fixtures."""
    from ..streaming.dedup_stream import incremental_dedup_sink

    docs = _documents_stream(spark, sf_dir).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="dedup_admission_")
    corpus = os.path.join(base, "corpus")
    try:
        q = incremental_dedup_sink(
            docs,
            corpus_path=corpus,
            matches_path=os.path.join(base, "matches"),
            checkpoint=os.path.join(base, "ckpt"),
        )
        q.awaitTermination()
        res = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(corpus)
            .select("doc_id", "text")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


register(
    "streaming_dedup_admission_drain",
    oracle=STREAMING_DEDUP_ADMISSION_ORACLE,
    doc="Streaming dedup admission gate drained via availableNow: the "
    "real foreachBatch corpus-landing path; single-batch result equals "
    "exact-dedup winners (redelivery/multi-batch under pytest).",
    tags=("streaming", "dedup", "drain"),
)(streaming_dedup_admission_drain)


STREAM_STREAM_JOIN_ORACLE = """
SELECT v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       v.user_id,
       v.ts AS view_ts,
       p.ts AS purchase_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


def streaming_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join through the REAL streaming path: two
    watermarked event streams (views, purchases) joined on user with a
    1-hour event-time bound, drained via availableNow. Exercises the
    symmetric-hash-join state store (both sides buffer until the
    watermark releases them) — the streaming family that was pytest-only
    before this entry. Batch oracle: the equivalent time-bounded
    self-join of `events`."""
    from ..streaming.aggregates import streaming_orders_with_payments

    base = _events_stream(spark, sf_dir)
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = streaming_orders_with_payments(
        views,
        purchases,
        key="user_id",
        orders_ts="view_ts",
        payments_ts="purchase_ts",
        within="1 hour",
        watermark="2 hours",
    ).select("view_event_id", "purchase_event_id", "user_id", "view_ts", "purchase_ts")
    return _drain_to_memory(joined, "append")


register(
    "streaming_join_drain",
    oracle=STREAM_STREAM_JOIN_ORACLE,
    doc="Watermarked stream-stream inner join (1h event-time bound) via "
    "availableNow drain; symmetric hash-join state store end-to-end "
    "(streaming/aggregates.py:143).",
    tags=("streaming", "join", "drain"),
)(streaming_join_drain)
