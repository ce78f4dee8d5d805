"""SCD2 hot-key compaction rehearsal (VERDICT r5/r6 task 6).

The stateful-skew rehearsal measured the one genuinely history-sized
hot-key cost in the engine: Scd2DimensionSink recomputes each touched
key's FULL interval history per micro-batch, so a Zipf hot key touched
every batch pays per-batch work that grows linearly with its lifetime
event count (47.5K rows re-read per batch at 100x Zipf). This runner
measures the fix — bronze value-run compaction (``compact_every`` +
``lateness``, streaming/scd2.py) — by driving the same time-ordered
change stream through the sink twice and reporting per-batch wall time
plus the hot key's physical bronze footprint:

- ``compaction=off``: the baseline; per-batch time and hot-key bronze
  rows grow with history.
- ``compaction=on`` (every 3 batches, 1-minute lateness): the hot key's
  bronze history collapses to its VALUE-CHANGE runs, so late batches
  re-read a bounded run list + the raw within-lateness tail, and the
  final dimension is asserted EQUAL to the uncompacted one.

Run:  python tools/scd2_compaction_rehearsal.py [skew_dir] [n_batches]
Default skew_dir /tmp/sfskew100 (the 100x Zipf replica), 9 batches.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import session
from end_to_end_data_lakehouse_pipeline_spark.plans.advanced import user_tier_changes
from end_to_end_data_lakehouse_pipeline_spark.streaming.scd2 import (
    BUCKET_COL,
    Scd2DimensionSink,
)

WS = "/tmp/scd2_compaction_rehearsal"


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew100"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = session.get_spark("scd2-compaction")
    ev = spark.read.parquet(f"{skew_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # 1-in-5 deterministic subsample keeps the rehearsal minutes-sized
    # while preserving the Zipf shape (the hot key keeps its share).
    changes = user_tier_changes(ev.filter(F.col("event_id") % 5 == 0)).cache()
    hot = (
        changes.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .first()
    )
    hot_user, hot_rows = int(hot["user_id"]), int(hot["n"])
    # the compaction floor: the hot key's VALUE-CHANGE count (a run
    # survives per change) — hot_bronze_rows_end lands at floor + the
    # raw within-lateness tail, however long the history grows
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hot_changes = (
        changes.filter(F.col("user_id") == hot_user)
        .withColumn("_prev", F.lag("tier").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("tier")))
        .count()
    )
    print(json.dumps({"hot_user": hot_user, "hot_rows": hot_rows,
                      "hot_value_changes_floor": hot_changes,
                      "total": changes.count()}))

    # time-ordered batch boundaries (arrival order = event-time order,
    # the lateness contract the drains also run under)
    bounds = (
        changes.select(F.unix_micros("ts").alias("e"))
        .approxQuantile("e", [i / n_batches for i in range(1, n_batches)], 0.001)
    )

    def batch_df(i: int):
        lo = None if i == 0 else bounds[i - 1]
        hi = None if i == n_batches - 1 else bounds[i]
        b = changes
        if lo is not None:
            b = b.filter(F.unix_micros("ts") >= lo)
        if hi is not None:
            b = b.filter(F.unix_micros("ts") < hi)
        return b

    results = {}
    for variant, compact_every in (("off", None), ("on", 3)):
        root = os.path.join(WS, variant)
        shutil.rmtree(root, ignore_errors=True)
        sink = Scd2DimensionSink(
            spark,
            bronze_path=os.path.join(root, "bronze"),
            dim_path=os.path.join(root, "dim"),
            key="user_id",
            ts="ts",
            tiebreak="event_id",
            value="tier",
            compact_every=compact_every,
            lateness="1 minute",
        )
        per_batch = []
        for i in range(n_batches):
            t0 = time.perf_counter()
            sink.upsert_batch(batch_df(i), batch_id=i)
            per_batch.append(round(time.perf_counter() - t0, 2))
        hot_bronze = (
            sink._read_bronze().filter(F.col("user_id") == hot_user).count()
        )
        results[variant] = sink
        print(
            json.dumps(
                {
                    "variant": variant,
                    "per_batch_sec": per_batch,
                    "last3_avg_sec": round(sum(per_batch[-3:]) / 3, 2),
                    "hot_bronze_rows_end": hot_bronze,
                    "manifest_gen": sink._manifest()["gen"],
                }
            )
        )

    # the two dimensions must be identical (compaction is exact within
    # the lateness bound; arrival here is time-ordered)
    a = results["off"].read_dim()
    b = results["on"].read_dim()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(json.dumps({"dim_rows": a.count(), "dim_diff_rows": diff}))
    assert diff == 0, "compacted dimension diverged from exact recompute"
    spark.stop()


if __name__ == "__main__":
    main()
