"""Medallion silver-merge rehearsal (VERDICT r7 task 1 done-criterion).

``medallion_e2e_drain``'s silver layer now runs per-micro-batch
file-level ACID merges (TransactionLogTable.merge) instead of the
O(table) LakehouseTable full rewrite. This measures, on a scaled
replica, that per-batch merge cost is bounded by TOUCHED FILES, not
table size:

  1. bootstrap a silver table (latest state per user_id, the drain's
     exact column shape) at ``n_files`` files range-sorted by user_id;
  2. key-slice batch — updates touching a contiguous 1% user_id range:
     the file-level merge must rewrite ~1% of files; the same batch
     through LakehouseTable.merge (the shape removed from the drain)
     is the O(table) comparison number;
  3. time-slice batch — the drain's honest per-micro-batch shape (a
     new time window hits scattered keys): recorded so the report is
     not just the flattering case;
  4. event-grain table — the drain's silver is user-grain (key
     cardinality caps at ~13K users), so the asymptotic contrast is
     run on the reference's order-grain shape (batch_silver.py keys
     silver on order_id): a row-per-event table (10M rows at 100x)
     takes a 1% key-range batch through the file-level merge (flat,
     ~1% of files) and through the LakehouseTable full rewrite
     (O(table) — the number that grows with the table forever).

Run:  python tools/medallion_rehearsal.py [sf_dir] [n_files]
Defaults: /tmp/sfscale100 200. Writes JSON to
$MEDALLION_REHEARSAL_OUT (default /tmp/medallion_rehearsal.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import session
from end_to_end_data_lakehouse_pipeline_spark.sources.lakehouse import (
    LakehouseTable,
    merge_upsert,
)
from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
    TransactionLogTable,
)


def drain_updates(spark, sf_dir: str):
    """The medallion_e2e_drain silver update shape, straight from events
    (scaled replicas read ts as TIMESTAMP_NTZ -> cast first)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("status"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.to_date("ts").alias("day"),
        (F.unix_millis("ts") * F.lit(1048576) + F.col("event_id")).alias(
            "order_key"
        ),
        (F.col("event_id") % 10 == 0).alias("_deleted"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = session.get_spark("medallion_rehearsal")
    out: dict = {"sf_dir": sf_dir, "n_files": n_files}

    updates = drain_updates(spark, sf_dir)
    lo, hi, n_rows = updates.agg(
        F.min("order_key"), F.max("order_key"), F.count(F.lit(1))
    ).first()
    out["event_rows"] = n_rows
    cut = lo + (hi - lo) * 99 // 100  # last 1% of event time = the batch
    boot = updates.filter(F.col("order_key") < cut)
    inc_time = updates.filter(F.col("order_key") >= cut)

    base = tempfile.mkdtemp(prefix="medallion_rehearsal_")
    try:
        # bootstrap: latest state per user at the cut, n_files key-sorted
        boot_latest = merge_upsert(
            None, boot, ["user_id"], "order_key"
        ).drop("_deleted")
        t = TransactionLogTable(
            spark, os.path.join(base, "silver"), stats_cols=("user_id",)
        )
        t0 = time.perf_counter()
        t.append(boot_latest, sort_by=["user_id"], n_files=n_files)
        out["bootstrap_sec"] = round(time.perf_counter() - t0, 2)
        out["silver_rows"] = boot_latest.count()
        total_files = len(t.snapshot())
        out["files_after_bootstrap"] = total_files
        # clone the bootstrapped state for the second experiment (pure
        # filesystem copy — both experiments start from identical state)
        shutil.copytree(
            os.path.join(base, "silver"), os.path.join(base, "silver_kb")
        )

        # --- time-slice batch (the drain's honest per-batch shape) ---
        out["time_batch_rows"] = inc_time.count()
        before = set(t.snapshot())
        t0 = time.perf_counter()
        t.merge(inc_time, pks=["user_id"], order_col="order_key")
        out["time_batch_merge_sec"] = round(time.perf_counter() - t0, 2)
        rewritten = len(before - set(t.snapshot()))
        out["time_batch_files_rewritten"] = rewritten
        out["time_batch_rewrite_fraction"] = round(rewritten / total_files, 4)

        # --- key-slice batch (contiguous ~1%-of-rows user_id range;
        # quantile cut, not span cut — replica striping makes the ID
        # space clustered, so a span fraction is not a row fraction) ---
        k_hi = boot_latest.stat.approxQuantile("user_id", [0.01], 0.001)[0]
        inc_keys = (
            boot_latest.filter(F.col("user_id") <= k_hi)
            .withColumn("status", F.lit("rehearsal"))
            .withColumn(
                "order_key", F.col("order_key") + F.lit(1 << 40).cast("long")
            )
            .withColumn("_deleted", F.lit(False))
        )
        out["key_batch_rows"] = inc_keys.count()
        t2 = TransactionLogTable(
            spark, os.path.join(base, "silver_kb"), stats_cols=("user_id",)
        )
        before = set(t2.snapshot())
        t0 = time.perf_counter()
        t2.merge(inc_keys, pks=["user_id"], order_col="order_key")
        out["key_batch_merge_sec"] = round(time.perf_counter() - t0, 2)
        rewritten = len(before - set(t2.snapshot()))
        out["key_batch_files_rewritten"] = rewritten
        out["key_batch_rewrite_fraction"] = round(rewritten / total_files, 4)

        # --- the removed shape: LakehouseTable full rewrite, same batch ---
        lk = LakehouseTable(spark, os.path.join(base, "silver_full"))
        lk.overwrite(boot_latest)
        t0 = time.perf_counter()
        lk.merge(inc_keys, pks=["user_id"], order_col="order_key")
        out["full_rewrite_merge_sec"] = round(time.perf_counter() - t0, 2)

        # --- event-grain (order_id-like PK, table >> batch) ---
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        fact = ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").alias("status"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (F.unix_millis("ts") * F.lit(1048576)).alias("order_key"),
        )
        e_hi = fact.stat.approxQuantile("event_id", [0.01], 0.0005)[0]
        e_files = max(n_files, 2)
        tg = TransactionLogTable(
            spark, os.path.join(base, "silver_ev"), stats_cols=("event_id",)
        )
        t0 = time.perf_counter()
        tg.append(fact, sort_by=["event_id"], n_files=e_files)
        out["event_grain_rows"] = n_rows
        out["event_grain_bootstrap_sec"] = round(time.perf_counter() - t0, 2)
        ev_total = len(tg.snapshot())
        out["event_grain_files"] = ev_total
        batch = (
            fact.filter(F.col("event_id") <= e_hi)
            .withColumn("status", F.lit("rehearsal"))
            .withColumn(
                "order_key", F.col("order_key") + F.lit(1 << 40).cast("long")
            )
            .withColumn("_deleted", F.lit(False))
        )
        out["event_grain_batch_rows"] = batch.count()
        before = set(tg.snapshot())
        t0 = time.perf_counter()
        tg.merge(batch, pks=["event_id"], order_col="order_key")
        out["event_grain_merge_sec"] = round(time.perf_counter() - t0, 2)
        rewritten = len(before - set(tg.snapshot()))
        out["event_grain_files_rewritten"] = rewritten
        out["event_grain_rewrite_fraction"] = round(rewritten / ev_total, 4)
        lk2 = LakehouseTable(spark, os.path.join(base, "silver_ev_full"))
        lk2.overwrite(fact)
        t0 = time.perf_counter()
        lk2.merge(batch, pks=["event_id"], order_col="order_key")
        out["event_grain_full_rewrite_sec"] = round(
            time.perf_counter() - t0, 2
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    path = os.environ.get(
        "MEDALLION_REHEARSAL_OUT", "/tmp/medallion_rehearsal.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
