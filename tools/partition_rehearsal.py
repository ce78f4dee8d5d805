"""Partition-pruning rehearsal at replica scale (VERDICT r5/r6 task 7).

Creates a TransactionLogTable over the scaled orders replica partitioned
hive-style by order month (the reference's ``PARTITION BY toYYYYMM``,
03_fact_tables.sql:53), then measures what a partition-predicate scan
physically touches: with one partition-value tuple per file recorded on
the add action, a single-month read must touch exactly that month's
files and a quarter read exactly three months' — EXACT pruning, not
stats-dependent — and an UPDATE discovery scan with a month predicate
must read only matching partitions.

Run:  python tools/partition_rehearsal.py [sf_dir]
Default /tmp/sfscale100 (the 100x replica).
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
from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
    TransactionLogTable,
)

WS = "/tmp/partition_rehearsal"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100"
    spark = session.get_spark("partition-rehearsal")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("o_month"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    shutil.rmtree(WS, ignore_errors=True)
    t = TransactionLogTable(
        spark, WS, stats_cols=("o_orderkey",), partition_by=("o_month",)
    )
    t0 = time.perf_counter()
    t.append(orders, sort_by=["o_orderkey"])
    snap = t.snapshot()
    months = sorted({e["partition"]["o_month"] for e in snap.values()})
    per_month = {}
    for e in snap.values():
        m = e["partition"]["o_month"]
        per_month[m] = per_month.get(m, 0) + 1
    print(
        json.dumps(
            {
                "rows": orders.count(),
                "files": len(snap),
                "months": len(months),
                "append_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )

    for label, lo, hi in (
        ("one_month", months[5], months[5]),
        ("quarter", months[6], months[8]),
    ):
        want = sum(n for m, n in per_month.items() if lo <= m <= hi)
        t0 = time.perf_counter()
        files = t.pruned_files("o_month", lo, hi)
        n_rows = t.read_pruned("o_month", lo, hi).count()
        print(
            json.dumps(
                {
                    "scan": label,
                    "files_touched": len(files),
                    "files_in_partitions": want,
                    "exact": len(files) == want,
                    "pct_of_table": round(100 * len(files) / len(snap), 2),
                    "rows": n_rows,
                    "sec": round(time.perf_counter() - t0, 1),
                }
            )
        )

    # UPDATE discovery with a partition predicate: candidates == the
    # target month's files, composed with the key-range stats prune
    target = months[9]
    cand = t._discovery_candidates(f"o_month = {target}", t.latest_version())
    print(
        json.dumps(
            {
                "update_discovery_month": target,
                "candidate_files": len(cand),
                "files_in_partition": per_month[target],
                "exact": len(cand) == per_month[target],
            }
        )
    )
    shutil.rmtree(WS, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
