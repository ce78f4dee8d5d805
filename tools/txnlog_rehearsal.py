"""Transaction-log write-path rehearsal (VERDICT r3 task 6).

The merge/CDF drives were rehearsed at 10x only; this runs the ACID
write path at an arbitrary replica factor — append, file-level MERGE
touching a contiguous 1% key range, stats-pruned read, CDF refresh —
and the log-layer microbench (commit loop + checkpointed replay) at
10K commits. Records the file-rewrite fraction: the 100 TB claim is
that a merge over 1% of the key space rewrites ~1% of files (+ the
boundary files), not the table.

Run:  python tools/txnlog_rehearsal.py [sf_dir] [n_files] [n_commits]
Defaults: /tmp/sfscale100 640 10000. Writes JSON to
$TXNLOG_REHEARSAL_OUT (default /tmp/txnlog_rehearsal.json).
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
from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
    TransactionLogTable,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    n_commits = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = session.get_spark("txnlog_rehearsal")
    out: dict = {"sf_dir": sf_dir, "n_files": n_files}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.lit(1).cast("long").alias("updated_at"),
    )
    lo, hi, n_rows = orders.agg(
        F.min("k"), F.max("k"), F.count(F.lit(1))
    ).first()
    out["n_rows"] = n_rows

    base = tempfile.mkdtemp(prefix="txnlog_rehearsal_")
    try:
        t = TransactionLogTable(spark, os.path.join(base, "t"), stats_cols=("k",))
        t0 = time.perf_counter()
        t.append(orders, sort_by=["k"], n_files=n_files)
        out["append_sec"] = round(time.perf_counter() - t0, 2)
        v1 = t.latest_version()
        total_files = len(t.snapshot())
        out["files_after_append"] = total_files

        # contiguous 1% key range
        span = hi - lo + 1
        r_lo, r_hi = lo, lo + span // 100
        updates = (
            orders.filter((F.col("k") >= r_lo) & (F.col("k") < r_hi))
            .withColumn("status", F.lit("X"))
            .withColumn("updated_at", F.lit(2).cast("long"))
            .withColumn("_deleted", F.lit(False))
        )
        out["merge_update_rows"] = updates.count()
        before = set(t.snapshot())
        t0 = time.perf_counter()
        t.merge(updates, pks=["k"], order_col="updated_at")
        out["merge_sec"] = round(time.perf_counter() - t0, 2)
        after = set(t.snapshot())
        rewritten = len(before - after)
        out["merge_files_rewritten"] = rewritten
        out["merge_rewrite_fraction"] = round(rewritten / total_files, 4)

        t0 = time.perf_counter()
        n_pruned = len(t.pruned_files("k", lo=r_lo, hi=r_hi - 1))
        out["pruned_read_sec"] = round(time.perf_counter() - t0, 3)
        out["pruned_files_touched"] = n_pruned
        out["pruned_files_total"] = len(after)

        t0 = time.perf_counter()
        cdf = t.read_changes(v1, pks=["k"])
        out["cdf_rows"] = cdf.count()
        out["cdf_sec"] = round(time.perf_counter() - t0, 2)

        # UPDATE WHERE on the NEXT contiguous 1% range (VERDICT r4 task
        # 2 done-criterion): stats-seeded discovery must plan its
        # verifying scan over ~the merge path's 1%, not 100%
        u_lo, u_hi = r_hi, r_hi + span // 100
        cond = f"k >= {u_lo} AND k < {u_hi}"
        head = t.latest_version()
        cands = t._discovery_candidates(cond, head)
        out["update_discovery_candidates"] = len(cands)
        out["update_discovery_fraction"] = round(
            len(cands) / len(t.snapshot(head)), 4
        )
        before_u = set(t.snapshot())
        t0 = time.perf_counter()
        t.update_where(cond, {"status": "'Y'"})
        out["update_where_sec"] = round(time.perf_counter() - t0, 2)
        after_u = set(t.snapshot())
        out["update_files_rewritten"] = len(before_u - after_u)
        out["update_rewrite_fraction"] = round(
            len(before_u - after_u) / len(before_u), 4
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # log-layer microbench: pure driver-side commit loop + replay
    base = tempfile.mkdtemp(prefix="txnlog_log_")
    try:
        t = TransactionLogTable(spark, os.path.join(base, "l"), checkpoint_interval=10)
        t0 = time.perf_counter()
        for v in range(1, n_commits + 1):
            t._commit(v, [{"meta": {"op": "append", "version": v}},
                          {"add": {"name": f"part-{v}.parquet", "bytes": 1}}])
        out["commit_loop_sec"] = round(time.perf_counter() - t0, 2)
        out["n_commits"] = n_commits
        t0 = time.perf_counter()
        snap = t.snapshot(n_commits)
        out["replay_checkpointed_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        out["snapshot_files"] = len(snap)
        # full replay: remove checkpoints from consideration by replaying
        # from scratch with a table handle whose checkpoints are hidden
        cps = [
            os.path.join(t.path, "_txn_log", f)
            for f in os.listdir(os.path.join(t.path, "_txn_log"))
            if f.endswith(".checkpoint.json")
        ]
        for f in cps:
            os.rename(f, f + ".hidden")
        t0 = time.perf_counter()
        assert len(t.snapshot(n_commits)) == len(snap)
        out["replay_full_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    path = os.environ.get("TXNLOG_REHEARSAL_OUT", "/tmp/txnlog_rehearsal.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
