"""Stateful-streaming skew rehearsal (VERDICT r4 task 7): the state-store
drains at 100x, uniform vs Zipf-skewed keys.

Round 4's Zipf work covered batch joins/aggs and 10x drains; the state
store's hot-key behavior (one user = ~5% of ALL events in sessionize /
running-totals / SCD2) was unmeasured at 100x. What skew can and cannot
do to each op:

- ``sessionize`` / ``running_user_totals`` hold O(1) state per key
  (open-session accumulator / lifetime counters), so the hot key can NOT
  blow up the state store. Its cost is the per-batch Arrow group: every
  micro-batch routes ~5% of its rows through ONE applyInPandasWithState
  group call on one task — a straggler, not a failure, and bounded by
  batch size (which the trigger controls), not by history.
- ``scd2`` recomputes the touched key's FULL interval list per batch:
  the hot key's change history is data-sized for that key, so its
  per-batch work GROWS with history — the one genuinely history-sized
  hot-key cost here (mitigation: per-key history capping or splitting
  tier-change compaction upstream; measured below so the cliff has a
  number).

This runner times the three registered drain drives on a uniform and a
Zipf replica of the same factor and reports the hot-key shape numbers
(hot-key row share, rows-per-batch through the hot group, SCD2 hot-key
dim rows). Also times ``term_zipf_fit`` and records the vocab size it
top-Ks (VERDICT r4 task 8: the fit never materializes a vocab-sized
rank; the 100x number documents what it avoided).

Run:  python tools/stateful_skew_rehearsal.py [skew_dir] [uniform_dir]
Defaults: /tmp/sfskew100 /tmp/sfscale100.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import plans, session

DRAINS = [
    "streaming_sessionize_drain",
    "streaming_running_totals_drain",
    "streaming_scd2_drain",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _hot_key_stats(spark, sf_dir: str) -> dict:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(1)
        .collect()[0]
    )
    return {
        "events": total,
        "hot_user": int(hot["user_id"]),
        "hot_rows": int(hot["n"]),
        "hot_share": round(hot["n"] / total, 4),
        # the drains split input into 3 micro-batches: rows through the
        # hot key's ONE group call per batch
        "hot_rows_per_batch": int(hot["n"] / 3),
    }


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew100"
    uniform_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale100"
    spark = session.get_spark("stateful-skew")
    qs = plans.queries()

    for tag, d in (("uniform", uniform_dir), ("zipf", skew_dir)):
        stats = _hot_key_stats(spark, d)
        print(json.dumps({"dataset": tag, "dir": d, **stats}))
        for name in DRAINS:
            t0 = time.perf_counter()
            out = qs[name](spark, d)
            _force(out)
            rec = {
                "dataset": tag,
                "drain": name,
                "sec": round(time.perf_counter() - t0, 1),
            }
            if name == "streaming_scd2_drain":
                # history-sized hot-key cost: the hot user's dim rows =
                # its tier-change count, recomputed in full per batch
                rec["hot_dim_rows"] = (
                    qs[name](spark, d)
                    .filter(F.col("user_id") == stats["hot_user"])
                    .count()
                )
            print(json.dumps(rec))

    # task 8: the Zipf fit's vocab — what the K-row top-K avoided ranking
    for tag, d in (("uniform", uniform_dir),):
        from end_to_end_data_lakehouse_pipeline_spark.plans.text import tokens_col

        docs = spark.read.parquet(f"{d}/documents.parquet")
        vocab = (
            docs.select(F.explode(tokens_col()).alias("t"))
            .select(F.lower("t").alias("term"))
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        _force(qs["term_zipf_fit"](spark, d))
        print(
            json.dumps(
                {
                    "dataset": tag,
                    "query": "term_zipf_fit",
                    "sec": round(time.perf_counter() - t0, 1),
                    "vocab_size": vocab,
                    "ranked_rows": 100,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
