"""Steady-state cost profile of streaming_dedup_admission_drain
(VERDICT r11 task 4): the suite's most expensive query at every decade
and its contention bellwether. Attributes the drain's wall clock across

  - split_input : one-time 3-way doc_id%3 parquet split (builder setup)
  - batch_prep  : per-batch within-batch exact dedup (+cache)
  - corpus_read : per-batch corpus-index parquet read + persist
  - exact_gate  : per-batch fingerprint anti-join against the index
  - near_verify : per-batch DF-capped shingle-verified near rejection
  - write       : per-batch matches + survivors parquet writes
  - stream_fixed: total - setup - sum(stages) — micro-batch machinery,
                  checkpoint commits, file listings, trigger scheduling

via the opt-in PROFILE hook in streaming/dedup_stream.gate_batch (the
REAL code path, not a replica — the hook only adds stage-boundary
count() calls whose results the cached frames reuse). Median-of-N
(default 3) with the bench latency probe stamped between runs so a
contended window is visible in the output.

Usage: python tools/admission_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_lakehouse_pipeline_spark import session
from end_to_end_data_lakehouse_pipeline_spark import plans
from end_to_end_data_lakehouse_pipeline_spark.streaming import dedup_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = session.get_spark("admission_profile")
    qs = plans.queries()

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _stamp() -> float:
        t0 = time.perf_counter()
        _force(qs["projection_cast_rename"](spark, sf_dir))
        return round(time.perf_counter() - t0, 3)

    # warm the session (JVM, file listings, codegen) exactly like bench.py
    _force(qs["distinct_segments"](spark, sf_dir))
    for _ in range(2):
        _stamp()

    from end_to_end_data_lakehouse_pipeline_spark.plans.streaming_oracle import (
        _split_input_mod,
    )
    from end_to_end_data_lakehouse_pipeline_spark.plans.workspace import (
        session_dir,
    )

    runs: list[dict] = []
    stamps = [_stamp()]
    for _ in range(repeats):
        # the builder's one-time setup, timed via a separate identical
        # invocation (the drain below re-splits into its own fresh
        # session_dir; this estimates that cost so the residual line is
        # pure streaming machinery)
        t0 = time.perf_counter()
        _split_input_mod(
            spark, sf_dir, "documents.parquet", "doc_id", session_dir("adm_prof")
        )
        split_est = round(time.perf_counter() - t0, 3)
        dedup_stream.PROFILE = []
        t0 = time.perf_counter()
        _force(qs["streaming_dedup_admission_drain"](spark, sf_dir))
        total = round(time.perf_counter() - t0, 3)
        prof, dedup_stream.PROFILE = dedup_stream.PROFILE, None
        stage_sum = round(
            sum(v for b in prof for k, v in b.items() if k.endswith("_sec")), 3
        )
        runs.append(
            {
                "total_sec": total,
                "split_input_est_sec": split_est,
                "stream_fixed_sec": round(total - stage_sum - split_est, 3),
                "batches": prof,
            }
        )
        stamps.append(_stamp())

    # per-stage medians across runs (summed over the 3 batches first)
    stages = sorted(
        {k for r in runs for b in r["batches"] for k in b if k.endswith("_sec")}
    )
    med = {
        "total_sec": round(statistics.median(r["total_sec"] for r in runs), 3),
        "split_input_est_sec": round(
            statistics.median(r["split_input_est_sec"] for r in runs), 3
        ),
        "stream_fixed_sec": round(
            statistics.median(r["stream_fixed_sec"] for r in runs), 3
        ),
    }
    for s in stages:
        med[s] = round(
            statistics.median(
                sum(b.get(s, 0.0) for b in r["batches"]) for r in runs
            ),
            3,
        )
    print(
        json.dumps(
            {
                "metric": "admission_drain_profile",
                "sf_dir": sf_dir,
                "repeats": repeats,
                "median": med,
                "runs": runs,
                "calibration_stamps_sec": stamps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
