"""Contract test for bench.py — the driver's per-round BENCH artifact.

The bench JSON is a graded deliverable with a specific shape (per-query
cross-pass medians, dual calibration stamps, >3x spread forensics, a
tail summary line that survives stdout truncation). Runs bench.py in a
subprocess (main() stops its SparkSession, so it must not share the
test session) on a 3-query headline + 1-query heavy slice at sf0.001
via the SPARK_GRAFT_BENCH_ONLY filter.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY=(
            "orders_enriched,dedup_exact,hash_sample,vocab_growth_curve"
        ),
        SPARK_GRAFT_BENCH_REPEATS="2",
        SPARK_GRAFT_BENCH_HEAVY_REPEATS="2",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 2, proc.stdout[-2000:]
    full, summary = (json.loads(ln) for ln in lines)

    # full line: per-query medians for exactly the headline slice
    assert full["metric"] == "headline_queries_total_sec"
    assert set(full["queries"]) == {"orders_enriched", "dedup_exact", "hash_sample"}
    assert full["sf"] == 0.001
    assert all(v > 0 for v in full["queries"].values())
    assert abs(full["value"] - sum(full["queries"].values())) < 0.01

    # steal-robust lower bound (r12): sum of per-query MIN passes — never
    # above the sum of medians, positive, mirrored in the tail summary
    assert 0 < full["value_min"] <= full["value"] + 0.01

    # calibration: both probes, stamps at [headline start, middle, end,
    # heavy start, heavy end] = 5 each, all positive
    cal = full["calibration"]
    assert cal["query"] == "projection_cast_rename"
    assert cal["throughput_query"] == "tpch_q1"
    assert len(cal["stamps_sec"]) == 5
    assert len(cal["throughput_stamps_sec"]) == 5
    assert all(s > 0 for s in cal["stamps_sec"] + cal["throughput_stamps_sec"])

    # self-adjudication (r12): band ratios + contended verdict derived
    # from the stamps themselves, mirrored into the tail summary
    assert cal["latency_band_ratio"] >= 1
    assert cal["throughput_band_ratio"] >= 1
    assert cal["contended"] == (
        cal["latency_band_ratio"] > 3 or cal["throughput_band_ratio"] > 3
    )

    # heavy tier: the filtered single entry, median of 2 interleaved passes
    assert set(full["heavy"]["queries"]) == {"vocab_growth_curve"}
    assert full["heavy"]["value"] == sum(full["heavy"]["queries"].values())
    assert 0 < full["heavy"]["value_min"] <= full["heavy"]["value"] + 0.01

    # spread forensics, when present, carry the raw per-pass runs
    for runs in full.get("pass_spreads_gt3x", {}).values():
        assert len(runs) == 2 and max(runs) > 3 * min(runs)

    # tail summary line: truncation-safe totals + both stamp series
    assert summary["summary"] is True
    assert summary["value"] == full["value"]
    assert summary["n_queries"] == 3
    assert summary["heavy_total"] == full["heavy"]["value"]
    assert summary["calibration_stamps_sec"] == cal["stamps_sec"]
    assert summary["calibration_throughput_stamps_sec"] == cal["throughput_stamps_sec"]
    assert summary["contended"] == cal["contended"]
    assert summary["value_min"] == full["value_min"]
    assert summary["heavy_total_min"] == full["heavy"]["value_min"]


def test_bench_degenerate_slice_keeps_stamp_shape():
    """ADVICE r11: a one-query headline with REPEATS=1 has no in-loop
    halfway index (1*1 // 2 == 0), so the mid stamp must be emitted
    after the pass loop — the calibration contract is ALWAYS 5 stamps
    (headline start/mid/end + heavy start/end), never a silent 4."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="orders_enriched",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_BENCH_HEAVY_REPEATS="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    full = json.loads(lines[0])
    assert set(full["queries"]) == {"orders_enriched"}
    cal = full["calibration"]
    assert len(cal["stamps_sec"]) == 5
    assert len(cal["throughput_stamps_sec"]) == 5
    # heavy pool filtered empty -> no heavy block in the JSON, but its
    # bracketing stamps still fired (the block runs, the dict is empty)
    assert "heavy" not in full
