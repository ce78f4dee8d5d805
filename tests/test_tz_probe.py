"""Session-timezone invariance — driver-contract hardening.

The driver calls queries() with its own SparkSession; nothing pins that
session's timezone. tools/tz_probe.py runs tz-sensitive queries under a
vanilla America/Sao_Paulo session and exact-compares against the
UTC-naive DuckDB oracle. Full 30-name sweep at sf0.01 passed 30/30 in
round 12; this test keeps a fast subset green at sf0.001 (subprocess —
the probe needs a session with a different timeZone than the shared
test session).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBSET = [
    "date_functions",      # the raw date/time function surface
    "time_dimension",      # calendar spine generation
    "mv_hourly_pattern",   # hour-of-day buckets (tz-shift-visible)
    "retention_cohorts",   # month truncation across a year boundary
    "hopping_event_counts",  # overlapping event-time windows
    "events_asof_last_order",  # as-of join on raw timestamps
    "user_weekday_bitmask",  # Mon=1 weekday parity
]


def test_tz_probe_subset():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "tz_probe.py"),
            "/root/testdata/sf0.001",
            *SUBSET,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-1000:]
    assert f"{len(SUBSET)}/{len(SUBSET)} tz-probe pass" in proc.stdout
