#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench-tier queries into plans/<round>/ (default r13).

Usage:
    python tools/plan_capture.py <out_suffix> [query,query,...]

Writes plans/<round>/<query>_<out_suffix>.txt for every headline + heavy query
(or the given subset). Planning only — no jobs run — so this is cheap and
safe to run alongside other work. The judge checks plan claims
(Exchange counts, join strategies, PushedFilters) against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from end_to_end_data_lakehouse_pipeline_spark import plans, session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = session.get_spark("plan-capture")
    qs = plans.queries()
    names = [n for n in bench.HEADLINE + bench.HEAVY if n in qs]
    if only:
        names = [n for n in names if n in only]
    failed = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # drains/DML build state; record the reason
            failed.append(name)
            txt = f"PLAN CAPTURE FAILED for {name}: {type(e).__name__}: {e}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}")
    if failed:
        print(f"FAILED ({len(failed)}): {', '.join(failed)}")
    spark.stop()


if __name__ == "__main__":
    main()
