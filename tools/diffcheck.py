"""Local differential harness — mimics the driver's correctness gate.

For every registered query: run the Spark plan and the DuckDB oracle on the
same parquet tables, then compare row count, column names/dtypes, and exact
values after sorting rows (strictly stronger than the driver's
order-insensitive value hash — if this passes, the driver's hash matches).

Usage:  python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def load_oracle(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    from end_to_end_data_lakehouse_pipeline_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.map(lambda v: None if v is None else str(v))
        elif str(s.dtype).startswith(("datetime", "date")):
            s = s.astype("datetime64[us]").astype(str)
        elif s.dtype.kind in "iu":
            s = s.astype("int64")
        elif s.dtype.kind == "f":
            s = s.astype("float64")
        elif s.dtype.kind == "b":
            s = s.astype("int64")
        out[c] = s
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    sdt = {c: spark_pdf[c].dtype.kind for c in sc}
    odt = {c: oracle_pdf[c].dtype.kind for c in oc}
    for c in sc:
        # int vs float is a real mismatch; everything object-ish is fine
        if sdt[c] != odt[c] and {sdt[c], odt[c]} <= {"i", "u", "f"} and sdt[c] != odt[c]:
            if {sdt[c], odt[c]} == {"i", "u"}:
                continue
            problems.append(f"dtype[{c}] spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f":
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                idx = (~eq).idxmax()
                diff = np.nanmax(np.abs(av.fillna(0) - bv.fillna(0)))
                problems.append(
                    f"values[{c}] first mismatch row {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r} maxabsdiff={diff:g}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"values[{c}] first mismatch row {idx}: spark={av[idx]!r} oracle={bv[idx]!r}"
                )
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from end_to_end_data_lakehouse_pipeline_spark import plans
    from end_to_end_data_lakehouse_pipeline_spark.session import get_spark

    spark = get_spark("diffcheck")
    con = duckdb.connect()
    load_oracle(con, sf_dir)

    specs = plans.specs()
    names = [n for n in specs if not only or n in only]
    failed = []
    # --json: the driver's CORRECTNESS artifact shape per query, so the
    # never-driver-sampled families (txnlog/connector/drain/tpch/mv) have
    # an auditable self-measured record (VERDICT r4 task 4). The local
    # compare is exact-value (strictly stronger than the driver's hash),
    # so hash_match=true here implies the driver's hash would match.
    results: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        t0 = time.time()
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": None,
            "spark_rows": None,
        }
        results[name] = rec
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            rec["spark_rows"] = len(spark_pdf)
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            rec["err"] = "spark_error"
            failed.append(name)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows={len(spark_pdf)} (no oracle; rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            rec["err"] = "no_oracle"
            continue
        try:
            oracle_pdf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: oracle error\n{traceback.format_exc()}")
            rec["err"] = "oracle_error"
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        rec["rows_match"] = not any(p.startswith("rowcount") for p in problems)
        rec["schema_match"] = not any(
            p.startswith(("columns", "dtype")) for p in problems
        )
        rec["hash_match"] = not problems
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(spark_pdf)} match [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match", f"failed: {failed}" if failed else "")
    if json_out:
        import json

        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(names),
            "n_match": len(names) - len(failed),
            "failed": failed,
            "compare": "exact-value (sorted rows; stronger than value-hash)",
            "queries": results,
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
