"""Skew rehearsal (VERDICT r3 task 1): hot-key joins/aggs on the Zipf
replica — which plans AQE rescues, which need the salt.

Every scale rehearsal before round 4 replicated keys uniformly, so the
salted operators (operators/skew.py) and AQE's skew-join splitting had
never met actual skew. This runner times three shapes on a skewed
replica (``scaleup.py --skew zipf``: hot o_custkey/user_id = 5% of all
rows) and, for calibration, on the uniform replica of the same factor:

1. ``dim_join`` — orders ⋈ customer on the skewed FK, forced to a
   shuffle (sort-merge) join: 1:1 match, so the hot key inflates ONE
   reducer's input linearly. Variants: naive (AQE skew-split off),
   aqe (skew-split on, thresholds scaled down to the replica's partition
   sizes — at 100 TB the DEFAULTS fire at 256 MB), salted_join.
2. ``fact_fact_pairs`` — view×purchase pairs per user from events (the
   stream-join shape): hot-key cost is QUADRATIC (5%·N views × 5%·N
   purchases on one task) — the join that actually dies at 100 TB.
   Variants: naive / aqe / salted_join on the view side.
3. ``hot_agg`` — events groupBy(user_id) sum/count: plain vs
   salted_aggregate (AQE skew-split does not apply to aggregates).

Output: one JSON line per (dataset, shape, variant) with wall seconds,
plus a summary. Run:  python tools/skew_rehearsal.py [skew_dir] [uniform_dir]
Defaults: /tmp/sfskew10 /tmp/sfscale10.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import session
from end_to_end_data_lakehouse_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)

# AQE skew-split thresholds scaled to the rehearsal replica: the
# defaults (256 MB partition, factor 5) are sized for real clusters and
# never fire on a ~200 MB dataset; scaling them down lets the rehearsal
# demonstrate the SAME mechanism that fires at 100 TB with defaults.
AQE_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    _force(fn())
    return round(time.perf_counter() - t0, 3)


def _set(spark, conf: dict[str, str]):
    old = {}
    for k, v in conf.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return old


def _restore(spark, old: dict[str, str | None]):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def dim_join_variants(spark, d: str):
    orders = spark.read.parquet(f"{d}/orders.parquet").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = spark.read.parquet(f"{d}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )

    def naive():
        return orders.join(customer.hint("merge"), "o_custkey")

    def salted():
        return salted_join(orders, customer, "o_custkey")

    return {"naive": naive, "aqe": naive, "salted": salted}


def fact_fact_variants(spark, d: str):
    ev = spark.read.parquet(f"{d}/events.parquet").select("user_id", "event_type", "event_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", F.col("event_id").alias("v"))
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("event_id").alias("p"))

    def naive():
        return (
            views.join(buys.hint("merge"), "user_id")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )

    def salted():
        # salt the view side; purchases-per-user replicated S ways. The
        # per-user pair count is reassembled exactly by the second agg.
        return (
            salted_join(views, buys, "user_id")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )

    def algebraic():
        # the 100-TB-correct rewrite: a quadratic-OUTPUT hot key defeats
        # every join strategy (AQE splits input, salt spreads input, but
        # the pairs still get EMITTED); when the downstream only needs a
        # per-key aggregate of the cross product, compute it from the
        # per-side counts — two linear aggs, zero pair materialization.
        v = views.groupBy("user_id").agg(F.count(F.lit(1)).alias("nv"))
        b = buys.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb"))
        return v.join(b, "user_id").select(
            "user_id", (F.col("nv") * F.col("nb")).alias("n_pairs")
        )

    return {"naive": naive, "aqe": naive, "salted": salted, "algebraic": algebraic}


def hot_agg_variants(spark, d: str):
    # exact integer cents (plans/parity.py convention): double sums are
    # order-sensitive, which would fail the salted==naive equality check
    # for reasons that have nothing to do with the salt
    ev = spark.read.parquet(f"{d}/events.parquet").select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )

    def plain():
        return ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
        )

    def salted():
        return salted_aggregate(
            ev, ["user_id"], {"n": ("cents", "count"), "total": ("cents", "sum")}
        )

    return {"naive": plain, "salted": salted}


SHAPES = {
    "dim_join": dim_join_variants,
    "fact_fact_pairs": fact_fact_variants,
    "hot_agg": hot_agg_variants,
}


def main() -> None:
    """Env knobs for big-factor runs: SKEW_VARIANTS (comma list, e.g.
    'aqe,salted,algebraic' — naive fact_fact at 100x is output-quadratic
    and will not finish), SKEW_CHECK=0 to skip the exceptAll equality
    pass (itself join-output-sized), SKEW_SHAPES (comma list)."""
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew10"
    uniform_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale10"
    only_variants = set(
        v for v in os.environ.get("SKEW_VARIANTS", "").split(",") if v
    )
    only_shapes = set(v for v in os.environ.get("SKEW_SHAPES", "").split(",") if v)
    do_check = os.environ.get("SKEW_CHECK", "1") != "0"
    spark = session.get_spark(
        "skew_rehearsal",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    results: dict[str, dict[str, dict[str, float]]] = {}
    for label, d in (("skewed", skew_dir), ("uniform", uniform_dir)):
        if not os.path.isdir(d):
            continue
        results[label] = {}
        for shape, make in SHAPES.items():
            if only_shapes and shape not in only_shapes:
                continue
            variants = make(spark, d)
            out = {}
            for vname, fn in variants.items():
                if only_variants and vname not in only_variants:
                    continue
                if vname == "aqe":
                    old = _set(spark, AQE_SKEW_CONF)
                    try:
                        out[vname] = _timed(fn)
                    finally:
                        _restore(spark, old)
                elif vname == "naive" and shape != "hot_agg":
                    # AQE skew split OFF for the honest naive baseline
                    old = _set(spark, {"spark.sql.adaptive.skewJoin.enabled": "false"})
                    try:
                        out[vname] = _timed(fn)
                    finally:
                        _restore(spark, old)
                else:
                    out[vname] = _timed(fn)
            results[label][shape] = out
            print(json.dumps({"dataset": label, "shape": shape, **out}))
    # correctness spot-check: salted results equal naive on the skewed set
    checks = {}
    if do_check:
        for shape, make in SHAPES.items():
            if only_shapes and shape not in only_shapes:
                continue
            variants = make(spark, skew_dir)
            a = variants["naive"]().orderBy(*variants["naive"]().columns[:1])
            b = variants["salted"]().orderBy(*variants["salted"]().columns[:1])
            checks[shape] = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
            if "algebraic" in variants:
                c = variants["algebraic"]().orderBy("user_id")
                checks[shape + "_algebraic"] = (
                    a.exceptAll(c).isEmpty() and c.exceptAll(a).isEmpty()
                )
    payload = {"salted_equals_naive": checks, "results": results}
    out_path = os.environ.get("SKEW_REHEARSAL_OUT", "/tmp/skew_rehearsal.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
