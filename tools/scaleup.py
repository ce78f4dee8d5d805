"""Scale rehearsal: synthesize a ~Nx replica of a testdata dir (VERDICT
r2 task 7) so the headline set can be exercised at sf1-equivalent before
a real 100x. Catches anything that only works because the data is small:
broadcast OOM, driver collects proportional to data, single-file scans.

Replication is union-by-replica with key remapping — replica i offsets
every entity key by i * STRIDE so joins still resolve within a replica
and key cardinality grows linearly (a naive union would multiply fanout
per key instead of adding keys, which changes join output size
non-linearly). Timestamps are kept (grouping cardinality per day grows
linearly, the realistic shape). Document text gets a per-replica suffix
so the dedup family doesn't see a corpus that is 90% exact duplicates —
that would distort shingle DF caps rather than rehearse real scale.

region/nation are genuinely constant-size dims and are copied verbatim.

``--skew zipf`` (VERDICT r3 task 1): every rehearsal before round 4
replicated keys with constant per-key fanout, so AQE skew-join handling
and the salted operators had only ever met uniform data — and key skew
is the #1 way a real 100 TB join dies. In skew mode the FOREIGN-key
columns (orders.o_custkey, events.user_id) are redistributed with a
Zipf-1 head: the K=8 hottest keys take share 0.05/rank (hot key #1 holds
~5% of ALL rows across every replica — the heads are replica-0 keys, so
replication CONCENTRATES them instead of diluting), the remaining ~86%
of rows keep their uniform remapped key. Entity PRIMARY keys stay
unique, so dims still join 1:1 and only the fact-side distribution is
pathological — exactly the shape that melts a single reducer.

Usage:  python tools/scaleup.py [factor] [src_dir] [out_dir] [--skew zipf]
        defaults: 10 /root/testdata/sf0.1 /tmp/sfscale
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import session

# Far above any testdata key (sf0.1 max orderkey ~ 6e5) yet small enough
# that 100 replicas of every key domain stay well inside int64.
STRIDE = 10_000_000_000

# table -> columns holding entity keys that must be remapped per replica.
KEY_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# Per-table output file counts: many files per big table so scans
# parallelize the way a real multi-file lakehouse table would.
FILES = {"lineitem": 32, "orders": 16, "events": 16, "documents": 8, "embeddings": 8}

# --skew zipf: FK columns redistributed with a Zipf-1 head. K hottest
# keys take share HEAD_SHARE/rank each; heads are the K smallest keys of
# the referenced domain in replica 0 (guaranteed to exist in the dim).
SKEW_COLS = {"orders": ("o_custkey",), "events": ("user_id",)}
ZIPF_HEADS = 8
HEAD_SHARE = 0.05  # rank-1 share; rank r gets HEAD_SHARE / r


def _zipf_skew(df, col: str, head_keys: list[int]):
    """Deterministically reassign ``col``: row's uniform hash u in [0,1)
    falls in the rank-r head bucket -> head key r; else keep the value."""
    u = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1_000_000)) / 1_000_000.0
    cum = 0.0
    expr = F.col(col)
    # build reversed so rank 1's (largest) bucket is checked first
    buckets = []
    for r, k in enumerate(head_keys, start=1):
        lo, hi = cum, cum + HEAD_SHARE / r
        buckets.append((lo, hi, k))
        cum = hi
    for lo, hi, k in reversed(buckets):
        expr = F.when((u >= lo) & (u < hi), F.lit(k).cast("long")).otherwise(expr)
    return df.withColumn(col, expr)


def scale_table(
    spark, src_dir: str, out_dir: str, name: str, factor: int, skew: str | None = None
) -> int:
    df = spark.read.parquet(f"{src_dir}/{name}.parquet")
    keys = KEY_COLS[name]
    if keys:
        rep = spark.range(factor).withColumnRenamed("id", "_replica")
        df = df.crossJoin(F.broadcast(rep))
        for k in keys:
            df = df.withColumn(k, (F.col(k) + F.col("_replica") * F.lit(STRIDE)).cast("long"))
        if name == "documents":
            # Replica>0 text is a deterministic per-replica token
            # PERMUTATION (sort tokens by md5(token#pos#replica)): a short
            # appended suffix would leave replicas near-duplicates of the
            # original (~90% near-dup corpus, dense clusters of 10 — the
            # first rehearsal run did exactly that and sent the shingle
            # inverted index quadratic). Permutation destroys cross-replica
            # shingle overlap while preserving unigram/token statistics, so
            # the scaled corpus behaves like 10x DISTINCT documents — the
            # realistic scale shape — while the base corpus's own near-dup
            # structure is preserved inside every replica.
            df = df.withColumn(
                "text",
                F.when(F.col("_replica") == 0, F.col("text")).otherwise(
                    F.expr(
                        "concat_ws(' ', transform(array_sort(transform(split(text, ' '), "
                        "(t, i) -> struct(md5(concat(t, '#', cast(i as string), '#', "
                        "cast(_replica as string))) as k, t as t))), s -> s.t))"
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        df = df.drop("_replica")
    if skew == "zipf" and name in SKEW_COLS:
        for col in SKEW_COLS[name]:
            # heads = K smallest replica-0 keys of the referenced domain
            # (same column in the base table), shared by every replica
            base = spark.read.parquet(f"{src_dir}/{name}.parquet")
            head_keys = [
                int(r[0])
                for r in base.select(col).distinct().orderBy(col).limit(ZIPF_HEADS).collect()
            ]
            df = _zipf_skew(df, col, head_keys)
    out = f"{out_dir}/{name}.parquet"
    df.repartition(FILES.get(name, 4)).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = None
    if "--skew" in sys.argv:
        skew = sys.argv[sys.argv.index("--skew") + 1]
        args = [a for a in args if a != skew]
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = args[2] if len(args) > 2 else "/tmp/sfscale"
    spark = session.get_spark("scaleup")
    for name in KEY_COLS:
        n = scale_table(spark, src, out, name, factor, skew=skew)
        print(f"{name}: {n} rows -> {out}/{name}.parquet")
    if skew:
        for name, cols in SKEW_COLS.items():
            for col in cols:
                top = (
                    spark.read.parquet(f"{out}/{name}.parquet")
                    .groupBy(col)
                    .count()
                    .orderBy(F.desc("count"))
                    .limit(3)
                    .collect()
                )
                tot = spark.read.parquet(f"{out}/{name}.parquet").count()
                shares = ", ".join(f"{r[0]}:{r['count']/tot:.3f}" for r in top)
                print(f"skew[{name}.{col}] top shares: {shares}")
    print(f"done: {out} at ~{factor}x of {src} (skew={skew})")


if __name__ == "__main__":
    main()
