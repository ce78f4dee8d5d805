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

Usage:  python tools/scaleup.py [factor] [src_dir] [out_dir]
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


def scale_table(spark, src_dir: str, out_dir: str, name: str, factor: int) -> int:
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
    out = f"{out_dir}/{name}.parquet"
    df.repartition(FILES.get(name, 4)).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale"
    spark = session.get_spark("scaleup")
    for name in KEY_COLS:
        n = scale_table(spark, src, out, name, factor)
        print(f"{name}: {n} rows -> {out}/{name}.parquet")
    print(f"done: {out} at ~{factor}x of {src}")


if __name__ == "__main__":
    main()
