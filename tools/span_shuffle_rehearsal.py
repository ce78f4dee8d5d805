"""Span-gram shuffle-width rehearsal (VERDICT r7 task 8 done-criterion).

span_dedup_rewrite / duplicate_span_coverage now fingerprint every
K-token gram to a 16-hex md5 prefix BEFORE any shuffle. This measures
the actual shuffle-write drop on a scaled replica by running the
rewrite's gram aggregate + coverage join both ways — raw gram strings
(the pre-task-8 shape, reconstructed inline) vs gram_id_col — and
reading per-stage shuffle write bytes from the Spark status REST API.

Run:  python tools/span_shuffle_rehearsal.py [sf_dir]
Default: /tmp/sfscale10. Writes $SPAN_SHUFFLE_OUT
(default /tmp/span_shuffle_rehearsal.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark import session
from end_to_end_data_lakehouse_pipeline_spark.catalog import ensure_read_confs
from end_to_end_data_lakehouse_pipeline_spark.plans.spans import (
    SPAN_K,
    gram_id_col,
    pos_grams_col,
)
from end_to_end_data_lakehouse_pipeline_spark.plans.text import tokens_col


def shuffle_write_bytes(spark) -> int:
    app = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run_variant(g, tag: str, k: int, spark, out: dict) -> None:
    key = "gid" if "gid" in g.columns else "gram"
    before = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    grams = g.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_inst"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    rep = g.join(grams.filter(F.col("n_inst") >= 2), key)
    covered = (
        rep.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("cp"),
        )
        .distinct()
        .count()
    )
    out[f"{tag}_sec"] = round(time.perf_counter() - t0, 2)
    out[f"{tag}_covered_positions"] = covered
    out[f"{tag}_shuffle_write_bytes"] = shuffle_write_bytes(spark) - before


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale10"
    spark = session.get_spark(
        "span_shuffle_rehearsal",
        extra_conf={"spark.ui.enabled": "true"},  # status REST = the meter
    )
    ensure_read_confs(spark)
    out: dict = {"sf_dir": sf_dir}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", tokens_col().alias("toks"))
    out["docs"] = base.count()
    # registered K plus a prod-shaped longer K: the gid width is constant,
    # the raw gram width grows with K — the ratio is the 100 TB story
    for k in (SPAN_K, 4 * SPAN_K):
        raw = base.select(
            "doc_id",
            F.posexplode(pos_grams_col(F.col("toks"), k)).alias("pos0", "gram"),
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
        hashed = raw.select(
            "doc_id", "pos", gram_id_col(F.col("gram")).alias("gid")
        )
        run_variant(raw, f"k{k}_raw_gram", k, spark, out)
        run_variant(hashed, f"k{k}_hashed_gid", k, spark, out)
        if out[f"k{k}_raw_gram_shuffle_write_bytes"]:
            out[f"k{k}_shuffle_bytes_ratio"] = round(
                out[f"k{k}_hashed_gid_shuffle_write_bytes"]
                / out[f"k{k}_raw_gram_shuffle_write_bytes"],
                4,
            )
        # both variants must see the SAME covered-position volume (the md5
        # prefix changes bytes on the wire, not semantics)
        out[f"k{k}_covered_match"] = (
            out[f"k{k}_raw_gram_covered_positions"]
            == out[f"k{k}_hashed_gid_covered_positions"]
        )
    path = os.environ.get("SPAN_SHUFFLE_OUT", "/tmp/span_shuffle_rehearsal.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
