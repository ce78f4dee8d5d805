"""The round-10 count-bound prune must be INVISIBLE: jaccard_pairs /
incremental_dedup_from with the prune return exactly what the unpruned
candidate+full-verify algebra returns, including on an adversarial
corpus where a true near-dup pair's overlap is carried almost entirely
by NON-rare (over-cap) shingles — the case a naive "rc alone decides"
prune would wrongly drop (the bound must credit min(nr1, nr2))."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans.dedup import (
    JACCARD_THRESHOLD,
    fp_col,
    incremental_dedup_from,
    jaccard_pairs,
    shingles_col,
)


def _docs(spark):
    """Adversarial corpus: a boilerplate phrase shared by MORE docs than
    the tiny df_cap used in the test, so its shingles are non-rare; the
    one true near-dup pair (9001, 9002) overlaps mostly via that
    boilerplate plus a couple of rare shingles — candidates admit it
    (shares a rare shingle) but its rc alone is far below the threshold
    rank, so only the nr-credited upper bound keeps it alive."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # 12 filler docs > df_cap=8 make every boilerplate shingle non-rare
    for i in range(12):
        rows.append((i, f"{boiler} filler{i} alpha{i} beta{i}"))
    # the true pair: boilerplate-dominated overlap + shared rare tail
    rows.append((9001, f"{boiler} shared rare tail one"))
    rows.append((9002, f"{boiler} shared rare tail two"))
    # a spurious candidate: shares one rare shingle, low jaccard
    rows.append((9003, "rare tail one unrelated words entirely different body text here"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingled(docs):
    toks = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id", shingles_col(toks).alias("sh"), fp_col().alias("fp")
    ).filter(F.size("sh") > 0)


def _unpruned_pairs(s, df_cap):
    """The pre-round-10 algebra, verbatim: shares->=1-rare-shingle
    candidates, full-array verify on ALL of them."""
    e = s.select("doc_id", F.explode("sh").alias("g"))
    rare = (
        e.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("g")
    )
    a = e.join(rare, "g").select("g", F.col("doc_id").alias("doc1"))
    b = e.select("g", F.col("doc_id").alias("doc2"))
    cand = (
        a.join(b, "g")
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    s1 = s.select(F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1"))
    s2 = s.select(F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    jac = n_common.cast("double") / (
        F.size("sh1") + F.size("sh2") - n_common
    )
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def test_prune_is_invisible_on_nonrare_dominated_overlap(spark):
    s = _shingled(_docs(spark)).select("doc_id", "sh")
    cap = 8
    got = {
        (r["doc1"], r["doc2"])
        for r in jaccard_pairs(s, df_cap=cap, persist=False).collect()
    }
    want = {
        (r["doc1"], r["doc2"]) for r in _unpruned_pairs(s, cap).collect()
    }
    assert (9001, 9002) in want, "fixture must produce the adversarial pair"
    assert got == want


def test_incremental_prune_is_invisible(spark):
    s = _shingled(_docs(spark))
    corpus = s.filter(F.col("doc_id") != 9002)
    batch = s.filter(F.col("doc_id") == 9002)
    got = incremental_dedup_from(corpus, batch, df_cap=8).collect()
    assert [(r["batch_doc"], r["corpus_doc"]) for r in got] == [(9002, 9001)]
    assert got[0]["match_type"] == "near"
