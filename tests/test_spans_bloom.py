"""Round-4 operators: repeated-span coverage and the pure-Catalyst
Bloom runtime filter."""

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans.runtime_filters import (
    N_WORDS,
    bloom_build,
    bloom_probe,
)
from end_to_end_data_lakehouse_pipeline_spark.plans.spans import (
    SPAN_K,
    build_duplicate_span_coverage,
    pos_grams_col,
)


def test_bloom_probe_has_no_false_negatives_and_bounded_size(spark):
    dim = spark.range(0, 5000, 7).withColumnRenamed("id", "k")  # 715 keys
    fact = spark.range(0, 5000).withColumnRenamed("id", "k")
    bf = bloom_build(dim, "k")
    row = bf.collect()[0]
    assert len(row.bf) <= N_WORDS  # bounded regardless of key count
    passed = {r.k for r in bloom_probe(fact, bf, "k").collect()}
    truth = {r.k for r in fact.join(dim, "k", "left_semi").collect()}
    assert truth <= passed  # zero false negatives
    # and the filter actually filters (not pass-everything degenerate)
    assert len(passed) < 5000
    fp_rate = (len(passed) - len(truth)) / (5000 - len(truth))
    assert fp_rate < 0.05  # 3 seeds, 64 Kibit, 715 keys -> well under 5%


def test_pos_grams_positions_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y")], ["doc_id", "text"]
    )
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    out = {
        r.doc_id: r.g
        for r in df.select("doc_id", pos_grams_col(toks).alias("g")).collect()
    }
    assert out[1] == ["a b c d e", "b c d e f"]  # positional, overlapping
    assert out[2] == []  # shorter than K


def test_duplicate_span_coverage_hand_case(spark, tmp_path):
    span = "one two three four five"  # exactly K tokens
    rows = [
        (1, f"{span} alpha beta gamma delta"),
        (2, f"prefix {span} tail tokens here"),
        (3, "completely different words nothing shared at all"),
    ]
    (
        spark.createDataFrame(rows, ["doc_id", "text"])
        .withColumn("source", F.lit("t"))
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "documents.parquet"))
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_covered, r.dup_fraction)
        for r in build_duplicate_span_coverage(spark, str(tmp_path)).collect()
    }
    # docs 1 and 2 share the 5-token span -> exactly those 5 tokens covered
    assert out[1] == (9, 5, round(5 / 9, 6))
    assert out[2] == (9, 5, round(5 / 9, 6))
    assert out[3] == (7, 0, 0.0)
