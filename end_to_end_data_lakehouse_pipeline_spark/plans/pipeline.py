"""Training-corpus composition operators — the end of the LLM data pipeline.

The dedup/text/similarity modules score and prune documents; this module
covers the steps that turn a scored corpus into training input, each one a
single declarative Spark plan with a DuckDB oracle:

- ``quality_gate``        — ordered filter chain with a reject *reason* per
                            document (the audit trail a curation pipeline
                            needs, not just a boolean).
- ``corpus_pack_chunks``  — token-budget sequence packing: concatenate docs
                            in deterministic order and assign each to a
                            fixed-token-budget training chunk (running-sum
                            window, integer arithmetic).
- ``train_val_test_split``— deterministic hash split (80/10/10): stable
                            under re-runs and appends, no RANDOM(), no
                            global sort — the only split that survives
                            100 TB (same rationale as hash_sample).
- ``contamination_ngrams``— benchmark-overlap decontamination: 3-gram
                            shingle intersection of every corpus doc
                            against a (small) benchmark set, broadcast to
                            every executor — the corpus is scanned once and
                            never shuffled.
- ``vocab_oov_rate``      — top-K vocabulary coverage: global term top-K
                            (deterministic tie-break), then per-source
                            out-of-vocabulary token rate via one broadcast
                            left join over the exploded tokens.

Scale notes (100 TB): quality_gate and the split are stateless scans
(codegen'd projections, no shuffle). Packing shuffles once on `source` and
computes the running sum within partitions. Contamination broadcasts only
the benchmark shingle set (eval suites are MBs, corpora are TBs).
vocab_oov_rate's top-K aggregate is partial+final with a K-row result that
broadcasts back; the token explode never leaves its input partitions.

Reference provenance: the reference pipeline has no training-data stage —
these extend the engine for the LLM-pipeline mandate (BASELINE.json north
star), composing the same shingle/token primitives as plans/dedup.py and
plans/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from .dedup import (
    JACCARD_THRESHOLD,
    SHINGLE_DF_CAP,
    _hex8_sql,
    _sql_shingles,
    fp_col,
    jaccard_pairs,
    shingles_col,
)
from .registry import register
from .text import _sql_tokens, tokens_col


def md5_bucket(col: str = "doc_id", mod: int = 100) -> Column:
    """Deterministic 0-(mod-1) bucket from md5 of the key column.

    SQL twin: ``{_hex8_sql("md5(CAST(<col> AS VARCHAR))", 1)} % mod`` —
    the single source of truth for every split/sample/mixture/shard
    decision in this module, so they can never drift apart (same
    primitive as hash_sample in plans/relational.py).
    """
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("long") % mod
    )


def split_from_bucket(bucket: Column) -> Column:
    """80/10/10 train/val/test assignment from an md5_bucket column."""
    return F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

# ---------------------------------------------------------------------------
# quality_gate — ordered filter chain with per-document reject reasons.
#
# Thresholds compare INTEGERS (counts scaled by the ratio denominator), so
# both engines decide each rule on exact arithmetic — no float thresholds.
# ---------------------------------------------------------------------------

MIN_TOKENS = 20  # too_short below this
ALPHA_PCT = 60  # low_alpha below alpha_chars/n_chars = 0.60
DIVERSITY_PCT = 30  # low_diversity below distinct/total tokens = 0.30

QUALITY_GATE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, n_chars,
           len({_sql_tokens()}) AS n_tokens,
           len(list_distinct({_sql_tokens()})) AS n_distinct,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
    FROM documents
)
SELECT
    doc_id, source, n_tokens,
    CASE
        WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
        WHEN alpha_chars * 100 < n_chars * {ALPHA_PCT} THEN 'low_alpha'
        WHEN n_distinct * 100 < n_tokens * {DIVERSITY_PCT} THEN 'low_diversity'
    END AS reject_reason,
    CASE
        WHEN n_tokens >= {MIN_TOKENS}
         AND alpha_chars * 100 >= n_chars * {ALPHA_PCT}
         AND n_distinct * 100 >= n_tokens * {DIVERSITY_PCT}
        THEN 1 ELSE 0
    END AS passed
FROM t
"""


def gate_stats(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """Per-doc gate inputs (n_tokens / n_distinct / alpha_chars) — shared
    by quality_gate and training_manifest so the manifest can never fork
    from the gate it composes."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        *extra_cols,
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("alpha_chars"),
    )


def gate_pass() -> Column:
    """The three-rule pass predicate over gate_stats columns."""
    return (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("alpha_chars") * 100 >= F.col("n_chars") * ALPHA_PCT)
        & (F.col("n_distinct") * 100 >= F.col("n_tokens") * DIVERSITY_PCT)
    )


def build_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = gate_stats(table(spark, sf_dir, "documents"), "source")
    reason = (
        F.when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("alpha_chars") * 100 < F.col("n_chars") * ALPHA_PCT, "low_alpha")
        .when(
            F.col("n_distinct") * 100 < F.col("n_tokens") * DIVERSITY_PCT,
            "low_diversity",
        )
    )
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        reason.alias("reject_reason"),
        F.when(reason.isNull(), 1).otherwise(0).alias("passed"),
    )


register(
    "quality_gate",
    oracle=QUALITY_GATE_ORACLE,
    doc="Ordered quality-filter chain with per-doc reject reason "
    "(too_short → low_alpha → low_diversity); stateless codegen scan, "
    "integer-arithmetic thresholds.",
    tags=("llm", "text", "filter"),
)(build_quality_gate)


# ---------------------------------------------------------------------------
# corpus_pack_chunks — token-budget sequence packing.
#
# Documents are concatenated per source in doc_id order; a doc starts in
# chunk floor(tokens_before / CHUNK_TOKENS). This is the standard
# "concatenate-then-chunk" LLM pretraining layout (docs may straddle a
# chunk boundary). One shuffle on source; the running sum is computed
# within the source partitions.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 512

PACK_CHUNKS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, len({_sql_tokens()}) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - n_tokens) // {CHUNK_TOKENS} AS BIGINT) AS chunk_id
FROM c
"""


def pack_window(part_col: str) -> Window:
    """Running-sum packing window, shared with training_manifest."""
    return (
        Window.partitionBy(part_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def chunk_id_col() -> Column:
    """Exact INTEGER division (SQL `div`) — stays correct past 2^53 where
    double-floor would round across a chunk boundary; oracle twin uses
    DuckDB's `//`."""
    return F.expr(f"(cum_tokens - n_tokens) div {CHUNK_TOKENS}").cast("long")


def build_corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", F.size(tokens_col()).alias("n_tokens"))
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(pack_window("source")))
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        chunk_id_col().alias("chunk_id"),
    )


register(
    "corpus_pack_chunks",
    oracle=PACK_CHUNKS_ORACLE,
    doc=f"Token-budget sequence packing: deterministic per-source running "
    f"token sum assigns each doc its {CHUNK_TOKENS}-token training chunk "
    "(single shuffle on source).",
    tags=("llm", "window"),
)(build_corpus_pack_chunks)


# ---------------------------------------------------------------------------
# train_val_test_split — deterministic 80/10/10 hash split + per-split
# token accounting. The md5-bucket is the same cross-engine primitive as
# hash_sample (relational.py); stability under appends is the point — a
# doc's split never changes when the corpus grows.
# ---------------------------------------------------------------------------

SPLIT_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           len({_sql_tokens()}) AS n_tokens,
           {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100 AS bucket
    FROM documents
)
SELECT
    CASE WHEN bucket < 80 THEN 'train'
         WHEN bucket < 90 THEN 'val'
         ELSE 'test' END AS split,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM t
GROUP BY 1
"""


def build_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(tokens_col()).alias("n_tokens"),
        "doc_id",
        split_from_bucket(md5_bucket()).alias("split"),
    )
    return t.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


register(
    "train_val_test_split",
    oracle=SPLIT_ORACLE,
    doc="Deterministic 80/10/10 md5-bucket split with per-split token "
    "accounting — reproducible, append-stable, shuffle-free assignment.",
    tags=("llm", "sampling"),
)(build_train_val_test_split)


# ---------------------------------------------------------------------------
# contamination_ngrams — benchmark-overlap decontamination.
#
# Docs from BENCH_SOURCE play the held-out benchmark; every other doc is
# checked for 3-gram shingle overlap against it. The benchmark shingle set
# is broadcast (eval suites are small); the corpus explode never shuffles.
# shingles_col() arrays are distinct, so the per-doc match count IS the
# distinct-overlap count.
# ---------------------------------------------------------------------------

BENCH_SOURCE = "src0"

CONTAMINATION_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, {_sql_tokens()} AS toks FROM documents
),
s AS (
    SELECT doc_id, source, {_sql_shingles("toks")} AS sh FROM t
    WHERE len({_sql_shingles("toks")}) > 0
),
bench_g AS (
    SELECT DISTINCT unnest(sh) AS g FROM s WHERE source = '{BENCH_SOURCE}'
),
corpus_e AS (
    SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g
    FROM s WHERE source <> '{BENCH_SOURCE}'
)
SELECT
    corpus_e.doc_id,
    n_shingles,
    CAST(COUNT(*) AS BIGINT) AS n_overlap,
    CAST(COUNT(*) AS DOUBLE) / n_shingles AS contamination
FROM corpus_e
JOIN bench_g ON corpus_e.g = bench_g.g
GROUP BY corpus_e.doc_id, n_shingles
"""


def build_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    s = docs.select(
        "doc_id", "source", shingles_col(tokens_col()).alias("sh")
    ).filter(F.size("sh") > 0)
    bench_g = (
        s.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    corpus_e = s.filter(F.col("source") != BENCH_SOURCE).select(
        "doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("g")
    )
    return (
        corpus_e.join(F.broadcast(bench_g), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
    )


register(
    "contamination_ngrams",
    oracle=CONTAMINATION_ORACLE,
    doc="Benchmark decontamination: per-doc distinct 3-gram overlap vs a "
    "broadcast benchmark shingle set (corpus scanned once, never shuffled).",
    tags=("llm", "dedup", "join"),
)(build_contamination_ngrams)


# ---------------------------------------------------------------------------
# vocab_oov_rate — top-K vocabulary coverage per source.
#
# The vocabulary is the global top-K terms (count DESC, term ASC — total
# order, deterministic cut). OOV rate = token INSTANCES outside the vocab
# over all instances, summed per source: a single division of exact
# integers on both engines.
# ---------------------------------------------------------------------------

VOCAB_K = 200

VOCAB_OOV_ORACLE = f"""
WITH e AS (
    SELECT doc_id, source, unnest({_sql_tokens()}) AS term
    FROM documents
),
vocab AS (
    SELECT term FROM e GROUP BY term
    ORDER BY COUNT(*) DESC, term ASC
    LIMIT {VOCAB_K}
)
SELECT
    source,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(COUNT(*) - COUNT(vocab.term) AS BIGINT) AS n_oov,
    CAST(COUNT(*) - COUNT(vocab.term) AS DOUBLE) / COUNT(*) AS oov_rate
FROM e
LEFT JOIN vocab ON e.term = vocab.term
GROUP BY source
"""


def build_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    e = docs.select("source", F.explode(tokens_col()).alias("term"))
    vocab = (
        e.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    joined = e.join(F.broadcast(vocab), "term", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("oov_rate"),
    )


register(
    "vocab_oov_rate",
    oracle=VOCAB_OOV_ORACLE,
    doc=f"Top-{VOCAB_K} vocabulary coverage: deterministic global term "
    "top-K, then per-source OOV token rate via one broadcast left join.",
    tags=("llm", "text", "join"),
)(build_vocab_oov_rate)


# ---------------------------------------------------------------------------
# training_manifest — the end-of-pipeline composition: quality gate →
# deterministic split → per-split sequence packing, in ONE declarative
# plan. Chunks are packed WITHIN a split (a chunk must never mix train and
# held-out text) in doc_id order. Catalyst pipelines the gate and split
# projections into the scan; the only shuffle is the per-split window.
# ---------------------------------------------------------------------------

MANIFEST_ORACLE = f"""
WITH t AS (
    SELECT doc_id, n_chars,
           len({_sql_tokens()}) AS n_tokens,
           len(list_distinct({_sql_tokens()})) AS n_distinct,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
    FROM documents
),
pass AS (
    SELECT doc_id, n_tokens FROM t
    WHERE n_tokens >= {MIN_TOKENS}
      AND alpha_chars * 100 >= n_chars * {ALPHA_PCT}
      AND n_distinct * 100 >= n_tokens * {DIVERSITY_PCT}
),
sp AS (
    SELECT doc_id, n_tokens,
           CASE WHEN {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100 < 80
                THEN 'train'
                WHEN {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM pass
),
c AS (
    SELECT doc_id, split, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY split ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM sp
)
SELECT doc_id, split, n_tokens,
       CAST((cum_tokens - n_tokens) // {CHUNK_TOKENS} AS BIGINT) AS chunk_id
FROM c
"""


def build_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = gate_stats(table(spark, sf_dir, "documents"))
    passing = t.filter(gate_pass()).select("doc_id", "n_tokens")
    sp = passing.withColumn("split", split_from_bucket(md5_bucket()))
    c = sp.withColumn("cum_tokens", F.sum("n_tokens").over(pack_window("split")))
    return c.select(
        "doc_id",
        "split",
        "n_tokens",
        chunk_id_col().alias("chunk_id"),
    )


register(
    "training_manifest",
    oracle=MANIFEST_ORACLE,
    doc="End-of-pipeline composition: quality gate → md5 split → per-split "
    f"{CHUNK_TOKENS}-token packing in one plan (gate and split fuse into "
    "the scan; single per-split window shuffle).",
    tags=("llm", "window", "filter"),
)(build_training_manifest)


# ---------------------------------------------------------------------------
# multimodal_byte_stats — the multimodal decode path as a DRIVER-CHECKED
# query. Payloads are built from the documents table (utf-8 encode — the
# corpus is ASCII, verified in testdata), then an Arrow-batched
# mapInPandas stage computes per-payload byte statistics with vectorized
# numpy — the exact pipeline shape of multimodal/columns.py
# decode_features, but with a cross-engine oracle: for ASCII text, byte
# values equal code points, so DuckDB reproduces the stats from ord().
#
# Scale notes: payload bytes move through Arrow record batches (no Python
# row loop); per-batch work is numpy frombuffer + bincount. This is the
# template for real image/audio feature extraction at 100 TB.
# ---------------------------------------------------------------------------

MM_BYTE_STATS_ORACLE = """
WITH b AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '(?s).'), c -> ord(c)) AS codes
    FROM documents
    WHERE length(text) > 0
)
SELECT doc_id,
       CAST(len(codes) AS BIGINT) AS n_bytes,
       CAST(len(list_distinct(codes)) AS BIGINT) AS n_distinct_bytes,
       CAST(list_sum(codes) AS BIGINT) AS sum_bytes,
       CAST(list_sum(codes) AS DOUBLE) / len(codes) AS mean_byte
FROM b
"""


def build_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql import types as T

    docs = spread(table(spark, sf_dir, "documents"), spark).filter(
        F.length("text") > 0
    )
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("n_distinct_bytes", T.LongType(), True),
            T.StructField("sum_bytes", T.LongType(), True),
            T.StructField("mean_byte", T.DoubleType(), True),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, n_distinct, sums = [], [], []
            for payload in pdf["payload"]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_bytes.append(len(a))
                n_distinct.append(int(np.unique(a).size))
                sums.append(int(a.sum(dtype=np.int64)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "n_distinct_bytes": pd.Series(n_distinct, dtype="int64"),
                    "sum_bytes": pd.Series(sums, dtype="int64"),
                }
            )
            out["mean_byte"] = out["sum_bytes"].astype("float64") / out["n_bytes"]
            yield out

    return media.mapInPandas(stats, schema=schema)


register(
    "multimodal_byte_stats",
    oracle=MM_BYTE_STATS_ORACLE,
    doc="Binary-payload feature extraction via Arrow-batched mapInPandas "
    "(numpy per batch, no row loop) — the multimodal decode template with "
    "an exact byte-level oracle (ASCII corpus: bytes == code points).",
    tags=("llm", "multimodal", "pandas"),
)(build_multimodal_byte_stats)


# ---------------------------------------------------------------------------
# source_mixture — data mixing: per-source sampling rates (the
# upsample/downsample weights of a training mixture) applied via the
# deterministic md5 bucket, so the kept set is reproducible and stable
# under appends. Rates live in a map literal (create_map) — the Spark
# analog of a broadcast mixture-config table.
# ---------------------------------------------------------------------------

MIXTURE_PCT: dict[str, int] = {  # source -> keep percentage
    "src0": 100, "src1": 100, "src2": 75, "src3": 75, "src4": 50,
    "src5": 50, "src6": 50, "src7": 25, "src8": 25, "src9": 25,
}
DEFAULT_PCT = 10  # unlisted sources are heavily downsampled


def _mixture_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {p}" for s, p in MIXTURE_PCT.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_PCT} END"


SOURCE_MIXTURE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source,
           len({_sql_tokens()}) AS n_tokens,
           {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100 AS bucket,
           {_mixture_case_sql()} AS keep_pct
    FROM documents
)
SELECT
    source,
    CAST(MAX(keep_pct) AS BIGINT) AS keep_pct,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COUNT(*) FILTER (WHERE bucket < keep_pct) AS BIGINT) AS n_kept,
    CAST(SUM(n_tokens) FILTER (WHERE bucket < keep_pct) AS BIGINT) AS kept_tokens
FROM t
GROUP BY source
"""


def build_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rate_map = F.create_map(
        *[F.lit(x) for kv in MIXTURE_PCT.items() for x in kv]
    )
    t = docs.select(
        "source",
        F.size(tokens_col()).alias("n_tokens"),
        md5_bucket().alias("bucket"),
        F.coalesce(rate_map[F.col("source")], F.lit(DEFAULT_PCT)).alias("keep_pct"),
    )
    kept = F.col("bucket") < F.col("keep_pct")
    return t.groupBy("source").agg(
        F.max("keep_pct").cast("long").alias("keep_pct"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens"))).alias("kept_tokens"),
    )


register(
    "source_mixture",
    oracle=SOURCE_MIXTURE_ORACLE,
    doc="Training-mixture weighting: per-source keep rates from a map "
    "literal applied via the deterministic md5 bucket (reproducible "
    "up/downsampling; stateless scan + one agg).",
    tags=("llm", "sampling"),
)(build_source_mixture)

# ---------------------------------------------------------------------------
# curation_funnel_report — the capstone curation number: docs and tokens
# surviving each pipeline stage, one row per stage:
#
#   raw → exact_dedup → near_dedup → quality_gate → decontaminated
#
# Single-pass formulation: each document gets a stage_reached label
# (1..5), then ONE explode(sequence(1, stage_reached)) + hash aggregate
# produces the cumulative funnel — the expensive near-dup and
# contamination sets are each computed exactly once, joined as drop
# flags, never re-derived per stage.
#
# Stage rules (identical, greedy-deterministic on both engines):
#   exact_dedup:    keep the min doc_id per normalized fingerprint.
#   near_dedup:     among exact survivors, drop any doc appearing as the
#                   LARGER id of a verified ngram-Jaccard pair (greedy
#                   keep-smaller; the transitive variant is
#                   dedup_components — this is the one-pass rule real
#                   pipelines run).
#   quality_gate:   the gate_pass() predicate.
#   decontaminated: drop benchmark-source docs and any doc whose distinct
#                   3-gram overlap with the benchmark reaches half its
#                   shingles (integer comparison, no float threshold).
# ---------------------------------------------------------------------------

CONTAM_DIV = 2  # drop when n_overlap * CONTAM_DIV >= n_shingles (≥50%)

_FUNNEL_FP = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

CURATION_FUNNEL_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, n_chars,
           len({_sql_tokens()}) AS n_tokens,
           len(list_distinct({_sql_tokens()})) AS n_distinct,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
           {_FUNNEL_FP} AS fp,
           {_sql_shingles(_sql_tokens())} AS sh
    FROM documents
),
s2 AS (
    SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canon FROM t
    ) WHERE doc_id = canon
),
e2 AS (SELECT doc_id, unnest(sh) AS g FROM s2 WHERE len(sh) > 0),
rare2 AS (SELECT g FROM e2 GROUP BY g HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
cand2 AS (
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM e2 a JOIN rare2 ON a.g = rare2.g JOIN e2 b ON a.g = b.g
    WHERE a.doc_id < b.doc_id
),
near_dropped AS (
    SELECT DISTINCT cand2.doc2 AS doc_id
    FROM cand2
    JOIN s2 x ON cand2.doc1 = x.doc_id
    JOIN s2 y ON cand2.doc2 = y.doc_id
    WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
          >= {JACCARD_THRESHOLD}
),
bench_g AS (
    SELECT DISTINCT unnest(sh) AS g FROM t WHERE source = '{BENCH_SOURCE}'
),
contam_dropped AS (
    SELECT e.doc_id
    FROM (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM t) e
    JOIN bench_g ON e.g = bench_g.g
    GROUP BY e.doc_id, e.n_sh
    HAVING COUNT(*) * {CONTAM_DIV} >= e.n_sh
),
staged AS (
    SELECT t.doc_id, t.n_tokens,
           CASE
               WHEN t.doc_id <> s2m.canon_id THEN 1
               WHEN nd.doc_id IS NOT NULL THEN 2
               WHEN NOT (t.n_tokens >= {MIN_TOKENS}
                         AND t.alpha_chars * 100 >= t.n_chars * {ALPHA_PCT}
                         AND t.n_distinct * 100 >= t.n_tokens * {DIVERSITY_PCT})
                   THEN 3
               WHEN t.source = '{BENCH_SOURCE}' OR cd.doc_id IS NOT NULL THEN 4
               ELSE 5
           END AS stage_reached
    FROM t
    JOIN (SELECT fp, MIN(doc_id) AS canon_id FROM t GROUP BY fp) s2m
      ON t.fp = s2m.fp
    LEFT JOIN near_dropped nd ON t.doc_id = nd.doc_id
    LEFT JOIN contam_dropped cd ON t.doc_id = cd.doc_id
)
SELECT
    CAST(stage_order AS BIGINT) AS stage_order,
    CASE stage_order WHEN 1 THEN 'raw' WHEN 2 THEN 'exact_dedup'
         WHEN 3 THEN 'near_dedup' WHEN 4 THEN 'quality_gate'
         ELSE 'decontaminated' END AS stage,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM (SELECT doc_id, n_tokens,
             unnest(generate_series(1, stage_reached)) AS stage_order
      FROM staged)
GROUP BY stage_order
"""


_FUNNEL_SHARED_CACHE: list[DataFrame] = []
_CONTAM_SIG_CACHE: list[DataFrame] = []


def _cache_funnel_shared(df: DataFrame) -> DataFrame:
    """Single-slot persist for the funnel's shared subtree.

    The tokenize+fingerprint+shingle projection feeds FIVE branches of the
    funnel plan; uncached, Spark recomputes it per reference (measured
    10.4 -> 7.4 s at sf0.1 with the cache). The slot releases the previous
    funnel's cache on the next call, so sequential query runs hold at most
    ONE such table — the bounded-cache discipline VERDICT r3 asked for on
    loops, applied to a DAG reuse (see workspace.single_slot_persist for
    the build-then-execute contract). At 100 TB the cache is data-sized
    but MEMORY_AND_DISK and evictable: eviction degrades to recompute,
    never OOM."""
    from pyspark import StorageLevel

    from .workspace import single_slot_persist

    return single_slot_persist(
        _FUNNEL_SHARED_CACHE, df, level=StorageLevel.MEMORY_AND_DISK
    )


def build_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    fp = fp_col()
    t = _cache_funnel_shared(
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("alpha_chars"),
            fp.alias("fp"),
            shingles_col(toks).alias("sh"),
        )
    )

    canon = t.groupBy("fp").agg(F.min("doc_id").alias("canon_id"))
    s2 = t.join(canon, "fp").filter(F.col("doc_id") == F.col("canon_id"))

    near_dropped = (
        # persist=False: s2 projects off the funnel's own persisted shared
        # subtree (sh already materialized) — a second cache slot here
        # would break the one-slot-per-query discipline for no win
        jaccard_pairs(
            s2.filter(F.size("sh") > 0).select("doc_id", "sh"), persist=False
        )
        .select(F.col("doc2").alias("doc_id"))
        .distinct()
        .withColumn("near_drop", F.lit(1))
    )

    bench_g = (
        t.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    contam_dropped = (
        t.select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("g"))
        .join(F.broadcast(bench_g), "g")
        .groupBy("doc_id", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") * CONTAM_DIV >= F.col("n_sh"))
        .select("doc_id")
        .withColumn("contam_drop", F.lit(1))
    )

    staged = (
        t.join(canon, "fp")
        .join(near_dropped, "doc_id", "left")
        .join(contam_dropped, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("doc_id") != F.col("canon_id"), 1)
            .when(F.col("near_drop").isNotNull(), 2)
            .when(~gate_pass(), 3)
            .when(
                (F.col("source") == BENCH_SOURCE)
                | F.col("contam_drop").isNotNull(),
                4,
            )
            .otherwise(5)
            .alias("stage_reached"),
        )
    )
    stage_name = (
        F.when(F.col("stage_order") == 1, "raw")
        .when(F.col("stage_order") == 2, "exact_dedup")
        .when(F.col("stage_order") == 3, "near_dedup")
        .when(F.col("stage_order") == 4, "quality_gate")
        .otherwise("decontaminated")
    )
    return (
        staged.select(
            "n_tokens",
            F.explode(F.sequence(F.lit(1), F.col("stage_reached"))).alias(
                "stage_order"
            ),
        )
        .groupBy(F.col("stage_order").cast("long").alias("stage_order"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select("stage_order", stage_name.alias("stage"), "n_docs", "total_tokens")
    )


register(
    "curation_funnel_report",
    oracle=CURATION_FUNNEL_ORACLE,
    doc="Capstone curation funnel: docs/tokens surviving raw → exact "
    "dedup → greedy near-dedup → quality gate → decontamination; "
    "single-pass stage_reached labels + one explode/aggregate (drop sets "
    "computed once, never per stage).",
    tags=("llm", "dedup", "filter", "report"),
)(build_curation_funnel_report)


# ---------------------------------------------------------------------------
# source_quality_rates — the gate report grouped by provenance: per-source
# pass rate and token yield from the SAME gate_stats/gate_pass the gate
# and manifest use (single scan + one agg; the table a curation run
# publishes next to the funnel).
# ---------------------------------------------------------------------------

SOURCE_QUALITY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, n_chars,
           len({_sql_tokens()}) AS n_tokens,
           len(list_distinct({_sql_tokens()})) AS n_distinct,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN n_tokens >= {MIN_TOKENS}
                        AND alpha_chars * 100 >= n_chars * {ALPHA_PCT}
                        AND n_distinct * 100 >= n_tokens * {DIVERSITY_PCT}
                  THEN 1 END) AS BIGINT) AS n_pass,
       CAST(COUNT(CASE WHEN n_tokens >= {MIN_TOKENS}
                        AND alpha_chars * 100 >= n_chars * {ALPHA_PCT}
                        AND n_distinct * 100 >= n_tokens * {DIVERSITY_PCT}
                  THEN 1 END) AS DOUBLE) / COUNT(*) AS pass_rate,
       CAST(SUM(CASE WHEN n_tokens >= {MIN_TOKENS}
                      AND alpha_chars * 100 >= n_chars * {ALPHA_PCT}
                      AND n_distinct * 100 >= n_tokens * {DIVERSITY_PCT}
                 THEN n_tokens ELSE 0 END) AS BIGINT) AS pass_tokens
FROM t GROUP BY source
"""


def build_source_quality_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = gate_stats(table(spark, sf_dir, "documents"), "source")
    passed = F.when(gate_pass(), 1)
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(passed).alias("n_pass"),
        (F.count(passed).cast("double") / F.count(F.lit(1))).alias("pass_rate"),
        F.sum(F.when(gate_pass(), F.col("n_tokens")).otherwise(0)).alias(
            "pass_tokens"
        ),
    )


register(
    "source_quality_rates",
    oracle=SOURCE_QUALITY_ORACLE,
    doc="Per-source quality pass rate and token yield from the shared "
    "gate predicate (the provenance table next to the curation funnel).",
    tags=("llm", "filter", "report"),
)(build_source_quality_rates)


# ---------------------------------------------------------------------------
# mixture_temperature_sample — temperature-scaled source balancing (the
# mT5/UNIMAX shape: sampling probability ∝ n_s^alpha, alpha=0.5, so large
# sources are down-weighted toward a flatter mixture). Rates are
# normalized to the SMALLEST source (keeps 100%), giving every source the
# same alpha-effective size: keep_pct_s = 100 * sqrt(n_min / n_s).
#
# Cross-engine float discipline: n_min is an exact BIGINT MIN (no float
# reduction anywhere), and the per-source rate uses SQRT — IEEE 754
# requires correctly-rounded sqrt/div/mul, so the double is bit-identical
# on both engines, unlike POWER(x, 0.5) (libm pow is not correctly
# rounded) or a SUM over doubles (order-dependent). The rate then becomes
# an INTEGER percentage compared against the shared md5 bucket.
# Scale shape: counts agg + tiny rates table joined back (AQE broadcasts
# it) + one final agg — two shuffles on uniform keys.
# ---------------------------------------------------------------------------

MIXTURE_TEMP_ORACLE = f"""
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
),
mn AS (SELECT MIN(n_docs) AS n_min FROM counts),
rates AS (
    SELECT source, n_docs,
           CAST(FLOOR(100.0 * SQRT(CAST(n_min AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE))) AS INTEGER)
               AS keep_pct
    FROM counts, mn
),
t AS (
    SELECT doc_id, source,
           len({{TOKENS}}) AS n_tokens,
           {{BUCKET}} % 100 AS bucket
    FROM documents
)
SELECT
    t.source,
    MAX(r.n_docs) AS n_docs,
    CAST(MAX(r.keep_pct) AS INTEGER) AS keep_pct,
    CAST(COUNT(*) FILTER (WHERE t.bucket < r.keep_pct) AS BIGINT) AS n_kept,
    CAST(COALESCE(SUM(t.n_tokens) FILTER (WHERE t.bucket < r.keep_pct), 0)
         AS BIGINT) AS kept_tokens
FROM t JOIN rates r ON t.source = r.source
GROUP BY t.source
"""


def build_mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(n_min).select(
        "source",
        "n_docs",
        F.floor(
            F.lit(100.0)
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double"))
        )
        .cast("int")
        .alias("keep_pct"),
    )
    t = docs.select(
        "source",
        F.size(tokens_col()).alias("n_tokens"),
        md5_bucket().alias("bucket"),
    )
    kept = F.col("bucket") < F.col("keep_pct")
    return (
        t.join(rates, "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("keep_pct").cast("int").alias("keep_pct"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


register(
    "mixture_temperature_sample",
    oracle=MIXTURE_TEMP_ORACLE.replace("{TOKENS}", _sql_tokens()).replace(
        "{BUCKET}", _hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)
    ),
    doc="Temperature-scaled (alpha=0.5) source mixture: keep rates "
    "100*sqrt(n_min/n_s) applied via the deterministic md5 bucket — "
    "IEEE-exact sqrt keeps the rate integer bit-identical cross-engine "
    "(LLM-pipeline extension).",
    tags=("llm", "sampling"),
)(build_mixture_temperature_sample)


# ---------------------------------------------------------------------------
# corpus_shard_layout — the training-data LAYOUT op: assign every doc a
# shard (md5 bucket over N_SHARDS) and a contiguous position WITHIN its
# shard (row_number ordered by the md5 hex itself — a deterministic
# pseudo-random shuffle, the standard way training corpora are both
# sharded and shuffled in one pass). Scale shape: the window partitions
# by shard_id, so parallelism = N_SHARDS — at real scale N_SHARDS is
# chosen ∝ data size (thousands), never a global un-partitioned sort.
# ---------------------------------------------------------------------------

N_SHARDS = 8

SHARD_LAYOUT_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS sort_key,
           {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % {N_SHARDS} AS shard_id
    FROM documents
)
SELECT doc_id,
       CAST(shard_id AS INTEGER) AS shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY sort_key)
            AS INTEGER) AS pos_in_shard
FROM t
"""


def build_corpus_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("sort_key"),
        md5_bucket(mod=N_SHARDS).cast("int").alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("sort_key")
    return t.select(
        "doc_id", "shard_id", F.row_number().over(w).alias("pos_in_shard")
    )


register(
    "corpus_shard_layout",
    oracle=SHARD_LAYOUT_ORACLE,
    doc="Sharded + deterministically shuffled training layout: md5 shard "
    "assignment and contiguous within-shard position in one windowed "
    "pass (LLM-pipeline extension).",
    tags=("llm", "layout", "window"),
)(build_corpus_shard_layout)


# ---------------------------------------------------------------------------
# boilerplate_shingle_ratio — per-doc boilerplate measurement: the share of
# a document's shingles that are corpus-common (shingle document-frequency
# >= BOILER_PCT% of docs). High-ratio docs are template/boilerplate
# families — the cleaning signal next to dedup. Threshold is integer
# cross-multiplied (df*100 >= n_docs*BOILER_PCT), no float compare.
# Scale shape: one explode + DF agg (uniform shingle keys), the common
# set is bounded above by 100/BOILER_PCT x n_shingles_per_doc — small,
# AQE broadcasts it into the semi join; per-doc ratio is exact division.
# ---------------------------------------------------------------------------

BOILER_PCT = 5  # a shingle in >= 5% of docs is boilerplate


def _shingle_docs_sql() -> str:
    return f"""
t AS (SELECT doc_id, {_sql_tokens()} AS toks FROM documents),
s AS (SELECT doc_id, {_sql_shingles('toks')} AS sh FROM t
      WHERE len({_sql_shingles('toks')}) > 0),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s)
"""


BOILERPLATE_ORACLE = f"""
WITH {_shingle_docs_sql().strip()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM s),
dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY shingle),
common AS (SELECT shingle FROM dfreq, tot WHERE df * 100 >= n_docs * {BOILER_PCT}),
b AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
    FROM ex WHERE shingle IN (SELECT shingle FROM common)
    GROUP BY doc_id
)
SELECT
    s.doc_id,
    CAST(len(s.sh) AS BIGINT) AS n_shingles,
    COALESCE(b.n_boiler, 0) AS n_boiler,
    CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / len(s.sh) AS boiler_ratio
FROM s LEFT JOIN b ON s.doc_id = b.doc_id
"""


def _shingle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id", shingles_col(tokens_col()).alias("sh")
    ).filter(F.size("sh") > 0)


def build_boilerplate_shingle_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _shingle_docs(spark, sf_dir)
    ex = s.select("doc_id", F.explode("sh").alias("shingle"))
    tot = s.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    common = (
        dfreq.crossJoin(tot)
        .filter(F.col("df") * 100 >= F.col("n_docs") * BOILER_PCT)
        .select("shingle")
    )
    b = (
        ex.join(common, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        s.join(b, "doc_id", "left")
        .select(
            "doc_id",
            F.size("sh").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias("n_boiler"),
            (
                F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
                / F.size("sh")
            ).alias("boiler_ratio"),
        )
    )


register(
    "boilerplate_shingle_ratio",
    oracle=BOILERPLATE_ORACLE,
    doc="Per-doc boilerplate share: fraction of shingles whose corpus "
    "document-frequency >= 5% of docs (integer cross-multiplied "
    "threshold; bounded common set semi-joined back).",
    tags=("llm", "text", "report"),
)(build_boilerplate_shingle_ratio)


# ---------------------------------------------------------------------------
# split_leakage_ngrams — train/eval LEAKAGE audit: train-split documents
# sharing rare shingles with the held-out (val/test) split. Stop-shingles
# (corpus DF > SHINGLE_DF_CAP) carry no leakage signal and are excluded —
# the same cap that keeps every shingle join in this module linear (and
# kills the skewed hot keys). A train doc is flagged leaked at
# LEAK_MIN_OVERLAP shared rare shingles.
# Scale shape: the eval shingle set is ∝ the 20% split and shrinks further
# under the DF cap; the train-side probe is one shuffle hash semi join on
# uniform (capped) shingle keys.
# ---------------------------------------------------------------------------

LEAK_MIN_OVERLAP = 3

SPLIT_LEAKAGE_ORACLE = f"""
WITH {_shingle_docs_sql().strip()},
bucketed AS (
    SELECT doc_id,
           {_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} % 100 AS bucket
    FROM s JOIN documents USING (doc_id)
),
stop AS (
    SELECT shingle FROM (
        SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle
    ) WHERE df > {SHINGLE_DF_CAP}
),
eval_sh AS (
    SELECT DISTINCT shingle
    FROM ex JOIN bucketed USING (doc_id)
    WHERE bucket >= 80 AND shingle NOT IN (SELECT shingle FROM stop)
),
overlap AS (
    SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM ex JOIN bucketed USING (doc_id)
    WHERE bucket < 80 AND shingle IN (SELECT shingle FROM eval_sh)
    GROUP BY ex.doc_id
)
SELECT doc_id, n_overlap, n_overlap >= {LEAK_MIN_OVERLAP} AS leaked
FROM overlap
"""


def build_split_leakage_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _shingle_docs(spark, sf_dir).withColumn("bucket", md5_bucket())
    ex = s.select("doc_id", "bucket", F.explode("sh").alias("shingle"))
    stop = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    eval_sh = (
        ex.filter(F.col("bucket") >= 80)
        .select("shingle")
        .distinct()
        .join(stop, "shingle", "left_anti")
    )
    return (
        ex.filter(F.col("bucket") < 80)
        .join(eval_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            "doc_id",
            "n_overlap",
            (F.col("n_overlap") >= LEAK_MIN_OVERLAP).alias("leaked"),
        )
    )


register(
    "split_leakage_ngrams",
    oracle=SPLIT_LEAKAGE_ORACLE,
    doc="Train/eval split leakage: train docs sharing rare (DF-capped) "
    "shingles with the held-out split, flagged at >= 3 overlaps "
    "(LLM-pipeline extension).",
    tags=("llm", "dedup", "report"),
)(build_split_leakage_ngrams)


# ---------------------------------------------------------------------------
# truncation_loss_report — per-source accounting of what a fixed training
# context length costs: docs over MAX_SEQ_LEN tokens, tokens lost to
# truncation, and the padding waste if each doc were padded to the full
# length instead of packed (the number corpus_pack_chunks exists to
# reclaim). Pure integer arithmetic; one scan + one agg.
# ---------------------------------------------------------------------------

MAX_SEQ_LEN = 256

TRUNCATION_ORACLE = f"""
WITH t AS (
    SELECT source, len({_sql_tokens()}) AS n_tokens FROM documents
)
SELECT
    source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(COUNT(*) FILTER (WHERE n_tokens > {MAX_SEQ_LEN}) AS BIGINT)
        AS n_truncated_docs,
    CAST(COALESCE(SUM(GREATEST(n_tokens - {MAX_SEQ_LEN}, 0)), 0) AS BIGINT)
        AS tokens_lost,
    CAST(COALESCE(SUM(GREATEST({MAX_SEQ_LEN} - n_tokens, 0)), 0) AS BIGINT)
        AS padding_waste
FROM t
GROUP BY source
"""


def build_truncation_loss_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("source", F.size(tokens_col()).alias("n_tokens"))
    over = F.greatest(F.col("n_tokens") - MAX_SEQ_LEN, F.lit(0))
    under = F.greatest(F.lit(MAX_SEQ_LEN) - F.col("n_tokens"), F.lit(0))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("n_tokens") > MAX_SEQ_LEN, 1).otherwise(0))
        .cast("long")
        .alias("n_truncated_docs"),
        F.coalesce(F.sum(over), F.lit(0)).cast("long").alias("tokens_lost"),
        F.coalesce(F.sum(under), F.lit(0)).cast("long").alias("padding_waste"),
    )


register(
    "truncation_loss_report",
    oracle=TRUNCATION_ORACLE,
    doc="Context-length economics per source: truncated docs, tokens "
    "lost at MAX_SEQ_LEN, and pad-to-length waste (the packing "
    "motivation numbers; LLM-pipeline extension).",
    tags=("llm", "report"),
)(build_truncation_loss_report)


# ---------------------------------------------------------------------------
# media_phash_near_dups — near-duplicate detection on BINARY payloads:
# 64-bit byte-histogram aHash (multimodal/columns.py phash_media), banded
# 4x16 bits for candidates, exact Hamming verify. Payloads derive from
# the ASCII corpus (same trick as multimodal_byte_stats), so DuckDB
# reproduces the hash bit-for-bit from ord() code points — the dedup
# family extended across modalities, still fully oracle-checked.
# ---------------------------------------------------------------------------

MEDIA_PHASH_ORACLE = """
WITH b AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '(?s).'), c -> ord(c)) AS codes
    FROM documents WHERE length(text) > 0
),
h AS (
    SELECT doc_id,
           array_to_string(
             list_transform(range(64), i ->
               CASE WHEN len(list_filter(codes, c -> (c // 4) = i))
                         > len(codes) / 64.0
                    THEN '1' ELSE '0' END), '') AS bs
    FROM b
),
bands AS (
    SELECT doc_id, bs, 0 AS band_idx, substr(bs, 1, 16) AS band_key FROM h
    UNION ALL SELECT doc_id, bs, 1, substr(bs, 17, 16) FROM h
    UNION ALL SELECT doc_id, bs, 2, substr(bs, 33, 16) FROM h
    UNION ALL SELECT doc_id, bs, 3, substr(bs, 49, 16) FROM h
),
cand AS (
    SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
           a.bs AS bs1, b.bs AS bs2
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)
SELECT id1, id2,
       CAST(len(list_filter(range(64),
                 i -> substr(bs1, i + 1, 1) <> substr(bs2, i + 1, 1)))
            AS INT) AS hamming
FROM cand
WHERE len(list_filter(range(64),
          i -> substr(bs1, i + 1, 1) <> substr(bs2, i + 1, 1))) <= 3
"""


def build_media_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import phash_media, phash_near_dups

    docs = spread(table(spark, sf_dir, "documents"), spark).filter(
        F.length("text") > 0
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    hashed = phash_media(media)
    pairs = phash_near_dups(hashed)
    return pairs.select(
        F.col("id1"), F.col("id2"), F.col("hamming")
    )


register(
    "media_phash_near_dups",
    oracle=MEDIA_PHASH_ORACLE,
    doc="Multimodal near-dup: 64-bit byte-histogram perceptual hash over "
    "binary payloads, 4x16-bit banding (covers every pair at Hamming<4 "
    "by pigeonhole) + exact popcount verify; oracle reproduces the hash "
    "from ASCII code points.",
    tags=("multimodal", "dedup", "llm"),
)(build_media_phash_near_dups)


# ---------------------------------------------------------------------------
# weighted_priority_sample — weight-proportional sampling without
# replacement via PRIORITY SAMPLING (Ohlsson's sequential Poisson;
# Duffield-Lund-Thorup): key_i = u_i / w_i with u_i uniform, keep the K
# smallest keys. Heavier documents get smaller keys more often, so
# inclusion probability is ~proportional to weight — the corpus
# subsampling shape ("sample 50 docs favoring long ones") that plain
# hash_sample (uniform) cannot express.
#
# Chosen over Efraimidis-Spirakis (u^(1/w)) deliberately: E-S needs a
# transcendental (ln/pow) whose last-ulp behavior differs between
# engines and could flip near-tied ranks; the priority key is ONE IEEE
# division of two exact integers — bit-identical everywhere. u_i is the
# md5-derived 32-bit integer +1 (never zero), the module's standard
# deterministic-uniform primitive, so the sample is stable under reruns
# and appends. Scale: keys are computed scan-side; the top-K is a single
# ORDER BY ... LIMIT (TakeOrderedAndProject — no full sort materialized).
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 50

WEIGHTED_PRIORITY_SAMPLE_ORACLE = f"""
WITH k AS (
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           CAST({_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)} + 1 AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS priority
    FROM documents
    WHERE n_chars > 0
),
-- select by the RAW priority in a subquery: in the flat form ORDER BY
-- priority binds to the ROUND(...) output alias (PG alias precedence),
-- while Spark orders by the raw column — near-K-boundary rank ties
-- rounding equal at 6 dp would then select different sets
top AS (
    SELECT * FROM k ORDER BY priority, doc_id LIMIT {PRIORITY_SAMPLE_K}
)
SELECT doc_id, source, weight, ROUND(priority, 6) AS priority FROM top
"""


def build_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ).cast("double")
    k = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        (u / F.col("n_chars").cast("double")).alias("priority"),
    )
    return (
        k.orderBy("priority", "doc_id")
        .limit(PRIORITY_SAMPLE_K)
        .select("doc_id", "source", "weight", F.round("priority", 6).alias("priority"))
    )


register(
    "weighted_priority_sample",
    oracle=WEIGHTED_PRIORITY_SAMPLE_ORACLE,
    doc=f"Weight-proportional sample (K={PRIORITY_SAMPLE_K}) via priority "
    "sampling — deterministic md5 uniforms, one IEEE division per row, "
    "TakeOrderedAndProject top-K (no full sort).",
    tags=("pipeline", "llm", "sampling"),
)(build_weighted_priority_sample)


# ---------------------------------------------------------------------------
# media_resize_report / media_frame_sample_report — the remaining two
# multimodal plumbing shapes (block-average "resize", every-Nth "frame
# sampling") as DRIVER-CHECKED queries, same trick as
# multimodal_byte_stats: payloads are utf-8 encodes of the ASCII corpus,
# so DuckDB reproduces the byte math from ord() + list slicing while the
# Spark side runs the real binary pipeline (Arrow-batched mapInPandas,
# numpy reshape — no Python row loop). Mirrors multimodal/columns.py
# resize_images / frame_sample, which stay the genuine binary-decode
# entry points (import-gated stubs for actual codecs).
# ---------------------------------------------------------------------------

RESIZE_BLOCK = 16
FRAME_BYTES = 32
FRAME_EVERY = 4

MEDIA_RESIZE_ORACLE = f"""
WITH b AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '(?s).'), c -> ord(c)) AS codes
    FROM documents
    WHERE length(text) >= {RESIZE_BLOCK}
),
r AS (
    SELECT doc_id,
           len(codes) // {RESIZE_BLOCK} AS n_blocks,
           list_transform(
               generate_series(1, len(codes) // {RESIZE_BLOCK}),
               i -> list_sum(codes[((i - 1) * {RESIZE_BLOCK} + 1):(i * {RESIZE_BLOCK})])
           ) AS blocks
    FROM b
)
SELECT doc_id,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(blocks[1] AS BIGINT) AS first_block_sum,
       CAST(list_max(blocks) AS BIGINT) AS max_block_sum,
       CAST(list_sum(blocks) AS DOUBLE) / n_blocks AS mean_block_sum
FROM r
"""


def build_media_resize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = spread(table(spark, sf_dir, "documents"), spark).filter(
        F.length("text") >= RESIZE_BLOCK
    )
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_blocks", T.LongType(), True),
            T.StructField("first_block_sum", T.LongType(), True),
            T.StructField("max_block_sum", T.LongType(), True),
            T.StructField("mean_block_sum", T.DoubleType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_blocks, first_s, max_s, mean_s = [], [], [], []
            for payload in pdf["payload"]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                nb = len(a) // RESIZE_BLOCK
                blocks = (
                    a[: nb * RESIZE_BLOCK]
                    .reshape(nb, RESIZE_BLOCK)
                    .sum(axis=1, dtype=np.int64)
                )
                n_blocks.append(nb)
                first_s.append(int(blocks[0]))
                max_s.append(int(blocks.max()))
                mean_s.append(float(blocks.sum(dtype=np.int64)) / nb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_blocks": pd.Series(n_blocks, dtype="int64"),
                    "first_block_sum": pd.Series(first_s, dtype="int64"),
                    "max_block_sum": pd.Series(max_s, dtype="int64"),
                    "mean_block_sum": pd.Series(mean_s, dtype="float64"),
                }
            )

    return media.mapInPandas(resize, schema=schema)


register(
    "media_resize_report",
    oracle=MEDIA_RESIZE_ORACLE,
    doc="Block-average 'resize' over binary payloads (Arrow-batched "
    "mapInPandas, numpy reshape) with an exact cross-engine oracle via "
    "ASCII byte==codepoint list slicing — the image-downsample plumbing "
    "shape, driver-checked.",
    tags=("llm", "multimodal", "pandas"),
)(build_media_resize_report)


MEDIA_FRAME_ORACLE = f"""
WITH b AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '(?s).'), c -> ord(c)) AS codes
    FROM documents
    WHERE length(text) >= {FRAME_BYTES}
),
r AS (
    SELECT doc_id,
           len(codes) // {FRAME_BYTES} AS n_frames,
           list_transform(
               generate_series(1, len(codes) // {FRAME_BYTES}),
               i -> list_sum(codes[((i - 1) * {FRAME_BYTES} + 1):(i * {FRAME_BYTES})])
           ) AS frames
    FROM b
),
s AS (
    SELECT doc_id, n_frames,
           list_filter(
               list_transform(generate_series(1, n_frames),
                              i -> CASE WHEN (i - 1) % {FRAME_EVERY} = 0
                                        THEN frames[i] END),
               x -> x IS NOT NULL
           ) AS sampled
    FROM r
)
SELECT doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(len(sampled) AS BIGINT) AS n_sampled,
       CAST(list_sum(sampled) AS BIGINT) AS sampled_checksum
FROM s
"""


def build_media_frame_sample_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = spread(table(spark, sf_dir, "documents"), spark).filter(
        F.length("text") >= FRAME_BYTES
    )
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("n_sampled", T.LongType(), True),
            T.StructField("sampled_checksum", T.LongType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, n_sampled, checksum = [], [], []
            for payload in pdf["payload"]:
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                nf = len(a) // FRAME_BYTES
                frames = (
                    a[: nf * FRAME_BYTES]
                    .reshape(nf, FRAME_BYTES)
                    .sum(axis=1, dtype=np.int64)
                )
                sampled = frames[::FRAME_EVERY]
                n_frames.append(nf)
                n_sampled.append(len(sampled))
                checksum.append(int(sampled.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.Series(n_frames, dtype="int64"),
                    "n_sampled": pd.Series(n_sampled, dtype="int64"),
                    "sampled_checksum": pd.Series(checksum, dtype="int64"),
                }
            )

    return media.mapInPandas(sample, schema=schema)


register(
    "media_frame_sample_report",
    oracle=MEDIA_FRAME_ORACLE,
    doc="Every-Nth frame sampling over binary payloads (fixed-size frame "
    "chunks, numpy stride slicing in Arrow batches) with an exact ord()-"
    "list oracle — the video frame-sample plumbing shape, driver-checked.",
    tags=("llm", "multimodal", "pandas"),
)(build_media_frame_sample_report)


# ---------------------------------------------------------------------------
# balanced_class_sample — exactly-k-per-class deterministic sampling (the
# "give me 50 inspection examples per language / balanced subsample per
# label" primitive). Rank within each class by an md5 hash of the id —
# uniform, seedless, reproducible on any engine — and keep the first K.
# One hash-partitioned window, WindowGroupLimit prunes to K per class
# before the final shuffle; no global sort, no RAND().
# ---------------------------------------------------------------------------

BALANCED_K = 50

BALANCED_SAMPLE_ORACLE = f"""
SELECT lang, doc_id, source, n_chars
FROM (
    SELECT lang, doc_id, source, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
WHERE rn <= {BALANCED_K}
ORDER BY lang, doc_id
"""


def build_balanced_class_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BALANCED_K)
        .drop("rn")
        .orderBy("lang", "doc_id")
    )


register(
    "balanced_class_sample",
    oracle=BALANCED_SAMPLE_ORACLE,
    doc=f"Exactly-{BALANCED_K}-per-class deterministic sample: md5-of-id "
    "rank within each class (uniform, seedless, engine-identical), "
    "WindowGroupLimit prunes to K per class pre-shuffle — the balanced "
    "subsample / per-class inspection primitive.",
    tags=("llm", "sampling", "window", "pipeline"),
)(build_balanced_class_sample)


# ---------------------------------------------------------------------------
# contamination_minhash — FUZZY benchmark decontamination (the GPT-3-style
# companion to contamination_ngrams' exact-shingle overlap): corpus docs
# are LSH-banded against the benchmark split's MinHash signatures, band
# collisions become candidate (corpus, benchmark) pairs, and each
# candidate is verified with the EXACT shingle Jaccard — so a lightly
# edited benchmark leak (insertions, reordering) is still flagged even
# when few shingles survive verbatim. Cost: banding is linear, the
# candidate join is bounded by band-bucket populations (never corpus x
# benchmark), the verify touches candidates only.
# ---------------------------------------------------------------------------

CONTAM_MINHASH_JACCARD = 0.5


def _contamination_minhash_oracle() -> str:
    from .dedup import _SQL_MINHASH_CTES, _band_sql, N_BANDS

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, source, sh, {j} AS band_idx, band_{j} AS band_key FROM sig"
        for j in range(N_BANDS)
    )
    return f"""
WITH t AS (
    SELECT doc_id, source, {_sql_tokens()} AS toks FROM documents
),
s AS (
    SELECT doc_id, source, {_sql_shingles("toks")} AS sh FROM t
    WHERE len({_sql_shingles("toks")}) > 0
){_SQL_MINHASH_CTES},
sig AS (
    SELECT s.doc_id, s.source, s.sh,
           {', '.join(_band_sql(j) + f' AS band_{j}' for j in range(N_BANDS))}
    FROM s JOIN mh ON s.doc_id = mh.doc_id
),
bands AS ({bands_union}),
cand AS (
    SELECT DISTINCT c.doc_id, c.sh AS c_sh, b.doc_id AS bench_doc_id,
                    b.sh AS b_sh
    FROM bands c
    JOIN bands b ON c.band_idx = b.band_idx AND c.band_key = b.band_key
    WHERE c.source <> '{BENCH_SOURCE}' AND b.source = '{BENCH_SOURCE}'
),
verified AS (
    SELECT doc_id, bench_doc_id,
           CAST(len(list_intersect(c_sh, b_sh)) AS DOUBLE)
               / (len(c_sh) + len(b_sh) - len(list_intersect(c_sh, b_sh)))
               AS jaccard
    FROM cand
),
ranked AS (
    SELECT doc_id, bench_doc_id, jaccard,
           CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_candidates,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY jaccard DESC, bench_doc_id ASC
           ) AS rk
    FROM verified
)
SELECT doc_id, bench_doc_id, jaccard, n_candidates
FROM ranked WHERE rk = 1 AND jaccard >= {CONTAM_MINHASH_JACCARD}
"""


def _contam_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, source, shingles, band keys) signature table,
    PERSISTED WITH THE CORPUS (VERDICT r7 task 6): the first run against
    a corpus writes it next to the session's store, every repeat run —
    recurring decontamination against each new benchmark drop is the
    production cadence — reads it back instead of re-scanning and
    re-hashing the corpus (the dominant cost at 100x). Deterministic
    content (hash-based MinHash), so stored-vs-fresh is value-identical
    and the oracle is unaffected. The store tag carries a content
    fingerprint (size/mtime over the corpus files), not just the path:
    a regenerated corpus at the same path gets a fresh store instead of
    silently-served stale signatures."""
    import os as _os

    from .dedup import N_BANDS, _band_col, minhash_table
    from .workspace import corpus_fingerprint, session_store

    store = session_store(
        "contam_sig_" + corpus_fingerprint(_os.path.join(sf_dir, "documents.parquet"))
    )
    path = _os.path.join(store, "signatures.parquet")
    if not _os.path.isfile(_os.path.join(path, "_SUCCESS")):
        docs = spread(table(spark, sf_dir, "documents"), spark)
        s = docs.select(
            "doc_id", "source", shingles_col(tokens_col()).alias("sh")
        ).filter(F.size("sh") > 0)
        mh = minhash_table(s)
        (
            s.join(mh, "doc_id")
            .select(
                "doc_id",
                "source",
                "sh",
                *[_band_col(j).alias(f"band_{j}") for j in range(N_BANDS)],
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def build_contamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .dedup import N_BANDS

    from .workspace import single_slot_persist

    # single-slot (round 10): was a bare persist that leaked one cached
    # signature table per call — repeats stacked copies (the VERDICT r3
    # leak class fixed in the LPA/components loops, found again by the
    # 10x sweep's memory-pressure swings). Materialized once; feeds both
    # band sides + the verify.
    sig = single_slot_persist(
        _CONTAM_SIG_CACHE, _contam_signatures(spark, sf_dir), materialize=True
    )
    bands = sig.select(
        "doc_id",
        "source",
        "sh",
        F.posexplode(F.array(*[F.col(f"band_{j}") for j in range(N_BANDS)])).alias(
            "band_idx", "band_key"
        ),
    )
    corpus = bands.filter(F.col("source") != BENCH_SOURCE).select(
        "doc_id", F.col("sh").alias("c_sh"), "band_idx", "band_key"
    )
    bench = bands.filter(F.col("source") == BENCH_SOURCE).select(
        F.col("doc_id").alias("bench_doc_id"),
        F.col("sh").alias("b_sh"),
        "band_idx",
        "band_key",
    )
    cand = (
        corpus.join(bench, ["band_idx", "band_key"])
        .select("doc_id", "c_sh", "bench_doc_id", "b_sh")
        .distinct()
    )
    inter = F.size(F.array_intersect("c_sh", "b_sh"))
    verified = cand.select(
        "doc_id",
        "bench_doc_id",
        (
            inter.cast("double") / (F.size("c_sh") + F.size("b_sh") - inter)
        ).alias("jaccard"),
    )
    wd = Window.partitionBy("doc_id")
    ranked = verified.select(
        "doc_id",
        "bench_doc_id",
        "jaccard",
        F.count(F.lit(1)).over(wd).cast("long").alias("n_candidates"),
        F.row_number()
        .over(wd.orderBy(F.desc("jaccard"), F.asc("bench_doc_id")))
        .alias("rk"),
    )
    out = ranked.filter(
        (F.col("rk") == 1) & (F.col("jaccard") >= CONTAM_MINHASH_JACCARD)
    ).drop("rk")
    return out


register(
    "contamination_minhash",
    oracle=_contamination_minhash_oracle(),
    doc="Fuzzy benchmark decontamination: corpus LSH-banded against the "
    "benchmark split's MinHash signatures, band-collision candidates "
    "verified with exact shingle Jaccard; per corpus doc the best "
    "matching benchmark doc above the threshold (candidate-bounded, "
    "never corpus x benchmark).",
    tags=("llm", "contamination", "minhash", "dedup"),
)(build_contamination_minhash)


# ---------------------------------------------------------------------------
# bm25_bench_retrieval — lexical retrieval (round 9): Okapi BM25
# (Robertson & Zaragoza 2009, §3.3) of every benchmark doc against the
# corpus, top-k per query. The retrieval modality the engine lacked:
# tfidf_top_terms characterizes single documents; this SCORES
# query-vs-corpus pairs — the production shape behind dataset search,
# retrieval-augmented eval, and decontamination triage (rank the best
# lexical matches before the expensive verifier).
#
# Scale shape: the pair space is candidate-bounded by the inverted-index
# join on DF-capped terms (a term in more than BM25_DF_CAP docs carries
# ~no idf and would fan out the join — the SHINGLE_DF_CAP discipline);
# the per-query window is bounded by the candidate count. Nothing is
# corpus x benchmark.
#
# Exactness: the only floats are per-(doc,term) contributions
# idf*saturation — computed on identical IEEE expression trees both
# engines and quantized to a 1e-6 integer grid BEFORE the per-pair sum
# (the dsir_importance_weights recipe), so the score sum is exact and
# order-independent, and the final ranking is total-ordered by
# (score, doc_id).
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 3
BM25_DF_CAP = 1000

# ADVICE r9: every k1/b literal below derives from the two constants, so
# editing them moves BOTH the Spark expression and the oracle in lockstep
# (Python float repr round-trips exactly into the SQL double literal).
BM25_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, source, lower(unnest({_sql_tokens()})) AS term
    FROM documents
),
ctf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE source <> '{BENCH_SOURCE}' GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY doc_id),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl
    FROM dl
),
dft AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM ctf GROUP BY term HAVING COUNT(*) <= {BM25_DF_CAP}
),
post AS (
    SELECT c.doc_id, c.term,
           CAST(ROUND(
               ln(1.0 + ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                         / (CAST(d.df AS DOUBLE) + 0.5)))
               * ((CAST(c.tf AS DOUBLE) * {BM25_K1 + 1.0!r})
                  / (CAST(c.tf AS DOUBLE)
                     + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * (CAST(l.dl AS DOUBLE)
                       / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
               * 1000000.0) AS BIGINT) AS c
    FROM ctf c JOIN dft d USING (term) JOIN dl l USING (doc_id)
    CROSS JOIN stats s
),
bench AS (
    SELECT DISTINCT doc_id AS bench_doc_id, term
    FROM tok WHERE source = '{BENCH_SOURCE}'
),
pairs AS (
    SELECT b.bench_doc_id, p.doc_id,
           CAST(SUM(p.c) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n_shared_terms
    FROM post p JOIN bench b USING (term)
    GROUP BY b.bench_doc_id, p.doc_id
),
ranked AS (
    SELECT bench_doc_id, doc_id, n_shared_terms, s,
           row_number() OVER (
               PARTITION BY bench_doc_id ORDER BY s DESC, doc_id ASC
           ) AS rnk
    FROM pairs
)
SELECT bench_doc_id, doc_id, CAST(rnk AS INTEGER) AS rank, n_shared_terms,
       CAST(s AS DOUBLE) / 1000000.0 AS bm25_score
FROM ranked WHERE rnk <= {BM25_TOPK}
"""


def _bm25_ctf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency table (doc_id, term, tf), PERSISTED WITH THE
    CORPUS (VERDICT r9 task 3, the contamination-signature pattern at
    _contam_signatures): it feeds dl, df and the postings build, and
    Catalyst does not reuse the exchange across the three consumers
    (plan-audited r9: 5 corpus scans / 5 explodes without materializing).
    r9 used localCheckpoint() — right locally, but it pins NON-REPLICATED
    executor-local blocks (a lost executor truncates the lineage and
    kills the query at cluster scale) and rebuilds every run. A content-
    fingerprinted parquet store keeps the lineage replayable (plain scan)
    and makes repeat retrievals — each new benchmark drop, the production
    cadence — skip the tokenize+count entirely. Deterministic content, so
    stored-vs-fresh is value-identical and the oracle is unaffected."""
    import os as _os

    from .workspace import corpus_fingerprint, session_store

    store = session_store(
        "bm25_ctf_"
        + corpus_fingerprint(_os.path.join(sf_dir, "documents.parquet"))
    )
    path = _os.path.join(store, "ctf.parquet")
    if not _os.path.isfile(_os.path.join(path, "_SUCCESS")):
        docs = spread(table(spark, sf_dir, "documents"), spark)
        (
            docs.filter(F.col("source") != BENCH_SOURCE)
            .select("doc_id", F.explode(tokens_col()).alias("t"))
            .select("doc_id", F.lower("t").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def build_bm25_bench_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(table(spark, sf_dir, "documents"), spark)
    tok = docs.select(
        "doc_id", "source", F.explode(tokens_col()).alias("t")
    ).select("doc_id", "source", F.lower("t").alias("term"))
    ctf = _bm25_ctf(spark, sf_dir)
    dl = ctf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dft = (
        ctf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= BM25_DF_CAP)
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (
            ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        )
    )
    sat = (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl))
    )
    post = (
        ctf.join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # 1-row totals
        .select(
            "doc_id",
            "term",
            F.round(idf * sat * F.lit(1000000.0), 0).cast("long").alias("c"),
        )
    )
    bench = (
        tok.filter(F.col("source") == BENCH_SOURCE)
        .select(F.col("doc_id").alias("bench_doc_id"), "term")
        .distinct()
    )
    pairs = post.join(bench, "term").groupBy("bench_doc_id", "doc_id").agg(
        F.sum("c").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
    )
    w = Window.partitionBy("bench_doc_id").orderBy(
        F.desc("s"), F.asc("doc_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "bench_doc_id",
            "doc_id",
            "rank",
            "n_shared_terms",
            (F.col("s").cast("double") / F.lit(1000000.0)).alias("bm25_score"),
        )
    )


# ---------------------------------------------------------------------------
# packing_padding_waste — sequence-packing efficiency report (round 9):
# for each candidate training sequence length, how many tokens the
# corpus actually fills vs the padded capacity if every document is
# chunked to ceil(tokens/L) sequences of length L (the no-cross-doc-
# packing baseline that document_chunking / corpus_pack_chunks improve
# on). The report every training-infra team runs before fixing seq_len:
# all-integer math (chunk counts, padded capacity), one map-side explode
# of a 4-element literal — a single pass over token counts at any scale.
# ---------------------------------------------------------------------------

PACK_SEQ_LENS = (512, 1024, 2048, 4096)

PADDING_WASTE_ORACLE = f"""
WITH d AS (
    SELECT source, CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens
    FROM documents
    WHERE len({_sql_tokens()}) > 0
)
SELECT source, seq_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens,
       CAST(SUM((n_tokens + seq_len - 1) // seq_len) AS BIGINT) AS n_chunks,
       CAST(SUM((n_tokens + seq_len - 1) // seq_len) * seq_len AS BIGINT)
           AS padded_tokens,
       CAST(SUM(n_tokens) AS DOUBLE)
           / CAST(SUM((n_tokens + seq_len - 1) // seq_len) * seq_len AS DOUBLE)
           AS utilization
FROM d CROSS JOIN (
    SELECT CAST(unnest([{", ".join(str(n) for n in PACK_SEQ_LENS)}]) AS BIGINT)
        AS seq_len
) s
GROUP BY source, seq_len
"""


def build_packing_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    d = docs.select(
        "source", F.size(tokens_col()).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    lens = F.explode(
        F.array(*[F.lit(n).cast("long") for n in PACK_SEQ_LENS])
    ).alias("seq_len")
    chunks = (F.col("n_tokens") + F.col("seq_len") - F.lit(1)) / F.col("seq_len")
    per = d.select("source", "n_tokens", lens).withColumn(
        "n_chunks", F.floor(chunks).cast("long")
    )
    agg = per.groupBy("source", "seq_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("corpus_tokens"),
        F.sum("n_chunks").alias("n_chunks"),
    )
    return agg.select(
        "source",
        "seq_len",
        "n_docs",
        "corpus_tokens",
        "n_chunks",
        (F.col("n_chunks") * F.col("seq_len")).alias("padded_tokens"),
        (
            F.col("corpus_tokens").cast("double")
            / (F.col("n_chunks") * F.col("seq_len")).cast("double")
        ).alias("utilization"),
    )


register(
    "packing_padding_waste",
    oracle=PADDING_WASTE_ORACLE,
    doc=f"Sequence-packing efficiency per (source, seq_len in "
    f"{PACK_SEQ_LENS}): exact chunk counts and padded capacity for the "
    "ceil(tokens/L) no-packing baseline, with utilization = corpus "
    "tokens / padded tokens — the report that sizes seq_len before "
    "training.",
    tags=("llm", "pipeline", "chunking", "report"),
)(build_packing_padding_waste)


register(
    "bm25_bench_retrieval",
    oracle=BM25_ORACLE,
    doc=f"Okapi BM25 (k1={BM25_K1}, b={BM25_B}) of every benchmark doc "
    f"against the corpus via a DF-capped (<= {BM25_DF_CAP}) inverted-"
    f"index join; top-{BM25_TOPK} per query with per-term contributions "
    "quantized to an exact 1e-6 integer grid before the order-"
    "independent score sum.",
    tags=("llm", "text", "retrieval", "topk", "join"),
)(build_bm25_bench_retrieval)


# ---------------------------------------------------------------------------
# dsir_importance_weights — Data Selection via Importance Resampling
# (Xie et al. 2023, public): score every raw-corpus document by the
# log-likelihood ratio of a hashed-bigram unigram model fit on the
# TARGET domain (the benchmark split) vs one fit on the raw corpus, the
# published recipe for picking pretraining data that "looks like" a
# target domain. Distributed shape: two bucket-count aggregates (map-side
# combined, DSIR_BUCKETS-bounded), one broadcastable per-bucket
# log-ratio table, one join + exact integer sum per document. The
# per-bucket log ratio is quantized to the 1e-6 grid BEFORE the per-doc
# summation, so document scores are exact integer sums — deterministic
# at any parallelism and bit-identical to the DuckDB twin (transcendental
# ln() agrees across engines well inside the 1e-6 grid).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096
_DSIR_Q = 1_000_000


def _bigrams_col(toks: Column) -> Column:
    n = F.size(toks)
    m = n - 1
    grams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def _sql_bigrams(toks: str) -> str:
    return (
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1]) "
        f"ELSE [] END"
    )


_DSIR_W_CTES = f"""t AS (
    SELECT doc_id, source, {_sql_bigrams(_sql_tokens())} AS bg FROM documents
),
e AS (
    SELECT doc_id, source,
           {_hex8_sql('md5(unnest(bg))', 1)} % {DSIR_BUCKETS} AS b
    FROM t
),
tc AS (SELECT b, COUNT(*) AS ct FROM e WHERE source = '{BENCH_SOURCE}' GROUP BY b),
rc AS (SELECT b, COUNT(*) AS cr FROM e WHERE source <> '{BENCH_SOURCE}' GROUP BY b),
tot AS (
    SELECT (SELECT COALESCE(SUM(ct), 0) FROM tc) AS t_total,
           (SELECT COALESCE(SUM(cr), 0) FROM rc) AS r_total
),
lr AS (
    SELECT COALESCE(tc.b, rc.b) AS b,
           CAST(ROUND(ln(
               (COALESCE(ct, 0) + 1.0) / (t_total + {DSIR_BUCKETS})
               * (r_total + {DSIR_BUCKETS}) / (COALESCE(cr, 0) + 1.0)
           ) * {_DSIR_Q}) AS BIGINT) AS lr_q
    FROM tc FULL OUTER JOIN rc ON tc.b = rc.b, tot
),
doc_b AS (
    SELECT doc_id, b, COUNT(*) AS n
    FROM e WHERE source <> '{BENCH_SOURCE}' GROUP BY doc_id, b
),
w AS (
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           SUM(n * lr_q) AS wq
    FROM doc_b JOIN lr USING (b) GROUP BY doc_id
)"""

DSIR_ORACLE = f"""
WITH {_DSIR_W_CTES}
SELECT doc_id, n_bigrams,
       CAST(wq AS DOUBLE) / {_DSIR_Q} AS logweight,
       wq > 0 AS selected
FROM w
"""


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    e = docs.select(
        "doc_id",
        "source",
        F.explode(_bigrams_col(tokens_col())).alias(("g")),
    ).select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % DSIR_BUCKETS)
        .alias("b"),
    )
    # NOTE (r12, measured and rejected): restructuring this around a
    # single-slot-persisted doc_b (rc derived from it by integer
    # identity, cutting the five bigram-explode references to two scans)
    # measured SLOWER at sf0.1 (1.3-1.5x) AND at 10x (1.5x) — this
    # corpus's tokenize pass is cheaper than the persist's materialize
    # job + cache traffic at every decade the bench reaches. Kept as-is;
    # the restructure is the right shape only when a tokenize pass costs
    # more than a cache round-trip.
    tc = (
        e.filter(F.col("source") == BENCH_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    rc = (
        e.filter(F.col("source") != BENCH_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    t_total = tc.agg(F.coalesce(F.sum("ct"), F.lit(0))).first()[0]
    r_total = rc.agg(F.coalesce(F.sum("cr"), F.lit(0))).first()[0]
    lr = (
        tc.join(rc, "b", "full_outer")
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1.0)
                    / F.lit(float(t_total + DSIR_BUCKETS))
                    * F.lit(float(r_total + DSIR_BUCKETS))
                    / (F.coalesce("cr", F.lit(0)) + 1.0)
                )
                * _DSIR_Q
            )
            .cast("long")
            .alias("lr_q"),
        )
    )
    doc_b = (
        e.filter(F.col("source") != BENCH_SOURCE)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        doc_b.join(F.broadcast(lr), "b")  # lr is DSIR_BUCKETS-bounded
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("lr_q")).alias("wq"),
        )
    )


def build_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _dsir_weights(spark, sf_dir)
    return w.select(
        "doc_id",
        "n_bigrams",
        (F.col("wq").cast("double") / _DSIR_Q).alias("logweight"),
        (F.col("wq") > 0).alias("selected"),
    )


register(
    "dsir_importance_weights",
    oracle=DSIR_ORACLE,
    doc=f"DSIR data selection (Xie et al. 2023): hashed-bigram "
    f"({DSIR_BUCKETS} buckets) target-vs-raw log-likelihood-ratio weight "
    "per raw-corpus document, Laplace-smoothed; per-bucket ratios "
    "quantized to 1e-6 before the exact-integer per-doc sum.",
    tags=("llm", "sampling", "importance", "pipeline"),
)(build_dsir_importance_weights)


# ---------------------------------------------------------------------------
# dsir_gumbel_resample — the SELECTION step that completes the DSIR
# pipeline (Xie et al. 2023 resample importance-weighted docs WITHOUT
# replacement): Gumbel-top-k over the log-weights. key_i = logweight_i
# + Gumbel(0,1)_i with the Gumbel noise derived DETERMINISTICALLY from
# md5(doc_id) — u is a dyadic rational ((hex8 + 0.5) / 2^32, exact in
# both engines), so the only float seams are the two ln calls (ULP-class,
# absorbed unless two keys collide to ~1e-16 — the established gamble).
# One weight aggregate + one global top-k; no per-doc state, no
# replacement bookkeeping — the exact shape that scales.
# ---------------------------------------------------------------------------

DSIR_SAMPLE_K = 100


def build_dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    w = _dsir_weights(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    logweight = F.col("wq").cast("double") / _DSIR_Q
    key = logweight + -F.log(-F.log(u))
    top = (
        w.select(
            "doc_id",
            "n_bigrams",
            logweight.alias("logweight"),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), "doc_id")
        .limit(DSIR_SAMPLE_K)
    )
    # rank over the K selected rows only — bounded window, not data-sized.
    # The PRESENTED key is rounded to 1e-6: the raw double carries the ln
    # calls' cross-engine ULP skew (~1e-15), which must not reach output.
    return top.withColumn(
        "sel_rank",
        F.row_number()
        .over(W.orderBy(F.desc("_key"), F.asc("doc_id")))
        .cast("long"),
    ).select(
        "doc_id",
        "n_bigrams",
        "logweight",
        F.round("_key", 6).alias("gumbel_key"),
        "sel_rank",
    )


DSIR_RESAMPLE_ORACLE = f"""
WITH {_DSIR_W_CTES},
smp AS (
    SELECT doc_id, n_bigrams,
           CAST(wq AS DOUBLE) / {_DSIR_Q} AS logweight,
           CAST(wq AS DOUBLE) / {_DSIR_Q}
           + (- ln(- ln((CAST({_hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)}
                          AS DOUBLE) + 0.5) / 4294967296.0))) AS _key
    FROM w
)
SELECT doc_id, n_bigrams, logweight, ROUND(_key, 6) AS gumbel_key,
       CAST(ROW_NUMBER() OVER (ORDER BY _key DESC, doc_id) AS BIGINT)
           AS sel_rank
FROM smp ORDER BY _key DESC, doc_id LIMIT {DSIR_SAMPLE_K}
"""


register(
    "dsir_gumbel_resample",
    oracle=DSIR_RESAMPLE_ORACLE,
    doc=f"DSIR's resampling step (Xie et al. 2023): Gumbel-top-{DSIR_SAMPLE_K} "
    "over the importance log-weights = sampling without replacement with "
    "probability proportional to exp(logweight); Gumbel noise derived "
    "deterministically from md5(doc_id), one global top-k.",
    tags=("llm", "sampling", "importance", "pipeline"),
)(build_dsir_gumbel_resample)


# ---------------------------------------------------------------------------
# mixture_token_waterfill — the token-budget ALLOCATION PLAN a training-mix
# planner actually executes (round 8): given per-source available tokens
# and a total training budget T (here T = total//2), allocate T across
# sources as evenly as capacity allows — the classic capacitated
# waterfilling: small sources are taken whole (capped), the rest share the
# remainder at a common waterline. Closed form, NO iteration: sort sources
# by availability, a capped source is exactly one where even granting its
# full size to every remaining source would not exhaust the budget
# (cum_{k-1} + avail_k * (n-k+1) <= T — the capped set is a prefix of the
# sort), then base = (T - capped_sum) div n_uncapped with the remainder
# given to the first uncapped sources in sort order. Every quantity is an
# exact integer (allocations provably never exceed capacity), the windows
# run over #sources rows (tiny at any corpus scale — the per-doc token
# count is the only data-sized pass, a map-side agg), and both engines
# evaluate the identical arithmetic.
# ---------------------------------------------------------------------------

WATERFILL_NUM, WATERFILL_DEN = 1, 2  # budget T = total_tokens * 1/2


def build_mixture_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread(table(spark, sf_dir, "documents"), spark)
    avail = (
        docs.select("source", F.size(tokens_col()).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("avail_tokens"))
    )
    # windows over #sources rows only — bounded, never data-sized
    w_all = W.partitionBy(F.lit(1))
    w_ord = W.partitionBy(F.lit(1)).orderBy("avail_tokens", "source")
    a = avail.select(
        "source",
        "avail_tokens",
        F.row_number().over(w_ord).alias("k"),
        F.sum("avail_tokens")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.expr(
            f"(sum(avail_tokens) over () * {WATERFILL_NUM})"
            f" div {WATERFILL_DEN}"
        ).alias("t_budget"),
    )
    a = a.withColumn(
        "capped",
        (F.col("cum") - F.col("avail_tokens"))
        + F.col("avail_tokens") * (F.col("n") - F.col("k") + 1)
        <= F.col("t_budget"),
    )
    a = a.select(
        "*",
        F.sum(F.when(F.col("capped"), F.col("avail_tokens")).otherwise(0))
        .over(w_all)
        .alias("capped_sum"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(w_all).alias("m"),
    )
    alloc = F.when(F.col("capped"), F.col("avail_tokens")).otherwise(
        F.expr("(t_budget - capped_sum) div (n - m)")
        + F.when(
            F.col("k") - F.col("m")
            <= F.expr("(t_budget - capped_sum) % (n - m)"),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return a.select(
        "source",
        "avail_tokens",
        alloc.cast("long").alias("allocated_tokens"),
        "capped",
        F.expr(
            "CASE WHEN avail_tokens > 0 THEN "
            "(CASE WHEN capped THEN avail_tokens ELSE "
            "(t_budget - capped_sum) div (n - m) + (CASE WHEN k - m <= "
            "(t_budget - capped_sum) % (n - m) THEN 1 ELSE 0 END) END) "
            "* 1000 div avail_tokens ELSE 0 END"
        )
        .cast("long")
        .alias("fill_per_mille"),
    )


WATERFILL_ORACLE = f"""
WITH t AS (
    SELECT source, CAST(len({_sql_tokens()}) AS BIGINT) AS n_tok FROM documents
),
avail AS (
    SELECT source, CAST(SUM(n_tok) AS BIGINT) AS avail_tokens
    FROM t GROUP BY source
),
a AS (
    SELECT source, avail_tokens,
           ROW_NUMBER() OVER (ORDER BY avail_tokens, source) AS k,
           CAST(SUM(avail_tokens) OVER (
               ORDER BY avail_tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum,
           COUNT(*) OVER () AS n,
           CAST((SUM(avail_tokens) OVER () * {WATERFILL_NUM})
                // {WATERFILL_DEN} AS BIGINT) AS t_budget
    FROM avail
),
b AS (
    SELECT *,
           (cum - avail_tokens) + avail_tokens * (n - k + 1) <= t_budget
               AS capped
    FROM a
),
c AS (
    SELECT *,
           CAST(SUM(CASE WHEN capped THEN avail_tokens ELSE 0 END)
                OVER () AS BIGINT) AS capped_sum,
           CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT)
               AS m
    FROM b
),
d AS (
    SELECT *,
           CASE WHEN capped THEN avail_tokens
                ELSE (t_budget - capped_sum) // (n - m)
                     + (CASE WHEN k - m <=
                          (t_budget - capped_sum) % (n - m)
                        THEN 1 ELSE 0 END)
           END AS alloc
    FROM c
)
SELECT source, avail_tokens, CAST(alloc AS BIGINT) AS allocated_tokens,
       capped,
       CAST(CASE WHEN avail_tokens > 0
                 THEN alloc * 1000 // avail_tokens ELSE 0 END AS BIGINT)
           AS fill_per_mille
FROM d
"""


register(
    "mixture_token_waterfill",
    oracle=WATERFILL_ORACLE,
    doc=f"Capacitated token-budget waterfilling (T = total * "
    f"{WATERFILL_NUM}/{WATERFILL_DEN}): small sources taken whole, the "
    "rest share a common waterline — closed form on sorted availability "
    "(no iteration), exact integer arithmetic, windows bounded by "
    "#sources; the allocation plan a training-mix builder executes.",
    tags=("llm", "sampling", "mixture", "pipeline"),
)(build_mixture_token_waterfill)
