"""Similarity search over embedding columns (array<float>).

The LLM-pipeline extension's ANN surface: brute-force cosine top-k as the
correctness baseline, and a random-hyperplane LSH-bucketed variant as the
scale path (bucket first, then search only the query's bucket — at 100 TB
the bucketed plan touches 1/2^P of the corpus per query and the bucket
assignment is a single embarrassingly-parallel projection).

Cross-engine exactness: embeddings are quantized to integer micro-units
(round(v*1e6) as bigint) so dot products and squared norms are exact
integer sums (order-independent); the final cosine is the same sequence of
IEEE double ops on both engines → bit-identical, no tolerance. Hyperplanes
are deterministic literals (numpy RandomState(42), quantized to integer
milli-units) injected into both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register

DIM = 64
N_PLANES = 6  # 64 buckets
KNN_K = 20
PAIR_THRESHOLD = 0.4

_rs = np.random.RandomState(42)
# integer milli-unit hyperplanes, deterministic across runs/engines
HYPERPLANES: list[list[int]] = [
    [int(x) for x in np.round(_rs.normal(size=DIM) * 1000)] for _ in range(N_PLANES)
]


def quantized(col: Column | str = "embedding") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda v: F.round(v.cast("double") * 1000000, 0).cast("long"))


def _sql_quantized(expr: str = "embedding") -> str:
    return (
        f"list_transform({expr}, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sql_int_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, {DIM}), i -> {a}[i] * {b}[i]))"


def ssq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def _sql_ssq(a: str) -> str:
    return f"list_sum(list_transform({a}, x -> x * x))"


def cosine(dot: Column, ssq1: Column, ssq2: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(ssq1.cast("double")) * F.sqrt(ssq2.cast("double"))
    )


def _sql_cosine(dot: str, ssq1: str, ssq2: str) -> str:
    return (
        f"CAST({dot} AS DOUBLE) / (sqrt(CAST({ssq1} AS DOUBLE)) * sqrt(CAST({ssq2} AS DOUBLE)))"
    )


def _plane_sql(j: int) -> str:
    return "[" + ", ".join(str(v) for v in HYPERPLANES[j]) + "]"


def _plane_col(j: int) -> Column:
    return F.array(*[F.lit(v).cast("long") for v in HYPERPLANES[j]])


def bucket_col(qa: Column) -> Column:
    """LSH bucket id: concatenated sign bits of hyperplane projections."""
    bits = [
        F.when(int_dot(qa, _plane_col(j)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(N_PLANES)
    ]
    return F.concat(*bits)


def _sql_bucket(qa: str) -> str:
    bits = " || ".join(
        f"(CASE WHEN {_sql_int_dot(qa, _plane_sql(j))} >= 0 THEN '1' ELSE '0' END)"
        for j in range(N_PLANES)
    )
    return f"({bits})"


# ---------------------------------------------------------------------------
# embedding_stats — per-label corpus statistics on exact integer norms.
# ---------------------------------------------------------------------------

EMBEDDING_STATS_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, label,
           CAST(ROUND(sqrt(CAST({_sql_ssq('qa')} AS DOUBLE)), 0) AS BIGINT) AS norm_micro
    FROM q
)
SELECT
    label,
    COUNT(*) AS n_vectors,
    CAST(SUM(norm_micro) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_norm,
    CAST(MIN(norm_micro) AS DOUBLE) / 1000000.0 AS min_norm,
    CAST(MAX(norm_micro) AS DOUBLE) / 1000000.0 AS max_norm
FROM n
GROUP BY label
"""


def build_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(ssq(quantized()).cast("double")), 0).cast("long").alias("norm_micro"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (F.sum("norm_micro").cast("double") / 1000000.0 / F.count(F.lit(1))).alias(
            "avg_norm"
        ),
        (F.min("norm_micro").cast("double") / 1000000.0).alias("min_norm"),
        (F.max("norm_micro").cast("double") / 1000000.0).alias("max_norm"),
    )


register(
    "embedding_stats",
    oracle=EMBEDDING_STATS_ORACLE,
    doc="Per-label embedding norm statistics on exact integer arithmetic "
    "(LLM-pipeline extension).",
    tags=("similarity", "llm"),
)(build_embedding_stats)


# ---------------------------------------------------------------------------
# knn_bruteforce_cosine — exact top-k for the min-vec_id query vector.
# The baseline every ANN variant is validated against.
# ---------------------------------------------------------------------------

KNN_BRUTE_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, label, qa, {_sql_ssq('qa')} AS ssq FROM q
),
query AS (
    SELECT * FROM n WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT
    c.vec_id,
    c.label,
    {_sql_cosine(_sql_int_dot('c.qa', 'query.qa'), 'c.ssq', 'query.ssq')} AS cos_sim
FROM n c, query
WHERE c.vec_id <> query.vec_id
ORDER BY cos_sim DESC, c.vec_id
LIMIT {KNN_K}
"""


def build_knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select("vec_id", "label", quantized().alias("qa")).withColumn(
        "ssq", ssq(F.col("qa"))
    )
    qid = emb.agg(F.min("vec_id")).first()[0]  # S12 scalar fetch
    query = n.filter(F.col("vec_id") == qid).select(
        F.col("qa").alias("q_qa"), F.col("ssq").alias("q_ssq")
    )
    return (
        n.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            cosine(int_dot(F.col("qa"), F.col("q_qa")), F.col("ssq"), F.col("q_ssq")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_bruteforce_cosine",
    oracle=KNN_BRUTE_ORACLE,
    doc="Exact cosine top-k via broadcast query vector (ANN correctness "
    "baseline; LLM-pipeline extension).",
    tags=("similarity", "llm", "topk"),
)(build_knn_bruteforce_cosine)


# ---------------------------------------------------------------------------
# knn_lsh_bucketed — the scale path: random-hyperplane bucket first, search
# only the query's bucket.
# ---------------------------------------------------------------------------

KNN_LSH_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, label, qa, {_sql_ssq('qa')} AS ssq, {_sql_bucket('qa')} AS bucket
    FROM q
),
query AS (
    SELECT * FROM n WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT
    c.vec_id,
    c.label,
    c.bucket,
    {_sql_cosine(_sql_int_dot('c.qa', 'query.qa'), 'c.ssq', 'query.ssq')} AS cos_sim
FROM n c, query
WHERE c.bucket = query.bucket AND c.vec_id <> query.vec_id
ORDER BY cos_sim DESC, c.vec_id
LIMIT {KNN_K}
"""


def build_knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = (
        emb.select("vec_id", "label", quantized().alias("qa"))
        .withColumn("ssq", ssq(F.col("qa")))
        .withColumn("bucket", bucket_col(F.col("qa")))
    )
    qid = emb.agg(F.min("vec_id")).first()[0]
    query = n.filter(F.col("vec_id") == qid).select(
        F.col("qa").alias("q_qa"),
        F.col("ssq").alias("q_ssq"),
        F.col("bucket").alias("q_bucket"),
    )
    return (
        n.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(query))
        .filter(F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            "label",
            "bucket",
            cosine(int_dot(F.col("qa"), F.col("q_qa")), F.col("ssq"), F.col("q_ssq")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_lsh_bucketed",
    oracle=KNN_LSH_ORACLE,
    doc=f"LSH-bucketed ANN ({N_PLANES} hyperplanes → {2**N_PLANES} buckets): "
    "search only the query's bucket (scale path; LLM-pipeline extension).",
    tags=("similarity", "llm", "lsh"),
)(build_knn_lsh_bucketed)


# ---------------------------------------------------------------------------
# similar_pairs_lsh — near-dup pair mining: pairs sharing an LSH bucket with
# cosine above threshold. Bucket join keeps pairwise work per-bucket.
# ---------------------------------------------------------------------------

SIMILAR_PAIRS_ORACLE = f"""
WITH q AS (
    SELECT vec_id, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, qa, {_sql_ssq('qa')} AS ssq, {_sql_bucket('qa')} AS bucket
    FROM q
)
SELECT
    a.vec_id AS vec1,
    b.vec_id AS vec2,
    a.bucket,
    {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')} AS cos_sim
FROM n a
JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')} >= {PAIR_THRESHOLD}
"""


def build_similar_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = (
        emb.select("vec_id", quantized().alias("qa"))
        .withColumn("ssq", ssq(F.col("qa")))
        .withColumn("bucket", bucket_col(F.col("qa")))
    )
    a = n.select(
        F.col("vec_id").alias("vec1"),
        F.col("qa").alias("qa1"),
        F.col("ssq").alias("ssq1"),
        "bucket",
    )
    b = n.select(
        F.col("vec_id").alias("vec2"),
        F.col("qa").alias("qa2"),
        F.col("ssq").alias("ssq2"),
        F.col("bucket").alias("bucket2"),
    )
    cos = cosine(int_dot(F.col("qa1"), F.col("qa2")), F.col("ssq1"), F.col("ssq2"))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket2")) & (F.col("vec1") < F.col("vec2")))
        .select("vec1", "vec2", "bucket", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= PAIR_THRESHOLD)
    )


register(
    "similar_pairs_lsh",
    oracle=SIMILAR_PAIRS_ORACLE,
    doc="Embedding near-dup pairs within LSH buckets above a cosine "
    "threshold (LLM-pipeline extension).",
    tags=("similarity", "llm", "lsh", "join"),
)(build_similar_pairs_lsh)


# ---------------------------------------------------------------------------
# knn_ivf — IVF-style ANN: coarse quantizer (per-label integer centroids)
# -> assign every vector to its nearest centroid cell -> search only the
# query's cell. The centroid table is tiny (K rows) and broadcasts; the
# assignment is one scan + broadcast join; at 100 TB only 1/K of the corpus
# is touched per query. Centroid arithmetic is exact-integer (floor of an
# IEEE-exact double division), so both engines agree bitwise.
# ---------------------------------------------------------------------------

KNN_IVF_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
cent AS (
    SELECT label, i,
           CAST(FLOOR(CAST(SUM(qa[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
    FROM q, UNNEST(generate_series(1, {DIM})) AS t(i)
    GROUP BY label, i
),
cent_arr AS (
    SELECT label AS cent_label, list(c ORDER BY i) AS ca FROM cent GROUP BY label
),
assign AS (
    SELECT vec_id, label, qa, cent_label,
           ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY list_sum(list_transform(generate_series(1, {DIM}),
                                 i -> (qa[i] - ca[i]) * (qa[i] - ca[i]))), cent_label
           ) AS rn
    FROM q CROSS JOIN cent_arr
),
cells AS (
    SELECT vec_id, label, qa, {_sql_ssq('qa')} AS ssq, cent_label AS cell
    FROM assign WHERE rn = 1
),
query AS (
    SELECT * FROM cells WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT
    c.vec_id,
    c.label,
    c.cell,
    {_sql_cosine(_sql_int_dot('c.qa', 'query.qa'), 'c.ssq', 'query.ssq')} AS cos_sim
FROM cells c, query
WHERE c.cell = query.cell AND c.vec_id <> query.vec_id
ORDER BY cos_sim DESC, c.vec_id
LIMIT {KNN_K}
"""


def build_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    q = emb.select("vec_id", "label", quantized().alias("qa"))
    # coarse quantizer: per-label element-wise integer centroid
    comp = q.select("label", F.posexplode("qa").alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).alias("i"), "v"
    )
    cent = comp.groupBy("label", "i").agg(
        F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).alias("c")
    )
    cent_arr = cent.groupBy(F.col("label").alias("cent_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("ca")
    )
    dist = F.aggregate(
        F.zip_with("qa", "ca", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(dist, F.col("cent_label"))
    assign = (
        q.crossJoin(F.broadcast(cent_arr))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    cells = assign.select(
        "vec_id", "label", "qa", ssq(F.col("qa")).alias("ssq"),
        F.col("cent_label").alias("cell"),
    )
    qid = emb.agg(F.min("vec_id")).first()[0]  # S12 scalar fetch
    query = cells.filter(F.col("vec_id") == qid).select(
        F.col("qa").alias("q_qa"), F.col("ssq").alias("q_ssq"), F.col("cell").alias("q_cell")
    )
    return (
        cells.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(query))
        .filter(F.col("cell") == F.col("q_cell"))
        .select(
            "vec_id",
            "label",
            "cell",
            cosine(int_dot(F.col("qa"), F.col("q_qa")), F.col("ssq"), F.col("q_ssq")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_ivf",
    oracle=KNN_IVF_ORACLE,
    doc="IVF ANN: per-label integer centroids (coarse quantizer) -> "
    "broadcast cell assignment -> search only the query's cell "
    "(LLM-pipeline extension; scale path touches 1/K of the corpus).",
    tags=("similarity", "llm", "ivf"),
)(build_knn_ivf)


# ---------------------------------------------------------------------------
# knn_pandas_vectorized — the Arrow/mapInPandas formulation of the exact
# brute-force top-k: numpy int64 matmul per Arrow batch against the
# broadcast query vector. Same quantization (HALF_UP like Spark/DuckDB
# round — numpy's bankers' rounding would diverge on exact .5 products),
# same integer dot/norms, same IEEE cosine -> shares the Catalyst
# version's oracle verbatim. The scale shape: ~1000-row Arrow batches,
# one BLAS matmul each, no per-row Python.
# ---------------------------------------------------------------------------


def _round_half_up(x):
    import numpy as np

    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")


def build_knn_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    qid = emb.agg(F.min("vec_id")).first()[0]
    qvec = emb.filter(F.col("vec_id") == qid).select("embedding").first()[0]
    q = _round_half_up(np.asarray(qvec, dtype=np.float64) * 1e6)
    q_ssq = float(np.sqrt(float((q * q).sum())))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = _round_half_up(
                np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
                * 1e6
            )
            dots = (m * q).sum(axis=1)  # int64 exact
            norms = np.sqrt((m * m).sum(axis=1).astype("float64"))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cos_sim": dots.astype("float64") / (norms * q_ssq),
                }
            )

    scored = emb.mapInPandas(
        score, schema="vec_id bigint, label int, cos_sim double"
    )
    return (
        scored.filter(F.col("vec_id") != qid)
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_pandas_vectorized",
    oracle=KNN_BRUTE_ORACLE,
    doc="Exact cosine top-k via Arrow-batched mapInPandas + numpy int64 "
    "matmul — same oracle as the Catalyst formulation (LLM-pipeline "
    "extension, the vectorized-Pandas-UDF path).",
    tags=("similarity", "llm", "pandas"),
)(build_knn_pandas_vectorized)


# ---------------------------------------------------------------------------
# docs_with_embeddings — cross-modal join: text corpus ⟕ embedding store
# on document id. The join key is the uniform content id, so it shuffles
# evenly; at 100 TB both sides would be bucketed by id (write_bucketed)
# making this exchange-free.
# ---------------------------------------------------------------------------

DOCS_EMB_ORACLE = f"""
SELECT
    d.doc_id,
    d.lang,
    d.n_chars,
    e.vec_id IS NOT NULL AS has_embedding,
    e.label AS cluster_label,
    CASE WHEN e.vec_id IS NULL THEN NULL
         ELSE CAST(ROUND(sqrt(CAST({_sql_ssq(_sql_quantized('e.embedding'))} AS DOUBLE)), 0)
              AS BIGINT) END AS norm_micro
FROM documents d
LEFT JOIN embeddings e ON d.doc_id = e.vec_id
"""


def build_docs_with_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.col("label").alias("cluster_label"),
        F.round(F.sqrt(ssq(quantized()).cast("double")), 0).cast("long").alias("norm_micro"),
    )
    return docs.join(e, docs.doc_id == e.vec_id, "left").select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("vec_id").isNotNull().alias("has_embedding"),
        "cluster_label",
        "norm_micro",
    )


register(
    "docs_with_embeddings",
    oracle=DOCS_EMB_ORACLE,
    doc="Cross-modal join of the text corpus with the embedding store "
    "(LLM-pipeline extension; bucket both sides by id at scale).",
    tags=("similarity", "llm", "join"),
)(build_docs_with_embeddings)


# ---------------------------------------------------------------------------
# kmeans_embeddings — the iterative-algorithm pattern done Spark-idiomatic:
# centroids are tiny (K x DIM ints) so each Lloyd iteration is one
# broadcast-assign pass over the corpus + one explode/groupBy centroid
# update collected to the driver (K rows over the wire — the standard
# Spark ML loop shape; the corpus is never collected). Deterministic:
# min-vec_id seeds, exact integer centroid floors, (dist, cluster)
# tie-break. Rows-only driver check by design (iterative refinement is
# not economically SQL-expressible); the pytest pins determinism and
# assignment sanity instead.
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def build_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    q = emb.select("vec_id", quantized().alias("qa")).persist()
    q.count()

    # deterministic seeds: the K lowest vec_ids
    seeds = q.orderBy("vec_id").limit(KMEANS_K).collect()
    centroids = [(i, list(r.qa)) for i, r in enumerate(seeds)]

    def assign(cent):
        cent_df = F.broadcast(
            spark.createDataFrame(cent, ["cluster", "ca"]).withColumn(
                "ca", F.col("ca").cast("array<long>")
            )
        )
        dist = F.aggregate(
            F.zip_with("qa", "ca", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        w = W.partitionBy("vec_id").orderBy(dist.asc(), F.col("cluster").asc())
        return (
            q.crossJoin(cent_df)
            .withColumn("dist_sq", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "qa", "cluster", "dist_sq")
        )

    for _ in range(KMEANS_ITERS):
        assigned = assign(centroids)
        rows = (
            assigned.select("cluster", F.posexplode("qa").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
                ).alias("ca")
            )
            .collect()  # K rows only — centroids, not data
        )
        new_centroids = {r.cluster: list(r.ca) for r in rows}
        centroids = [
            (k, new_centroids.get(k, ca)) for k, ca in centroids  # keep empty clusters
        ]

    final = assign(centroids)
    q.unpersist()
    return final.select("vec_id", "cluster", "dist_sq")


register(
    "kmeans_embeddings",
    oracle=None,
    doc=f"Lloyd k-means (K={KMEANS_K}, {KMEANS_ITERS} iters) over embeddings: "
    "broadcast assign + driver-side centroid update per iteration; "
    "deterministic seeds/tie-breaks; rows-only check (iterative).",
    tags=("similarity", "llm", "iterative"),
)(build_kmeans_embeddings)
