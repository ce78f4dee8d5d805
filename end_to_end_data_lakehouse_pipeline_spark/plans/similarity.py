"""Similarity search over embedding columns (array<float>).

The LLM-pipeline extension's ANN surface: brute-force cosine top-k as the
correctness baseline, and two scale paths — banded multi-table
random-hyperplane LSH (candidates = vectors sharing ANY band bucket with
the query / partner) and a seed-based IVF coarse quantizer with a tunable
cell count and nprobe.

Scale design (the 100 TB story):
- 24 hyperplanes split into 3 bands of 8 bits → 256 buckets per band.
  Candidate work per query is ~3·n/256 with far better recall than one
  monolithic table; pair mining is Θ(Σ bucket²) per band, and hot buckets
  are dropped by an explicit population cap (``BUCKET_CAP``) so the join
  stays linear in n. Planes/bands are module constants — at a real corpus
  raise ROWS_PER_BAND toward log2(n) (e.g. 16-20 bits per band at 10⁹
  vectors) and add bands for recall; the plan shape is unchanged.
- IVF: ``IVF_K`` seed vectors define the cells (nearest-seed assignment);
  the query probes its ``IVF_NPROBE`` nearest cells. K ≈ √n at scale.
- Band keys are computed in ONE fold per band (zip_with over a transposed
  plane matrix), not one interpreted HOF chain per plane — see
  bucket-granularity / HOF-recompute notes in VERDICT round 1.

Cross-engine exactness: embeddings are quantized to integer micro-units
(round(v*1e6) as bigint) so dot products and squared norms are exact
integer sums (order-independent); the final cosine is the same sequence of
IEEE double ops on both engines → bit-identical, no tolerance. Hyperplanes
are deterministic literals (numpy RandomState(42), quantized to integer
milli-units) injected into both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register

DIM = 64
N_BANDS = 3
ROWS_PER_BAND = 8  # bits per band -> 256 buckets/band
N_PLANES = N_BANDS * ROWS_PER_BAND
BUCKET_CAP = 100  # pair mining drops band buckets more populous than this
KNN_K = 20
PAIR_THRESHOLD = 0.4
IVF_K = 16  # coarse-quantizer cells (≈ √n at scale)
IVF_NPROBE = 2  # cells searched per query

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


def _sql_band_key(qa: str, b: int) -> str:
    bits = " || ".join(
        f"(CASE WHEN {_sql_int_dot(qa, _plane_sql(b * ROWS_PER_BAND + j))} >= 0 "
        f"THEN '1' ELSE '0' END)"
        for j in range(ROWS_PER_BAND)
    )
    return f"({bits})"


def band_signatures(n: DataFrame) -> DataFrame:
    """(vec_id, qa, ...) -> one row per (vec_id, band, key).

    The whole-stage-codegen formulation (the minhash_table shape, see
    dedup.py): explode the vector to (vec_id, i, v) rows, compute all 24
    plane products per row as codegen'd ``v * element_at(const_plane, i)``
    projections, and take the 24 dot products in a single hash aggregate
    with map-side partial combine — the shuffle carries one 24-long row per
    vector, 64× less than the exploded input. No interpreted higher-order
    functions in the hot path (a zip_with/aggregate fold here costs ~µs per
    element interpreted — 100× the codegen'd arithmetic).
    """
    spark = n.sparkSession
    # plane coefficients as a 64-row broadcast relation, NOT as 24×64
    # literal expression nodes — a literal-matrix expression tree costs
    # seconds of Catalyst optimization per query build; a tiny broadcast
    # join costs none and generates the same codegen'd multiply-sums.
    coeff_rows = [
        (i + 1, *[HYPERPLANES[j][i] for j in range(N_PLANES)]) for i in range(DIM)
    ]
    coeffs = spark.createDataFrame(
        coeff_rows, ["i", *[f"c{j}" for j in range(N_PLANES)]]
    )
    e = n.select("vec_id", F.posexplode("qa").alias("i0", "v")).select(
        "vec_id", (F.col("i0") + 1).alias("i"), "v"
    )
    dots = (
        e.join(F.broadcast(coeffs), "i")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(F.col("v") * F.col(f"c{j}")).alias(f"d{j}")
                for j in range(N_PLANES)
            ]
        )
    )

    def key(b: int) -> Column:
        return F.concat(
            *[
                F.when(F.col(f"d{b * ROWS_PER_BAND + j}") >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for j in range(ROWS_PER_BAND)
            ]
        )

    keys = F.array(*[key(b) for b in range(N_BANDS)])
    return dots.select("vec_id", F.posexplode(keys).alias("band", "key"))


def _sql_band_signatures(src: str = "n") -> str:
    """UNION ALL mirror of band_signatures over CTE ``src``."""
    return " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_sql_band_key('qa', b)} AS key FROM {src}"
        for b in range(N_BANDS)
    )


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
# knn_lsh_bucketed — the scale path: banded multi-table LSH. Candidates are
# vectors sharing ANY of the query's 3 band buckets (256 buckets/band), so
# per-query work is ~3·n/256 with multi-table recall; only candidates are
# scored. The signature relation is what a real deployment would precompute
# and bucket-write.
# ---------------------------------------------------------------------------

KNN_LSH_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, label, qa, {_sql_ssq('qa')} AS ssq FROM q
),
sig AS ({_sql_band_signatures('n')}),
qsig AS (
    SELECT band, key FROM sig WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
),
cand AS (
    SELECT DISTINCT s.vec_id
    FROM sig s JOIN qsig ON s.band = qsig.band AND s.key = qsig.key
    WHERE s.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
),
query AS (
    SELECT * FROM n WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT
    c.vec_id,
    c.label,
    {_sql_cosine(_sql_int_dot('c.qa', 'query.qa'), 'c.ssq', 'query.ssq')} AS cos_sim
FROM n c JOIN cand ON c.vec_id = cand.vec_id, query
ORDER BY cos_sim DESC, c.vec_id
LIMIT {KNN_K}
"""


def _quantize_py(vec) -> list[int]:
    """Driver-side mirror of quantized(): round(v*1e6) HALF_UP on the same
    IEEE double — identical integers to Spark's F.round and DuckDB's round."""
    out = []
    for v in vec:
        x = float(v) * 1000000.0
        out.append((1 if x >= 0 else -1) * int(abs(x) + 0.5))
    return out


def _band_keys_py(qa: list[int]) -> list[tuple[int, str]]:
    """Driver-side band signature of ONE query vector (exact int arithmetic —
    the serving-layer analog of band_signatures)."""
    keys = []
    for b in range(N_BANDS):
        bits = ""
        for j in range(ROWS_PER_BAND):
            plane = HYPERPLANES[b * ROWS_PER_BAND + j]
            dot = sum(x * c for x, c in zip(qa, plane))
            bits += "1" if dot >= 0 else "0"
        keys.append((b, bits))
    return keys


def _query_row(emb: DataFrame):
    """Fetch the min-vec_id query vector (single-row S12 scalar fetch)."""
    r = emb.orderBy("vec_id").select("vec_id", "embedding").first()
    qa = _quantize_py(r.embedding)
    return r.vec_id, qa, sum(x * x for x in qa)


def build_knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select("vec_id", "label", quantized().alias("qa")).withColumn(
        "ssq", ssq(F.col("qa"))
    )
    qid, q_qa, q_ssq = _query_row(emb)
    # query-side band keys are computed on the driver (O(DIM·planes) scalar
    # work — the serving-layer shape); the corpus-side signature stays fully
    # distributed and the tiny candidate set broadcasts into the score join.
    qkeys = _band_keys_py(q_qa)
    sig = band_signatures(n)
    key_match = F.struct("band", "key").isin(
        [F.struct(F.lit(b), F.lit(k)) for b, k in qkeys]
    )
    cand = sig.filter(key_match & (F.col("vec_id") != qid)).select("vec_id").distinct()
    q_arr = F.array(*[F.lit(x).cast("long") for x in q_qa])
    return (
        n.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            "label",
            cosine(
                int_dot(F.col("qa"), q_arr), F.col("ssq"), F.lit(q_ssq).cast("long")
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_lsh_bucketed",
    oracle=KNN_LSH_ORACLE,
    doc=f"Banded multi-table LSH ANN ({N_BANDS} bands × {ROWS_PER_BAND} bits → "
    f"{2**ROWS_PER_BAND} buckets/band): candidates share any band bucket with "
    "the query, only candidates scored (scale path; LLM-pipeline extension).",
    tags=("similarity", "llm", "lsh"),
)(build_knn_lsh_bucketed)


# ---------------------------------------------------------------------------
# similar_pairs_lsh — near-dup pair mining via banded multi-table LSH:
# candidate pairs share ≥1 of 3 band buckets (256/band), band buckets more
# populous than BUCKET_CAP are dropped (a stop-bucket carries no near-dup
# signal and would make the self-join quadratic — the documented recall
# trade for linear scale), candidates are deduped across bands, and only
# candidates get the exact cosine verify.
# ---------------------------------------------------------------------------

SIMILAR_PAIRS_ORACLE = f"""
WITH q AS (
    SELECT vec_id, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, qa, {_sql_ssq('qa')} AS ssq FROM q
),
sig AS ({_sql_band_signatures('n')}),
ok AS (
    SELECT band, key FROM sig GROUP BY band, key HAVING COUNT(*) <= {BUCKET_CAP}
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
    FROM sig a
    JOIN ok ON a.band = ok.band AND a.key = ok.key
    JOIN sig b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT
    cand.vec1,
    cand.vec2,
    {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')} AS cos_sim
FROM cand
JOIN n a ON cand.vec1 = a.vec_id
JOIN n b ON cand.vec2 = b.vec_id
WHERE {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')} >= {PAIR_THRESHOLD}
"""


def similar_pairs_from(n: DataFrame, bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """Banded pair mining over (vec_id, qa, ssq) — testable on any corpus."""
    sig = band_signatures(n)
    ok = sig.groupBy("band", "key").agg(F.count(F.lit(1)).alias("pop")).filter(
        F.col("pop") <= bucket_cap
    ).select("band", "key")
    a = sig.join(ok, ["band", "key"]).select("band", "key", F.col("vec_id").alias("vec1"))
    b = sig.select("band", "key", F.col("vec_id").alias("vec2"))
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("vec1") < F.col("vec2"))
        .select("vec1", "vec2")
        .distinct()
    )
    na = n.select(
        F.col("vec_id").alias("vec1"), F.col("qa").alias("qa1"), F.col("ssq").alias("ssq1")
    )
    nb = n.select(
        F.col("vec_id").alias("vec2"), F.col("qa").alias("qa2"), F.col("ssq").alias("ssq2")
    )
    cos = cosine(int_dot(F.col("qa1"), F.col("qa2")), F.col("ssq1"), F.col("ssq2"))
    return (
        cand.join(na, "vec1")
        .join(nb, "vec2")
        .select("vec1", "vec2", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= PAIR_THRESHOLD)
    )


def build_similar_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select("vec_id", quantized().alias("qa")).withColumn("ssq", ssq(F.col("qa")))
    return similar_pairs_from(n)


register(
    "similar_pairs_lsh",
    oracle=SIMILAR_PAIRS_ORACLE,
    doc=f"Embedding near-dup pairs via banded multi-table LSH ({N_BANDS}×"
    f"{ROWS_PER_BAND} bits, bucket cap {BUCKET_CAP}) + exact cosine verify "
    "(LLM-pipeline extension).",
    tags=("similarity", "llm", "lsh", "join"),
)(build_similar_pairs_lsh)


# ---------------------------------------------------------------------------
# knn_ivf — IVF ANN with a TUNABLE cell count: the IVF_K lowest vec_ids act
# as coarse-quantizer seed points (the SQL-expressible stand-in for a
# trained k-means codebook — kmeans_embeddings below is the trained
# variant); every vector is assigned to its nearest seed (exact integer L2,
# deterministic tie-break), and the query probes its IVF_NPROBE nearest
# cells. The seed table is K rows and broadcasts; at 100 TB only
# ~NPROBE/K of the corpus is scored per query, and K ≈ √n is a constant
# change.
# ---------------------------------------------------------------------------

_SQL_L2 = (
    f"list_sum(list_transform(generate_series(1, {DIM}), "
    "i -> (qa[i] - ca[i]) * (qa[i] - ca[i])))"
)

KNN_IVF_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
seeds AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qa AS ca
    FROM (SELECT vec_id, qa FROM q ORDER BY vec_id LIMIT {IVF_K})
),
assign AS (
    SELECT vec_id, label, qa, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {_SQL_L2}, cell) AS rn
    FROM q CROSS JOIN seeds
),
cells AS (
    SELECT vec_id, label, qa, {_sql_ssq('qa')} AS ssq, cell
    FROM assign WHERE rn = 1
),
qcells AS (
    SELECT cell FROM (
        SELECT cell, ROW_NUMBER() OVER (ORDER BY {_SQL_L2}, cell) AS rn
        FROM (SELECT qa FROM q WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
        CROSS JOIN seeds
    ) WHERE rn <= {IVF_NPROBE}
),
query AS (
    SELECT * FROM cells WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT
    c.vec_id,
    c.label,
    c.cell,
    {_sql_cosine(_sql_int_dot('c.qa', 'query.qa'), 'c.ssq', 'query.ssq')} AS cos_sim
FROM cells c JOIN qcells ON c.cell = qcells.cell, query
WHERE c.vec_id <> query.vec_id
ORDER BY cos_sim DESC, c.vec_id
LIMIT {KNN_K}
"""


def build_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    q = emb.select("vec_id", "label", quantized().alias("qa"))
    # coarse quantizer: K seed vectors fetched to the driver (K rows — the
    # same S12-sanctioned shape as the k-means centroid pull), re-broadcast
    # as a literal cell table.
    seed_rows = (
        emb.orderBy("vec_id").select("vec_id", "embedding").limit(IVF_K).collect()
    )
    seed_vecs = [_quantize_py(r.embedding) for r in seed_rows]
    seeds = F.broadcast(
        emb.sparkSession.createDataFrame(
            list(enumerate(seed_vecs)), ["cell", "ca"]
        ).withColumn("ca", F.col("ca").cast("array<long>"))
    )
    dist = F.aggregate(
        F.zip_with("qa", "ca", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(dist, F.col("cell"))
    cells = (
        q.crossJoin(seeds)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "qa", ssq(F.col("qa")).alias("ssq"), "cell")
    )
    # query-side: nprobe nearest cells computed on the driver from the
    # already-fetched seeds (exact int L2, deterministic tie on cell id) —
    # the serving-layer shape, no extra Spark jobs. The query vector (min
    # vec_id) is seed 0, already on the driver.
    qid, q_qa = seed_rows[0].vec_id, seed_vecs[0]
    q_ssq = sum(x * x for x in q_qa)
    by_dist = sorted(
        (sum((x - y) * (x - y) for x, y in zip(q_qa, ca)), cell)
        for cell, ca in enumerate(seed_vecs)
    )
    probe_cells = [cell for _, cell in by_dist[:IVF_NPROBE]]
    q_arr = F.array(*[F.lit(x).cast("long") for x in q_qa])
    return (
        cells.filter(F.col("cell").isin(probe_cells) & (F.col("vec_id") != qid))
        .select(
            "vec_id",
            "label",
            "cell",
            cosine(
                int_dot(F.col("qa"), q_arr), F.col("ssq"), F.lit(q_ssq).cast("long")
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_ivf",
    oracle=KNN_IVF_ORACLE,
    doc=f"IVF ANN with tunable K={IVF_K} seed cells and nprobe={IVF_NPROBE}: "
    "broadcast seed assignment -> search the query's nprobe nearest cells "
    "(LLM-pipeline extension; ~nprobe/K of the corpus per query).",
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
# tie-break — and therefore FULLY ORACLED (round 8, the pagerank
# unrolling discipline): every quantity in a Lloyd round is an exact
# integer (squared distances, argmin with total-order tie-break) or a
# floor of an int/int division whose double evaluation is
# boundary-safe at these magnitudes, so the rounds unroll as DuckDB
# CTEs (_kmeans_ctes, shared with the SemDeDup oracle).
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _kmeans_ctes(n_iters: int = KMEANS_ITERS) -> tuple[str, str]:
    """(CTE chain, final-assignment CTE name) shared by the kmeans and
    dedup_semantic_clusters oracles: min-vec_id seeds -> ``n_iters``
    unrolled Lloyd rounds (assign, per-dim floor(sum/count) centroid
    update, empty clusters keep their previous centroid) -> one final
    assignment against the converged centroids."""
    dist = (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        "i -> (q.qa[i] - c.ca[i]) * (q.qa[i] - c.ca[i])))"
    )
    parts = [
        f"q AS (SELECT vec_id, {_sql_quantized()} AS qa FROM embeddings)",
        f"seeds AS (SELECT vec_id, qa FROM q ORDER BY vec_id LIMIT {KMEANS_K})",
        "c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, "
        "qa AS ca FROM seeds)",
    ]
    for r in range(1, n_iters + 2):  # n_iters updates + the final assign
        parts.append(
            f"""a{r} AS (
    SELECT vec_id, qa, cluster, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM (SELECT q.vec_id, q.qa, c.cluster, {dist} AS dist FROM q, c{r - 1} c)
)"""
        )
        if r <= n_iters:
            parts.append(
                f"""u{r} AS (
    SELECT cluster, i,
           CAST(floor(CAST(SUM(qa[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
    FROM a{r} CROSS JOIN UNNEST(generate_series(1, {DIM})) AS t(i)
    WHERE rn = 1 GROUP BY cluster, i
),
uu{r} AS (SELECT cluster, list(c ORDER BY i) AS ca FROM u{r} GROUP BY cluster),
c{r} AS (
    SELECT p.cluster, COALESCE(n.ca, p.ca) AS ca
    FROM c{r - 1} p LEFT JOIN uu{r} n ON p.cluster = n.cluster
)"""
            )
    return ",\n".join(parts), f"a{n_iters + 1}"


def _kmeans_oracle() -> str:
    ctes, final = _kmeans_ctes()
    return f"""
WITH {ctes}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist_sq
FROM {final} WHERE rn = 1
"""


def build_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    q = emb.select("vec_id", quantized().alias("qa")).persist()
    q.count()

    # deterministic seeds: the K lowest vec_ids
    seeds = q.orderBy("vec_id").limit(KMEANS_K).collect()
    centroids = [(i, list(r.qa)) for i, r in enumerate(seeds)]

    def assign(cent):
        # r12 OPTIMIZATION (guide §2.4 "remove shuffles outright"): the
        # centroids live on the DRIVER, so the argmin over K=8 of them is
        # a pure map-side projection — the K distances as a literal
        # array<struct<dist_sq,cluster>> and array_min's lexicographic
        # (dist_sq, cluster) ordering == the previous orderBy(dist asc,
        # cluster asc) row_number()==1 winner, tie-break included. The
        # old shape (crossJoin(broadcast centroids) + row_number window)
        # shuffled AND sorted K×N rows per assign — one Exchange + two
        # sorts × 4 assigns per run (see
        # plans/r12/kmeans_embeddings_before.txt) for work that needs no
        # data movement at all. Exact same integer arithmetic on the
        # same quantized grid.
        def dist_to(ca):
            # one F.expr per centroid, not one F.lit per element: 512
            # py4j round-trips per assign cost 1.4-2.7 s of pure DRIVER
            # time per iteration (measured — the first cut of this
            # rewrite was slower end-to-end for exactly that reason);
            # the SQL-text array literal is a single lazy call.
            lit_arr = F.expr(
                "array(" + ",".join(f"{int(v)}L" for v in ca) + ")"
            )
            return F.aggregate(
                F.zip_with("qa", lit_arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        # Distance ARRAY in its own projection so the 8 interpreted
        # folds evaluate once per row (CollapseProject keeps the
        # non-cheap producer separate — verified in the plan: 8
        # `aggregate(zip_with` occurrences, not 16); the argmin is then
        # array_min + array_position over 8 longs, whose first-match
        # semantics IS the lowest-cluster tie-break (centroid list is
        # ordered 0..K-1).
        assert [k for k, _ in cent] == list(range(len(cent)))  # position == id
        da = F.array(*[dist_to(ca) for _k, ca in cent])
        m = F.array_min(F.col("da"))
        return (
            q.withColumn("da", da)
            .select(
                "vec_id",
                "qa",
                (F.array_position(F.col("da"), m) - 1)
                .cast("long")
                .alias("cluster"),
                m.alias("dist_sq"),
            )
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
    oracle=_kmeans_oracle(),
    doc=f"Lloyd k-means (K={KMEANS_K}, {KMEANS_ITERS} iters) over embeddings: "
    "broadcast assign + driver-side centroid update per iteration; "
    "min-vec_id seeds, exact integer distances, floor centroid grid — "
    "fully oracled via unrolled Lloyd-round CTEs.",
    tags=("similarity", "llm", "iterative"),
)(build_kmeans_embeddings)


# ---------------------------------------------------------------------------
# dedup_embedding_cosine — embedding-level near-dup DEDUP (the survivor
# pass over similar_pairs_lsh): drop every vector that is >= PAIR_THRESHOLD
# cosine-similar to a lower-id vector. Keep-lowest-id is the deterministic
# greedy rule; transitive-closure canonicalization is dedup_components.
# ---------------------------------------------------------------------------

DEDUP_EMB_ORACLE = f"""
WITH q AS (
    SELECT vec_id, {_sql_quantized()} AS qa FROM embeddings
),
n AS (
    SELECT vec_id, qa, {_sql_ssq('qa')} AS ssq FROM q
),
sig AS ({_sql_band_signatures('n')}),
ok AS (
    SELECT band, key FROM sig GROUP BY band, key HAVING COUNT(*) <= {BUCKET_CAP}
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
    FROM sig a
    JOIN ok ON a.band = ok.band AND a.key = ok.key
    JOIN sig b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
drops AS (
    SELECT DISTINCT cand.vec2 AS vec_id
    FROM cand
    JOIN n a ON cand.vec1 = a.vec_id
    JOIN n b ON cand.vec2 = b.vec_id
    WHERE {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')} >= {PAIR_THRESHOLD}
)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM drops)
"""


def build_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the pair miner is the banded-LSH candidate join
    (linear via the bucket cap); the survivor pass is one anti-join on
    vec_id. No all-pairs stage anywhere."""
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select("vec_id", quantized().alias("qa")).withColumn("ssq", ssq(F.col("qa")))
    drops = similar_pairs_from(n).select(F.col("vec2").alias("vec_id")).distinct()
    return emb.select("vec_id", "label").join(drops, "vec_id", "left_anti")


register(
    "dedup_embedding_cosine",
    oracle=DEDUP_EMB_ORACLE,
    doc=f"Embedding-cosine near-dup dedup: banded-LSH pair mining + "
    f"keep-lowest-id anti-join (threshold {PAIR_THRESHOLD}; LLM-pipeline "
    "extension, completes the dedup family).",
    tags=("similarity", "llm", "dedup", "lsh"),
)(build_dedup_embedding_cosine)


# ---------------------------------------------------------------------------
# label_centroids — per-label mean embedding (the IVF coarse-quantizer /
# class-prototype computation) as (label, dim, value) rows on exact
# integer sums.
# ---------------------------------------------------------------------------

LABEL_CENTROIDS_ORACLE = f"""
WITH q AS (
    SELECT label, {_sql_quantized()} AS qa FROM embeddings
)
SELECT
    label,
    CAST(d.dim AS INTEGER) AS dim,
    CAST(SUM(qa[d.dim]) AS DOUBLE) / 1000000.0 / COUNT(*) AS centroid
FROM q, generate_series(1, {DIM}) AS d(dim)
GROUP BY label, d.dim
"""


def build_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode → one partial+final hash agg on (label, dim): the
    shuffle carries 64 partial sums per (label, dim) group, not vectors.
    Integer micro-unit sums are exact; the final double division is the
    same IEEE sequence both engines. At 100 TB this is the centroid
    update step of kmeans_embeddings, shared shape."""
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    e = emb.select("label", F.posexplode(quantized()).alias("p", "v"))
    return (
        e.groupBy("label", (F.col("p") + 1).cast("int").alias("dim"))
        .agg(
            (F.sum("v").cast("double") / 1000000.0 / F.count(F.lit(1))).alias("centroid")
        )
    )


register(
    "label_centroids",
    oracle=LABEL_CENTROIDS_ORACLE,
    doc="Per-label mean embedding as (label, dim, centroid) rows — the "
    "class-prototype / IVF coarse-quantizer computation on exact integer "
    "sums (LLM-pipeline extension).",
    tags=("similarity", "llm"),
)(build_label_centroids)


# ---------------------------------------------------------------------------
# knn_pq_adc — product quantization with asymmetric-distance scoring, the
# memory-bound ANN scale path (IVF prunes candidates; PQ compresses them:
# 64 dims × 8 bytes -> 8 one-byte codes). Codebooks here are seeded
# deterministic draws (matched to the corpus component scale), NOT
# k-means-trained — the operator shape (encode once, LUT per query, ADC
# scan over codes) is the real thing; training quality is orthogonal and
# lives in kmeans_embeddings.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_SUB = DIM // PQ_M

_rs_pq = np.random.RandomState(7)
# micro-unit integer centroids at the corpus component scale (unit-norm
# 64-dim vectors -> component std ~= 1/8)
PQ_CENTROIDS: list[list[list[int]]] = [
    [
        [int(x) for x in np.round(_rs_pq.normal(size=PQ_SUB) * 0.125 * 1000000)]
        for _ in range(PQ_K)
    ]
    for _ in range(PQ_M)
]


def _pq_cent_values_sql() -> str:
    rows = []
    for m in range(PQ_M):
        for k in range(PQ_K):
            lst = "[" + ", ".join(str(v) for v in PQ_CENTROIDS[m][k]) + "]"
            rows.append(f"({m}, {k}, {lst})")
    return ", ".join(rows)


_PQ_D2 = (
    "list_sum(list_transform(generate_series(1, {sub}), "
    "i -> ({qa}[{off} + i] - {c}[i]) * ({qa}[{off} + i] - {c}[i])))"
)

KNN_PQ_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label, {_sql_quantized()} AS qa FROM embeddings
),
cent(m, k, c) AS (VALUES {_pq_cent_values_sql()}),
enc0 AS (
    SELECT q.vec_id, cent.m, cent.k,
           {_PQ_D2.format(sub=PQ_SUB, qa='q.qa', off='cent.m * ' + str(PQ_SUB), c='cent.c')} AS d2
    FROM q, cent
),
enc AS (
    SELECT vec_id, m, k AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM enc0
    ) WHERE rn = 1
),
query AS (
    SELECT qa FROM q WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
),
lut AS (
    SELECT cent.m, cent.k,
           {_PQ_D2.format(sub=PQ_SUB, qa='query.qa', off='cent.m * ' + str(PQ_SUB), c='cent.c')} AS d2q
    FROM query, cent
),
score AS (
    SELECT e.vec_id, SUM(l.d2q) AS qd
    FROM enc e
    JOIN lut l ON e.m = l.m AND e.code = l.k
    WHERE e.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
    GROUP BY e.vec_id
)
SELECT
    s.vec_id,
    q.label,
    CAST(s.qd AS DOUBLE) / 1000000000000.0 AS approx_dist
FROM score s
JOIN q ON s.vec_id = q.vec_id
ORDER BY approx_dist, s.vec_id
LIMIT {KNN_K}
"""


def build_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode: posexplode -> per-(vec, subspace) pivot (map-side partial
    agg, 8 rows/vector shuffled) -> broadcast 128-row codebook ->
    row_number argmin. In production the code table is written once and
    the scan reads ONLY codes — 64x less IO than raw vectors. Query time:
    the 8x16 LUT of exact integer distances is built on the driver
    (serving shape) and broadcast; the ADC scan is a code join + one sum
    per vector — no vector arithmetic at scan time. All distances are
    exact micro^2 integers, so both engines rank identically."""
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    n = emb.select("vec_id", "label", quantized().alias("qa"))
    # --- corpus encode (precomputed in a real deployment) ---
    e = n.select("vec_id", F.posexplode("qa").alias("i0", "v")).select(
        "vec_id",
        F.floor(F.col("i0") / PQ_SUB).cast("int").alias("m"),
        (F.col("i0") % PQ_SUB).cast("int").alias("j"),
        "v",
    )
    sub = e.groupBy("vec_id", "m").agg(
        *[F.max(F.when(F.col("j") == x, F.col("v"))).alias(f"s{x}") for x in range(PQ_SUB)]
    )
    cent_rows = [
        (m, k, *PQ_CENTROIDS[m][k]) for m in range(PQ_M) for k in range(PQ_K)
    ]
    cent = spark.createDataFrame(
        cent_rows, ["m", "k", *[f"c{x}" for x in range(PQ_SUB)]]
    )
    d2 = None
    for x in range(PQ_SUB):
        term = (F.col(f"s{x}") - F.col(f"c{x}")) * (F.col(f"s{x}") - F.col(f"c{x}"))
        d2 = term if d2 is None else d2 + term
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "k")
    enc = (
        sub.join(F.broadcast(cent), "m")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("k").alias("code"))
    )
    # --- query LUT (driver-side serving shape; exact ints) ---
    qid, q_qa, _ = _query_row(emb)
    lut_rows = []
    for m in range(PQ_M):
        qs = q_qa[m * PQ_SUB : (m + 1) * PQ_SUB]
        for k in range(PQ_K):
            d2q = sum((a - b) * (a - b) for a, b in zip(qs, PQ_CENTROIDS[m][k]))
            lut_rows.append((m, k, d2q))
    lut = spark.createDataFrame(lut_rows, ["m", "code", "d2q"])
    score = (
        enc.filter(F.col("vec_id") != qid)
        .join(F.broadcast(lut), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d2q").alias("qd"))
    )
    return (
        score.join(n.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            (F.col("qd").cast("double") / 1000000000000.0).alias("approx_dist"),
        )
        .orderBy("approx_dist", "vec_id")
        .limit(KNN_K)
    )


register(
    "knn_pq_adc",
    oracle=KNN_PQ_ORACLE,
    doc=f"Product-quantization ANN ({PQ_M} subspaces x {PQ_K} codes, "
    "seeded codebooks): distributed encode, driver-built asymmetric-"
    "distance LUT, code-join ADC scan — the memory-bound scale path "
    "(LLM-pipeline extension).",
    tags=("similarity", "llm", "pq", "topk"),
)(build_knn_pq_adc)


# ---------------------------------------------------------------------------
# ann_recall_lsh — ANN quality evaluation as a first-class query: recall@K
# of the banded-LSH path against the exact brute-force top-K for the same
# query vector. The production tuning loop (raise bands/bits until recall
# clears the bar) is exactly this query run over a sample of query
# vectors; both sides reuse the registered plans, so the metric can never
# drift from what the engine actually serves.
# ---------------------------------------------------------------------------

ANN_RECALL_ORACLE = f"""
WITH bf AS (SELECT vec_id FROM ({KNN_BRUTE_ORACLE})),
lshk AS (SELECT vec_id FROM ({KNN_LSH_ORACLE}))
SELECT
    CAST({KNN_K} AS BIGINT) AS k,
    CAST(COUNT(lshk.vec_id) AS BIGINT) AS n_overlap,
    CAST(COUNT(lshk.vec_id) AS DOUBLE) / {KNN_K} AS recall_at_k
FROM bf LEFT JOIN lshk ON bf.vec_id = lshk.vec_id
"""


def build_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = build_knn_bruteforce_cosine(spark, sf_dir).select("vec_id")
    lsh = build_knn_lsh_bucketed(spark, sf_dir).select(
        F.col("vec_id").alias("lsh_vec_id")
    )
    joined = bf.join(
        F.broadcast(lsh), bf.vec_id == F.col("lsh_vec_id"), "left"
    )
    return joined.agg(
        F.lit(KNN_K).cast("long").alias("k"),
        F.count("lsh_vec_id").alias("n_overlap"),
        (F.count("lsh_vec_id").cast("double") / KNN_K).alias("recall_at_k"),
    )


register(
    "ann_recall_lsh",
    oracle=ANN_RECALL_ORACLE,
    doc=f"ANN evaluation: recall@{KNN_K} of banded-LSH candidates vs the "
    "exact brute-force top-K, composed from the two registered plans "
    "(the production LSH tuning loop as a query).",
    tags=("similarity", "llm", "evaluation"),
)(build_ann_recall_lsh)


# ---------------------------------------------------------------------------
# ann_recall_ivf — same evaluation for the IVF path, completing the
# recall@K family: every ANN variant ships with its measured recall
# against the exact baseline, so parameter changes (IVF_K, IVF_NPROBE)
# are judged by the same query that tunes the LSH path.
# ---------------------------------------------------------------------------

ANN_RECALL_IVF_ORACLE = f"""
WITH bf AS (SELECT vec_id FROM ({KNN_BRUTE_ORACLE})),
ivfk AS (SELECT vec_id FROM ({KNN_IVF_ORACLE}))
SELECT
    CAST({KNN_K} AS BIGINT) AS k,
    CAST(COUNT(ivfk.vec_id) AS BIGINT) AS n_overlap,
    CAST(COUNT(ivfk.vec_id) AS DOUBLE) / {KNN_K} AS recall_at_k
FROM bf LEFT JOIN ivfk ON bf.vec_id = ivfk.vec_id
"""


def build_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = build_knn_bruteforce_cosine(spark, sf_dir).select("vec_id")
    ivf = build_knn_ivf(spark, sf_dir).select(F.col("vec_id").alias("ivf_vec_id"))
    joined = bf.join(F.broadcast(ivf), bf.vec_id == F.col("ivf_vec_id"), "left")
    return joined.agg(
        F.lit(KNN_K).cast("long").alias("k"),
        F.count("ivf_vec_id").alias("n_overlap"),
        (F.count("ivf_vec_id").cast("double") / KNN_K).alias("recall_at_k"),
    )


register(
    "ann_recall_ivf",
    oracle=ANN_RECALL_IVF_ORACLE,
    doc=f"ANN evaluation: recall@{KNN_K} of the IVF path (K={IVF_K}, "
    f"nprobe={IVF_NPROBE}) vs the exact brute-force top-K.",
    tags=("similarity", "llm", "evaluation"),
)(build_ann_recall_ivf)


# ---------------------------------------------------------------------------
# ann_recall_pq — recall@K for the product-quantization path, completing
# the evaluation family (every ANN variant now ships with its measured
# recall against the exact baseline): PQ trades recall for 8-byte codes,
# and this query is how the PQ_M/PQ_K trade is tuned.
# ---------------------------------------------------------------------------

ANN_RECALL_PQ_ORACLE = f"""
WITH bf AS (SELECT vec_id FROM ({KNN_BRUTE_ORACLE})),
pqk AS (SELECT vec_id FROM ({KNN_PQ_ORACLE}))
SELECT
    CAST({KNN_K} AS BIGINT) AS k,
    CAST(COUNT(pqk.vec_id) AS BIGINT) AS n_overlap,
    CAST(COUNT(pqk.vec_id) AS DOUBLE) / {KNN_K} AS recall_at_k
FROM bf LEFT JOIN pqk ON bf.vec_id = pqk.vec_id
"""


def build_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = build_knn_bruteforce_cosine(spark, sf_dir).select("vec_id")
    pq = build_knn_pq_adc(spark, sf_dir).select(F.col("vec_id").alias("pq_vec_id"))
    joined = bf.join(F.broadcast(pq), bf.vec_id == F.col("pq_vec_id"), "left")
    return joined.agg(
        F.lit(KNN_K).cast("long").alias("k"),
        F.count("pq_vec_id").alias("n_overlap"),
        (F.count("pq_vec_id").cast("double") / KNN_K).alias("recall_at_k"),
    )


register(
    "ann_recall_pq",
    oracle=ANN_RECALL_PQ_ORACLE,
    doc=f"ANN evaluation: recall@{KNN_K} of the PQ-ADC path vs the exact "
    "brute-force top-K (tunes the PQ_M/PQ_K memory-recall trade).",
    tags=("similarity", "llm", "evaluation"),
)(build_ann_recall_pq)


# ---------------------------------------------------------------------------
# embedding_outliers — per-vector distance to its label centroid with an
# outlier flag: the embedding-space data-quality audit (mislabeled or
# corrupted vectors sit far from their class prototype).
#
# Exactness: milli-quantized (10^3) integers so the squared-distance
# numerator Σ_d (x_d·N − S_d)² stays an EXACT BIGINT (|x|≤~1e3, so the
# sum fits int64 up to N ≈ 1.9e5 vectors per label; beyond that, shard
# labels or drop to micro/double — documented scale path). The only
# float steps are one correctly-rounded CAST, one SQRT (IEEE-exact), and
# one division — bit-identical cross-engine, unlike a per-dim double sum
# whose result depends on reduction order.
# Scale shape: centroid agg shuffles (label, dim) partial sums; the
# join-back is vector ⋈ 64-row-per-label centroid — AQE broadcasts the
# centroid side; final agg is per (vec_id) with map-side partials.
# ---------------------------------------------------------------------------

OUTLIER_DIST = 1.02  # flag distance for these unit-ish noisy test vectors

EMB_OUTLIER_ORACLE = f"""
WITH q AS (
    SELECT vec_id, label,
           list_transform(embedding,
               v -> CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)) AS qa
    FROM embeddings
),
c AS (
    SELECT label, CAST(d.dim AS INTEGER) AS dim,
           SUM(qa[d.dim]) AS s, CAST(COUNT(*) AS BIGINT) AS n
    FROM q, generate_series(1, {DIM}) AS d(dim)
    GROUP BY label, d.dim
)
SELECT
    q.vec_id, q.label,
    SQRT(CAST(SUM((qa[c.dim] * c.n - c.s) * (qa[c.dim] * c.n - c.s)) AS DOUBLE))
        / (1000.0 * MAX(c.n)) AS centroid_dist,
    SQRT(CAST(SUM((qa[c.dim] * c.n - c.s) * (qa[c.dim] * c.n - c.s)) AS DOUBLE))
        / (1000.0 * MAX(c.n)) > {OUTLIER_DIST} AS is_outlier
FROM q JOIN c ON q.label = c.label
GROUP BY q.vec_id, q.label
"""


def _milli_quantized(col: Column | str = "embedding") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda v: F.round(v.cast("double") * 1000, 0).cast("long"))


def build_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    q = emb.select("vec_id", "label", _milli_quantized().alias("qa"))
    e = q.select(
        "vec_id", "label", F.posexplode("qa").alias("p", "x")
    ).withColumn("dim", (F.col("p") + 1).cast("int"))
    c = (
        e.groupBy("label", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    term = F.col("x") * F.col("n") - F.col("s")
    num = F.sum(term * term)
    dist = F.sqrt(num.cast("double")) / (F.lit(1000.0) * F.max("n"))
    return (
        e.join(c, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            dist.alias("centroid_dist"),
            (dist > OUTLIER_DIST).alias("is_outlier"),
        )
    )


register(
    "embedding_outliers",
    oracle=EMB_OUTLIER_ORACLE,
    doc="Embedding-space quality audit: exact-integer distance to the "
    "label centroid with an outlier flag (milli-quantized, IEEE-exact "
    "sqrt; LLM-pipeline extension).",
    tags=("similarity", "llm", "report"),
)(build_embedding_outliers)


# ---------------------------------------------------------------------------
# embedding_pca_variance — distributed PCA spectrum of the embedding
# space: the dimensionality-collapse diagnostic an embedding-dedup /
# semantic-search pipeline runs before trusting cosine distances
# (anisotropic spaces need whitening; a handful of dominant components
# means near-dup thresholds are unstable).
#
# The classic Spark linear-algebra split: ONE distributed pass computes
# the exact covariance sufficient statistics — per-Arrow-batch numpy
# X^T X / column sums over INTEGER-quantized micro-units (exact int64
# partials, so the result is independent of partitioning and row order) —
# then the driver eigendecomposes the tiny D x D matrix (D=64: 4 KB).
# Work: O(rows * D^2 / cores) map-side, O(partitions) rows collected
# (S12 shape), O(D^3) driver eigh. At 100 TB this is the only sane plan;
# no shuffle of row data at all.
#
# Oracled as a CONTRACT CHECK (VERDICT r9 task 2, the
# approx_quantile_error_report pattern): the eigendecomposition itself is
# not expressible in SQL, but its defining invariants are deterministic —
# the eigenvalue sum equals the covariance trace (exactly recomputable
# from the integer sufficient statistics), eigenvalues come out sorted
# and non-negative (PSD covariance), explained-variance ratios live in
# [0, 1] and cumulate monotonically to 1 — all checked on a 1e-9 grid.
# The registered query carries n, D, the EXACT integer trace numerator
# sum_i (n*ss_ii - s_i^2) as a VARCHAR (HUGEINT-recomputable in DuckDB),
# and the deterministically-TRUE booleans; the engine-specific float
# eigenvalues stay internal (pca_spectrum keeps the presentation, pinned
# by the pytest property suite).
# ---------------------------------------------------------------------------


def _cov_suffstats(q):
    """Exact integer covariance sufficient statistics of a ``qa:
    array<long>`` relation: ``(n, s[D], ss[D*D])`` with the partial rows
    re-summed driver-side in Python ints (arbitrary precision — exact at
    any partitioning). One distributed pass, one bounded collect (a row
    per Arrow chunk — S12 shape). int64-overflow guard (ADVICE r8): each
    batch's second moment is bounded by rows * max|q|^2, so batches are
    chunked at 2^62 / max|q|^2 rows. Returns None on an empty relation."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["qa"].to_numpy())  # (n, D) int64
            m = int(np.abs(x).max()) or 1
            step = max(1, min(len(x), (1 << 62) // (m * m)))
            for lo in range(0, len(x), step):
                c = x[lo : lo + step]
                yield pd.DataFrame(
                    {
                        "n": [len(c)],
                        "s": [c.sum(axis=0).tolist()],
                        "ss": [(c.T @ c).reshape(-1).tolist()],
                    }
                )

    stats = q.mapInPandas(
        partials, schema="n long, s array<long>, ss array<long>"
    ).collect()  # one row per non-empty chunk — bounded, S12 shape
    if not stats:
        return None
    n = sum(r["n"] for r in stats)
    d = len(stats[0]["s"])
    s = [sum(r["s"][i] for r in stats) for i in range(d)]
    ss = [sum(r["ss"][i] for r in stats) for i in range(d * d)]
    return n, s, ss


def pca_spectrum(q, spark):
    """Exact-covariance PCA spectrum of a DataFrame with one
    ``qa: array<long>`` column (integer micro-units). Partition-count
    invariant: int64 numpy partials summed as python ints."""
    import numpy as np

    n, s, ss = _cov_suffstats(q)
    d = len(s)
    sv = np.array(s, dtype=np.float64)
    ssm = np.array(ss, dtype=np.float64).reshape(d, d)
    cov = (ssm - np.outer(sv, sv) / n) / (n - 1) / 1e12  # micro-units^2 -> units^2
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    cum = np.cumsum(evals)
    rows = [
        (
            int(i + 1),
            round(float(evals[i]), 9),
            round(float(evals[i] / total), 9),
            round(float(cum[i] / total), 9),
        )
        for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double, cum_ratio double"
    )


_PCA_GRID = 1e-9

_PCA_CONTRACT_SCHEMA = (
    "component int, n long, dim int, trace_num string, "
    "eig_sum_matches_trace boolean, eig_nonneg boolean, "
    "eig_sorted_desc boolean, ratio_in_unit boolean, "
    "cum_ratio_monotone boolean, ratios_sum_to_one boolean"
)


def build_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    st = _cov_suffstats(emb.select(quantized().alias("qa")))
    if st is None or st[0] < 2:
        # degenerate corpus: mirror the oracle exactly — generate_series
        # still emits D rows; the trace SUM over zero per-dim rows is NULL
        n0 = 0 if st is None else st[0]
        return spark.createDataFrame(
            [(i + 1, n0, DIM, None, True, True, True, True, True, True)
             for i in range(DIM)],
            _PCA_CONTRACT_SCHEMA,
        )
    n, s, ss = st
    d = DIM
    # exact integer trace numerator sum_i (n*ss_ii - s_i^2), Python ints;
    # the actual trace in units^2 is trace_num / (n*(n-1)) / 1e12
    trace_num = sum(n * ss[i * d + i] - s[i] * s[i] for i in range(d))
    trace = trace_num / (n * (n - 1)) / 1e12
    sv = np.array(s, dtype=np.float64)
    ssm = np.array(ss, dtype=np.float64).reshape(d, d)
    cov = (ssm - np.outer(sv, sv) / n) / (n - 1) / 1e12
    evals = np.linalg.eigvalsh(cov)[::-1]  # ascending, reversed
    total = float(evals.sum())
    ratios = [float(e / total) for e in evals]
    cum = np.cumsum(ratios)
    scale = max(abs(trace), 1.0)
    sum_ok = bool(abs(total - trace) <= _PCA_GRID * scale)
    ratios_ok = bool(abs(float(cum[-1]) - 1.0) <= _PCA_GRID)
    rows = [
        (
            i + 1,
            n,
            d,
            str(trace_num),
            sum_ok,
            bool(evals[i] >= -_PCA_GRID * scale),
            bool(i == 0 or evals[i] <= evals[i - 1] + _PCA_GRID * scale),
            bool(-_PCA_GRID <= ratios[i] <= 1.0 + _PCA_GRID),
            bool(i == 0 or cum[i] >= cum[i - 1] - _PCA_GRID),
            ratios_ok,
        )
        for i in range(d)
    ]
    return spark.createDataFrame(rows, _PCA_CONTRACT_SCHEMA)


EMB_PCA_CONTRACT_ORACLE = f"""
WITH q AS (SELECT {_sql_quantized()} AS qa FROM embeddings),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
per AS (
    SELECT t.i,
           SUM(CAST(qa[t.i] AS HUGEINT) * qa[t.i]) AS ssii,
           SUM(CAST(qa[t.i] AS HUGEINT)) AS si
    FROM q CROSS JOIN UNNEST(generate_series(1, {DIM})) t(i)
    GROUP BY t.i
),
tr AS (
    SELECT CAST(SUM(cnt.n * per.ssii - per.si * per.si) AS VARCHAR) AS trace_num
    FROM per CROSS JOIN cnt
)
SELECT CAST(t.i AS INTEGER) AS component,
       cnt.n AS n,
       CAST({DIM} AS INTEGER) AS dim,
       tr.trace_num AS trace_num,
       TRUE AS eig_sum_matches_trace,
       TRUE AS eig_nonneg,
       TRUE AS eig_sorted_desc,
       TRUE AS ratio_in_unit,
       TRUE AS cum_ratio_monotone,
       TRUE AS ratios_sum_to_one
FROM UNNEST(generate_series(1, {DIM})) t(i) CROSS JOIN cnt CROSS JOIN tr
"""


register(
    "embedding_pca_variance",
    oracle=EMB_PCA_CONTRACT_ORACLE,
    doc="PCA contract check (VERDICT r9 task 2): exact int64 covariance "
    "partials via mapInPandas, driver eigh of the DxD matrix; the output "
    "carries n, D, the EXACT integer trace numerator (DuckDB HUGEINT-"
    "recomputable, VARCHAR-routed) and deterministically-TRUE eigh "
    "invariants on a 1e-9 grid (eigensum==trace, sorted/non-negative "
    "spectrum, ratios in [0,1] cumulating to 1); the float eigenvalues "
    "stay internal — pca_spectrum keeps the presentation, pytest-pinned.",
    tags=("similarity", "llm", "pca"),
)(build_embedding_pca_variance)


# ---------------------------------------------------------------------------
# embedding_covariance_suffstats — the ORACLED face of the PCA plan
# (round 8, the quality_logit_suffstats pattern): everything the cluster
# actually computes for PCA — n, the per-dimension sums, and the full
# upper-triangle second-moment matrix, all EXACT integers — emitted as a
# tall table and value-checked against a DuckDB twin. Only the O(D^3)
# driver eigh (numpy, no cluster data) remains outside the oracle.
# ---------------------------------------------------------------------------


def build_embedding_covariance_suffstats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    st = _cov_suffstats(emb.select(quantized().alias("qa")))
    if st is None:
        # empty corpus: the DuckDB twin's GROUP BY legs return no s/ss
        # rows, only the COUNT leg — mirror that exactly
        return spark.createDataFrame(
            [("n", 0, 0, "0")], "stat string, i int, j int, value string"
        )
    n, s, ss = st
    d = len(s)
    rows = [("n", 0, 0, str(n))]
    rows += [("s", i + 1, 0, str(s[i])) for i in range(d)]
    rows += [
        ("ss", i + 1, j + 1, str(ss[i * d + j]))
        for i in range(d)
        for j in range(i, d)
    ]
    return spark.createDataFrame(
        rows, "stat string, i int, j int, value string"
    ).orderBy("stat", "i", "j")


EMB_COV_SUFFSTATS_ORACLE = f"""
WITH q AS (SELECT {_sql_quantized()} AS qa FROM embeddings)
SELECT 'n' AS stat, 0 AS i, 0 AS j, CAST(COUNT(*) AS VARCHAR) AS value FROM q
UNION ALL
SELECT 's', i, 0, CAST(SUM(qa[i]) AS VARCHAR)
FROM q CROSS JOIN UNNEST(generate_series(1, {DIM})) t(i) GROUP BY i
UNION ALL
SELECT 'ss', p.i, p.j, CAST(SUM(qa[p.i] * qa[p.j]) AS VARCHAR)
FROM q CROSS JOIN (
    SELECT a.i, b.j
    FROM UNNEST(generate_series(1, {DIM})) a(i),
         UNNEST(generate_series(1, {DIM})) b(j)
    WHERE a.i <= b.j
) p GROUP BY p.i, p.j
"""


register(
    "embedding_covariance_suffstats",
    oracle=EMB_COV_SUFFSTATS_ORACLE,
    doc=f"PCA's exact integer sufficient statistics (n, per-dim sums, "
    f"{DIM}x{DIM} upper-triangle second moments) as a tall table — the "
    "entire distributed portion of embedding_pca_variance value-checked "
    "cross-engine; only the driver-side numpy eigh stays outside.",
    tags=("similarity", "llm", "pca"),
)(build_embedding_covariance_suffstats)


# ---------------------------------------------------------------------------
# dedup_semantic_clusters — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space with k-means, then compare pairs ONLY
# within a cluster and drop every vector cosine-similar (>= threshold) to
# a lower-id cluster-mate. Complements dedup_embedding_cosine: LSH bands
# mine pairs by random hyperplanes (recall depends on the S-curve);
# SemDeDup's clusters adapt to the data's actual density, which is why
# the paper uses it at web scale.
#
# Scale shape: the k-means assignment is the broadcast-centroid pass
# (corpus never collected); within-cluster comparison is O(sum c_i^2),
# so clusters are deterministically SUB-SPLIT (md5 bucket of vec_id —
# the engine's cross-engine hash) above CLUSTER_PAIR_CAP members — the
# same population-cap discipline as every other dedup family here
# (bounded work per cell, documented recall trade; in production scale
# K with n so mean cluster size stays fixed). Fully oracled (round 8):
# the clustering rides the unrolled _kmeans_ctes and the sub-split +
# pair compare are SQL-expressible on top.
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = PAIR_THRESHOLD  # share the family's near-dup bar
CLUSTER_PAIR_CAP = 200

_SEMDEDUP_M_CACHE: list[DataFrame] = []


def build_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    assigned = build_kmeans_embeddings(spark, sf_dir).select("vec_id", "cluster")
    emb = table(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", quantized().alias("qa")).withColumn(
        "ssq", ssq(F.col("qa"))
    )
    m = assigned.join(n, "vec_id")
    # deterministic sub-split of oversized clusters: bounded pair work.
    # md5-bucket hash (not xxhash64): the engine's single cross-engine
    # hash primitive, so the oracle reproduces the exact cell layout.
    sizes = W.partitionBy("cluster")
    hash8 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    m = m.withColumn(
        "cell",
        F.concat_ws(
            "_",
            F.col("cluster"),
            F.pmod(
                hash8,
                F.ceil(
                    F.count(F.lit(1)).over(sizes) / F.lit(CLUSTER_PAIR_CAP)
                ).cast("long"),
            ),
        ),
    )
    # m feeds THREE consumers (both sides of the within-cell pair join +
    # the final labeling); uncached, each re-runs the k-means assignment
    # and the quantize/ssq projection from the scan (6 embeddings scans
    # in one plan). Row-per-vector with fixed-width payload ->
    # single-slot persist at the helper's default level (evictable,
    # degrades to recompute), LAZILY — eager materialize measured
    # strictly worse in r12, so on a cold run the two self-join map
    # stages may each compute the subtree once before the cache fills.
    from .workspace import single_slot_persist

    m = single_slot_persist(_SEMDEDUP_M_CACHE, m)
    a = m.select(
        "cell",
        F.col("vec_id").alias("vec1"),
        F.col("qa").alias("qa1"),
        F.col("ssq").alias("ssq1"),
    )
    b = m.select(
        "cell",
        F.col("vec_id").alias("vec2"),
        F.col("qa").alias("qa2"),
        F.col("ssq").alias("ssq2"),
    )
    cos = cosine(int_dot(F.col("qa1"), F.col("qa2")), F.col("ssq1"), F.col("ssq2"))
    drops = (
        a.join(b, "cell")
        .filter(F.col("vec1") < F.col("vec2"))
        .filter(cos >= SEMDEDUP_THRESHOLD)
        .select(F.col("vec2").alias("vec_id"))
        .distinct()
    )
    return (
        m.select("vec_id", "cluster")
        .join(drops.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def _semdedup_oracle() -> str:
    from .dedup import _hex8_sql

    ctes, final = _kmeans_ctes()
    h8 = _hex8_sql("md5(CAST(m0.vec_id AS VARCHAR))", 1)
    return f"""
WITH {ctes},
asg AS (SELECT vec_id, cluster FROM {final} WHERE rn = 1),
nn AS (SELECT vec_id, qa, {_sql_ssq('qa')} AS ssq FROM q),
m AS (
    SELECT m0.vec_id, m0.cluster, nn.qa, nn.ssq,
           CAST(m0.cluster AS VARCHAR) || '_' || CAST(
               {h8} % CAST(ceil(
                   CAST(COUNT(*) OVER (PARTITION BY m0.cluster) AS DOUBLE)
                   / {CLUSTER_PAIR_CAP}) AS BIGINT) AS VARCHAR) AS cell
    FROM asg m0 JOIN nn ON m0.vec_id = nn.vec_id
),
drops AS (
    SELECT DISTINCT b.vec_id
    FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_sql_cosine(_sql_int_dot('a.qa', 'b.qa'), 'a.ssq', 'b.ssq')}
          >= {SEMDEDUP_THRESHOLD}
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       vec_id IN (SELECT vec_id FROM drops) AS is_dup
FROM m
"""


register(
    "dedup_semantic_clusters",
    oracle=_semdedup_oracle(),
    doc=f"SemDeDup: k-means clusters + within-cluster cosine dedup "
    f"(threshold {SEMDEDUP_THRESHOLD}, md5-bucket sub-split above "
    f"{CLUSTER_PAIR_CAP} members); fully oracled on the unrolled "
    "Lloyd-round CTEs.",
    tags=("similarity", "llm", "dedup", "iterative"),
)(build_dedup_semantic_clusters)


# ---------------------------------------------------------------------------
# embedding_quantize_int8 — symmetric per-dimension int8 quantization with
# a per-vector reconstruction-error report: the storage/serving compression
# step an ANN system applies before building its index (8x smaller than
# float32, dot products in integer SIMD). Per dim: scale = max|v| (zero
# dims guard to 1); code = clamp(round(v * 127 / scale)). All arithmetic
# is forced to DOUBLE on both engines (FLOAT-typed math rounds differently
# per engine), products/divisions are the bit-stable single-op shapes, and
# the per-vector reductions run INSIDE the array (sequential, order-fixed)
# so no shuffle order can perturb the sums. Linear: one dim-indexed agg
# (bounded by dimensionality) + one broadcast of the scale vector.
# ---------------------------------------------------------------------------

QUANTIZE_INT8_ORACLE = """
WITH s AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings
),
d AS (
    SELECT unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM s
),
mx AS (
    SELECT i,
           CASE WHEN MAX(ABS(v)) = 0 THEN 1.0 ELSE MAX(ABS(v)) END AS m
    FROM d GROUP BY i
),
scales AS (SELECT list(m ORDER BY i) AS ms FROM mx),
q AS (
    SELECT vec_id, emb, ms,
           list_transform(generate_series(1, len(emb)), i ->
               GREATEST(-127, LEAST(127,
                   CAST(ROUND(emb[i] * 127 / ms[i], 0) AS BIGINT)))) AS codes
    FROM s, scales
)
SELECT vec_id,
       CAST(len(emb) AS BIGINT) AS n_dims,
       CAST(list_sum(list_transform(codes, c -> ABS(c))) AS BIGINT) AS q_l1,
       CAST(list_max(list_transform(codes, c -> ABS(c))) AS BIGINT) AS q_max,
       ROUND(list_sum(list_transform(generate_series(1, len(emb)), i ->
                 (emb[i] - codes[i] * ms[i] / 127)
                 * (emb[i] - codes[i] * ms[i] / 127)))
             / len(emb), 6) AS recon_mse
FROM q
"""


def build_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), spark)
    s = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    d = s.select(F.posexplode("emb").alias("i0", "v"))
    mx = d.groupBy("i0").agg(
        F.when(F.max(F.abs(F.col("v"))) == 0, F.lit(1.0))
        .otherwise(F.max(F.abs(F.col("v"))))
        .alias("m")
    )
    scales = mx.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i0", "m"))), lambda st: st["m"]
        ).alias("ms")
    )
    q = s.crossJoin(F.broadcast(scales))
    codes = F.zip_with(
        "emb",
        "ms",
        lambda v, m: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.round(v * 127 / m, 0).cast("long"),
            ),
        ),
    )
    q = q.withColumn("codes", codes)
    recon = F.zip_with(
        "emb",
        F.zip_with("codes", "ms", lambda c, m: c * m / 127).alias("r"),
        lambda v, r: (v - r) * (v - r),
    )
    return q.select(
        "vec_id",
        F.size("emb").cast("long").alias("n_dims"),
        F.aggregate(
            F.transform("codes", F.abs), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_l1"),
        F.array_max(F.transform("codes", F.abs)).alias("q_max"),
        F.round(
            F.aggregate(recon, F.lit(0.0), lambda a, x: a + x) / F.size("emb"), 6
        ).alias("recon_mse"),
    )


register(
    "embedding_quantize_int8",
    oracle=QUANTIZE_INT8_ORACLE,
    doc="Symmetric per-dim int8 quantization of the embedding corpus with "
    "per-vector code stats + reconstruction MSE (double-forced, in-array "
    "order-fixed reductions; dim-bounded scale broadcast).",
    tags=("similarity", "llm", "quantization"),
)(build_embedding_quantize_int8)
