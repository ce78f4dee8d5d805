"""Distributed model fitting without MLlib: logistic regression by IRLS
over EXACT integer sufficient statistics.

The fasttext-style linear quality / language classifier is a standard
LLM-curation component (CCNet-lineage pipelines score every document
with one); this trains such a model ON the cluster with nothing but
aggregates:

- Features are quantized to a 1e-6 integer grid once, per document
  (map-only).
- Each IRLS round needs only X^T W X (d x d) and X^T (y - p) (d) —
  computed as SUMS OF INTEGER PRODUCTS cast to DECIMAL(38,0), which
  Spark sums EXACTLY and order-independently. Training is therefore
  bit-deterministic at any parallelism / partitioning — no
  double-accumulation drift (the same exact-sum discipline as
  plans/parity.py money sums, applied to model fitting).
- The d x d solve (d = 5) happens on the driver per round — a bounded
  O(d^2) collect, the S12 driver-fetch shape — and the updated
  coefficient vector re-enters the plan as literals.

Iterative + driver-mediated solves -> registered rows-only (no SQL
oracle); tests/test_mlfit.py verifies against a pure-Python IRLS on the
collected feature table (exact same quantization) and asserts
partition-invariance of the fitted coefficients.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register
from .text import EN_STOP, _stop_count, tokens_col

N_ROUNDS = 4
Q = 1_000_000  # 1e-6 feature/weight quantization grid
FEATURES = ("intercept", "log_tokens", "en_stop_ratio", "type_token_ratio", "mean_tok_len")
D = len(FEATURES)


def _feature_table(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x0..x4) with x_i quantized to the 1e-6 grid (long)."""
    t = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        tokens_col().alias("toks"),
        F.col("n_chars"),
    )
    n = F.size("toks")
    safe = F.greatest(n, F.lit(1)).cast("double")
    feats: list[Column] = [
        F.lit(1.0),
        F.log1p(n.cast("double")),
        _stop_count(F.col("toks"), EN_STOP).cast("double") / safe,
        F.size(F.array_distinct("toks")).cast("double") / safe,
        F.col("n_chars").cast("double") / safe / F.lit(10.0),  # /10 keeps grids balanced
    ]
    qcols = [
        F.round(c * Q).cast("long").alias(f"x{i}") for i, c in enumerate(feats)
    ]
    return t.select("doc_id", "y", *qcols)


def fit_logit_irls(feats: DataFrame, n_rounds: int = N_ROUNDS) -> list[dict]:
    """IRLS rounds over exact decimal sums; returns one row per
    (round, feature) with the coefficient after that round's update."""
    import math

    beta = [0.0] * D
    out: list[dict] = []
    dec = "decimal(38,0)"
    for r in range(1, n_rounds + 1):
        # p = sigmoid(x . beta) from the CURRENT literals, quantized so
        # every downstream sum is an exact integer sum
        z = sum(
            (F.col(f"x{i}").cast("double") / Q) * beta[i] for i in range(D)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        pq = F.round(p * Q).cast("long")
        wq = F.round(w * Q).cast("long")
        aggs = []
        for i in range(D):
            for j in range(i, D):
                aggs.append(
                    F.sum(
                        (F.col(f"x{i}").cast(dec) * F.col(f"x{j}").cast(dec))
                        * wq.cast(dec)
                    ).alias(f"h_{i}_{j}")
                )
            aggs.append(
                F.sum(
                    F.col(f"x{i}").cast(dec)
                    * (F.col("y").cast("long") * Q - pq).cast(dec)
                ).alias(f"g_{i}")
            )
        row = feats.agg(*aggs).first()
        # de-quantize: features carry Q each, weights/residuals carry Q
        h = [[0.0] * D for _ in range(D)]
        g = [0.0] * D
        for i in range(D):
            g[i] = float(row[f"g_{i}"]) / (Q * Q)
            for j in range(i, D):
                v = float(row[f"h_{i}_{j}"]) / (Q * Q * Q)
                h[i][j] = h[j][i] = v
        for i in range(D):  # ridge: keeps the solve stable on tiny SFs
            h[i][i] += 1e-6
        # Gauss solve of h * delta = g (d=5, driver-side)
        a = [h[i][:] + [g[i]] for i in range(D)]
        for col in range(D):
            piv = max(range(col, D), key=lambda r2: abs(a[r2][col]))
            a[col], a[piv] = a[piv], a[col]
            div = a[col][col]
            a[col] = [v / div for v in a[col]]
            for r2 in range(D):
                if r2 != col and a[r2][col] != 0.0:
                    f = a[r2][col]
                    a[r2] = [v - f * w2 for v, w2 in zip(a[r2], a[col])]
        delta = [a[i][D] for i in range(D)]
        beta = [b + d for b, d in zip(beta, delta)]
        if any(not math.isfinite(b) for b in beta):
            raise ArithmeticError("IRLS diverged")
        for i, name in enumerate(FEATURES):
            out.append(
                {"round": r, "feature": name, "coef": round(beta[i], 6)}
            )
    return out


def build_quality_logit_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    feats = _feature_table(docs).localCheckpoint()
    rows = fit_logit_irls(feats)
    return spark.createDataFrame(
        rows, "round long, feature string, coef double"
    ).orderBy("round", "feature")


register(
    "quality_logit_fit",
    oracle=None,  # iterative driver-mediated solve — rows-only; pytest
    # verifies against a pure-Python IRLS on the identical quantized
    # features and asserts partition-invariance (exact decimal sums)
    doc=f"Train a {D}-feature logistic lang/quality classifier by "
    f"{N_ROUNDS} IRLS rounds: per-round X^T W X and X^T(y-p) as EXACT "
    "integer-product decimal sums (bit-deterministic at any "
    "parallelism), 5x5 driver solve, coefficients re-enter as literals.",
    tags=("llm", "quality", "ml", "iterative"),
)(build_quality_logit_fit)
