"""IRLS logistic trainer: pure-Python reference parity and the
exact-sum partition-invariance guarantee."""

from __future__ import annotations

import math

from end_to_end_data_lakehouse_pipeline_spark.catalog import table
from end_to_end_data_lakehouse_pipeline_spark.plans.mlfit import (
    D,
    FEATURES,
    N_ROUNDS,
    Q,
    _cramer_solve,
    _feature_table,
    fit_logit_irls,
)


def _reference_irls(rows, n_rounds=N_ROUNDS):
    """Pure-Python IRLS on the identical quantized features, with the
    identical quantization of p/w and EXACT integer sums (Python ints),
    so it reproduces the distributed trainer bit-for-bit up to the
    shared float driver solve."""
    beta = [0.0] * D
    out = []
    for r in range(1, n_rounds + 1):
        hq = [[0] * D for _ in range(D)]
        gq = [0] * D
        for row in rows:
            x = [row[f"x{i}"] for i in range(D)]
            z = sum((xi / Q) * b for xi, b in zip(x, beta))
            p = 1.0 / (1.0 + math.exp(-z))
            pq = round(p * Q)
            wq = round(p * (1.0 - p) * Q)
            resid = row["y"] * Q - pq
            for i in range(D):
                gq[i] += x[i] * resid
                for j in range(i, D):
                    hq[i][j] += x[i] * x[j] * wq
        h = [[0.0] * D for _ in range(D)]
        g = [float(gq[i]) / (Q * Q) for i in range(D)]
        for i in range(D):
            for j in range(i, D):
                h[i][j] = h[j][i] = float(hq[i][j]) / (Q * Q * Q)
            h[i][i] += 1e-6
        delta = _cramer_solve(h, g)  # the shared canonical-order solve
        beta = [b + d for b, d in zip(beta, delta)]
        out.append({"round": r, "beta": list(beta)})
    return out


def test_matches_pure_python_reference(spark, sf_dir):
    feats = _feature_table(table(spark, sf_dir, "documents"))
    got = fit_logit_irls(feats)
    rows = [r.asDict() for r in feats.collect()]
    want = _reference_irls(rows)
    by_round = {}
    for rec in got:
        by_round.setdefault(rec["round"], {})[rec["feature"]] = rec["coef"]
    for ref in want:
        r = ref["round"]
        for i, name in enumerate(FEATURES):
            assert abs(by_round[r][name] - round(ref["beta"][i], 6)) <= 1e-6, (
                r,
                name,
            )


def test_partition_invariant_coefficients(spark, sf_dir):
    """Exact decimal sums make the fit BIT-deterministic under any
    partitioning — the property double accumulation would break."""
    feats = _feature_table(table(spark, sf_dir, "documents"))
    a = fit_logit_irls(feats.repartition(1))
    b = fit_logit_irls(feats.repartition(13))
    assert a == b


def test_model_beats_base_rate(spark, sf_dir):
    feats = _feature_table(table(spark, sf_dir, "documents"))
    rows = [r.asDict() for r in feats.collect()]
    final = {
        rec["feature"]: rec["coef"]
        for rec in fit_logit_irls(feats)
        if rec["round"] == N_ROUNDS
    }
    beta = [final[f] for f in FEATURES]
    correct = 0
    pos = 0
    for row in rows:
        z = sum((row[f"x{i}"] / Q) * beta[i] for i in range(D))
        pred = 1 if z >= 0 else 0
        correct += pred == row["y"]
        pos += row["y"]
    n = len(rows)
    base = max(pos, n - pos) / n
    assert correct / n >= base - 0.02, "fit should not lose to the base rate"
