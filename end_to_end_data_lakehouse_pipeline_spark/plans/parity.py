"""Exact cross-engine aggregation helpers (Spark side + oracle-SQL emitters).

Why: double summation is order-sensitive in the last bits, and the test
data's money columns are exact 2-decimal values — so true sums/averages land
EXACTLY on rounding boundaries, where Spark's parallel sum and DuckDB's
sequential sum round in different directions. ``ROUND`` can't fix that.

Fix: aggregate in scaled integers. ``round(x * scale)`` of the same input
double is the same integer on both engines (both round .5 away from zero,
and the multiply is identical IEEE); integer sums are exact and
order-independent; the final ``sum / scale / count`` is the same sequence of
IEEE double ops on both sides → bit-identical output, no tolerance needed.

Scale 100 captures 2-decimal money exactly. Sums of integral-valued doubles
(quantities) are already exact — aggregate them raw.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scaled_long(col: Column | str, scale: int = 100) -> Column:
    """Per-row exact integer representation: round(x*scale) as bigint."""
    return F.round(_as_col(col) * F.lit(scale), 0).cast("long")


def exact_sum(col: Column | str, alias: str, scale: int = 100) -> Column:
    """SUM(x) computed exactly at 1/scale resolution, output as double."""
    return (F.sum(scaled_long(col, scale)).cast("double") / F.lit(float(scale))).alias(alias)


def exact_avg(col: Column | str, alias: str, scale: int = 100) -> Column:
    """AVG(x) exact at 1/scale resolution, with standard AVG null
    semantics: the denominator is COUNT(col) (non-null rows), matching
    o_avg's COUNT(expr) — a nullable column no longer silently deflates
    the average toward zero (VERDICT r1 item 10)."""
    return (
        F.sum(scaled_long(col, scale)).cast("double")
        / F.lit(float(scale))
        / F.count(_as_col(col))
    ).alias(alias)


# --- DuckDB oracle-SQL emitters (textual twins of the above) ---------------


def o_sum(expr: str, alias: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0 AS {alias}"
    )


def o_avg(expr: str, alias: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0 / COUNT({expr}) AS {alias}"
    )
