"""Skew mitigation operators (SURVEY.md §7 / 100 TB design notes).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in
session.get_spark) handles sort-merge joins automatically. Two cases it
does NOT cover, provided here as reusable transforms:

- ``salted_aggregate``: a groupBy whose key distribution is pathological
  (one key = 30% of a 100 TB table) puts that key's entire partial state
  on one reducer. Two-phase salting bounds any reducer's input to 1/S of
  the hot key.
- ``salted_join``: a shuffled equi-join where one LEFT key is hot and the
  right side is too big to broadcast. Replicating the right side S ways
  and salting the left spreads the hot key over S reducers.

Both are algebraic rewrites — results are exactly equal to the unsalted
plans (tests assert it) — at the cost of S× replication of the small side
/ an extra partial-aggregate pass. Use when metrics show a hot key; do
not salt by default.

Measured guidance (round-4 Zipf rehearsal, tools/skew_rehearsal.py —
hot key = 5% of all rows at 10x, BASELINE.md for the table):

- **1:N dim-join skew is AQE's job**: the skewed orders⋈customer
  sort-merge join went 3.3 s naive → 0.5 s with AQE skew-split (vs
  1.8 s salted). Keep ``spark.sql.adaptive.skewJoin`` on (session
  default) and don't salt these.
- **N:M fact-fact hot keys need the salt — until the output itself
  explodes**: AQE splits skewed partitions by INPUT bytes, but a hot
  key's join OUTPUT is quadratic and lands on whichever split holds it
  — views⋈purchases per user at 10x: 2.2 s naive, 1.8 s AQE, 1.6 s
  salted. At 100x the hot key emits ~2.7e10 pairs and NEITHER strategy
  finishes — when the downstream is an aggregate of the cross product,
  rewrite it algebraically (per-key count product: two linear aggs,
  zero pair materialization; equality-certified in skew_rehearsal.py).
  ``salted_join`` is for output-roughly-input-sized skewed joins.
- **Decomposable aggregates self-heal**: hash-aggregate partials
  combine map-side, so the hot key reaches the reducer pre-reduced;
  plain groupBy beat ``salted_aggregate`` (0.53 s vs 0.87 s) even on
  the skewed replica. Salt aggregates only when the per-key state is
  NOT decomposable (collect_list/exact distinct), where map-side
  combine can't shrink the hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash all columns mod S. Deterministic
    (replayable, test-stable) and uniform enough to split a hot key."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}; these are the decomposable aggregates whose
    partial/final combine is the same function (count combines with sum).
    Phase 1 aggregates on (keys, salt); phase 2 combines per keys.
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in combiner:
            raise ValueError(f"{fn!r} is not decomposable; use sum/count/min/max")

    phase1 = df.withColumn("_salt", _salt_col(df, n_salts)).groupBy(
        *keys, "_salt"
    ).agg(
        *[partial[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[combiner[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side, replicate the
    right side n_salts times, join on (key, salt). Supported how: inner,
    left. Output columns = left ++ right-minus-key, like df.join(r, on).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salted_left = left.withColumn("_salt", _salt_col(left, n_salts))
    replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_left.join(replicated, [on, "_salt"], how).drop("_salt")


def crossproduct_aggregate(
    left: DataFrame,
    right: DataFrame,
    on: str,
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Per-key aggregates over the (left x right) MATCH SET without ever
    materializing the pairs — the algebraic rewrite the round-4 100x
    rehearsal proved necessary: a hot key's cross product is quadratic
    OUTPUT, which neither AQE skew-split nor salting reduces (they
    spread input). Any separable pair function f(l)*g(r) factors:

        sum over pairs f(l)*g(r)  =  (sum_l f) * (sum_r g)   per key

    so pair-count is n_l*n_r (f=g=1), pair value-product sums are
    product-of-sums, etc. ``aggs`` maps output column -> (left SQL expr,
    right SQL expr); use '1' for counts. Cost: two linear map-side-
    combined aggregates + one key join — hot keys arrive pre-reduced to
    ONE row per side. Inner-match semantics (keys present on both
    sides), matching ``left.join(right, on)``.
    """
    lagg = left.groupBy(on).agg(
        *[F.sum(F.expr(lf)).alias(f"_l_{o}") for o, (lf, _rf) in aggs.items()]
    )
    ragg = right.groupBy(on).agg(
        *[F.sum(F.expr(rf)).alias(f"_r_{o}") for o, (_lf, rf) in aggs.items()]
    )
    return lagg.join(ragg, on).select(
        on, *[(F.col(f"_l_{o}") * F.col(f"_r_{o}")).alias(o) for o in aggs]
    )
