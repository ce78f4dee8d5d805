"""Distributed exact global ranking — no single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole relation into ONE task in Spark — the classic 100 TB cliff. The
distributed rewrite used here:

1. Sample split points of the leading sort key (``approxQuantile`` —
   accuracy only affects balance, never correctness) and define each
   row's **range bucket as a pure function of its key** (count of split
   points strictly below it). Value-defined buckets are what make this
   safe under AQE: partition ids from ``repartitionByRange`` +
   ``spark_partition_id()`` are NOT stable across the two jobs (AQE may
   coalesce the exchange differently per action — measured: off-by-13
   bucket sizes at sf0.01), whereas a key-derived bucket is identical in
   every job by construction.
2. One cheap job counts rows per bucket (bucket-count-sized collect,
   never data-sized) and prefix-sums the counts into per-bucket offsets
   (bucket id is monotone in the key, so bucket order = key order).
3. A bucket-partitioned ``row_number`` window (each bucket ~1/parts of
   the data) plus the broadcast offset map yields the exact global rank.

Caveats: the sort columns must be non-null and numeric (split points
come from ``approxQuantile`` / grouped ``percentile_approx``). Rows
sharing one leading-key value land in one bucket; buckets that exceed
3x the target size are refined ONE further level: the bucket's dominant
(modal) leading value's rows are split on the SECOND sort column (one
grouped-percentile job covers all hot buckets), rows below/above the
dominant value take boundary sub-buckets — order-safe even when the hot
range holds several distinct leading values. This handles the
low-cardinality-leading-key shape — ntile by a status-like column over
a unique tiebreak. A key PREFIX that is constant across most of the
data deeper than two columns would need recursive refinement (same
construction, not implemented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__rank_bucket"
_SUB = "__rank_subbucket"


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row_number over a total order, distributed.

    ``order_cols`` must define a TOTAL order (include a unique tie-break
    key) with a non-null numeric leading column. Returns ``(df_with_rank,
    total_rows)`` — the total falls out of the offset pass for free.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = order_cols[0]
    probs = [i / parts for i in range(1, parts)]
    bounds = sorted(set(df.stat.approxQuantile(key, probs, 0.001))) if probs else []

    if bounds:
        # bucket = #split points strictly below the key — monotone in the
        # key, deterministic, identical in every job.
        bucket: Column = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b < F.col(key).cast("double"),
            )
        )
    else:
        bucket = F.lit(0)
    with_bkt = df.withColumn(_BKT, bucket)

    counts = {
        r[_BKT]: r["cnt"]
        for r in with_bkt.groupBy(_BKT).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())

    # Low-cardinality leading key (ntile by a status-like column): every
    # row of a hot value lands in ONE bucket, and the bucket-local window
    # degrades toward the single-partition cliff. One refinement level:
    # per-bucket split points on the SECOND sort column (one grouped
    # percentile_approx job covers every hot bucket at once), sub-bucket
    # assigned from the broadcast per-bucket bound arrays. Rank order is
    # preserved because equal leading keys share a bucket and the
    # sub-bucket is monotone in the second column within it.
    hot_target = 3 * max(1, total // max(parts, 1))
    hot = sorted(b for b, c in counts.items() if c > hot_target)
    sub_expr: Column = F.lit(0)
    if hot and len(order_cols) > 1:
        key2 = order_cols[1]
        key1d = F.col(key).cast("double")
        key2d = F.col(key2).cast("double")
        hot_rows = with_bkt.filter(F.col(_BKT).isin(hot))
        # A hot bucket is a key RANGE and may hold several distinct
        # leading-key values (a heavy-hitter plus continuous neighbors in
        # the same quantile interval). Sub-splitting on the second column
        # is only order-safe among rows sharing ONE leading value, so:
        # rows below the bucket's dominant (modal) value take sub 0, the
        # dominant value's rows are percentile-split on the second column
        # into subs 1..m+1, and rows above take the last sub. Sub order
        # then agrees with (key1, key2) order by construction.
        modes = {
            r[_BKT]: r["mode"]
            for r in hot_rows.groupBy(_BKT).agg(F.mode(key1d).alias("mode")).collect()
        }
        mode_pairs = [x for b, m in modes.items() for x in (F.lit(b), F.lit(m))]
        mode_for_bucket = F.create_map(*mode_pairs)[F.col(_BKT)]
        sub_probs = [i / parts for i in range(1, parts)]
        # One grouped job covers every hot bucket: second-column split
        # points among the dominant value's rows only (NULL elsewhere —
        # percentile_approx ignores nulls).
        sub_bounds = {
            r[_BKT]: sorted(
                {float(x) for x in (r["qs"] or []) if x is not None}
            )
            for r in hot_rows.groupBy(_BKT)
            .agg(
                F.percentile_approx(
                    F.when(key1d == mode_for_bucket, key2d), sub_probs, 1000
                ).alias("qs")
            )
            .collect()
        }
        branches = None
        for b in hot:
            v = modes.get(b)
            if v is None:
                continue
            sbs = sub_bounds.get(b, [])
            if sbs:
                dom_sub = F.lit(1) + F.size(
                    F.filter(
                        F.array(*[F.lit(x) for x in sbs]),
                        lambda q: q < key2d,
                    )
                )
            else:
                dom_sub = F.lit(1)
            sub_b = (
                F.when(key1d < F.lit(v), F.lit(0))
                .when(key1d == F.lit(v), dom_sub)
                .otherwise(F.lit(len(sbs) + 2))
            )
            cond = F.col(_BKT) == F.lit(b)
            branches = (
                F.when(cond, sub_b)
                if branches is None
                else branches.when(cond, sub_b)
            )
        if branches is not None:
            sub_expr = branches.otherwise(F.lit(0))
    with_sub = with_bkt.withColumn(_SUB, sub_expr)

    counts2 = {
        (r[_BKT], r[_SUB]): r["cnt"]
        for r in with_sub.groupBy(_BKT, _SUB)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    acc = 0
    offsets2: dict[tuple[int, int], int] = {}
    for bk in sorted(counts2):
        offsets2[bk] = acc
        acc += counts2[bk]
    offset_expr: Column = F.lit(0)
    if offsets2:
        # composite key for the literal map: bucket * 2^32 + sub
        combo = F.col(_BKT).cast("long") * F.lit(1 << 32) + F.col(_SUB)
        pairs = [
            x
            for (b, s), off in offsets2.items()
            for x in (F.lit(b * (1 << 32) + s), F.lit(off))
        ]
        offset_expr = F.create_map(*pairs)[combo]

    w = Window.partitionBy(_BKT, _SUB).orderBy(*[F.col(c) for c in order_cols])
    out = (
        with_sub.withColumn(
            out_col, (F.row_number().over(w) + offset_expr).cast("long")
        )
        .drop(_BKT)
        .drop(_SUB)
    )
    return out, acc


def ntile_from_rank(rn: Column, total: int, n: int) -> Column:
    """Exact NTILE(n) bucket from a 1-based global rank.

    Standard SQL semantics: the first ``total % n`` buckets get
    ``total//n + 1`` rows, the rest ``total//n``. Matches DuckDB/Postgres
    NTILE exactly, including total < n (each row its own bucket).
    """
    q, r = divmod(total, n)
    if q == 0:
        return rn.cast("int")
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets

    def intdiv(a: Column, b: int) -> Column:
        # Exact integral division: subtract the remainder first so the
        # double division is of an exact multiple (correctly rounded to
        # the exact integer quotient — no float-boundary bucket flips).
        return ((a - (a % F.lit(b))) / F.lit(b)).cast("long")

    return (
        F.when(rn <= F.lit(big), intdiv(rn - 1, q + 1))
        .otherwise(F.lit(r) + intdiv(rn - 1 - F.lit(big), q))
        + 1
    ).cast("int")
