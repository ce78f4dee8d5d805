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
    out, total, _ = _rank_impl(df, order_cols, out_col, num_partitions)
    return out, total


def global_rank_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "rn",
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Global row_number PLUS the running sum of ``sum_col`` over the same
    total order — the Pareto/cumulative-share primitive — with the same
    distributed construction: per-(bucket, sub) SUMS ride along in the
    offset pass, so the running sum is a bucket-local window plus a
    broadcast sum-offset. Returns ``(df, total_rows, total_sum)`` — the
    grand total falls out of the same bucket-sized collect (no extra
    job for the denominator of a cumulative share)."""
    return _rank_impl(df, order_cols, out_col, num_partitions, sum_col, cumsum_col)


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prev_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running max of ``value_col`` over the
    ``order_col`` total order (``MAX(...) OVER (ORDER BY o ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``), distributed — the skyline /
    cumulative-dominance primitive, with the same construction as
    :func:`global_row_number`: value-range buckets from approx quantiles
    of ``order_col``, a bucket-local exclusive cummax window, and a
    broadcast prefix-max of the buckets strictly below. No
    single-partition WindowExec at any input size. ``order_col`` must be
    non-null numeric and unique (one row per ordered value)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / parts for i in range(1, parts)]
    bounds = (
        sorted(set(df.stat.approxQuantile(order_col, probs, 0.001))) if probs else []
    )
    if bounds:
        bucket: Column = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b < F.col(order_col).cast("double"),
            )
        )
    else:
        bucket = F.lit(0)
    with_bkt = df.withColumn(_BKT, bucket)
    bmax = {
        r[_BKT]: r["m"]
        for r in with_bkt.groupBy(_BKT).agg(F.max(value_col).alias("m")).collect()
    }
    prefix: dict[int, object] = {}
    run = None
    for b in sorted(bmax):
        prefix[b] = run
        run = bmax[b] if run is None else max(run, bmax[b])
    vtype = dict(df.dtypes)[value_col]
    pairs = [
        x for b, m in prefix.items() if m is not None for x in (F.lit(b), F.lit(m))
    ]
    prefix_expr: Column = (
        F.create_map(*pairs)[F.col(_BKT)].cast(vtype)
        if pairs
        else F.lit(None).cast(vtype)
    )
    w = (
        Window.partitionBy(_BKT)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips nulls (null only when BOTH sides are null — the
    # global first row), exactly the exclusive-frame semantics
    return with_bkt.withColumn(
        out_col, F.greatest(F.max(value_col).over(w), prefix_expr)
    ).drop(_BKT)


def _rank_impl(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    num_partitions: int | None,
    sum_col: str | None = None,
    cumsum_col: str | None = None,
) -> tuple[DataFrame, int, int | float | None]:
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

    aggs = [F.count(F.lit(1)).alias("cnt")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("s"))
    grouped = with_sub.groupBy(_BKT, _SUB).agg(*aggs).collect()
    counts2 = {(r[_BKT], r[_SUB]): r["cnt"] for r in grouped}
    sums2 = (
        {(r[_BKT], r[_SUB]): (r["s"] or 0) for r in grouped}
        if sum_col is not None
        else {}
    )
    acc = 0
    sacc: int | float = 0
    offsets2: dict[tuple[int, int], int] = {}
    soffsets2: dict[tuple[int, int], int | float] = {}
    for bk in sorted(counts2):
        offsets2[bk] = acc
        acc += counts2[bk]
        if sum_col is not None:
            soffsets2[bk] = sacc
            sacc += sums2[bk]
    offset_expr: Column = F.lit(0)
    soffset_expr: Column = F.lit(0)
    # composite key for the literal maps: bucket * 2^32 + sub
    combo = F.col(_BKT).cast("long") * F.lit(1 << 32) + F.col(_SUB)
    if offsets2:
        pairs = [
            x
            for (b, s), off in offsets2.items()
            for x in (F.lit(b * (1 << 32) + s), F.lit(off))
        ]
        offset_expr = F.create_map(*pairs)[combo]
    if soffsets2:
        spairs = [
            x
            for (b, s), off in soffsets2.items()
            for x in (F.lit(b * (1 << 32) + s), F.lit(off))
        ]
        soffset_expr = F.create_map(*spairs)[combo]

    w = Window.partitionBy(_BKT, _SUB).orderBy(*[F.col(c) for c in order_cols])
    out = with_sub.withColumn(
        out_col, (F.row_number().over(w) + offset_expr).cast("long")
    )
    if sum_col is not None and cumsum_col is not None:
        w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            cumsum_col, F.sum(sum_col).over(w_run) + soffset_expr
        )
    out = out.drop(_BKT).drop(_SUB)
    return out, acc, (sacc if sum_col is not None else None)


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


def sequence_gaps(df: DataFrame, col: str) -> DataFrame:
    """Holes in an integer key sequence — ``LEAD() OVER (ORDER BY col)``
    semantics WITHOUT the single-partition window.

    Value-range buckets from ``approxQuantile`` (a pure function of the
    key — stable across jobs under AQE), ``lead()`` inside each bucket
    finds every in-bucket gap, and the bucket SEAMS are stitched from a
    bucket-count-sized collect of per-bucket ``[min, max]`` (a gap
    between consecutive buckets is visible from those two numbers
    alone). Quantile accuracy only moves the seams, never the answer.
    Keys must be distinct non-null integers. Output columns:
    ``gap_start, gap_end, gap_len`` (all long)."""
    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism
    probs = [i / parts for i in range(1, parts)]
    bounds = sorted(set(df.stat.approxQuantile(col, probs, 0.001))) if probs else []
    if bounds:
        bkt: Column = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b < F.col(col).cast("double"),
            )
        )
    else:
        bkt = F.lit(0)
    s = df.withColumn(_BKT, bkt).withColumn(
        "__next",
        F.lead(col).over(Window.partitionBy(_BKT).orderBy(col)),
    )
    inner = s.filter(F.col("__next") - F.col(col) > 1).select(
        (F.col(col) + 1).cast("long").alias("gap_start"),
        (F.col("__next") - 1).cast("long").alias("gap_end"),
        (F.col("__next") - F.col(col) - 1).cast("long").alias("gap_len"),
    )
    edges = sorted(
        (r[_BKT], r["lo"], r["hi"])
        for r in s.groupBy(_BKT)
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    seams = [
        (int(prev_hi + 1), int(lo - 1), int(lo - prev_hi - 1))
        for (_, _, prev_hi), (_, lo, _) in zip(edges, edges[1:])
        if lo - prev_hi > 1
    ]
    seam_df = spark.createDataFrame(
        seams, "gap_start bigint, gap_end bigint, gap_len bigint"
    )
    return inner.unionByName(seam_df)
