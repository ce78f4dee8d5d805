"""Data-quality constraint checking — the validation stage every lakehouse
pipeline runs between bronze and silver (the reference enforces these as
PostgreSQL DDL constraints: postgres_init NOT NULL / PRIMARY KEY / CHECK;
this engine evaluates them declaratively and reports violation counts).

Shape notes for 100 TB: each table contributes ONE scan producing every
rule's count as a column of a single partial+final aggregate (no
rule-per-scan), then the one-row aggregates are unpivoted and unioned —
constant-size shuffles. The referential-integrity rule is a broadcast/
shuffled ANTI join, the same plan as P6/J6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register

DQ_ORACLE = """
SELECT 'lineitem_discount_out_of_range' AS rule,
       CAST(COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS BIGINT)
           AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       CAST(COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders_dup_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_null_custkey',
       CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_nonpositive_total',
       CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_orderdate_out_of_range',
       CAST(COUNT(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
                         OR CAST(o_orderdate AS DATE) > DATE '2005-12-31' THEN 1 END)
            AS BIGINT)
FROM orders
ORDER BY rule
"""


def _flag(cond) -> F.Column:  # type: ignore[name-defined]
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")


def build_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = spread(table(spark, sf_dir, "lineitem"), spark)

    o_agg = orders.agg(
        _flag(F.col("o_custkey").isNull()).alias("null_custkey"),
        _flag(F.col("o_totalprice") <= 0).alias("nonpositive_total"),
        _flag(
            (F.col("o_orderdate").cast("date") < F.lit("1990-01-01"))
            | (F.col("o_orderdate").cast("date") > F.lit("2005-12-31"))
        ).alias("orderdate_range"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    l_agg = li.agg(
        _flag((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("disc_range"),
        _flag(F.col("l_quantity") <= 0).alias("qty_nonpos"),
    )
    orphans = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))

    def row(src: DataFrame, col: str, rule: str) -> DataFrame:
        return src.select(F.lit(rule).alias("rule"), F.col(col).alias("n_violations"))

    out = (
        row(l_agg, "disc_range", "lineitem_discount_out_of_range")
        .unionByName(row(l_agg, "qty_nonpos", "lineitem_nonpositive_qty"))
        .unionByName(row(orphans, "n", "lineitem_orphan_orderkey"))
        .unionByName(row(o_agg, "dup_orderkey", "orders_dup_orderkey"))
        .unionByName(row(o_agg, "null_custkey", "orders_null_custkey"))
        .unionByName(row(o_agg, "nonpositive_total", "orders_nonpositive_total"))
        .unionByName(row(o_agg, "orderdate_range", "orders_orderdate_out_of_range"))
    )
    return out.orderBy("rule")


register(
    "dq_checks",
    oracle=DQ_ORACLE,
    doc="Declarative data-quality rules (null/range/uniqueness/referential "
    "integrity — postgres_init DDL constraints as queries): one aggregate "
    "scan per table + one anti-join, violation counts per rule.",
    tags=("quality", "agg"),
)(build_dq_checks)


# ---------------------------------------------------------------------------
# k_anonymity_audit — privacy audit for a quasi-identifier tuple: group
# sizes over (nation, market segment), each group's k-anonymity verdict,
# and the table-wide k (the smallest group) every row can be attributed
# to. The release-gating question a training-data pipeline asks before
# shipping user-derived features (GDPR pseudonymisation guidance; the
# erasure module handles the deletion side).
#
# Scale: one partial+final groupBy on the quasi-identifier tuple; the
# table-wide min is a window over the (domain-bounded: |nations|x
# |segments|) group list — no second scan of the base table.
# ---------------------------------------------------------------------------

K_ANON_K = 5

K_ANON_ORACLE = f"""
WITH g AS (
    SELECT c.c_nationkey AS nationkey,
           n.n_name      AS nation,
           c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
)
SELECT nationkey, nation, mktsegment, group_size,
       CAST(group_size >= {K_ANON_K} AS BOOLEAN) AS meets_k,
       CAST(MIN(group_size) OVER () AS BIGINT) AS table_k_anonymity
FROM g
"""


def build_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    g = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        "nationkey",
        "nation",
        "mktsegment",
        "group_size",
        (F.col("group_size") >= F.lit(K_ANON_K)).alias("meets_k"),
        F.min("group_size").over(whole).alias("table_k_anonymity"),
    )


register(
    "k_anonymity_audit",
    oracle=K_ANON_ORACLE,
    doc="k-anonymity release audit over the (nation, mktsegment) "
    "quasi-identifier: per-group sizes, per-group k verdict, table-wide k.",
    tags=("quality", "privacy"),
)(build_k_anonymity_audit)


# ---------------------------------------------------------------------------
# approx_quantile_error_report — the engine measures its own sketch
# accuracy (same family as ann_recall_* and minhash_error_report): for
# each metric column and quantile, compute approx_percentile (the
# KLL-style sketch every 100 TB pipeline must use — exact percentile is
# a full sort) AND the exact quantile, then the TRUE rank error of the
# sketch answer, checked against the sketch's accuracy contract
# (rank error <= n / accuracy).
#
# Oracled as a CONTRACT CHECK (VERDICT r8 task 1, the hll_vocab_report
# pattern): the engine-specific sketch value never enters the output —
# the report carries n, the exact quantile, the contract bound, and a
# within_bound boolean that the sketch contract makes deterministically
# TRUE, all of which DuckDB recomputes. The exact quantile is the
# DISCRETE one (the value at sorted rank ceil(q*n)) — an actual data
# value, so cross-engine parity needs no interpolation-arithmetic
# matching at all.
#
# Plan shape: per column, one count + one distinct-value cumulative rank
# (the exact side is a full-distribution quantile — this report is a
# VALIDATION query, run at sampled scale; production serves the approx
# path), then ONE conditional aggregate rank-checking the K collected
# sketch answers (S12 shape).
# ---------------------------------------------------------------------------

_AQ_ACCURACY = 1000
_AQ_QS = [0.5, 0.9, 0.99]
_AQ_TARGETS = [
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("events", "value"),
]


def build_approx_quantile_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql import Window

    out_rows = []
    for tbl_name, col in _AQ_TARGETS:
        df = table(spark, sf_dir, tbl_name)
        n = df.filter(F.col(col).isNotNull()).count()
        ks = [max(1, math.ceil(q * n)) for q in _AQ_QS]
        # discrete quantiles from ONE cumulative rank over the distinct
        # values (the window is value-domain-sized, not row-sized)
        vc = (
            df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        cum = vc.select("v", F.sum("c").over(w).alias("cum"))
        exact = cum.agg(
            *[
                F.min(F.when(F.col("cum") >= F.lit(k), F.col("v"))).alias(f"e{i}")
                for i, k in enumerate(ks)
            ]
        ).first()
        approx = df.agg(
            F.percentile_approx(col, _AQ_QS, _AQ_ACCURACY).alias("approx")
        ).first()["approx"]
        # rank lookup for all sketch answers in ONE conditional aggregate
        ranks = df.agg(
            *[
                F.count(F.when(F.col(col) <= F.lit(av), 1)).alias(f"r{i}")
                for i, av in enumerate(approx)
            ]
        ).first()
        for i, q in enumerate(_AQ_QS):
            rank_err = abs(ranks[f"r{i}"] - q * n)
            bound = n / _AQ_ACCURACY + 1  # +1: rank of a present value
            out_rows.append(
                (
                    tbl_name,
                    col,
                    q,
                    n,
                    float(exact[f"e{i}"]),
                    float(bound),
                    bool(rank_err <= bound),
                )
            )
    return spark.createDataFrame(
        out_rows,
        "table_name string, column_name string, q double, n long, "
        "exact_value double, rank_error_bound double, within_bound boolean",
    )


def _aq_oracle() -> str:
    legs = []
    for tbl_name, col in _AQ_TARGETS:
        for q in _AQ_QS:
            legs.append(
                f"""SELECT '{tbl_name}' AS table_name, '{col}' AS column_name,
       CAST({q} AS DOUBLE) AS q, n.c AS n,
       (SELECT v FROM (
            SELECT {col} AS v,
                   row_number() OVER (ORDER BY {col}) AS rn
            FROM {tbl_name} WHERE {col} IS NOT NULL
        ) WHERE rn = GREATEST(1, CAST(CEIL({q} * n.c) AS BIGINT))
       ) AS exact_value,
       CAST(n.c AS DOUBLE) / {_AQ_ACCURACY} + 1 AS rank_error_bound,
       TRUE AS within_bound
FROM (SELECT CAST(COUNT({col}) AS BIGINT) AS c FROM {tbl_name}) n"""
            )
    return "\nUNION ALL\n".join(legs)


register(
    "approx_quantile_error_report",
    oracle=_aq_oracle(),
    doc="Sketch-accuracy contract check: approx_percentile's true rank "
    "error verified against the n/accuracy contract; the output carries "
    "n, the exact DISCRETE quantile (value at rank ceil(q*n)) and a "
    "deterministically-TRUE within-bound boolean — all DuckDB-"
    "recomputable; the engine-specific sketch value stays internal.",
    tags=("quality", "sketch", "self-measurement"),
)(build_approx_quantile_error_report)


# ---------------------------------------------------------------------------
# source_drift_ks — per-source distribution-drift audit: the exact
# two-sample Kolmogorov-Smirnov statistic between each source's document
# length distribution and the rest of the corpus, with the alpha=0.05
# rejection flag (D > 1.36 * sqrt((n1+n2)/(n1*n2))). The ingestion-time
# canary an LLM corpus pipeline runs per feed: a drifting source means a
# scraper change or a new content mix upstream.
#
# Shape: the audit needs F_source and F_rest evaluated at the UNION of
# sample points, so the metric rows are replicated once per audited
# source (|sources| x rows — bounded by the SOURCE DOMAIN, not data
# volume; at scale shard the audit by source and this is one window per
# shard). ECDFs are RANGE-frame running counts (ties included on both
# engines); the supremum is a groupBy max. All counts are integers, the
# final division is one double op per row — cross-engine stable.
# ---------------------------------------------------------------------------

SOURCE_DRIFT_KS_ORACLE = """
WITH m AS (
    SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
),
-- aggregate FIRST (same discipline as source_drift_psi): one data-sized
-- pass to (x, source) counts; everything after runs on the
-- value-domain x source-domain grid, never on raw rows
vc AS (
    SELECT x, source, COUNT(*) AS c FROM m GROUP BY 1, 2
),
xt AS (
    SELECT x, SUM(c) AS c_all FROM vc GROUP BY 1
),
grid AS (
    SELECT s.audit_source, xt.x, xt.c_all, COALESCE(vc.c, 0) AS c_in
    FROM (SELECT DISTINCT source AS audit_source FROM m) s
    CROSS JOIN xt
    LEFT JOIN vc ON vc.x = xt.x AND vc.source = s.audit_source
),
e AS (
    SELECT audit_source,
           SUM(c_in) OVER (PARTITION BY audit_source ORDER BY x
                           ROWS UNBOUNDED PRECEDING) AS cum_in,
           SUM(c_all - c_in) OVER (PARTITION BY audit_source ORDER BY x
                                   ROWS UNBOUNDED PRECEDING) AS cum_out,
           SUM(c_in) OVER (PARTITION BY audit_source) AS n_in,
           SUM(c_all - c_in) OVER (PARTITION BY audit_source) AS n_out
    FROM grid
)
SELECT audit_source AS source,
       CAST(MAX(n_in) AS BIGINT) AS n_docs,
       ROUND(MAX(ABS(CAST(cum_in AS DOUBLE) / n_in
                     - CAST(cum_out AS DOUBLE) / n_out)), 6) AS ks_d,
       CAST(MAX(ABS(CAST(cum_in AS DOUBLE) / n_in
                    - CAST(cum_out AS DOUBLE) / n_out))
            > 1.36 * sqrt(CAST(MAX(n_in) + MAX(n_out) AS DOUBLE)
                          / (MAX(n_in) * MAX(n_out))) AS BOOLEAN) AS drifted
FROM e
GROUP BY audit_source
"""


def build_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    vc = m.groupBy("x", "source").agg(F.count(F.lit(1)).alias("c"))
    xt = vc.groupBy("x").agg(F.sum("c").alias("c_all"))
    audit = m.select(F.col("source").alias("audit_source")).distinct()
    grid = (
        audit.crossJoin(xt)
        .join(
            vc.withColumnRenamed("source", "audit_source"),
            ["audit_source", "x"],
            "left",
        )
        .select(
            "audit_source", "x", "c_all", F.coalesce("c", F.lit(0)).alias("c_in")
        )
    )
    run = (
        Window.partitionBy("audit_source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy("audit_source")
    e = grid.select(
        "audit_source",
        F.sum("c_in").over(run).alias("cum_in"),
        F.sum(F.col("c_all") - F.col("c_in")).over(run).alias("cum_out"),
        F.sum("c_in").over(whole).alias("n_in"),
        F.sum(F.col("c_all") - F.col("c_in")).over(whole).alias("n_out"),
    )
    d = F.abs(
        F.col("cum_in").cast("double") / F.col("n_in")
        - F.col("cum_out").cast("double") / F.col("n_out")
    )
    return (
        e.withColumn("d", d)
        .groupBy(F.col("audit_source").alias("source"))
        .agg(
            F.max("n_in").alias("n_docs"),
            F.round(F.max("d"), 6).alias("ks_d"),
            (
                F.max("d")
                > 1.36
                * F.sqrt(
                    (F.max("n_in") + F.max("n_out")).cast("double")
                    / (F.max("n_in") * F.max("n_out"))
                )
            ).alias("drifted"),
        )
    )


register(
    "source_drift_ks",
    oracle=SOURCE_DRIFT_KS_ORACLE,
    doc="Exact two-sample KS drift audit per source vs rest-of-corpus "
    "(running-count ECDFs over the value-domain grid, alpha=0.05 flag). "
    "Aggregate-first: raw rows collapse to (value, source) counts before "
    "any replication — grid size is value-domain x source-domain.",
    tags=("quality", "llm", "drift", "stats"),
)(build_source_drift_ks)


# ---------------------------------------------------------------------------
# l_diversity_audit — k-anonymity's companion: a QI group can be large
# (k-anonymous) yet expose everyone in it if a SENSITIVE attribute is
# homogeneous. Per QI group (nation), report the number of distinct
# sensitive values (market segment), the group's l verdict, and the
# table-wide l (the weakest group). Same single-scan shape as
# k_anonymity_audit: one groupBy, one domain-bounded window.
# ---------------------------------------------------------------------------

L_DIVERSITY_L = 3

L_DIVERSITY_ORACLE = f"""
WITH g AS (
    SELECT c.c_nationkey AS nationkey,
           n.n_name      AS nation,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT c.c_mktsegment) AS BIGINT) AS distinct_sensitive
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
)
SELECT nationkey, nation, group_size, distinct_sensitive,
       CAST(distinct_sensitive >= {L_DIVERSITY_L} AS BOOLEAN) AS meets_l,
       CAST(MIN(distinct_sensitive) OVER () AS BIGINT) AS table_l_diversity
FROM g
"""


def build_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    g = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("c_mktsegment").alias("distinct_sensitive"),
        )
    )
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        "nationkey",
        "nation",
        "group_size",
        "distinct_sensitive",
        (F.col("distinct_sensitive") >= F.lit(L_DIVERSITY_L)).alias("meets_l"),
        F.min("distinct_sensitive").over(whole).alias("table_l_diversity"),
    )


register(
    "l_diversity_audit",
    oracle=L_DIVERSITY_ORACLE,
    doc="l-diversity release audit: distinct sensitive values (mktsegment) "
    "per QI group (nation), per-group l verdict, table-wide l.",
    tags=("quality", "privacy"),
)(build_l_diversity_audit)


# ---------------------------------------------------------------------------
# t_closeness_audit — the third member of the release-audit triad (Li,
# Li & Venkatasubramanian, ICDE 2007): a group can be k-anonymous AND
# l-diverse yet still leak if its sensitive-attribute DISTRIBUTION
# diverges from the table's (e.g. 90% of one segment where the table
# holds 20%). Per QI group (nation), the Earth Mover's Distance between
# the group's mktsegment distribution and the global one; for a
# categorical attribute under the equal-distance ground metric the EMD
# is the total variation distance (1/2)*sum_i |p_i - q_i| (the paper's
# §4.2 formulation).
#
# Exactness (the parity.py discipline): p_i - q_i = (cnt_i*total -
# seg_total_i*group_size) / (group_size*total) — every present-segment
# term shares ONE denominator, and segments ABSENT from the group
# contribute q_i, i.e. (total - sum_present seg_total)*group_size on
# the same denominator. The numerator products are computed in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — BIGINT inputs would wrap
# SILENTLY in non-ANSI Spark past ~3e9 customer rows while DuckDB
# errors or widens, diverging the engines (ADVICE r11); 128-bit
# integers are exact to ~1.7e19 rows. ONE identically-ordered double
# expression per group then produces the EMD in both engines (128-bit
# int -> double rounds to nearest on both sides, so identical integers
# give bit-identical doubles); table-wide t is a MAX (order-
# independent, unlike a float sum).
#
# Scale: one partial+final groupBy on (QI, sensitive); everything after
# operates on the |nations| x |segments| domain grid (125 rows at any
# data size), so the windows/second agg are free.
# ---------------------------------------------------------------------------

T_CLOSENESS_T = 0.2

T_CLOSENESS_ORACLE = f"""
WITH cnt AS (
    SELECT c.c_nationkey AS nationkey, n.n_name AS nation,
           c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
),
w AS (
    SELECT cnt.*,
           CAST(SUM(cnt) OVER (PARTITION BY seg) AS BIGINT) AS seg_total,
           CAST(SUM(cnt) OVER (PARTITION BY nationkey) AS BIGINT) AS grp_size,
           CAST(SUM(cnt) OVER () AS BIGINT) AS total
    FROM cnt
),
g AS (
    SELECT nationkey, nation, grp_size, total,
           SUM(ABS(CAST(cnt AS HUGEINT) * total
                   - CAST(seg_total AS HUGEINT) * grp_size))
               AS present_num,
           CAST(SUM(seg_total) AS BIGINT) AS present_seg_total
    FROM w GROUP BY 1, 2, 3, 4
),
e AS (
    SELECT nationkey, nation, grp_size AS group_size,
           CAST(present_num
                + CAST(total - present_seg_total AS HUGEINT) * grp_size
                AS DOUBLE)
               / (2.0 * CAST(total AS DOUBLE) * CAST(grp_size AS DOUBLE))
               AS emd
    FROM g
)
SELECT nationkey, nation, group_size, emd,
       CAST(emd <= {T_CLOSENESS_T!r} AS BOOLEAN) AS meets_t,
       MAX(emd) OVER () AS table_t_closeness
FROM e
"""


def build_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    cnt = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = cnt.select(
        "nationkey",
        "nation",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("seg")).alias("seg_total"),
        F.sum("cnt").over(Window.partitionBy("nationkey")).alias("grp_size"),
        F.sum("cnt").over(whole).alias("total"),
    )
    # 128-bit numerator products (DECIMAL(38,0) here, HUGEINT in the
    # oracle): BIGINT*BIGINT wraps silently in non-ANSI Spark past ~3e9
    # customer rows while DuckDB widens/errors — the engines would
    # diverge instead of failing loudly (ADVICE r11).
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = w.groupBy("nationkey", "nation", "grp_size", "total").agg(
        F.sum(
            F.abs(dec("cnt") * dec("total") - dec("seg_total") * dec("grp_size"))
        ).alias("present_num"),
        F.sum("seg_total").alias("present_seg_total"),
    )
    # Same left-to-right double expression as the oracle: numerator /
    # (2.0 * total * grp_size) — one division of exactly-representable
    # integers, bit-identical across engines (decimal/hugeint -> double
    # both round to nearest).
    emd = (
        (
            F.col("present_num")
            + (dec("total") - dec("present_seg_total")) * dec("grp_size")
        ).cast("double")
        / (F.lit(2.0) * F.col("total").cast("double") * F.col("grp_size").cast("double"))
    ).alias("emd")
    e = g.select(
        "nationkey", "nation", F.col("grp_size").alias("group_size"), emd
    )
    return e.select(
        "nationkey",
        "nation",
        "group_size",
        "emd",
        (F.col("emd") <= F.lit(T_CLOSENESS_T)).alias("meets_t"),
        F.max("emd").over(whole).alias("table_t_closeness"),
    )


register(
    "t_closeness_audit",
    oracle=T_CLOSENESS_ORACLE,
    doc="t-closeness release audit (Li et al. 2007): per QI group "
    "(nation) the EMD between the group's sensitive-attribute "
    "(mktsegment) distribution and the global one — total variation "
    "distance for categorical attributes — exact BIGINT numerators over "
    "a shared denominator, per-group t verdict, table-wide t (max).",
    tags=("quality", "privacy"),
)(build_t_closeness_audit)


# ---------------------------------------------------------------------------
# source_drift_psi — Population Stability Index per source vs the rest of
# the corpus: PSI = sum_bins (p_i - q_i) * ln(p_i / q_i) over GLOBAL
# decile bins of document length. The industry-standard model/feature
# drift metric (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted) —
# complements source_drift_ks: KS is the sharpest single deviation, PSI
# weights the whole shape.
#
# Determinism: bin edges are the global deciles computed ONCE (exact
# percentile over bigint lengths — the same values on both engines), so
# binning is pure integer comparison; bin probabilities are Laplace-
# smoothed (+1 per bin) so empty bins never hit ln(0) and the smoothing
# is identical algebra on both sides. One pass to bin (broadcastable
# 9-value edge list via a CASE chain), one groupBy, one ln per bin.
# ---------------------------------------------------------------------------

_PSI_BINS = 10


def _psi_edges_sql(col: str = "n_chars") -> str:
    qs = ", ".join(str(i / _PSI_BINS) for i in range(1, _PSI_BINS))
    return f"quantile_cont(CAST({col} AS BIGINT), [{qs}])"


def _psi_edges(m, x_col: str = "x"):
    """Global decile edges of ``m[x_col]`` — one exact-percentile scalar
    fetch (S12), shared by every PSI variant so edges can't drift."""
    qs = [i / _PSI_BINS for i in range(1, _PSI_BINS)]
    return m.agg(F.percentile(x_col, F.lit(qs)).alias("e")).first()["e"]


def _psi_bin_col(edges, x_col: str = "x"):
    """Bin index 0..9 by pure integer comparison against the shared edges."""
    return sum((F.col(x_col) > F.lit(float(v))).cast("int") for v in edges)


SOURCE_DRIFT_PSI_ORACLE = f"""
WITH m AS (
    SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
),
edges AS (
    SELECT {_psi_edges_sql("n_chars")} AS e FROM documents
),
-- aggregate FIRST: one data-sized pass to (source, bin) counts; the
-- rest is algebra on the domain-bounded sources x bins grid (PSI never
-- needs the per-source data replication KS does)
counts AS (
    SELECT m.source,
           (SELECT COUNT(*) FROM unnest((SELECT e FROM edges)) AS t(v)
            WHERE m.x > v) AS bin,
           COUNT(*) AS c
    FROM m GROUP BY 1, 2
),
grid AS (
    SELECT s.source, b.bin
    FROM (SELECT DISTINCT source FROM counts) s
    CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b
),
full_counts AS (
    SELECT g.source, g.bin, COALESCE(c.c, 0) AS c_in,
           SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.bin) - COALESCE(c.c, 0)
               AS c_out
    FROM grid g LEFT JOIN counts c
      ON g.source = c.source AND g.bin = c.bin
),
p AS (
    SELECT source,
           CAST(c_in + 1 AS DOUBLE)
             / (SUM(c_in) OVER (PARTITION BY source) + {_PSI_BINS}) AS p_in,
           CAST(c_out + 1 AS DOUBLE)
             / (SUM(c_out) OVER (PARTITION BY source) + {_PSI_BINS}) AS p_out
    FROM full_counts
)
SELECT source,
       ROUND(SUM((p_in - p_out) * ln(p_in / p_out)), 6) AS psi,
       CAST(SUM((p_in - p_out) * ln(p_in / p_out)) > 0.25 AS BOOLEAN)
           AS shifted
FROM p
GROUP BY source
"""


def build_source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    edges = _psi_edges(m)
    counts = (
        m.withColumn("bin", _psi_bin_col(edges))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sources = counts.select("source").distinct()
    bins = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = sources.crossJoin(F.broadcast(bins))
    wb = Window.partitionBy("bin")
    full_counts = (
        grid.join(counts, ["source", "bin"], "left")
        .select("source", "bin", F.coalesce("c", F.lit(0)).alias("c_in"))
        .withColumn("c_out", F.sum("c_in").over(wb) - F.col("c_in"))
    )
    ws = Window.partitionBy("source")
    p = full_counts.select(
        "source",
        (
            (F.col("c_in") + 1).cast("double")
            / (F.sum("c_in").over(ws) + F.lit(_PSI_BINS))
        ).alias("p_in"),
        (
            (F.col("c_out") + 1).cast("double")
            / (F.sum("c_out").over(ws) + F.lit(_PSI_BINS))
        ).alias("p_out"),
    )
    term = (F.col("p_in") - F.col("p_out")) * F.log(F.col("p_in") / F.col("p_out"))
    return (
        p.withColumn("t", term)
        .groupBy("source")
        .agg(
            F.round(F.sum("t"), 6).alias("psi"),
            (F.sum("t") > 0.25).alias("shifted"),
        )
    )


register(
    "source_drift_psi",
    oracle=SOURCE_DRIFT_PSI_ORACLE,
    doc="Population Stability Index per source vs rest over global decile "
    "bins (exact shared edges, Laplace-smoothed; PSI > 0.25 flag). "
    "Aggregate-first: one data-sized pass to (source, bin) counts, then "
    "algebra on the domain-bounded grid — no per-source replication.",
    tags=("quality", "llm", "drift", "stats"),
)(build_source_drift_psi)


# ---------------------------------------------------------------------------
# source_drift_mannwhitney — location-shift drift test per source: the
# Mann-Whitney U statistic of each source's document lengths against the
# rest, with the tie-corrected normal approximation z and the alpha=0.05
# two-sided flag. Completes the drift toolkit: KS = sharpest single
# deviation, PSI = whole-shape weight, U = median shift direction.
#
# Cost shape beats the other two: ranks are computed ONCE over the whole
# corpus (U against "rest" only needs union ranks), so there is NO
# per-source replication — one global sort window + one groupBy(source).
# Ties use average ranks (rank + (t-1)/2, exact halves in double); the
# tie correction term sum(t^3 - t) is an exact bigint aggregate.
# ---------------------------------------------------------------------------

SOURCE_DRIFT_MW_ORACLE = """
WITH m AS (
    SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
),
r AS (
    SELECT source, x,
           RANK() OVER (ORDER BY x)
             + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS avg_rank
    FROM m
),
ties AS (
    SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term,
           CAST(MAX(n) AS BIGINT) AS n
    FROM (SELECT COUNT(*) AS t, SUM(COUNT(*)) OVER () AS n FROM m GROUP BY x)
),
s AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n1,
           SUM(avg_rank) AS r1
    FROM r GROUP BY source
),
v AS (
    SELECT s.source, s.n1,
           s.r1 - s.n1 * (s.n1 + 1) / 2.0 AS u,
           s.n1 * (ties.n - s.n1) / 2.0 AS mu,
           (CAST(s.n1 AS DOUBLE) * (ties.n - s.n1) / 12.0)
             * ((ties.n + 1) - CAST(ties.tie_term AS DOUBLE)
                                / (ties.n * (ties.n - 1.0))) AS var
    FROM s CROSS JOIN ties
)
SELECT source,
       n1 AS n_docs,
       ROUND(u, 1) AS u_stat,
       -- var = 0 (single source, or all values tied) must be NULL on
       -- BOTH engines: DuckDB returns NULL for x/0.0 while Spark
       -- returns IEEE Inf/NaN, so an unguarded division diverges
       ROUND(CASE WHEN var > 0 THEN (u - mu) / sqrt(var) END, 6) AS z_score,
       CAST(CASE WHEN var > 0 THEN ABS((u - mu) / sqrt(var)) > 1.96 END
            AS BOOLEAN) AS shifted
FROM v
"""


def build_source_drift_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    # VERDICT r4 task 1: the average-rank window ran unpartitioned over
    # ALL documents. Mann-Whitney only needs SUM(avg_rank) per source,
    # and avg_rank is a pure function of the VALUE:
    #   avg_rank(x) = c_below(x) + (t_x + 1)/2
    # so the whole test reduces to grouped counts: per-value tallies t_x
    # (the cumulative below-count is a window over DISTINCT n_chars
    # values — value-domain-sized, never data-sized), per-(source,value)
    # tallies, one join on the value, one sum. Doubled ranks (2*avg_rank
    # is an integer) keep every partial sum exact in longs.
    vx = m.groupBy("x").agg(F.count(F.lit(1)).alias("t"))
    wv = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vx2 = vx.withColumn(
        "a2",
        2 * (F.sum("t").over(wv) - F.col("t")) + F.col("t") + 1,
    )
    tie_row = vx.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_term"),
        F.sum("t").alias("n"),
    ).first()  # S12: two scalars
    n, tie_term = tie_row["n"], tie_row["tie_term"]
    sx = m.groupBy("source", "x").agg(F.count(F.lit(1)).alias("t_sx"))
    s = sx.join(vx2.select("x", "a2"), "x").groupBy("source").agg(
        F.sum("t_sx").alias("n1"),
        (F.sum(F.col("t_sx") * F.col("a2")) / 2.0).alias("r1"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * (F.lit(n) - F.col("n1")) / 2.0
    var = (
        F.col("n1").cast("double") * (F.lit(n) - F.col("n1")) / 12.0
    ) * (F.lit(float(n + 1)) - F.lit(float(tie_term)) / F.lit(float(n * (n - 1))))
    # var = 0 (single source / all values tied) -> NULL, matching the
    # oracle's guard; Spark's raw x/0.0 would be Inf/NaN, not NULL
    z = F.when(var > 0, (u - mu) / F.sqrt(var))
    return s.select(
        "source",
        F.col("n1").alias("n_docs"),
        F.round(u, 1).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("shifted"),
    )


register(
    "source_drift_mannwhitney",
    oracle=SOURCE_DRIFT_MW_ORACLE,
    doc="Mann-Whitney U location-shift test per source vs rest (average "
    "ranks, tie-corrected z, alpha=0.05 flag); fully grouped — rank sums "
    "derive from per-value tallies, no data-sized window anywhere.",
    tags=("quality", "llm", "drift", "stats"),
)(build_source_drift_mannwhitney)


# ---------------------------------------------------------------------------
# weekly_value_psi — TEMPORAL drift: PSI of the event-value distribution
# for each ISO week against the PREVIOUS week (the production-monitoring
# twin of source_drift_psi's cross-source audit — "did this week's
# traffic change shape?"). Same exact machinery: global decile edges
# (computed once, shared), Laplace-smoothed bin probabilities, one ln per
# bin. The week-to-week pairing is a self-join on week_index-1 over the
# (weeks x bins) aggregate — domain-bounded rows, never data-sized.
# ---------------------------------------------------------------------------

WEEKLY_PSI_ORACLE = f"""
WITH m AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
           CAST(date_trunc('week', ts) AS DATE) AS week_start
    FROM events WHERE value IS NOT NULL
),
edges AS (
    SELECT {_psi_edges_sql("x")} AS e FROM m
),
binned AS (
    SELECT week_start,
           (SELECT COUNT(*) FROM unnest((SELECT e FROM edges)) AS t(v)
            WHERE m.x > v) AS bin
    FROM m
),
counts AS (
    SELECT week_start, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
),
-- dense bin grid so empty bins exist for smoothing
grid AS (
    SELECT w.week_start, b.bin
    FROM (SELECT DISTINCT week_start FROM counts) w
    CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b
),
full_counts AS (
    SELECT g.week_start, g.bin, COALESCE(c.c, 0) AS c
    FROM grid g LEFT JOIN counts c
      ON g.week_start = c.week_start AND g.bin = c.bin
),
p AS (
    SELECT week_start, bin,
           CAST(c + 1 AS DOUBLE)
             / (SUM(c) OVER (PARTITION BY week_start) + {_PSI_BINS}) AS pr
    FROM full_counts
),
pairs AS (
    SELECT cur.week_start, cur.pr AS p_cur, prv.pr AS p_prev
    FROM p cur JOIN p prv
      ON cur.bin = prv.bin AND prv.week_start = cur.week_start - INTERVAL 7 DAY
)
SELECT week_start,
       ROUND(SUM((p_cur - p_prev) * ln(p_cur / p_prev)), 6) AS psi,
       CAST(SUM((p_cur - p_prev) * ln(p_cur / p_prev)) > 0.25 AS BOOLEAN)
           AS shifted
FROM pairs
GROUP BY week_start
"""


def build_weekly_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = table(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
    )
    edges = _psi_edges(m)  # S12 scalar fetch, shared PSI primitive
    counts = (
        m.withColumn("bin", _psi_bin_col(edges))
        .groupBy("week_start", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    weeks = counts.select("week_start").distinct()
    bins = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = weeks.crossJoin(F.broadcast(bins))
    full_counts = grid.join(counts, ["week_start", "bin"], "left").select(
        "week_start", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("week_start")
    p = full_counts.select(
        "week_start",
        "bin",
        (
            (F.col("c") + 1).cast("double")
            / (F.sum("c").over(w) + F.lit(_PSI_BINS))
        ).alias("pr"),
    )
    prv = p.select(
        (F.col("week_start") + F.expr("INTERVAL 7 DAY")).cast("date").alias("week_start"),
        "bin",
        F.col("pr").alias("p_prev"),
    )
    pairs = p.withColumnRenamed("pr", "p_cur").join(prv, ["week_start", "bin"])
    term = (F.col("p_cur") - F.col("p_prev")) * F.log(F.col("p_cur") / F.col("p_prev"))
    return (
        pairs.withColumn("t", term)
        .groupBy("week_start")
        .agg(
            F.round(F.sum("t"), 6).alias("psi"),
            (F.sum("t") > 0.25).alias("shifted"),
        )
    )


register(
    "weekly_value_psi",
    oracle=WEEKLY_PSI_ORACLE,
    doc="Week-over-week PSI of the event-value distribution (shared exact "
    "decile edges, dense smoothed bin grid, week self-join on the "
    "domain-bounded weeks-x-bins aggregate).",
    tags=("quality", "drift", "timeseries", "stats"),
)(build_weekly_value_psi)


# ---------------------------------------------------------------------------
# mad_length_outliers — robust per-source length outliers (round 9):
# median + MAD (median absolute deviation) instead of mean + stddev, the
# estimator that survives the heavy-tailed length distributions every
# web corpus has (a handful of giant documents move a mean arbitrarily
# far; they move a median not at all). Everything is INTEGER: token
# counts, the discrete median (value at rank ceil(n/2), same definition
# as approx_quantile_error_report's exact side), the MAD, and the
# |x - med| > 3 * max(mad, 1) flag — zero float ops, so cross-engine
# parity is structural. Two grouped rank passes (round 10): the data-
# sized stage is a partial-aggregating groupBy(source, value); the only
# windows run over the distinct (source, value) tallies — value-domain-
# sized, never data-sized (the mannwhitney reduction).
# ---------------------------------------------------------------------------

MAD_K = 3

_MAD_D_CACHE: list[DataFrame] = []

MAD_OUTLIERS_ORACLE = f"""
WITH d AS (
    SELECT doc_id, source,
           CAST(len({{tok}}) AS BIGINT) AS n_tokens
    FROM documents
),
r1 AS (
    SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY n_tokens
           ) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS cnt
    FROM d
),
med AS (
    SELECT source, n_tokens AS med_tokens
    FROM r1 WHERE rn = (cnt + 1) // 2
),
dev AS (
    SELECT d.doc_id, d.source, d.n_tokens, m.med_tokens,
           ABS(d.n_tokens - m.med_tokens) AS deviation
    FROM d JOIN med m USING (source)
),
r2 AS (
    SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY deviation
           ) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS cnt
    FROM dev
),
mad AS (
    SELECT source, deviation AS mad_tokens
    FROM r2 WHERE rn = (cnt + 1) // 2
)
SELECT v.doc_id, v.source, v.n_tokens, v.med_tokens, a.mad_tokens,
       v.deviation
FROM dev v JOIN mad a USING (source)
WHERE v.deviation > {MAD_K} * GREATEST(a.mad_tokens, 1)
""".format(tok="{tok}")


from .text import _sql_tokens  # noqa: E402  (oracle twin of tokens_col)


def build_mad_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .text import tokens_col

    docs = spread(table(spark, sf_dir, "documents"), spark)
    # d (doc_id, source, n_tokens) feeds FOUR paths (median tallies, dev,
    # MAD tallies, the final outlier join); uncached, each re-runs the
    # tokenizer over the full text (4 documents scans in one plan).
    # Three narrow columns per doc — far smaller than the corpus —
    # single-slot persisted LAZILY (eager materialize measured worse,
    # r12). Measured evidence (r12): ~0.92x at sf0.1 but a WASH at 10x
    # (1.06x) — kept on the structural ground that the regexp tokenizer
    # provably runs once; re-evaluate rather than treat as a clean win.
    from .workspace import single_slot_persist

    d = single_slot_persist(
        _MAD_D_CACHE,
        docs.select(
            "doc_id", "source", F.size(tokens_col()).cast("long").alias("n_tokens")
        ),
    )

    # VERDICT r9 task 1: the original per-source row_number window put
    # EVERY row of a source through one sort task — the single-partition
    # cliff at 100 TB. Value-domain reduction (the r5
    # source_drift_mannwhitney precedent): the discrete median at rank
    # (cnt+1)//2 is fully determined by per-(source, value) tallies, so
    # the data-sized pass is a partial-aggregating groupBy (map-side
    # combine, every shuffle partition busy) and the only window runs
    # over the DISTINCT (source, value) rows — value-domain-sized, the
    # same bounded class as approx_quantile_error_report's exact side.
    # median = MIN value whose cumulative tally reaches the target rank,
    # identical to row_number()=rank on sorted rows.
    # Integer floor-division parity: (cnt+1)/2 on longs is double
    # division in Spark — floor() lands on DuckDB's // rank.
    def _per_source_median(df: DataFrame, col: str, out: str) -> DataFrame:
        vc = df.groupBy("source", F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        wcum = (
            Window.partitionBy("source")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy("source")
        cum = vc.select(
            "source",
            "v",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wall).alias("cnt"),
        )
        return (
            cum.filter(F.col("cum") >= F.floor((F.col("cnt") + 1) / 2))
            .groupBy("source")
            .agg(F.min("v").alias(out))
        )

    med = _per_source_median(d, "n_tokens", "med_tokens")
    dev = d.join(med, "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "med_tokens",
        F.abs(F.col("n_tokens") - F.col("med_tokens")).alias("deviation"),
    )
    mad = _per_source_median(dev, "deviation", "mad_tokens")
    return dev.join(mad, "source").filter(
        F.col("deviation") > MAD_K * F.greatest(F.col("mad_tokens"), F.lit(1))
    ).select(
        "doc_id", "source", "n_tokens", "med_tokens", "mad_tokens", "deviation"
    )


register(
    "mad_length_outliers",
    oracle=MAD_OUTLIERS_ORACLE.format(tok=_sql_tokens()),
    doc=f"Robust per-source length outliers: integer discrete median + "
    f"MAD over token counts, flagging |x - med| > {MAD_K} * max(MAD, 1) "
    "— the heavy-tail-proof alternative to mean/stddev gates; all-"
    "integer math, structurally exact cross-engine.",
    tags=("quality", "robust", "llm", "stats"),
)(build_mad_length_outliers)
