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
# a full sort) AND the exact percentile, then the TRUE rank error of the
# sketch answer, checked against the sketch's accuracy contract
# (rank error <= n / accuracy).
#
# Plan shape: pass 1 = one aggregate producing approx+exact per column
# (the exact side is the expensive full-distribution percentile — this
# report is a VALIDATION query, run at sampled scale; production serves
# the approx path); pass 2 = one conditional aggregate counting rows at
# or below each sketch answer (rank lookup), driven by the K collected
# scalars (S12 shape). Rows-only registration: approx_percentile's
# sketch state is engine-specific, so no cross-engine oracle exists by
# design — the pytest property pins the error bound instead.
# ---------------------------------------------------------------------------

_AQ_ACCURACY = 1000
_AQ_QS = [0.5, 0.9, 0.99]


def build_approx_quantile_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    targets = [
        ("orders", "o_totalprice"),
        ("lineitem", "l_extendedprice"),
        ("events", "value"),
    ]
    out_rows = []
    for tbl_name, col in targets:
        df = table(spark, sf_dir, tbl_name)
        agg = df.agg(
            F.count(col).alias("n"),
            F.percentile_approx(col, _AQ_QS, _AQ_ACCURACY).alias("approx"),
            F.percentile(col, _AQ_QS).alias("exact"),
        ).first()
        n = agg["n"]
        # rank lookup for all q in ONE conditional aggregate
        ranks = df.agg(
            *[
                F.count(F.when(F.col(col) <= F.lit(av), 1)).alias(f"r{i}")
                for i, av in enumerate(agg["approx"])
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
                    float(agg["exact"][i]),
                    float(agg["approx"][i]),
                    float(rank_err),
                    float(bound),
                    bool(rank_err <= bound),
                )
            )
    return spark.createDataFrame(
        out_rows,
        "table_name string, column_name string, q double, exact_value double, "
        "approx_value double, rank_error double, rank_error_bound double, "
        "within_bound boolean",
    )


register(
    "approx_quantile_error_report",
    oracle=None,
    doc="Sketch-accuracy self-measurement: approx_percentile vs exact "
    "percentile with true rank error against the n/accuracy contract; "
    "rows-only (sketch state is engine-specific by design).",
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
a AS (SELECT DISTINCT source AS audit_source FROM m),
crossed AS (
    SELECT a.audit_source, m.x, CAST(m.source = a.audit_source AS INTEGER) AS is_in
    FROM a CROSS JOIN m
),
e AS (
    SELECT audit_source,
           SUM(is_in) OVER (PARTITION BY audit_source ORDER BY x
                            RANGE UNBOUNDED PRECEDING) AS cum_in,
           SUM(1 - is_in) OVER (PARTITION BY audit_source ORDER BY x
                                RANGE UNBOUNDED PRECEDING) AS cum_out,
           SUM(is_in) OVER (PARTITION BY audit_source) AS n_in,
           SUM(1 - is_in) OVER (PARTITION BY audit_source) AS n_out
    FROM crossed
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

    docs = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    audit = docs.select(F.col("source").alias("audit_source")).distinct()
    crossed = audit.crossJoin(docs).select(
        "audit_source",
        "x",
        (F.col("source") == F.col("audit_source")).cast("int").alias("is_in"),
    )
    run = (
        Window.partitionBy("audit_source")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy("audit_source")
    e = crossed.select(
        "audit_source",
        F.sum("is_in").over(run).alias("cum_in"),
        F.sum(1 - F.col("is_in")).over(run).alias("cum_out"),
        F.sum("is_in").over(whole).alias("n_in"),
        F.sum(1 - F.col("is_in")).over(whole).alias("n_out"),
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
    "(RANGE-frame ECDFs, alpha=0.05 rejection flag); replication bounded "
    "by the source domain.",
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
