"""Mergeable-sketch operators: Count-Min term counts and HLL cardinality.

Two classic streaming/sketch summaries re-expressed as Spark aggregates
(reference parity: the engine's approximate-query surface; extension family
alongside heavy_hitter_terms' Misra-Gries in plans/mining.py):

- **Count-Min** (Cormode & Muthukrishnan 2005): D independent hash rows x
  W buckets of additive counters. Built here FROM the term-frequency
  vector (sum of freqs per (row, bucket)) which is algebraically identical
  to streaming increments but rides one map-side-combined hash aggregate —
  the sketch is D*W cells regardless of corpus size, so at 100 TB it is a
  broadcastable 2 KB..2 MB summary and the build is one shuffle of the
  (already small) distinct-term vector. Estimates are min over rows; CMS
  never underestimates, so ``overestimate >= 0`` is an invariant the
  oracle checks row by row.
- **HLL** via Spark's ``approx_count_distinct`` (HLL++, Heule 2013). The
  raw estimate is engine-specific, so the registered output exposes the
  EXACT cardinality plus a ``within_tol`` self-measurement boolean (|approx
  - exact| <= 10% of exact at rsd=0.02 — a >5-sigma bound, deterministic
  TRUE on both engines); the DuckDB twin asserts the same contract.

Hash parity with the oracle follows plans/dedup.py:308: md5 hex -> first 8
hex chars -> BIGINT (``F.conv`` on the Spark side, digit fold in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register
from .text import _sql_tokens, tokens_col

CMS_ROWS = 4
CMS_WIDTH = 512
CMS_TOP_K = 20


def _hex8_sql(h: str, off: int = 1) -> str:
    """DuckDB: parse 8 hex chars of md5 text at 1-based offset into BIGINT."""
    return (
        f"CAST(list_sum(list_transform(generate_series(0, 7), i -> "
        f"CAST(strpos('0123456789abcdef', substr({h}, {off} + i, 1)) - 1 AS BIGINT) "
        f"* (CAST(1 AS BIGINT) << (4 * (7 - i))))) AS BIGINT)"
    )


def _bucket_col(row: int, term_col: str = "term") -> Column:
    """Spark: CMS bucket of `term` for hash row `row` (md5 parity)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), F.col(term_col)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_WIDTH


# ---------------------------------------------------------------------------
# countmin_term_counts — CMS build + top-K estimate-vs-exact error report.
# ---------------------------------------------------------------------------

COUNTMIN_ORACLE = f"""
WITH tok AS (
    SELECT lower(unnest({_sql_tokens()})) AS term FROM documents
),
wc AS (
    SELECT term, COUNT(*) AS freq FROM tok GROUP BY term
),
probes AS (
    SELECT term, freq, r,
           {_hex8_sql("md5(CAST(r AS VARCHAR) || ':' || term)")} % {CMS_WIDTH} AS bucket
    FROM wc, (SELECT unnest(generate_series(0, {CMS_ROWS - 1})) AS r)
),
sketch AS (
    SELECT r, bucket, CAST(SUM(freq) AS BIGINT) AS counter
    FROM probes GROUP BY r, bucket
),
top AS (
    SELECT term, freq FROM wc ORDER BY freq DESC, term LIMIT {CMS_TOP_K}
),
est AS (
    SELECT t.term, t.freq, MIN(s.counter) AS cms
    FROM top t
    JOIN probes p ON p.term = t.term
    JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
    GROUP BY t.term, t.freq
)
SELECT term,
       freq AS exact_freq,
       cms AS cms_estimate,
       cms - freq AS overestimate
FROM est
ORDER BY exact_freq DESC, term
"""


def build_countmin_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    tok = docs.select(F.explode(tokens_col()).alias("t")).select(
        F.lower("t").alias("term")
    )
    # NOTE (r12, measured and rejected): single-slot-persisting wc (it
    # feeds three consumers, each re-running tokenize+explode) measured
    # SLOWER at sf0.1 (1.2x) and 10x (1.55x) — the tokenize pass is
    # cheaper than the persist's materialize job at every decade the
    # bench reaches. Left uncached.
    wc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))

    # Sketch: D (row, bucket) cells per distinct term, summed. posexplode of a
    # D-wide bucket array keeps it ONE pass over the term vector.
    probes = wc.select(
        "term",
        "freq",
        F.posexplode(
            F.array(*[_bucket_col(r).cast("long") for r in range(CMS_ROWS)])
        ).alias("r", "bucket"),
    )
    sketch = probes.groupBy("r", "bucket").agg(F.sum("freq").alias("counter"))

    top = wc.orderBy(F.desc("freq"), "term").limit(CMS_TOP_K)

    est = (
        top.join(probes.select("term", "r", "bucket"), "term")
        .join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("term", "freq")
        .agg(F.min("counter").alias("cms"))
    )
    return est.select(
        "term",
        F.col("freq").alias("exact_freq"),
        F.col("cms").alias("cms_estimate"),
        (F.col("cms") - F.col("freq")).alias("overestimate"),
    ).orderBy(F.desc("exact_freq"), "term")


register(
    "countmin_term_counts",
    oracle=COUNTMIN_ORACLE,
    doc="Count-Min sketch (4x512, md5-parity hashing) built from the "
    "term-frequency vector in one map-side-combined aggregate; top-20 "
    "estimate-vs-exact error report. Sketch is O(D*W) cells — broadcast "
    "size at any corpus scale; overestimate >= 0 invariant.",
    tags=("sketch", "text", "llm", "evaluation"),
)(build_countmin_term_counts)


# ---------------------------------------------------------------------------
# hll_vocab_report — per-source exact vocabulary + HLL self-measurement.
# ---------------------------------------------------------------------------

HLL_RSD = 0.02
HLL_TOL = 0.10

HLL_ORACLE = f"""
WITH tok AS (
    SELECT source, lower(unnest({_sql_tokens()})) AS term FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS exact_vocab,
       TRUE AS within_tol
FROM tok
GROUP BY source
ORDER BY source
"""


def build_hll_vocab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    tok = docs.select("source", F.explode(tokens_col()).alias("t")).select(
        "source", F.lower("t").alias("term")
    )
    agg = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("exact_vocab"),
        F.approx_count_distinct("term", rsd=HLL_RSD).alias("approx_vocab"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "exact_vocab",
        (
            F.abs(F.col("approx_vocab") - F.col("exact_vocab"))
            <= F.col("exact_vocab") * F.lit(HLL_TOL)
        ).alias("within_tol"),
    ).orderBy("source")


register(
    "hll_vocab_report",
    oracle=HLL_ORACLE,
    doc="Per-source vocabulary cardinality: exact distinct + HLL++ "
    "(approx_count_distinct rsd=0.02) self-measurement — the registered "
    "output carries the exact count and a 10%-tolerance boolean (>5-sigma "
    "bound, deterministically TRUE), so the engine-specific raw estimate "
    "never enters the cross-engine hash. At 100 TB the HLL side is the "
    "one that stays one pass / fixed memory; the exact side is the audit.",
    tags=("sketch", "text", "llm", "approx"),
)(build_hll_vocab_report)


# ---------------------------------------------------------------------------
# join_size_estimate_cms — join-cardinality estimation from per-side
# Count-Min sketches (Cormode & Muthukrishnan 2005 §4.2: the sketch
# inner product upper-bounds the true join size; take the min over hash
# rows). The optimizer-statistics use case: |orders ><  events on
# customer| is sum_k n_orders(k) * n_events(k); the sketches compress
# each side's key-frequency vector to D*W counters, so two 100 TB
# inputs reduce to two broadcastable grids and the estimate is a D*W
# elementwise product — no join executed. The report carries the exact
# size (one equi-join aggregate) for self-measurement; overestimate >= 0
# is the paper's guarantee and the oracle checks it row-exactly.
# ---------------------------------------------------------------------------

JCMS_ROWS = 4
JCMS_WIDTH = 1024


def _jcms_probe_sql(side_sql: str, key: str) -> str:
    """DuckDB: key-frequency vector of `side_sql` -> (r, bucket, freq)."""
    return f"""
    SELECT r,
           {_hex8_sql(f"md5(CAST(r AS VARCHAR) || ':' || CAST({key} AS VARCHAR))")}
               % {JCMS_WIDTH} AS bucket,
           CAST(SUM(freq) AS BIGINT) AS counter
    FROM (SELECT {key}, COUNT(*) AS freq FROM ({side_sql}) GROUP BY {key}),
         (SELECT unnest(generate_series(0, {JCMS_ROWS - 1})) AS r)
    GROUP BY 1, 2
    """


JOIN_SIZE_ORACLE = f"""
WITH sa AS ({_jcms_probe_sql('SELECT o_custkey AS k FROM orders', 'k')}),
sb AS ({_jcms_probe_sql('SELECT user_id AS k FROM events', 'k')}),
inner_products AS (
    SELECT sa.r, CAST(SUM(sa.counter * sb.counter) AS BIGINT) AS ip
    FROM sa JOIN sb ON sa.r = sb.r AND sa.bucket = sb.bucket
    GROUP BY sa.r
),
est AS (SELECT MIN(ip) AS cms_estimate FROM inner_products),
exact AS (
    SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS exact_size
    FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1) a
    JOIN (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1) b
      ON a.k = b.k
)
SELECT exact.exact_size,
       est.cms_estimate,
       est.cms_estimate - exact.exact_size AS overestimate,
       -- integer parts-per-million: no cross-engine double rounding
       CAST((est.cms_estimate - exact.exact_size) * 1000000
            // exact.exact_size AS BIGINT) AS rel_error_ppm
FROM exact, est
"""


def _jcms_sketch(df: DataFrame, key: str) -> DataFrame:
    """Spark: (r, bucket, counter) CMS of df[key]'s frequency vector."""
    wc = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("freq"))
    h = lambda r: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), F.col("k").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % JCMS_WIDTH
    )
    probes = wc.select(
        "freq",
        F.posexplode(F.array(*[h(r).cast("long") for r in range(JCMS_ROWS)])).alias(
            "r", "bucket"
        ),
    )
    return probes.groupBy("r", "bucket").agg(F.sum("freq").alias("counter"))


def build_join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    events = spread(table(spark, sf_dir, "events"), spark)
    sa = _jcms_sketch(orders.select(F.col("o_custkey").alias("k")), "k")
    sb = _jcms_sketch(events.select(F.col("user_id").alias("k")), "k")
    ip = (
        sa.join(F.broadcast(sb.withColumnRenamed("counter", "cb")), ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("counter") * F.col("cb")).alias("ip"))
    )
    est = ip.agg(F.min("ip").alias("cms_estimate"))
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    exact = (
        a.join(b, "k")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("exact_size"))
    )
    over_ppm = (F.col("cms_estimate") - F.col("exact_size")) * F.lit(1_000_000)
    # exact integer floor-division (both operands non-negative)
    ppm = ((over_ppm - over_ppm % F.col("exact_size")) / F.col("exact_size")).cast(
        "long"
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_size")).alias("overestimate"),
        ppm.alias("rel_error_ppm"),
    )


register(
    "join_size_estimate_cms",
    oracle=JOIN_SIZE_ORACLE,
    doc="Join-cardinality estimation from per-side Count-Min sketches "
    "(min-over-rows inner product, never underestimates): two key-"
    "frequency vectors compress to D*W counter grids, estimate computed "
    "without executing the join; exact size reported alongside for "
    "self-measurement.",
    tags=("sketch", "join", "evaluation", "scale"),
)(build_join_size_estimate_cms)
