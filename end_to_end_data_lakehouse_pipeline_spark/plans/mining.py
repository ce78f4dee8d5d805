"""Frequency mining, n-gram language-model scoring, autocorrelation, and
link analysis.

Extends the engine's LLM-data-pipeline surface (SURVEY.md §2 extensions)
with four operator families a 100 TB corpus run needs:

- **heavy_hitter_terms**: Misra-Gries two-phase heavy hitters. Phase 1 is
  a per-partition bounded-memory sketch (<= CAP counters regardless of
  partition size — the mergeable-summaries reduction); phase 2 exactly
  recounts only the candidate union (bounded by partitions x CAP) and
  applies the exact threshold. The final filter makes the result EXACT:
  the sketch only needs the superset guarantee, which Misra-Gries provides
  (any term with partition frequency > n_p/CAP survives; by pigeonhole any
  global heavy hitter is heavy in some partition).
- **doc_lm_perplexity**: bigram language model with add-one smoothing
  trained on the corpus, then each document scored by perplexity — the
  CCNet-style quality-filtering signal. Log-probabilities are quantized to
  exact integers before the per-doc sum (parity.py rationale), so the
  result is order-independent.
- **revenue_autocorrelation**: ACF of the daily-revenue series at lags
  1/7/30 from exact integer-cents sufficient statistics (decimal(38,0)
  sums guard the product-of-cents overflow at warehouse scale).
- **pagerank_copurchase**: power-iteration PageRank on the support-bounded
  co-purchase graph — the second iterative operator family next to
  k-means (rows-only check: iterative, not SQL-expressible).

Reference anchor: the warehouse layer's product-analytics MVs
(clickhouse_init/04_materialized_views.sql) motivate the frequency and
graph families; the corpus ops extend spark/batch_gold.py-style rollups to
LLM-data curation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.iterate import free_checkpoint
from .registry import register
from .text import _sql_tokens, tokens_col

# ---------------------------------------------------------------------------
# heavy_hitter_terms — exact heavy hitters (freq * K > n_tokens) via a
# Misra-Gries candidate phase + exact recount of the bounded candidate set.
# ---------------------------------------------------------------------------

HH_K = 200  # heavy hitter = term carrying > 1/K of all token mass
MG_CAP = 1000  # per-partition counter budget (>= HH_K with margin)

HEAVY_HITTER_ORACLE = f"""
WITH tok AS (
    SELECT lower(unnest({_sql_tokens()})) AS term FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS freq,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_tokens FROM tot), 6) AS share
FROM tok
GROUP BY term
HAVING COUNT(*) * {HH_K} > (SELECT n_tokens FROM tot)
"""


def mg_partition_fn(cap: int):
    """Bounded-memory Misra-Gries over a partition's term stream.

    Returns a nested closure (pickled by value, so executors never need
    this package importable). Batched form: merge each Arrow batch's
    value_counts into the counter map; when the map exceeds ``cap``,
    subtract the (cap+1)-th largest count from every counter and drop the
    non-positive ones. Each such decrement removes >= cap+1 units per unit
    subtracted, so the total undercount of any term is <= n_p/(cap+1) —
    every term with partition share > 1/cap survives (the
    mergeable-summaries bound).
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > cap:
                d = sorted(counters.values(), reverse=True)[cap]
                counters = {t: c - d for t, c in counters.items() if c > d}
        yield pd.DataFrame({"term": list(counters.keys()) or []}, dtype="object")

    return mg


def build_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    tok = docs.select(F.explode(tokens_col()).alias("t")).select(
        F.lower("t").alias("term")
    )
    # Phase 1: candidate sketch — bounded memory per partition, output
    # bounded by (#partitions x MG_CAP) rows total.
    cand = tok.mapInPandas(mg_partition_fn(MG_CAP), schema="term string").distinct()
    # Phase 2: exact recount of candidates only. The candidate set is
    # bounded by construction -> broadcast is size-safe at any scale.
    # NOTE (r12, measured and rejected): replacing the two recount
    # passes with a single-slot-persisted full term-frequency table
    # measured 1.9x SLOWER at sf0.1 and 2.4x at 10x — the full-vocabulary
    # aggregate + cache round-trip costs more than two cheap tokenize
    # passes (one of which is a broadcast-semi-joined recount).
    tot = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    counted = (
        tok.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counted.crossJoin(F.broadcast(tot))
        # integer threshold compare — no float division on the filter path
        .filter(F.col("freq") * HH_K > F.col("n_tokens"))
        .select(
            "term",
            "freq",
            F.round(F.col("freq").cast("double") / F.col("n_tokens"), 6).alias(
                "share"
            ),
        )
    )


register(
    "heavy_hitter_terms",
    oracle=HEAVY_HITTER_ORACLE,
    doc=f"Exact heavy hitters (share > 1/{HH_K}) via per-partition "
    "Misra-Gries candidates + exact recount of the bounded candidate "
    "union — never a full-vocabulary shuffle of rare terms.",
    tags=("text", "llm", "sketch"),
)(build_heavy_hitter_terms)


# ---------------------------------------------------------------------------
# doc_lm_perplexity — corpus-trained bigram LM with add-one smoothing;
# per-document perplexity as a quality-filtering signal.
# ---------------------------------------------------------------------------

_LOGP_SCALE = 1_000_000

_BIGRAM_BASE_SQL = f"""
    SELECT doc_id,
           lower(unnest({_sql_tokens()})) AS term,
           generate_subscripts({_sql_tokens()}, 1) AS pos
    FROM documents
"""

LM_PERPLEXITY_ORACLE = f"""
WITH e AS ({_BIGRAM_BASE_SQL}),
big AS (
    SELECT doc_id, term AS w1,
           LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM e
),
bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM e),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bi FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_uni FROM bg GROUP BY w1),
scored AS (
    SELECT bg.doc_id,
           CAST(ROUND(ln(CAST(c2.c_bi + 1 AS DOUBLE)
                         / (c1.c_uni + (SELECT v FROM vocab)))
                      * {_LOGP_SCALE}, 0) AS BIGINT) AS lp_q
    FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
            JOIN c1 ON bg.w1 = c1.w1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(exp(-(CAST(SUM(lp_q) AS DOUBLE) / {_LOGP_SCALE}) / COUNT(*)), 4)
           AS perplexity
FROM scored GROUP BY doc_id
"""


def build_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    e = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "t")
    ).select("doc_id", "pos", F.lower("t").alias("term"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = e.select(
        "doc_id",
        F.col("term").alias("w1"),
        F.lead("term").over(wdoc).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    vocab = e.agg(F.countDistinct("term").alias("v"))
    # NOTE (r12, measured and rejected): restructuring around a
    # single-slot-persisted per-doc bigram tally (c1 derived from c2,
    # scoring join on distinct per-doc bigrams with multiplicity)
    # measured 2.2x SLOWER at sf0.1 and 1.4x at 10x — within-doc bigrams
    # are nearly all distinct in this corpus, so the tally is
    # instance-sized and the extra aggregate + cache round-trip buys
    # nothing. Kept in the original 3-reference shape.
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    # The count tables grow with the corpus -> shuffle joins on the bigram
    # key (no broadcast hints); AQE picks the strategy. Only the 1-row
    # vocab scalar broadcasts.
    joined = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    # ln of (identical-integer ratio) is the identical double on both
    # engines; quantizing before the sum makes the per-doc total exact.
    lp_q = F.round(
        F.log(
            (F.col("c_bi") + 1).cast("double") / (F.col("c_uni") + F.col("v"))
        )
        * _LOGP_SCALE,
        0,
    ).cast("long")
    scored = joined.select("doc_id", lp_q.alias("lp_q"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.exp(
                -(F.sum("lp_q").cast("double") / _LOGP_SCALE)
                / F.count(F.lit(1))
            ),
            4,
        ).alias("perplexity"),
    )


register(
    "doc_lm_perplexity",
    oracle=LM_PERPLEXITY_ORACLE,
    doc="Per-document perplexity under a corpus-trained add-one bigram LM "
    "(CCNet-style quality signal); quantized log-probs make the doc sums "
    "exact and order-independent.",
    tags=("text", "llm", "quality"),
)(build_doc_lm_perplexity)


# ---------------------------------------------------------------------------
# revenue_autocorrelation — ACF of daily revenue at lags 1/7/30 from exact
# integer-cents sufficient statistics.
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 7, 30)

REVENUE_ACF_ORACLE = f"""
WITH daily AS (
    SELECT o_orderdate AS d,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS x
    FROM orders GROUP BY o_orderdate
),
lagged AS (
    SELECT x,
           LAG(x, 1) OVER w AS x1,
           LAG(x, 7) OVER w AS x7,
           LAG(x, 30) OVER w AS x30
    FROM daily WINDOW w AS (ORDER BY d)
),
pairs AS (
    SELECT 1 AS lag_days, x, x1 AS y FROM lagged WHERE x1 IS NOT NULL
    UNION ALL
    SELECT 7, x, x7 FROM lagged WHERE x7 IS NOT NULL
    UNION ALL
    SELECT 30, x, x30 FROM lagged WHERE x30 IS NOT NULL
),
s AS (
    SELECT lag_days,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                AS DOUBLE) AS sxx,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DOUBLE) AS syy
    FROM pairs GROUP BY lag_days
)
SELECT CAST(lag_days AS INT) AS lag_days,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS autocorr
FROM s
"""


def build_revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("x")
    )
    # Single-partition window over the POST-AGGREGATION series (one row per
    # day — calendar-bounded, ~36.5k rows per century), not over the scan.
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
        F.lag("x", 30).over(w).alias("x30"),
    )
    pairs = lagged.select(
        F.expr("stack(3, 1, x, x1, 7, x, x7, 30, x, x30) as (lag_days, x, y)")
    ).filter(F.col("y").isNotNull())
    s = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        # cast to decimal BEFORE the multiply: daily-aggregated cents grow
        # with data volume, so the bigint product overflows at ~10x (the
        # exact failure the 10x rehearsal caught); decimal(19)x(19)->(38)
        # stays exact at any realistic scale
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("lag_days").cast("int").alias("lag_days"),
        n.cast("long").alias("n_pairs"),
        F.round(num / den, 6).alias("autocorr"),
    )


register(
    "revenue_autocorrelation",
    oracle=REVENUE_ACF_ORACLE,
    doc="Daily-revenue ACF at lags 1/7/30 from exact integer-cents "
    "sufficient statistics (decimal sums guard product overflow); "
    "lags unpivoted via stack into one grouped aggregate.",
    tags=("timeseries", "statistics", "exact"),
)(build_revenue_autocorrelation)


# ---------------------------------------------------------------------------
# pagerank_copurchase — power-iteration PageRank on the support-bounded
# co-purchase graph. Iterative, but FULLY ORACLED (VERDICT r7 task 2):
# ranks live on an exact integer grid (total mass = PR_SCALE, every
# update is integer multiply/floor-divide/sum — the quality_logit_fit
# bit-determinism discipline), so the 10 power iterations unroll as
# DuckDB CTEs with cross-engine-identical values; the double `rank`
# output is derived from the same integer on both sides.
# ---------------------------------------------------------------------------

PR_SUPPORT = 2
PR_DAMPING = 0.85  # applied as exact integer 85/100 — keep in sync below
PR_ITERATIONS = 10
PR_TOP = 20
PR_PARTITIONS = 8  # iteration-loop width: arc set is support-bounded
PR_SCALE = 10**16  # integer rank grid; 85*PR_SCALE stays well inside int64


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    und = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= PR_SUPPORT)
        .select("src", "dst")
    )
    # symmetrize: undirected graph as two directed arcs
    return und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def build_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration: rank' = (1-d)/N + d * sum(rank/degree over in-arcs),
    run entirely on an exact integer grid (total mass = PR_SCALE):

    - rank0 = PR_SCALE div N; contribution = rank div deg (integer floor
      division, identical in Spark `div` and DuckDB `//` for positive
      operands); damping = (85 * inbound) div 100. Every quantity is an
      exact int64 sum — bit-deterministic, partition-order invariant, and
      reproducible verbatim by the unrolled DuckDB oracle. Quantization
      loss is <= deg*1e-16 mass per node per round — PageRank semantics
      to 15+ significant digits.

    Every node has degree >= 1 (edges are symmetrized), so there is no
    dangling mass. Each iteration is one join + one aggregate on the
    support-bounded arc set; each round eagerly localCheckpoints (plan
    truncation keeps per-round planning O(1)) and free_checkpoint
    releases the superseded round's storage, so at most two rank tables
    are ever live (functions/iterate.py has the measured rationale).

    The support-pruned arc set is orders of magnitude smaller than the
    scan, so the iteration loop runs on a FEW partitions (task-launch
    overhead, not data volume, dominates a 10-round loop at the default
    shuffle width; size PR_PARTITIONS up with the frequent-pair count).
    """
    arcs = (
        _copurchase_edges(spark, sf_dir)
        .repartition(PR_PARTITIONS, "src")
        .cache()
    )
    arcs.count()  # materialize once before the loop
    degrees = arcs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        degrees.select(F.col("src").alias("node"), "deg")
        .repartition(PR_PARTITIONS, "node")
        .cache()
    )
    n_nodes = nodes.count()  # K-row driver scalar (S12 shape); warms the cache
    base = (15 * PR_SCALE) // (100 * n_nodes)  # exact (1-d)/N on the grid
    ranks = nodes.select(
        "node", "deg", F.lit(PR_SCALE // n_nodes).cast("long").alias("rank")
    ).localCheckpoint()
    for _ in range(PR_ITERATIONS):
        contribs = (
            arcs.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.expr("rank div deg").alias("w"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("inbound"))
        )
        superseded = ranks
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base).cast("long")
                    + F.expr("(85 * coalesce(inbound, 0L)) div 100")
                ).alias("rank"),
            )
            .localCheckpoint()  # eager: plan truncation keeps rounds O(1)
        )
        free_checkpoint(superseded)  # <=2 rank tables ever live (r3 leak)
    # top-k selected on the EXACT integer rank (ties broken by key), then
    # presented as the probability it encodes — the int -> double
    # conversion and the division by the exactly-representable PR_SCALE
    # are IEEE-identical across engines
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(PR_TOP)
        .select(
            F.col("node").alias("p_partkey"),
            (F.col("rank").cast("double") / F.lit(float(PR_SCALE))).alias("rank"),
        )
    )


def _pagerank_oracle(n_iter: int = PR_ITERATIONS) -> str:
    """DuckDB twin: the power iterations unrolled as CTEs (the
    bpe_train_merges / label_propagation unrolling pattern). All rank
    arithmetic is integer (`//` floor division == Spark `div` on
    positive operands), so every round's values are exactly equal."""
    rounds = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT d.node, d.deg,
           CAST((SELECT base FROM consts)
                + (85 * COALESCE(c.inbound, 0)) // 100 AS BIGINT) AS rank
    FROM deg d LEFT JOIN (
        SELECT a.dst AS node, SUM(r.rank // r.deg) AS inbound
        FROM arcs a JOIN {prev} r ON a.src = r.node
        GROUP BY a.dst
    ) c ON d.node = c.node
)"""
        )
        prev = f"r{k}"
    chain = ",\n".join(rounds)
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (
    SELECT src, dst FROM pairs GROUP BY src, dst
    HAVING COUNT(*) >= {PR_SUPPORT}
),
arcs AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM arcs GROUP BY src),
consts AS (
    SELECT CAST({PR_SCALE} // COUNT(*) AS BIGINT) AS r0val,
           CAST({15 * PR_SCALE} // (100 * COUNT(*)) AS BIGINT) AS base
    FROM deg
),
r0 AS (
    SELECT node, deg, (SELECT r0val FROM consts) AS rank FROM deg
),
{chain}
SELECT p_partkey, CAST(rank_i AS DOUBLE) / {float(PR_SCALE)} AS rank
FROM (
    SELECT node AS p_partkey, rank AS rank_i
    FROM {prev} ORDER BY rank DESC, node LIMIT {PR_TOP}
) t
"""


register(
    "pagerank_copurchase",
    oracle=_pagerank_oracle(),
    doc=f"PageRank (d={PR_DAMPING}, {PR_ITERATIONS} iterations) on the "
    "support-bounded symmetric co-purchase graph, on an exact integer "
    "rank grid (mass = 1e16) so the unrolled-CTE DuckDB oracle matches "
    "bit-for-bit; per-round localCheckpoint + free_checkpoint keeps at "
    "most two rank tables cached.",
    tags=("graph", "iterative"),
)(build_pagerank_copurchase)
