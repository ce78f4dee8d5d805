"""Value-distribution operators: exact equi-depth histogram and Pareto
frontier (skyline).

- **equidepth_histogram_orders** — exact NTILE(10) bucketing of orders by
  total price WITHOUT the single-partition global window Spark would use
  for ``ntile() OVER (ORDER BY ...)``: ranks come from
  :func:`functions.ranking.global_row_number` (range partition + offset
  fold), buckets from the closed-form NTILE formula. This is the scale
  path for "split 100 TB into equal-frequency shards"; the DuckDB oracle
  is the literal NTILE window, proving the rewrite implements exact SQL
  semantics.
- **pareto_frontier_parts** — skyline on (minimize price, maximize size).
  Two-phase: per-price max-size aggregate (the only data-sized shuffle),
  then a cumulative-max scan over the DISTINCT-price table (grid-bounded,
  orders of magnitude smaller than the fact — the window's single
  partition holds price-domain rows, not data rows), then a semi-join
  back to count parts sitting on each frontier point. Oracle mirrors it;
  a NOT EXISTS dominance probe in tests pins the skyline definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.ranking import global_row_number, ntile_from_rank
from .parity import exact_sum, o_sum
from .registry import register

N_BUCKETS = 10

EQUIDEPTH_ORACLE = f"""
WITH r AS (
    SELECT o_totalprice,
           CAST(NTILE({N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS bucket
    FROM orders
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total,
       {o_sum('o_totalprice', 'sum_total')}
FROM r
GROUP BY bucket
ORDER BY bucket
"""


def build_equidepth_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spread(table(spark, sf_dir, "orders"), spark)
    ranked, total = global_row_number(
        orders.select("o_orderkey", "o_totalprice"),
        order_cols=["o_totalprice", "o_orderkey"],
    )
    bucketed = ranked.withColumn(
        "bucket", ntile_from_rank(F.col("rn"), total, N_BUCKETS)
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
            exact_sum("o_totalprice", "sum_total"),
        )
        .orderBy("bucket")
    )


register(
    "equidepth_histogram_orders",
    oracle=EQUIDEPTH_ORACLE,
    doc="Exact equal-frequency histogram: distributed global row_number "
    "(range partition + per-partition offset fold — no single-partition "
    "window) + closed-form NTILE bucketing; oracle is DuckDB's literal "
    "NTILE(10) window, so the rewrite is proven against exact SQL "
    "semantics.",
    tags=("histogram", "window", "relational", "scale"),
)(build_equidepth_histogram_orders)


PARETO_ORACLE = """
WITH pm AS (
    SELECT p_retailprice AS price, MAX(p_size) AS best_size
    FROM part GROUP BY 1
),
fr AS (
    SELECT price, best_size FROM (
        SELECT price, best_size,
               MAX(best_size) OVER (
                   ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM pm
    )
    WHERE prev_max IS NULL OR prev_max < best_size
)
SELECT f.price,
       f.best_size AS size,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       MIN(p.p_partkey) AS min_partkey
FROM fr f
JOIN part p ON p.p_retailprice = f.price AND p.p_size = f.best_size
GROUP BY f.price, f.best_size
ORDER BY f.price
"""


def build_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import global_running_max

    part = spread(table(spark, sf_dir, "part"), spark)
    pm = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("best_size")
    )
    # exclusive running max over the price order, distributed (value-range
    # buckets + broadcast prefix max — no single-partition WindowExec even
    # though the distinct-price table is value-domain-sized)
    fr = global_running_max(pm, "price", "best_size", "prev_max").filter(
        F.col("prev_max").isNull() | (F.col("prev_max") < F.col("best_size"))
    )
    return (
        F.broadcast(fr.select("price", "best_size"))
        .join(
            part,
            (part.p_retailprice == F.col("price"))
            & (part.p_size == F.col("best_size")),
        )
        .groupBy("price", F.col("best_size").alias("size"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
        )
        .orderBy("price")
    )


register(
    "pareto_frontier_parts",
    oracle=PARETO_ORACLE,
    doc="Skyline (Pareto frontier) on minimize-price/maximize-size: "
    "per-price max aggregate (one data shuffle) + cumulative-max scan "
    "over the grid-bounded distinct-price table + broadcast semi-join "
    "back for per-point part counts. Dominance definition pinned by a "
    "NOT-EXISTS probe in tests.",
    tags=("relational", "window", "report"),
)(build_pareto_frontier_parts)
