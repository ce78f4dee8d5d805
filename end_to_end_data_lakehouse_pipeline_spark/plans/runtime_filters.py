"""Runtime-filter operators: Bloom-filter semi-join pruning in pure
Catalyst expressions.

At 100 TB the classic scan-reduction move is a runtime Bloom filter:
build an ~8 KB bit set over the (selective) dim keys, broadcast IT
instead of the dim, and drop non-matching fact rows before the shuffle
— Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` does
exactly this inside the optimizer for shuffle joins, and the reference's
warehouse engine gets the same effect from ClickHouse set indexes. The
internal `bloom_filter_agg`/`might_contain` expressions are not in the
public function registry, so this module builds the same structure from
PUBLIC Catalyst primitives only — which also makes the mechanics
auditable:

- build: explode each dim key into ``N_SEEDS`` bit positions
  (``pmod(xxhash64(key, seed), 64*N_WORDS)``), groupBy word index,
  ``bit_or`` the masks -> one map<word, bits> row (< N_WORDS entries,
  bounded bytes regardless of dim size — that is the whole point).
- probe: 3 map lookups + bitwise ANDs per fact row, all JVM-side
  whole-stage-codegen expressions; no UDF, no driver collect.
- exactness: the Bloom pass only PREFILTERS (false positives pass); an
  exact semi-join on the survivors removes them, so the registered
  result is exactly the plain semi-join — the DuckDB oracle proves it
  and thereby bounds the Bloom implementation's false-NEGATIVE rate at
  zero (a single dropped true match would change the totals).

Local note: at test scale the dim itself is broadcastable, so this
plan is not FASTER here — it demonstrates (and oracle-verifies) the
pattern that wins when the dim is 10^9 keys and only the 8 KB filter
fits in a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .parity import o_sum
from .registry import register

N_WORDS = 1024  # 64 Kibit filter
N_SEEDS = (0x9E37, 0x85EB, 0xC2B2)  # deterministic hash family


def _pos_sql(key: str, seed: int) -> str:
    """SQL text for one hash-family bit position. TEXTUALLY shared by
    build and probe so the seed literal's TYPE (bigint) is identical on
    both sides — xxhash64 of int vs bigint are different hashes."""
    return f"pmod(xxhash64({key}, cast({seed} as bigint)), {N_WORDS * 64})"


def bloom_build(dim_keys: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame (`bf`: map<long, long>) — the Bloom bit set over
    ``dim_keys[key]``. Size is bounded by N_WORDS entries no matter how
    many keys went in."""
    pos = dim_keys.select(
        F.explode(
            F.array(*[F.expr(_pos_sql(key, s)) for s in N_SEEDS])
        ).alias("p")
    )
    words = (
        pos.select(
            F.expr("cast(p div 64 as long)").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bf")
    )


def bloom_probe(fact: DataFrame, bf: DataFrame, key: str) -> DataFrame:
    """Fact rows passing the Bloom membership test (superset of the true
    matches). ``bf`` is broadcast — the fact side never shuffles here;
    the checks are plain codegen expressions (map lookup + AND)."""
    out = fact.crossJoin(F.broadcast(bf))
    cond = F.lit(True)
    for s in N_SEEDS:
        p = _pos_sql(key, s)
        word = F.coalesce(
            F.element_at(F.col("bf"), F.expr(f"cast(({p}) div 64 as long)")),
            F.lit(0).cast("long"),
        )
        mask = F.expr(f"shiftleft(1L, cast(pmod({p}, 64) as int))")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return out.filter(cond).drop("bf")


BLOOM_PREJOIN_ORACLE = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       {o_sum('l_extendedprice', 'revenue')}
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
GROUP BY l_returnflag
"""


def build_bloom_prejoin_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select(F.col("p_partkey").cast("long").alias("p_partkey"))
    )
    fact = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("l_partkey"),
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
    )
    bf = bloom_build(dim, "p_partkey")
    pre = bloom_probe(fact, bf, "l_partkey")
    exact = pre.join(
        dim.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("revenue"),
    )


register(
    "bloom_prejoin_lineitem",
    oracle=BLOOM_PREJOIN_ORACLE,
    doc="Runtime Bloom-filter semi-join pruning in pure Catalyst "
    "expressions (bounded map<word,bits> broadcast + 3 codegen map "
    "lookups per row, exact semi-join removes false positives); result "
    "equals the plain IN-subquery semi-join.",
    tags=("join", "runtime-filter", "scale"),
)(build_bloom_prejoin_lineitem)
