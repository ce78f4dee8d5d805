"""Token-level repeated-span analysis — the "duplicate text fraction"
curation signal.

Document-level dedup (plans/dedup.py) misses the dominant duplication
mode in web corpora: long VERBATIM SPANS (boilerplate, licenses, quoted
passages) embedded in otherwise-distinct documents. Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022,
public), show removing repeated ~50-token spans beats document-level
dedup; the tractable distributed formulation is the positional-n-gram
reduction used here (their ExactSubstr via suffix arrays is
single-machine):

- every K-token positional gram of every doc (position kept, NOT
  distinct — the same gram twice in one doc is two occurrences),
- a gram is a *repeated span* if it appears in >= 2 distinct docs,
- a token is *covered* if any repeated gram's window [pos, pos+K-1]
  contains it; per doc: covered-token count and fraction.

Every step is linear shuffles on (gram) then (doc_id): gram counting is
a hash aggregate with map-side combine; coverage is an equi-join of
occurrences against the repeated-gram set followed by a bounded K-way
position explode and per-doc distinct. No driver state, no caps — at
100 TB the gram-count aggregate is the same shape as term_frequencies.
The oracle reproduces the whole pipeline in DuckDB (positional grams ->
cross-doc counts -> window union) — exact integer counts, one final
bit-stable division.

Shuffle width (VERDICT r7 task 8): the raw gram STRING (K tokens, ~300
bytes at prod K=50) never travels through a shuffle — every gram is
fingerprinted to a 16-hex-char md5 prefix (``gram_id_col``) right after
the explode, before any groupBy/join. 64-bit fingerprints are the
standard exact-substring-dedup practice (Lee et al. pipelines hash
grams); at ~1e11 grams the birthday estimate is a few hundred spurious
gram merges corpus-wide — noise against the dedup signal — and the
oracle applies the identical md5 prefix, so cross-engine equality is
unaffected. span_top_repeats keeps the raw gram: the report's OUTPUT is
the gram text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register
from .text import _sql_tokens, tokens_col

SPAN_K = 5  # tokens per span gram (testdata docs are short; prod ~50)

# Single-slot cache for span_dedup_rewrite's gram-instance table: the
# tokenize + pos_grams + md5 gram-id projection is its expensive
# subtree, referenced THREE times (the grams aggregate + both rep
# consumers). Measured r12: 0.91x at sf0.1 AND at 10x in clean 5-pass
# windows. duplicate_span_coverage references g only twice and measured
# WORSE cached — it stays uncached (note at its builder).
# Helper-default storage level (MEMORY_AND_DISK_DESER, the no-arg
# persist() default — ADVICE r12: the explicit MEMORY_AND_DISK constant
# is the SERIALIZED variant and silently differed from the other
# single-slot caches): the table is gram-instance-sized, so eviction
# degrades to recompute, never OOM.
_SPAN_G_CACHE: list[DataFrame] = []


def _cache_span_grams(df: DataFrame) -> DataFrame:
    from .workspace import single_slot_persist

    return single_slot_persist(_SPAN_G_CACHE, df)


def pos_grams_col(toks: Column, k: int = SPAN_K) -> Column:
    """POSITIONAL k-gram array: element i (0-based) is the gram starting
    at token i. Same slice+zip_with formulation as dedup.shingles_col
    (avoids Catalyst re-evaluating the tokenizer per element) but keeps
    duplicates and order — position IS the payload here."""
    n = F.size(toks)
    m = n - (k - 1)
    grams = F.slice(toks, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def _sql_pos_grams(toks: str, k: int = SPAN_K) -> str:
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" if j else f"{toks}[i]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}), i -> {parts}) "
        f"ELSE [] END"
    )


def gram_id_col(gram: Column) -> Column:
    """16-hex-char (64-bit) md5 prefix of a gram — the value that is
    allowed into shuffles in place of the K-token string."""
    return F.substring(F.md5(gram), 1, 16)


def _sql_gram_id(gram: str) -> str:
    return f"substr(md5({gram}), 1, 16)"


DUPLICATE_SPAN_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
g AS (
    SELECT doc_id,
           unnest(generate_series(1, len(toks) - {SPAN_K - 1})) AS pos,
           unnest(list_transform({_sql_pos_grams('toks')},
                                 x -> {_sql_gram_id('x')})) AS gid
    FROM t WHERE len(toks) >= {SPAN_K}
),
rep AS (
    SELECT gid FROM g GROUP BY gid HAVING COUNT(DISTINCT doc_id) >= 2
),
cov AS (
    SELECT DISTINCT doc_id, cp FROM (
        SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + {SPAN_K - 1})) AS cp
        FROM g JOIN rep ON g.gid = rep.gid
    )
),
covn AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       COALESCE(covn.n_covered, 0) AS n_covered,
       CASE WHEN len(t.toks) > 0
            THEN ROUND(CAST(COALESCE(covn.n_covered, 0) AS DOUBLE) / len(t.toks), 6)
            ELSE 0.0 END AS dup_fraction
FROM t LEFT JOIN covn ON t.doc_id = covn.doc_id
"""


def build_duplicate_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    base = docs.select("doc_id", tokens_col().alias("toks"))
    # NOTE (r12, measured and rejected): single-slot-persisting g here
    # (it is referenced twice: rep mining + coverage join) measured 1.13x
    # SLOWER at sf0.1 and a wash (0.97) at 10x in clean 5-pass windows —
    # with only two references, the gram-instance cache's write+read
    # traffic costs more than one recompute. Contrast span_dedup_rewrite
    # below, where g feeds THREE consumers and the same cache wins at
    # both scales.
    g = base.select(
        "doc_id", F.posexplode(pos_grams_col(F.col("toks"))).alias("pos0", "gram")
    ).select("doc_id", "pos0", gram_id_col(F.col("gram")).alias("gid"))
    rep = (
        g.groupBy("gid")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gid")
    )
    cov = (
        g.join(rep, "gid")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos0"), F.col("pos0") + F.lit(SPAN_K - 1))
            ).alias("cp"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    return (
        base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_covered"), F.lit(0)).cast("long").alias("n_covered"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


register(
    "duplicate_span_coverage",
    oracle=DUPLICATE_SPAN_ORACLE,
    doc=f"Per-doc repeated-span coverage: {SPAN_K}-token positional grams "
    "appearing in >=2 docs, covered-token union per doc (the Lee et al. "
    "duplicate-text-fraction signal as linear gram shuffles).",
    tags=("dedup", "llm", "text", "spans"),
)(build_duplicate_span_coverage)


# ---------------------------------------------------------------------------
# chunk_exact_dedup — ALIGNED-window chunk dedup: split every doc into
# fixed CHUNK_W-token windows (the unit a training pipeline actually
# feeds the model), fingerprint each chunk, keep the first writer
# (min (doc_id, chunk_idx) lexicographically). Complements
# duplicate_span_coverage: spans find arbitrary-offset repetition, chunk
# dedup is the cheap aligned variant a packing pipeline applies right
# before tokenization — one md5 per chunk, one hash shuffle, no joins.
# ---------------------------------------------------------------------------

CHUNK_W = 8  # tokens per chunk (testdata docs are short; prod 512-2048)

CHUNK_DEDUP_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
c AS (
    SELECT doc_id,
           unnest(generate_series(0, CAST(ceil(len(toks) / {CHUNK_W}.0) AS BIGINT) - 1))
               AS chunk_idx,
           toks
    FROM t WHERE len(toks) > 0
),
f AS (
    SELECT doc_id, chunk_idx,
           md5(array_to_string(
               list_slice(toks, chunk_idx * {CHUNK_W} + 1,
                          chunk_idx * {CHUNK_W} + {CHUNK_W}), ' ')) AS fp,
           len(list_slice(toks, chunk_idx * {CHUNK_W} + 1,
                          chunk_idx * {CHUNK_W} + {CHUNK_W})) AS n_tokens
    FROM c
),
w AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY fp ORDER BY doc_id, chunk_idx) AS rn,
        CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
    FROM f
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, fp,
       CAST(n_tokens AS BIGINT) AS n_tokens, n_copies
FROM w WHERE rn = 1
"""


def build_chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_W))).cast("long")
    c = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    ).filter(F.size("toks") > 0)
    chunk = F.slice(
        F.col("toks"), (F.col("chunk_idx") * CHUNK_W + 1).cast("int"), CHUNK_W
    )
    f = c.select(
        "doc_id",
        "chunk_idx",
        F.md5(F.concat_ws(" ", chunk)).alias("fp"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    return (
        f.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(W.partitionBy("fp")))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_idx", "fp", "n_tokens", "n_copies")
    )


register(
    "chunk_exact_dedup",
    oracle=CHUNK_DEDUP_ORACLE,
    doc=f"Aligned {CHUNK_W}-token chunk dedup: md5 fingerprint per chunk, "
    "first-writer winner + copy count per fingerprint — one hash "
    "shuffle, the pre-tokenization packing-pipeline pass.",
    tags=("dedup", "llm", "text", "chunks"),
)(build_chunk_exact_dedup)


# ---------------------------------------------------------------------------
# span_top_repeats — the boilerplate REPORT: the most repeated K-token
# spans across the corpus, with distinct-doc counts. This is what a
# curation engineer actually reads before choosing removal thresholds
# (license headers, navigation chrome, quoted templates float to the
# top). Deterministic top-k: occurrences DESC, docs DESC, gram ASC.
# ---------------------------------------------------------------------------

TOP_REPEATS_K = 20

SPAN_TOP_REPEATS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
g AS (
    SELECT doc_id, unnest({_sql_pos_grams('toks')}) AS gram
    FROM t WHERE len(toks) >= {SPAN_K}
),
c AS (
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT gram, n_occurrences, n_docs
FROM c
ORDER BY n_occurrences DESC, n_docs DESC, gram ASC
LIMIT {TOP_REPEATS_K}
"""


def build_span_top_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    g = docs.select(
        "doc_id", F.explode(pos_grams_col(tokens_col())).alias("gram")
    )
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), F.desc("n_docs"), F.asc("gram"))
        .limit(TOP_REPEATS_K)
    )


register(
    "span_top_repeats",
    oracle=SPAN_TOP_REPEATS_ORACLE,
    doc=f"Top-{TOP_REPEATS_K} most repeated {SPAN_K}-token spans with "
    "distinct-doc counts (the boilerplate report; deterministic "
    "total-order top-k).",
    tags=("dedup", "llm", "text", "spans"),
)(build_span_top_repeats)


# ---------------------------------------------------------------------------
# span_dedup_rewrite — the exact-substring dedup REWRITE (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): where
# duplicate_span_coverage only reports repeated-span fractions, this emits
# the CLEANED corpus — every token position covered by a repeated span is
# dropped, except the positions of each span's single canonical occurrence
# (first writer: smallest (doc_id, start) over all its instances, the
# keep-one-copy rule). Repetition is counted over ALL instances (within-doc
# repeats dedup too, unlike the cross-doc-only coverage signal). All
# linear, stride-1 gram shuffles: gram agg -> canonical winner window ->
# covered/protected position explodes -> anti-join -> ordered reassembly.
# ---------------------------------------------------------------------------


SPAN_REWRITE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
g AS (
    SELECT doc_id,
           unnest(generate_series(1, len(toks) - {SPAN_K - 1})) AS pos,
           unnest(list_transform({_sql_pos_grams('toks')},
                                 x -> {_sql_gram_id('x')})) AS gid
    FROM t WHERE len(toks) >= {SPAN_K}
),
inst AS (
    SELECT doc_id, pos, gid,
           COUNT(*) OVER (PARTITION BY gid) AS n_inst,
           ROW_NUMBER() OVER (
               PARTITION BY gid ORDER BY doc_id, pos
           ) AS rk
    FROM g
),
rep AS (SELECT * FROM inst WHERE n_inst >= 2),
covered AS (
    SELECT DISTINCT doc_id,
           unnest(generate_series(pos, pos + {SPAN_K - 1})) AS cp
    FROM rep
),
protected AS (
    SELECT DISTINCT doc_id,
           unnest(generate_series(pos, pos + {SPAN_K - 1})) AS cp
    FROM rep WHERE rk = 1
),
dropped AS (
    SELECT c.doc_id, c.cp FROM covered c
    LEFT JOIN protected p ON c.doc_id = p.doc_id AND c.cp = p.cp
    WHERE p.doc_id IS NULL
),
toks AS (
    SELECT t.doc_id,
           unnest(generate_series(1, len(t.toks))) AS cp,
           unnest(t.toks) AS tok
    FROM t
),
kept AS (
    SELECT k.doc_id, k.cp, k.tok FROM toks k
    LEFT JOIN dropped d ON k.doc_id = d.doc_id AND k.cp = d.cp
    WHERE d.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(kn.n_kept, 0) AS BIGINT) AS n_dropped,
       COALESCE(kn.cleaned_text, '') AS cleaned_text
FROM t
LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY cp) AS cleaned_text
    FROM kept GROUP BY doc_id
) kn ON t.doc_id = kn.doc_id
"""


def build_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    base = docs.select("doc_id", tokens_col().alias("toks"))
    g = _cache_span_grams(
        base.select(
            "doc_id",
            F.posexplode(pos_grams_col(F.col("toks"))).alias("pos0", "gram"),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            gram_id_col(F.col("gram")).alias("gid"),
        )
    )
    # per-gram instance count + canonical first occurrence as ONE
    # map-side-combinable aggregate (no per-gram window: a degenerate
    # hyper-repeated gram — a billion-instance stopword run at corpus
    # scale — would funnel through a single row_number reducer; min on a
    # (doc_id, pos) struct combines in O(1) state per gram per task)
    grams = g.groupBy("gid").agg(
        F.count(F.lit(1)).alias("n_inst"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    rep = g.join(grams.filter(F.col("n_inst") >= 2), "gid")
    span_positions = F.explode(
        F.sequence(F.col("pos"), F.col("pos") + F.lit(SPAN_K - 1))
    ).alias("cp")
    covered = rep.select("doc_id", span_positions).distinct()
    protected = (
        rep.filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
        .select("doc_id", span_positions)
        .distinct()
    )
    dropped = covered.join(protected, ["doc_id", "cp"], "left_anti")
    toks = base.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("cp"), "tok")
    kept = toks.join(dropped, ["doc_id", "cp"], "left_anti")
    # ordered reassembly without a per-doc sort shuffle beyond the groupBy:
    # collect (cp, tok) structs, array_sort on cp, project the tokens
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("cp", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned_text"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


register(
    "span_dedup_rewrite",
    oracle=SPAN_REWRITE_ORACLE,
    doc=f"Exact-substring dedup rewrite (Lee et al. 2022): drop every "
    f"token covered by a repeated {SPAN_K}-token span except the span's "
    "canonical first occurrence; emits the cleaned corpus text. Linear "
    "stride-1 gram shuffles + anti-joins, no pairwise comparisons.",
    tags=("dedup", "llm", "text", "spans", "rewrite"),
)(build_span_dedup_rewrite)
