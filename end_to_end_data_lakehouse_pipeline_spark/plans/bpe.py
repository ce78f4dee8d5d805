"""Distributed BPE merge training — the tokenizer-construction step of
an LLM data pipeline (Sennrich et al. 2016, public).

``token_count_bpe`` (plans/text.py) APPLIES a BPE-ish tokenizer; this
module TRAINS the merge table itself, the part that actually needs the
corpus: start from characters, repeatedly merge the most frequent
adjacent symbol pair. The distributed formulation:

- the corpus collapses to the DISTINCT-WORD frequency table once (the
  classic reduction — merge decisions depend only on word shapes and
  counts, so all further work is vocabulary-sized, not corpus-sized);
- each round: one weighted pair-count aggregate over the word table
  (map-side combined, shuffle bounded by distinct adjacent pairs), a
  1-row driver fetch of the winner (count DESC, pair ASC — total order,
  deterministic), and a map-side left-to-right greedy rewrite of every
  word's symbol array (an in-array ``F.aggregate`` fold — no shuffle);
- per-round ``localCheckpoint`` + ``free_checkpoint`` keeps planning
  O(1) and at most two word tables live (functions/iterate.py — the
  same discipline as PageRank/components).

Greedy left-to-right non-overlapping application matches the reference
BPE semantics (tests verify against a pure-Python implementation).
Fully oracled despite being iterative + driver-mediated: ``_bpe_oracle``
unrolls the merge rounds as DuckDB CTEs (greedy pair merge == string
replace over a double-delimited symbol encoding), and ``bpe_apply_merges``
round-trips the trained table back over the corpus under the same oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..functions.iterate import free_checkpoint
from .registry import register
from .text import _sql_tokens, tokens_col

N_MERGES = 10
END_OF_WORD = "_"  # appended marker so suffix merges differ from interior


def _merge_pair_col(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with
    the concatenated symbol — a sequential fold inside the array.

    KEPT AS THE REFERENCE SEMANTICS (and used by the pytest equivalence
    guard): train_bpe_merges now runs the same greedy merge as a literal
    string replace (r13); this fold is the executable definition it was
    proven against."""
    merged = left + right
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(acc["pend"].isNull(), F.struct(acc["out"].alias("out"), x.alias("pend")))
            .when(
                (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, acc0, step, fin)


def train_bpe_merges(words: DataFrame, n_merges: int = N_MERGES) -> list[dict]:
    """``words``: (word string, freq long) -> ordered merge table rows
    [{rank, left, right, merged, pair_count}]. Stops early when no
    adjacent pair repeats.

    r13 REWRITE (guide §1.2 per-task work + §4.1 prefer built-ins): the
    vocabulary is held as ONE STRING per word — every symbol wrapped as
    ``" sym "`` (a space can never occur inside a symbol: tokens are
    whitespace-split, so the delimiter is collision-proof, unlike the
    apply path's historical "|") — and each round's merge is a single
    codegen'd literal ``replace`` of ``" a  b "`` with ``" ab "``.
    Leftmost non-overlapping literal replacement is EXACTLY the greedy
    left-to-right fold (neither rescans replaced output; matches cannot
    share characters because every symbol carries its own delimiters),
    so the merge trajectory is identical — asserted against the old
    fold implementation on the full corpus before the swap. The old
    shape built a ~100-node interpreted ``aggregate`` fold expression
    and a fresh localCheckpoint EVERY round: 10 rounds of (fold-plan
    compile + checkpoint job + TakeOrdered job) measured 2.5-2.6 s at
    sf0.1 vs 1.5-1.9 s for the replace chain (one base checkpoint, ONE
    job per round). The chained-replace plan grows by one tiny replace
    node per round — bounded by the registered N_MERGES=10; a
    production-size merge count would re-checkpoint every ~dozens of
    rounds to keep the re-replace work linear."""
    base = words.select(
        F.array_join(
            F.transform(
                F.split(F.concat(F.col("word"), F.lit(END_OF_WORD)), ""),
                lambda c: F.concat(F.lit(" "), c, F.lit(" ")),
            ),
            "",
        ).alias("s"),
        F.col("freq"),
    ).localCheckpoint()
    merges: list[dict] = []
    s = F.col("s")
    for rank in range(1, n_merges + 1):
        cur = base.select(s.alias("cur"), F.col("freq"))
        # back to the symbol array: strip the outer delimiters, split on
        # the doubled inner delimiter — pure codegen string ops
        arr = F.split(F.expr("substring(cur, 2, length(cur) - 2)"), "  ")
        pairs = (
            cur.select(
                F.posexplode(F.slice(arr, 1, F.size(arr) - 1)).alias("i", "a"),
                arr.alias("arr"),
                F.col("freq"),
            )
            .select(
                F.col("a"),
                F.element_at(F.col("arr"), F.col("i") + 2).alias("b"),
                F.col("freq"),
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(2).collect()
        if not top or top[0]["n"] < 2:
            break
        w = top[0]
        merges.append(
            {
                "rank": rank,
                "left": w["a"],
                "right": w["b"],
                "merged": w["a"] + w["b"],
                "pair_count": int(w["n"]),
            }
        )
        s = F.replace(
            s,
            F.lit(f" {w['a']}  {w['b']} "),
            F.lit(f" {w['a']}{w['b']} "),
        )
    free_checkpoint(base)
    return merges


def build_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    words = (
        docs.select(F.explode(tokens_col()).alias("w"))
        .select(F.lower("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    rows = train_bpe_merges(words)
    schema = "rank long, left string, right string, merged string, pair_count long"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def _bpe_oracle(n_merges: int = N_MERGES) -> str:
    """DuckDB twin: the ``n_merges`` greedy rounds unrolled as CTEs (the
    same unrolling trick as label_propagation_communities' LPA rounds).

    Greedy left-to-right non-overlapping pair merging is expressed as a
    string ``replace``: each word's symbol array is encoded as a
    double-delimited string ``||s1||s2||...||``, and merging pair (a, b)
    is ``replace(s, '|a||b|', '|ab|')`` — SQL replace scans left to
    right and resumes after each replacement, which is exactly BPE's
    greedy application order (overlaps like [a,a,a] -> [aa, a] included,
    because the consumed trailing delimiter blocks the overlap).
    """
    parts = [
        f"""
words AS (
    SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT lower(unnest({_sql_tokens()})) AS word FROM documents
    ) GROUP BY word
),
s0 AS (
    SELECT '||' || array_to_string(string_split(word || '{END_OF_WORD}', ''), '||') || '||' AS s,
           freq
    FROM words
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""
p{k} AS (
    SELECT a, b, sum(freq)::BIGINT AS n FROM (
        SELECT list_extract(l, i) AS a, list_extract(l, i + 1) AS b, freq FROM (
            SELECT string_split(trim(s, '|'), '||') AS l, freq,
                   unnest(generate_series(1, len(string_split(trim(s, '|'), '||')) - 1)) AS i
            FROM s{k - 1}
        )
    ) GROUP BY a, b
),
w{k} AS (SELECT a, b, n FROM p{k} ORDER BY n DESC, a ASC, b ASC LIMIT 1),
s{k} AS (
    SELECT CASE WHEN w.n >= 2
                THEN replace(t.s, '|' || w.a || '||' || w.b || '|', '|' || w.a || w.b || '|')
                ELSE t.s END AS s,
           t.freq
    FROM s{k - 1} t, w{k} w
)"""
        )
    winners = "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS rank, a AS \"left\", b AS \"right\", a || b AS merged,"
        f" n AS pair_count FROM w{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"\nSELECT * FROM (\n{winners}\n) WHERE pair_count >= 2"
    )


register(
    "bpe_train_merges",
    oracle=_bpe_oracle(),
    doc=f"Train {N_MERGES} BPE merges on the corpus: distinct-word freq "
    "reduction, per-round weighted pair-count agg + deterministic winner "
    "+ in-array greedy rewrite (localCheckpoint/free_checkpoint rounds).",
    tags=("text", "llm", "iterative", "tokenizer"),
)(build_bpe_train_merges)


# ---------------------------------------------------------------------------
# bpe_apply_merges — the APPLY side of the tokenizer round-trip: run the
# merge table bpe_train_merges produces back over the corpus and report
# per-document token counts before/after. Application uses the same
# delimiter-exact string-replace encoding as the training oracle (greedy
# left-to-right non-overlapping == replace's scan-resume semantics), so
# the DuckDB twin re-derives the merges with the training CTEs and
# applies them with an identical replace chain — the full train->apply
# loop is differentially verified. Scale shape: merges apply to the
# DISTINCT-WORD table (vocabulary-sized, the classic reduction); per-doc
# counts come from one explode + equi-join + sum.
# ---------------------------------------------------------------------------


def _apply_oracle(n_merges: int = N_MERGES) -> str:
    train = _bpe_oracle(n_merges)
    ctes = train[len("WITH ") : train.rindex("\nSELECT * FROM")]
    expr = "ws.s"
    for k in range(1, n_merges + 1):
        expr = (
            f"CASE WHEN w{k}.n >= 2 THEN "
            f"replace({expr}, '|' || w{k}.a || '||' || w{k}.b || '|', "
            f"'|' || w{k}.a || w{k}.b || '|') ELSE {expr} END"
        )
    joins = " ".join(f"LEFT JOIN w{k} ON TRUE" for k in range(1, n_merges + 1))
    return f"""WITH {ctes},
vocab AS (
    SELECT word, freq,
           '||' || array_to_string(string_split(word || '{END_OF_WORD}', ''), '||') || '||' AS s
    FROM words
),
applied AS (
    SELECT ws.word,
           len(string_split(trim({expr}, '|'), '||')) AS n_sym,
           len(ws.word) + 1 AS n_chr
    FROM vocab ws {joins}
),
doc_words AS (
    SELECT doc_id, lower(unnest({_sql_tokens()})) AS word FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(a.n_chr) AS BIGINT) AS n_char_tokens,
       CAST(SUM(a.n_sym) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(a.n_chr) AS DOUBLE) / SUM(a.n_sym), 6) AS compression
FROM doc_words d JOIN applied a ON d.word = a.word
GROUP BY d.doc_id"""


def build_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    doc_words = docs.select(
        "doc_id", F.explode(tokens_col()).alias("w")
    ).select("doc_id", F.lower("w").alias("word"))
    words = doc_words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    merges = train_bpe_merges(words)
    s = F.concat(
        F.lit("||"),
        F.array_join(F.split(F.concat(F.col("word"), F.lit(END_OF_WORD)), ""), "||"),
        F.lit("||"),
    )
    for m in merges:  # greedy application via literal replace, rank order
        s = F.replace(
            s,
            F.lit("|" + m["left"] + "||" + m["right"] + "|"),
            F.lit("|" + m["merged"] + "|"),
        )
    applied = words.select(
        "word",
        F.size(
            F.split(F.regexp_replace(s, r"^\|+|\|+$", ""), r"\|\|")
        ).alias("n_sym"),
        (F.length("word") + 1).alias("n_chr"),
    )
    return (
        doc_words.join(applied, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_chr").cast("long").alias("n_char_tokens"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_chr").cast("double") / F.sum("n_sym"), 6
            ).alias("compression"),
        )
    )


register(
    "bpe_apply_merges",
    oracle=_apply_oracle(),
    doc=f"Apply the trained {N_MERGES}-merge BPE table back to the corpus "
    "(vocabulary-sized application via delimiter-exact greedy replace) "
    "and report per-doc char-level vs BPE token counts — the train->apply "
    "tokenizer round-trip, fully differential.",
    tags=("text", "llm", "tokenizer"),
)(build_bpe_apply_merges)
