"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language-ID
(stopword-vocabulary heuristic), quality scoring (type-token ratio, length,
stopword ratios), token counting (whitespace + regex word tokenizer), and
document fingerprinting (normalized md5) — all pure Catalyst expressions
(higher-order array functions), zero Python UDFs, so they run JVM-side and
scale linearly with executors.

Cross-engine parity notes: token arrays are built with the same split +
empty-filter on both engines; all ratios are single divisions of identical
integers (bit-identical doubles, no rounding needed); composite scores are
parenthesized identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import spread, table
from .registry import register

# Shared stopword vocabularies (tiny on purpose — these are *heuristic*
# operators; swap in real lists in production).
EN_STOP = ("the", "a", "of", "and", "to", "in", "is")
ES_STOP = ("el", "la", "de", "y", "en", "es", "un")
DE_STOP = ("der", "die", "das", "und", "ist", "ein", "zu")
FR_STOP = ("le", "la", "de", "et", "est", "un", "dans")


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens with empties removed (cross-engine stable)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def _sql_tokens(expr: str = "text") -> str:
    """DuckDB twin of :func:`tokens_col`."""
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def _stop_count(toks: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*vocab)))


def _sql_stop_count(toks: str, vocab: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in vocab)
    return f"len(list_filter({toks}, t -> t IN ({inlist})))"


# ---------------------------------------------------------------------------
# text_stats — per-document token statistics.
# ---------------------------------------------------------------------------

TEXT_STATS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, source, n_chars, {_sql_tokens()} AS toks,
           regexp_extract_all(text, '[a-zA-Z]+') AS words
    FROM documents
)
SELECT
    doc_id,
    lang,
    source,
    n_chars,
    CAST(len(toks) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
    CAST(len(words) AS INTEGER) AS n_words,
    CAST(len(list_filter(toks, x -> length(x) >= 5)) AS INTEGER) AS n_long_tokens,
    CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_token,
    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio
FROM t
"""


def build_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    t = docs.withColumn("toks", tokens_col()).withColumn(
        "words", F.regexp_extract_all("text", F.lit("[a-zA-Z]+"), 0)
    )
    return t.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        F.size("words").alias("n_words"),
        F.size(F.filter("toks", lambda x: F.length(x) >= 5)).alias("n_long_tokens"),
        (F.col("n_chars").cast("double") / F.size("toks")).alias("chars_per_token"),
        (F.size(F.array_distinct("toks")).cast("double") / F.size("toks")).alias(
            "type_token_ratio"
        ),
    )


register(
    "text_stats",
    oracle=TEXT_STATS_ORACLE,
    doc="Per-document token statistics via higher-order array functions "
    "(LLM-pipeline extension; zero Python UDFs).",
    tags=("text", "llm"),
)(build_text_stats)


# ---------------------------------------------------------------------------
# lang_id_heuristic — stopword-vocabulary scoring with deterministic argmax.
# ---------------------------------------------------------------------------


def _lang_oracle() -> str:
    toks = _sql_tokens()
    return f"""
WITH t AS (
    SELECT doc_id, lang AS lang_label,
           {_sql_stop_count(toks, EN_STOP)} AS s_en,
           {_sql_stop_count(toks, ES_STOP)} AS s_es,
           {_sql_stop_count(toks, DE_STOP)} AS s_de,
           {_sql_stop_count(toks, FR_STOP)} AS s_fr,
           CAST(len({toks}) AS INTEGER) AS n_tokens
    FROM documents
)
SELECT
    doc_id,
    lang_label,
    CAST(s_en AS INTEGER) AS s_en,
    CAST(s_es AS INTEGER) AS s_es,
    CAST(s_de AS INTEGER) AS s_de,
    CAST(s_fr AS INTEGER) AS s_fr,
    CASE
        WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'unknown'
        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        WHEN s_de >= s_fr THEN 'de'
        ELSE 'fr'
    END AS lang_pred,
    CAST(GREATEST(s_en, s_es, s_de, s_fr) AS DOUBLE) / GREATEST(n_tokens, 1)
        AS lang_confidence
FROM t
"""


def build_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    t = docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        _stop_count(toks, EN_STOP).alias("s_en"),
        _stop_count(toks, ES_STOP).alias("s_es"),
        _stop_count(toks, DE_STOP).alias("s_de"),
        _stop_count(toks, FR_STOP).alias("s_fr"),
        F.size(toks).alias("n_tokens"),
    )
    pred = (
        F.when(
            (F.col("s_en") == 0) & (F.col("s_es") == 0) & (F.col("s_de") == 0)
            & (F.col("s_fr") == 0),
            "unknown",
        )
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_fr")), "es")
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
    )
    return t.select(
        "doc_id",
        "lang_label",
        "s_en",
        "s_es",
        "s_de",
        "s_fr",
        pred.alias("lang_pred"),
        (
            F.greatest("s_en", "s_es", "s_de", "s_fr").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("lang_confidence"),
    )


register(
    "lang_id_heuristic",
    oracle=_lang_oracle(),
    doc="Stopword-vocabulary language ID with deterministic argmax "
    "(LLM-pipeline extension).",
    tags=("text", "llm"),
)(build_lang_id_heuristic)


# ---------------------------------------------------------------------------
# doc_quality_score — composite quality heuristic (identically-parenthesized
# arithmetic on both engines → bit-identical doubles).
# ---------------------------------------------------------------------------

QUALITY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, n_chars, {_sql_tokens()} AS toks FROM documents
),
m AS (
    SELECT
        doc_id,
        n_chars,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        {_sql_stop_count('toks', EN_STOP)} AS n_stop
    FROM t
)
SELECT
    doc_id,
    n_tokens,
    CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1) AS ttr,
    LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score,
    CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1) AS stop_ratio,
    ((0.5 * (CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1)))
     + (0.3 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)))
     + (0.2 * (1.0 - (CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1))))
        AS quality_score,
    n_tokens >= 20 AND (CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1)) >= 0.3
        AS keep_for_training
FROM m
"""


def build_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    m = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        _stop_count(toks, EN_STOP).alias("n_stop"),
    )
    ttr = F.col("n_distinct").cast("double") / F.greatest("n_tokens", F.lit(1))
    len_score = F.least(F.col("n_chars").cast("double") / F.lit(500.0), F.lit(1.0))
    stop_ratio = F.col("n_stop").cast("double") / F.greatest("n_tokens", F.lit(1))
    return m.select(
        "doc_id",
        "n_tokens",
        ttr.alias("ttr"),
        len_score.alias("len_score"),
        stop_ratio.alias("stop_ratio"),
        (((F.lit(0.5) * ttr) + (F.lit(0.3) * len_score)) + (F.lit(0.2) * (F.lit(1.0) - stop_ratio))).alias(
            "quality_score"
        ),
        ((F.col("n_tokens") >= 20) & (ttr >= 0.3)).alias("keep_for_training"),
    )


register(
    "doc_quality_score",
    oracle=QUALITY_ORACLE,
    doc="Composite document-quality heuristic + training-set filter "
    "(LLM-pipeline extension).",
    tags=("text", "llm"),
)(build_doc_quality_score)


# ---------------------------------------------------------------------------
# doc_fingerprint — normalized content fingerprint (md5) + shingle count;
# the exact-dedup key (plans/dedup.py builds on this).
# ---------------------------------------------------------------------------

FINGERPRINT_ORACLE = f"""
WITH t AS (
    SELECT doc_id, n_chars,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           {_sql_tokens()} AS toks
    FROM documents
)
SELECT
    doc_id,
    fingerprint,
    substr(fingerprint, 1, 8) AS fingerprint_prefix,
    n_chars,
    CAST(len(toks) AS INTEGER) AS n_tokens,
    toks[1] AS first_token,
    toks[-1] AS last_token
FROM t
"""


def build_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    t = docs.select(
        "doc_id", "n_chars", fp.alias("fingerprint"), tokens_col().alias("toks")
    )
    return t.select(
        "doc_id",
        "fingerprint",
        F.substring("fingerprint", 1, 8).alias("fingerprint_prefix"),
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.element_at("toks", 1).alias("first_token"),
        F.element_at("toks", -1).alias("last_token"),
    )


register(
    "doc_fingerprint",
    oracle=FINGERPRINT_ORACLE,
    doc="Normalized md5 content fingerprint per document "
    "(LLM-pipeline exact-dedup key).",
    tags=("text", "llm", "dedup"),
)(build_doc_fingerprint)


# ---------------------------------------------------------------------------
# token_count_bpe — BPE-ish regex tokenization counts (SURVEY M5: token
# counting "whitespace + a BPE-ish regex"). The pattern splits words,
# numbers, and individual punctuation marks the way byte-pair pretokenizers
# do — kept lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree.
# ---------------------------------------------------------------------------

BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

TOKEN_COUNT_ORACLE = f"""
WITH t AS (
    SELECT doc_id, n_chars,
           {_sql_tokens()} AS ws_toks,
           regexp_extract_all(text, '{BPE_PATTERN}') AS bpe_toks,
           regexp_extract_all(text, '[0-9]+') AS num_toks,
           regexp_extract_all(text, '[^a-zA-Z0-9 ]') AS punct_toks
    FROM documents
)
SELECT
    doc_id,
    CAST(len(ws_toks) AS INTEGER) AS n_ws_tokens,
    CAST(len(bpe_toks) AS INTEGER) AS n_bpe_tokens,
    CAST(len(num_toks) AS INTEGER) AS n_number_tokens,
    CAST(len(punct_toks) AS INTEGER) AS n_punct_tokens,
    CAST(n_chars AS DOUBLE) / GREATEST(len(bpe_toks), 1) AS chars_per_bpe_token
FROM t
"""


def build_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    t = docs.select(
        "doc_id",
        "n_chars",
        F.size(tokens_col()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_number_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), 0)).alias(
            "n_punct_tokens"
        ),
    )
    return t.select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_tokens",
        "n_number_tokens",
        "n_punct_tokens",
        (
            F.col("n_chars").cast("double") / F.greatest("n_bpe_tokens", F.lit(1))
        ).alias("chars_per_bpe_token"),
    )


register(
    "token_count_bpe",
    oracle=TOKEN_COUNT_ORACLE,
    doc="BPE-style pretokenizer counts via lookahead-free regex, identical "
    "under Java regex and RE2 (LLM-pipeline extension).",
    tags=("text", "llm"),
)(build_token_count_bpe)


# ---------------------------------------------------------------------------
# term_frequencies — corpus-level top-k terms (explode -> count -> top-k).
# The canonical "what's in my 100 TB corpus" query: the explode fans out to
# rows (codegen), the count is partial+final hash agg (map-side combine
# collapses each executor's token stream before the shuffle), and the
# top-k is TakeOrderedAndProject — no global sort.
# ---------------------------------------------------------------------------

TERM_FREQ_K = 100

TERM_FREQ_ORACLE = f"""
WITH tok AS (
    SELECT lower(unnest({_sql_tokens()})) AS term FROM documents
)
SELECT term, COUNT(*) AS freq
FROM tok
GROUP BY term
ORDER BY freq DESC, term
LIMIT {TERM_FREQ_K}
"""


def build_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    tok = docs.select(F.explode(tokens_col()).alias("t")).select(
        F.lower("t").alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(TERM_FREQ_K)
    )


register(
    "term_frequencies",
    oracle=TERM_FREQ_ORACLE,
    doc="Corpus top-k term frequencies via explode + partial/final count + "
    "TakeOrderedAndProject (LLM-pipeline extension).",
    tags=("text", "llm", "topk"),
)(build_term_frequencies)


# ---------------------------------------------------------------------------
# doc_rolling_hash — order-sensitive Rabin-Karp polynomial fingerprint:
# fold over tokens of (acc*B + h(token)) mod P. Unlike the normalization
# md5 (doc_fingerprint), token ORDER changes this hash — the rolling-hash
# fingerprint SURVEY M5 names. h(token) = first 32 md5 bits (cross-engine
# via conv/strpos-nibble parse); B=31, P=1e9+7 keeps acc*B+h < 2^35,
# far from BIGINT overflow.
# ---------------------------------------------------------------------------

RH_B = 31
RH_P = 1_000_000_007

_RH_TOKEN_HASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 7), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(t), 1 + i, 1)) - 1 AS BIGINT) "
    "* (CAST(1 AS BIGINT) << (4 * (7 - i))))) AS BIGINT)"
)

ROLLING_HASH_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
h AS (
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           list_transform(toks, t -> {_RH_TOKEN_HASH_SQL} % {RH_P}) AS hs
    FROM t
)
SELECT
    doc_id,
    n_tokens,
    list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                (acc, x) -> (acc * {RH_B} + x) % {RH_P}) AS rolling_hash
FROM h
"""


def build_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    token_hash = (
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % RH_P
    )
    t = docs.select("doc_id", tokens_col().alias("toks"))
    h = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.transform("toks", token_hash).alias("hs"),
    )
    return h.select(
        "doc_id",
        "n_tokens",
        F.aggregate(
            "hs",
            F.lit(0).cast("long"),
            lambda acc, x: (acc * RH_B + x) % RH_P,
        ).alias("rolling_hash"),
    )


register(
    "doc_rolling_hash",
    oracle=ROLLING_HASH_ORACLE,
    doc="Order-sensitive Rabin-Karp rolling-hash document fingerprint "
    "(LLM-pipeline extension; fold via F.aggregate / list_reduce).",
    tags=("text", "llm", "fingerprint"),
)(build_doc_rolling_hash)


# ---------------------------------------------------------------------------
# user_gap_stats — grouped-map applyInPandas in the oracle-checked
# surface: per-user inter-event gap statistics computed in pandas (exact
# int64 epoch-micros; np.median's two-middle average equals DuckDB
# quantile_cont(0.5) on integers). The Arrow grouped-map path: each user
# group arrives as one pandas frame, work is vectorized, output one row.
# ---------------------------------------------------------------------------

USER_GAP_ORACLE = """
WITH ordered AS (
    SELECT user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
),
gaps AS (SELECT user_id, gap_us FROM ordered WHERE gap_us IS NOT NULL)
SELECT
    user_id,
    CAST(COUNT(*) AS BIGINT) AS n_gaps,
    CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
    CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
    quantile_cont(gap_us, 0.5) AS median_gap_us
FROM gaps
GROUP BY user_id
"""


def build_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    events = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns -> us
        gaps = np.diff(us)
        if len(gaps) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_gaps", "min_gap_us", "max_gap_us", "median_gap_us"]
            )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_gaps": [len(gaps)],
                "min_gap_us": [int(gaps.min())],
                "max_gap_us": [int(gaps.max())],
                "median_gap_us": [float(np.median(gaps))],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        stats,
        schema="user_id bigint, n_gaps bigint, min_gap_us bigint, "
        "max_gap_us bigint, median_gap_us double",
    )


register(
    "user_gap_stats",
    oracle=USER_GAP_ORACLE,
    doc="Per-user inter-event gap stats via grouped-map applyInPandas "
    "(Arrow per-group frames, vectorized numpy; SQL-window oracle).",
    tags=("text", "pandas", "window"),
)(build_user_gap_stats)


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-document top-k distinctive terms. tf and df are
# exact integer aggregates; the idf factor is the LINEAR rarity ratio N/df
# (an exact IEEE divide, bit-identical across engines) rather than log
# idf — java Math.log and DuckDB ln are each <=1ulp but not guaranteed the
# SAME ulp, which would poison an exact-hash comparison. Monotone in 1/df,
# so the ranking is the classic tf-idf ranking; the score column is
# documented as linear-idf. Scale shape: explode -> two hash aggregates
# (term-level df is a broadcast-size side; tf agg has map-side combine) ->
# per-doc window top-k.
# ---------------------------------------------------------------------------

TFIDF_K = 5

TFIDF_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, lower(unnest({_sql_tokens()})) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
               AS tfidf_linear,
           ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE)
                        * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
                        tf.term
           ) AS rnk
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf_linear, CAST(rnk AS INTEGER) AS rnk
FROM scored WHERE rnk <= {TFIDF_K}
"""


def build_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(table(spark, sf_dir, "documents"), spark)
    n_docs = docs.count()  # S12 scalar fetch (oracle's scalar subquery)
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("t")).select(
        "doc_id", F.lower("t").alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    score = F.col("tf").cast("double") * (
        F.lit(float(n_docs)) / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.join(df, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            score.alias("tfidf_linear"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= TFIDF_K)
    )


register(
    "tfidf_top_terms",
    oracle=TFIDF_ORACLE,
    doc=f"Per-document top-{TFIDF_K} tf-idf terms (linear rarity N/df — "
    "exact IEEE, cross-engine bit-identical; log-idf gives the same "
    "ranking); explode -> tf/df aggregates -> window top-k "
    "(LLM-pipeline extension).",
    tags=("text", "llm", "topk", "join"),
)(build_tfidf_top_terms)


# ---------------------------------------------------------------------------
# stratified_sample — per-language deterministic sampling: high-resource
# languages downsampled hard, low-resource kept — the data-mixing move
# every multilingual training pipeline makes. The sample decision is a
# pure per-row md5-bucket threshold (same literal CASE on both engines):
# reproducible, shuffle-free, join-free, and at 100 TB it composes with
# partition pruning (the filter pushes to the scan).
# ---------------------------------------------------------------------------

STRATA_PERMILLE = {"en": 200, "zh": 500, "es": 500, "fr": 500, "de": 500}
STRATA_DEFAULT = 1000  # unknown languages kept whole


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {p}" for lang, p in sorted(STRATA_PERMILLE.items())
    )
    return f"CASE lang {whens} ELSE {STRATA_DEFAULT} END"


STRATIFIED_ORACLE = f"""
WITH h AS (
    SELECT doc_id, lang, n_chars,
           CAST(list_sum(list_transform(generate_series(0, 7), i ->
               CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1 + i, 1)) - 1 AS BIGINT)
               * (CAST(1 AS BIGINT) << (4 * (7 - i))))) % 1000 AS BIGINT) AS bucket
    FROM documents
)
SELECT doc_id, lang, n_chars, bucket
FROM h
WHERE bucket < ({_strata_case_sql()})
"""


def build_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    threshold = F.lit(STRATA_DEFAULT)
    for lang, p in sorted(STRATA_PERMILLE.items()):
        threshold = F.when(F.col("lang") == lang, F.lit(p)).otherwise(threshold)
    return docs.select(
        "doc_id", "lang", "n_chars", bucket.alias("bucket")
    ).filter(F.col("bucket") < threshold)


register(
    "stratified_sample",
    oracle=STRATIFIED_ORACLE,
    doc="Per-language stratified sample via deterministic md5-bucket "
    "thresholds (en 20%, others 50%): reproducible, shuffle-free, filter "
    "pushes to the scan (LLM-pipeline extension).",
    tags=("text", "llm", "sampling"),
)(build_stratified_sample)


# ---------------------------------------------------------------------------
# text_normalize — canonical whitespace/case normalization, the first stage
# of every training-data text pipeline. The corpus is already clean, so the
# query deterministically dirties each doc (same expression both engines)
# and then normalizes it — the op is exercised for real, not as a no-op.
# ---------------------------------------------------------------------------

TEXT_NORMALIZE_ORACLE = """
WITH d AS (
    SELECT doc_id, '  ' || upper(text) || chr(9) || ' END  ' AS dirty
    FROM documents
)
SELECT
    doc_id,
    lower(trim(regexp_replace(dirty, '\\s+', ' ', 'g'))) AS normalized,
    CAST(length(dirty) AS INTEGER) AS n_chars_before,
    CAST(length(lower(trim(regexp_replace(dirty, '\\s+', ' ', 'g')))) AS INTEGER)
        AS n_chars_after
FROM d
"""


def build_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure Catalyst string expressions (codegen, zero Python) — scales
    linearly; no shuffle at all (map-only plan)."""
    docs = spread(table(spark, sf_dir, "documents"), spark)
    dirty = F.concat(F.lit("  "), F.upper(F.col("text")), F.lit("\t END  "))
    norm = F.lower(F.trim(F.regexp_replace(dirty, r"\s+", " ")))
    return docs.select(
        "doc_id",
        norm.alias("normalized"),
        F.length(dirty).cast("int").alias("n_chars_before"),
        F.length(norm).cast("int").alias("n_chars_after"),
    )


register(
    "text_normalize",
    oracle=TEXT_NORMALIZE_ORACLE,
    doc="Whitespace/case normalization over a deterministically-dirtied "
    "corpus: lower + trim + \\s+ collapse, map-only codegen plan "
    "(LLM-pipeline extension).",
    tags=("text", "llm"),
)(build_text_normalize)


# ---------------------------------------------------------------------------
# pii_redact — regex PII scrubbing (emails, phone numbers). The corpus has
# no PII, so each doc gets a deterministic synthetic email+phone appended
# (same expression both engines) before redaction — proving the patterns
# match and the replacement is total.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

PII_REDACT_ORACLE = f"""
WITH d AS (
    SELECT
        doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com or 555-123-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
    FROM documents
)
SELECT
    doc_id,
    regexp_replace(
        regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
        '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM d
"""


def build_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained JVM regexp_replace calls (Java regex ≡ RE2 for this
    pattern subset) — map-only, no shuffle, codegen'd; the standard
    pre-training scrub stage."""
    docs = spread(table(spark, sf_dir, "documents"), spark)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select("doc_id", redacted.alias("redacted"))


register(
    "pii_redact",
    oracle=PII_REDACT_ORACLE,
    doc="Regex PII redaction (email + phone patterns) over deterministically "
    "PII-seeded docs — map-only scrub stage (LLM-pipeline extension).",
    tags=("text", "llm"),
)(build_pii_redact)


# ---------------------------------------------------------------------------
# repetition_ratio — repetition-based quality signal: distinct-token ratio
# and the share of the single most frequent token. High top-token share /
# low distinct ratio flags boilerplate and degenerate generations.
# ---------------------------------------------------------------------------

REPETITION_RATIO_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({_sql_tokens()}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tok
)
SELECT
    doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_distinct,
    CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS distinct_ratio,
    CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_token_share
FROM tf
GROUP BY doc_id
"""


def build_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → (doc, token) counts → per-doc rollup. Both aggregates are
    partial+final; the shuffle key is (doc_id, tok) then doc_id — high
    cardinality, no skew. Ratios divide exact longs, bit-identical."""
    docs = spread(table(spark, sf_dir, "documents"), spark)
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double")).alias(
            "distinct_ratio"
        ),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_token_share"
        ),
    )


register(
    "repetition_ratio",
    oracle=REPETITION_RATIO_ORACLE,
    doc="Repetition quality signal: per-doc distinct-token ratio and top "
    "token share via token-frequency rollup (LLM-pipeline extension).",
    tags=("text", "llm", "quality"),
)(build_repetition_ratio)


# ---------------------------------------------------------------------------
# bigram_typicality — corpus-typicality scoring, the exact-arithmetic
# analog of n-gram LM (KenLM-style) document scoring: build the corpus
# bigram frequency table, then score every document by the mean corpus
# frequency of its bigrams. The engineering shape is the real one — a
# big n-gram relation joined back to per-doc n-grams — while staying on
# integer counts + one final division (cross-engine exact, no logs).
#
# Scale notes: the bigram table aggregates partial+final (map-side
# combine); the score join shuffles on the bigram key. At 100 TB the
# table would be DF-capped and bucket-written once, then reused — same
# contract as the dedup shingle index.
# ---------------------------------------------------------------------------

BIGRAM_TYPICALITY_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
bg AS (
    SELECT doc_id, list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
    FROM t WHERE len(toks) >= 2
),
e AS (SELECT doc_id, unnest(bigrams) AS bigram FROM bg),
freq AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS bg_count FROM e GROUP BY bigram)
SELECT
    e.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
    CAST(SUM(freq.bg_count) AS BIGINT) AS sum_freq,
    CAST(SUM(freq.bg_count) AS DOUBLE) / COUNT(*) AS typicality
FROM e JOIN freq ON e.bigram = freq.bigram
GROUP BY e.doc_id
"""


def build_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    t = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    # adjacent-pair bigrams via slice + zip_with (same O(n) shape as
    # shingles_col — no per-element re-tokenization)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    e = t.select("doc_id", F.explode(bigrams).alias("bigram"))
    freq = e.groupBy("bigram").agg(F.count(F.lit(1)).alias("bg_count"))
    return (
        e.join(freq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bg_count").alias("sum_freq"),
            (F.sum("bg_count").cast("double") / F.count(F.lit(1))).alias("typicality"),
        )
    )


register(
    "bigram_typicality",
    oracle=BIGRAM_TYPICALITY_ORACLE,
    doc="Corpus-typicality document scoring via the bigram frequency "
    "table (n-gram-LM scoring shape on exact integer counts; "
    "LLM-pipeline extension).",
    tags=("text", "llm", "join"),
)(build_bigram_typicality)


# ---------------------------------------------------------------------------
# vocab_growth_curve — Heaps'-law audit: distinct vocabulary seen after
# the first 10%, 20%, …, 100% of documents (doc_id order). The running
# distinct is decomposed as term-first-occurrence (min doc_id per term)
# + threshold counts — two hash aggregates and a 10-row broadcast join,
# never a distinct-in-window. The curve tells a corpus builder whether
# new data still adds vocabulary or only repeats it.
# ---------------------------------------------------------------------------

VOCAB_GROWTH_ORACLE = f"""
WITH firsts AS (
    SELECT term, MIN(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest({_sql_tokens()}) AS term FROM documents
    ) GROUP BY term
),
n AS (SELECT COUNT(*) AS total_docs FROM documents),
cp AS (
    SELECT pct, (SELECT total_docs FROM n) * pct // 100 AS doc_threshold
    FROM (SELECT unnest(generate_series(10, 100, 10)) AS pct)
)
SELECT CAST(cp.pct AS BIGINT) AS pct,
       CAST(cp.doc_threshold AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN firsts.first_doc < cp.doc_threshold THEN 1 END)
            AS BIGINT) AS vocab_size
FROM cp CROSS JOIN firsts
GROUP BY cp.pct, cp.doc_threshold
"""


def build_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    firsts = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    total_docs = docs.count()  # S12 scalar fetch
    cp = spark.range(1, 11).select(
        (F.col("id") * 10).cast("long").alias("pct"),
        F.expr(f"id * 10 * {total_docs} div 100").cast("long").alias(
            "doc_threshold"
        ),
    )
    return (
        firsts.crossJoin(F.broadcast(cp))
        .groupBy("pct", F.col("doc_threshold").alias("n_docs"))
        .agg(
            F.count(
                F.when(F.col("first_doc") < F.col("doc_threshold"), 1)
            ).alias("vocab_size")
        )
    )


register(
    "vocab_growth_curve",
    oracle=VOCAB_GROWTH_ORACLE,
    doc="Heaps'-law vocabulary growth: distinct terms after each 10% of "
    "the corpus, via term-first-occurrence + 10-row broadcast threshold "
    "join (no distinct-in-window).",
    tags=("text", "llm", "report"),
)(build_vocab_growth_curve)


# ---------------------------------------------------------------------------
# lang_id_confusion — the language-ID evaluation: confusion matrix of the
# heuristic against the labeled lang column (one row per label/pred cell
# with the label's recall share). Composes the registered lang_id plan —
# the same measure-your-heuristics pattern as ann_recall_* and
# dedup_method_agreement.
# ---------------------------------------------------------------------------

LANG_CONFUSION_ORACLE = f"""
WITH p AS (SELECT lang_label, lang_pred FROM ({_lang_oracle()})),
tot AS (SELECT lang_label, CAST(COUNT(*) AS BIGINT) AS n_label
        FROM p GROUP BY lang_label)
SELECT p.lang_label, p.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_label) AS label_share
FROM p JOIN tot ON p.lang_label = tot.lang_label
GROUP BY p.lang_label, p.lang_pred
"""


def build_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = build_lang_id_heuristic(spark, sf_dir).select("lang_label", "lang_pred")
    tot = p.groupBy("lang_label").agg(F.count(F.lit(1)).alias("n_label"))
    return (
        p.join(F.broadcast(tot), "lang_label")
        .groupBy("lang_label", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)).cast("double") / F.max("n_label")).alias(
                "label_share"
            ),
        )
    )


register(
    "lang_id_confusion",
    oracle=LANG_CONFUSION_ORACLE,
    doc="Language-ID evaluation: label × prediction confusion matrix "
    "with per-label recall share, composed from the registered "
    "lang_id_heuristic plan.",
    tags=("text", "llm", "evaluation"),
)(build_lang_id_confusion)


# ---------------------------------------------------------------------------
# term_position_stats — positional token analytics via posexplode: where
# in documents do the top terms appear (mean relative position)? The
# position index comes from posexplode (§2.7 generator completeness
# beyond plain explode); means are exact integer sums over positions with
# one final division.
# ---------------------------------------------------------------------------

POSITION_TOP_K = 20

TERM_POSITION_ORACLE = f"""
WITH e AS (
    SELECT doc_id,
           unnest({_sql_tokens()}) AS term,
           generate_subscripts({_sql_tokens()}, 1) - 1 AS pos,
           len({_sql_tokens()}) AS n_tokens
    FROM documents
),
top_terms AS (
    SELECT term FROM e GROUP BY term
    ORDER BY COUNT(*) DESC, term ASC LIMIT {POSITION_TOP_K}
)
SELECT e.term,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(SUM(e.pos) AS BIGINT) AS pos_sum,
       CAST(SUM(e.pos) AS DOUBLE) / SUM(e.n_tokens - 1) AS mean_rel_position
FROM e JOIN top_terms ON e.term = top_terms.term
GROUP BY e.term
"""


def build_term_position_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = tokens_col()
    e = docs.select(
        "doc_id", F.size(toks).alias("n_tokens"), F.posexplode(toks).alias("pos", "term")
    )
    top_terms = (
        e.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(POSITION_TOP_K)
        .select("term")
    )
    return (
        e.join(F.broadcast(top_terms), "term")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum("pos").alias("pos_sum"),
            (
                F.sum("pos").cast("double")
                / F.sum(F.col("n_tokens") - 1)
            ).alias("mean_rel_position"),
        )
    )


register(
    "term_position_stats",
    oracle=TERM_POSITION_ORACLE,
    doc=f"Positional token analytics: mean relative position of the top "
    f"{POSITION_TOP_K} terms via posexplode (generator completeness; "
    "exact integer position sums).",
    tags=("text", "llm", "agg"),
)(build_term_position_stats)


# ---------------------------------------------------------------------------
# char_class_profile — per-source character-class hygiene: digit /
# space / word-char fractions of the corpus text, exact integer length
# arithmetic (regexp_replace strip + length on both engines). The
# hygiene axes quality classifiers threshold on beyond the token gate.
# ---------------------------------------------------------------------------

CHAR_CLASS_ORACLE = """
WITH t AS (
    SELECT source,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digits,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT)
               AS n_spaces,
           CAST(length(regexp_replace(text, '[^a-zA-Z0-9_]', '', 'g')) AS BIGINT)
               AS n_word
    FROM documents WHERE length(text) > 0
)
SELECT source,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_digits) AS DOUBLE) / SUM(n_chars) AS digit_ratio,
       CAST(SUM(n_spaces) AS DOUBLE) / SUM(n_chars) AS space_ratio,
       CAST(SUM(n_word) AS DOUBLE) / SUM(n_chars) AS word_char_ratio
FROM t GROUP BY source
"""


def build_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark).filter(
        F.length("text") > 0
    )
    t = docs.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("n_digits"),
        F.length(F.regexp_replace("text", "[^ ]", "")).cast("long").alias("n_spaces"),
        F.length(F.regexp_replace("text", "[^a-zA-Z0-9_]", ""))
        .cast("long")
        .alias("n_word"),
    )
    return t.groupBy("source").agg(
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_digits").cast("double") / F.sum("n_chars")).alias("digit_ratio"),
        (F.sum("n_spaces").cast("double") / F.sum("n_chars")).alias("space_ratio"),
        (F.sum("n_word").cast("double") / F.sum("n_chars")).alias("word_char_ratio"),
    )


register(
    "char_class_profile",
    oracle=CHAR_CLASS_ORACLE,
    doc="Per-source character-class hygiene (digit/space/word-char "
    "fractions) on exact length arithmetic — the axes quality "
    "classifiers threshold beyond the token gate.",
    tags=("text", "llm", "report"),
)(build_char_class_profile)


# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang — tokenizer-efficiency audit per language:
# BPE-ish tokens per whitespace word (fertility) and characters per token.
# High-fertility languages cost more context budget per word — the number
# an LLM-data team checks before fixing a tokenizer or re-weighting a
# language mix.
# ---------------------------------------------------------------------------

TOKENIZER_FERTILITY_ORACLE = f"""
WITH t AS (
    SELECT lang,
           len({_sql_tokens()}) AS n_words,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe,
           n_chars
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6) AS chars_per_token
FROM t GROUP BY lang
"""


def build_tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    t = docs.select(
        "lang",
        F.size(tokens_col()).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n_bpe"),
        "n_chars",
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe").alias("n_bpe_tokens"),
        F.round(F.sum("n_bpe").cast("double") / F.sum("n_words"), 6).alias(
            "fertility"
        ),
        F.round(F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6).alias(
            "chars_per_token"
        ),
    )


register(
    "tokenizer_fertility_by_lang",
    oracle=TOKENIZER_FERTILITY_ORACLE,
    doc="Per-language tokenizer fertility (BPE tokens per word) and "
    "chars-per-token — the context-budget economics of a language mix; "
    "exact integer sums, one hash aggregate.",
    tags=("text", "llm", "agg"),
)(build_tokenizer_fertility_by_lang)


# ---------------------------------------------------------------------------
# document_chunking — overlapping token-window chunks (the RAG / training
# sequence-prep step): every document splits into CHUNK-token windows on a
# STRIDE-token grid (last window short, overlap = CHUNK - STRIDE). Pure
# Catalyst — sequence() of starts, explode, slice — so the chunker is one
# narrow projection + generate, no Python in the row path; at 100 TB it
# scales as a map-only stage (zero shuffles).
# ---------------------------------------------------------------------------

CHUNK_TOKENS, CHUNK_STRIDE = 64, 48

DOCUMENT_CHUNKING_ORACLE = f"""
WITH t AS (
    SELECT doc_id, {_sql_tokens()} AS toks FROM documents
), x AS (
    SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
    FROM t WHERE len(toks) > 0
), s AS (
    SELECT doc_id, toks, n,
           UNNEST(range(0, n, {CHUNK_STRIDE})) AS start
    FROM x
)
SELECT doc_id,
       CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(toks[start + 1 : least(start + {CHUNK_TOKENS}, n)]) AS BIGINT)
           AS n_tokens,
       md5(array_to_string(
           toks[start + 1 : least(start + {CHUNK_TOKENS}, n)], ' '))
           AS chunk_md5
FROM s
"""


def build_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), spark)
    toks = (
        docs.select("doc_id", tokens_col().alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    ).withColumn(
        "chunk", F.slice("toks", F.col("start") + 1, CHUNK_TOKENS)
    )
    return chunks.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


register(
    "document_chunking",
    oracle=DOCUMENT_CHUNKING_ORACLE,
    doc="Overlapping token-window chunking (64-token chunks on a "
    "48-token stride) — the RAG/training sequence-prep transform; "
    "sequence+explode+slice, map-only, zero shuffles.",
    tags=("text", "llm", "chunking"),
)(build_document_chunking)
