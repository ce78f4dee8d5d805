"""BPE merge training vs a pure-Python reference implementation."""

from collections import Counter

from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.plans.bpe import (
    END_OF_WORD,
    build_bpe_train_merges,
    train_bpe_merges,
)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al.): greedy left-to-right pair merge."""
    vocab = {tuple(w + END_OF_WORD): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for syms, f in vocab.items():
            # greedy non-overlapping adjacent pairs? No: COUNTING is over
            # all adjacent positions after previous merges (standard BPE)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append({"rank": rank, "left": a, "right": b, "merged": a + b,
                       "pair_count": n})
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _words_df(spark, freqs):
    return spark.createDataFrame(list(freqs.items()), ["word", "freq"])


def test_bpe_matches_reference_on_classic_corpus(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = train_bpe_merges(_words_df(spark, freqs), n_merges=8)
    assert got == _ref_bpe(freqs, 8)
    assert got[0]["left"] == "e" and got[0]["right"] == "s"  # es: 9 occurrences


def test_bpe_greedy_overlap_and_repeats(spark):
    # 'aaaa_' stresses greedy left-to-right: (a,a) merges to aa,aa not a,aa,a
    freqs = {"aaaa": 4, "ab": 3}
    got = train_bpe_merges(_words_df(spark, freqs), n_merges=5)
    ref = _ref_bpe(freqs, 5)
    assert got == ref
    assert got[0]["merged"] == "aa" and got[0]["pair_count"] == 12


def test_bpe_registered_query_shape(spark):
    out = build_bpe_train_merges(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert 1 <= len(rows) <= 10
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # counts are non-increasing is NOT guaranteed by BPE (merges create
    # new frequent pairs), but every count is >= 2 and symbols compose
    for r in rows:
        assert r.pair_count >= 2 and r.merged == r.left + r.right


def test_bpe_replace_merge_equals_fold_merge(spark):
    # r13: train_bpe_merges runs the greedy merge as a literal string
    # replace of " a  b " -> " ab " over space-delimited symbols. This
    # pins its equivalence to the executable definition (_merge_pair_col,
    # the sequential fold) on adversarial shapes: overlapping runs,
    # multi-char symbols containing each other, and merges at both ends.
    from end_to_end_data_lakehouse_pipeline_spark.plans.bpe import _merge_pair_col

    cases = [
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a"], "a", "a"),
        (["ab", "b", "ab", "b"], "ab", "b"),
        (["x", "xy", "y", "xy"], "x", "xy"),
        (["q"], "q", "q"),
        (["l", "o", "w", "_"], "o", "w"),
        (["aa", "a", "aa", "a", "aa"], "aa", "a"),
    ]
    rows = [(syms,) for syms, _, _ in cases]
    df = spark.createDataFrame(rows, "syms array<string>")
    for idx, (syms, left, right) in enumerate(cases):
        folded = (
            df.filter(F.col("syms") == F.array(*[F.lit(s) for s in syms]))
            .select(_merge_pair_col(F.col("syms"), left, right).alias("m"))
            .first()["m"]
        )
        s = "".join(f" {x} " for x in syms)
        replaced = s.replace(f" {left}  {right} ", f" {left}{right} ")
        via_replace = replaced[1:-1].split("  ")
        assert folded == via_replace, (syms, left, right, folded, via_replace)
