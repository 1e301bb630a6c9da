"""BPE merge-learning gates: parity with a pure-python reference trainer,
greedy left-to-right merge semantics (the space-doubling trick), and
deterministic tie-breaking."""

from __future__ import annotations

from collections import Counter

import pytest

from crowdsorsa_etl_spark.operators.bpe import bpe_learn_merges


def _merge_seq(seq, a, b):
    """Greedy left-to-right merge of adjacent (a, b) in a symbol tuple."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _reference_bpe(texts, n_merges):
    """Sennrich-style trainer over the word-count dict; ties broken by pair
    text ascending. Returns [(pair, weighted_count), ...]."""
    words = Counter()
    for t in texts:
        for w in " ".join(t.strip().lower().split()).split(" "):
            if w:
                words[w] += 1
    reps = {tuple(w): c for w, c in words.items()}

    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, c in reps.items():
            for x, y in zip(seq, seq[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        (a, b), total = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((f"{a} {b}", total))
        rebuilt = {}
        for seq, c in reps.items():
            m = _merge_seq(seq, a, b)
            rebuilt[m] = rebuilt.get(m, 0) + c
        reps = rebuilt
    return merges


def _spark_merges(spark, texts, n):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = bpe_learn_merges(df, n_merges=n).orderBy("merge_rank").collect()
    return [(r.pair, r.total) for r in rows]


class TestBpeLearnMerges:
    def test_matches_reference_trainer(self, spark):
        texts = [
            "low lower lowest low low",
            "new newer newest new newer",
            "wide wider widest wide",
        ]
        assert _spark_merges(spark, texts, 6) == _reference_bpe(texts, 6)

    def test_consecutive_occurrences_merge_greedily(self, spark):
        # 'aaaa': (a,a) pairs count 3 per word; after merging, 'aa aa' must
        # be the result (greedy left-to-right), giving (aa,aa) next — the
        # case a naive single-space replace gets wrong
        texts = ["aaaa aaaa aaaa b"]
        got = _spark_merges(spark, texts, 2)
        assert got[0] == ("a a", 9)
        assert got[1] == ("aa aa", 3)
        assert got == _reference_bpe(texts, 2)

    def test_odd_run_leaves_singleton(self, spark):
        # 'aaa' -> greedy gives 'aa a', so the second merge is (aa, a)
        texts = ["aaa aaa c"]
        got = _spark_merges(spark, texts, 2)
        assert got[0] == ("a a", 4)
        assert got[1] == ("aa a", 2)
        assert got == _reference_bpe(texts, 2)

    def test_multichar_symbols_keep_merging(self, spark):
        texts = ["abab abab abab"]
        got = _spark_merges(spark, texts, 3)
        # corpus exhausts after two merges: both engines must stop early
        assert got == _reference_bpe(texts, 3)
        assert len(got) == 2
        # final merge builds a 4-char symbol from two 2-char symbols
        assert got[1][0] == "ab ab"

    def test_tie_break_is_pair_text_ascending(self, spark):
        # 'xy' and 'yx' pair counts tie; 'x y' < 'y x' lexicographically
        texts = ["xy yx", "xy yx"]
        got = _spark_merges(spark, texts, 1)
        assert got[0][0] == "x y"

    def test_matches_reference_on_fixture(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r.text for r in docs.select("text").collect()]
        assert _spark_merges_df(spark, docs, 5) == _reference_bpe(texts, 5)

    def test_rejects_bad_n(self, spark):
        df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bpe_learn_merges(df, n_merges=0)

    def test_rejects_bad_strategy(self, spark):
        df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bpe_learn_merges(df, n_merges=1, strategy="gpu")


class TestDriverStrategyParity:
    """The driver-loop strategy (production merge counts) must be
    bit-identical to the distributed per-merge-job loop."""

    def test_distributed_vs_driver_on_fixture(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        dist = bpe_learn_merges(docs, n_merges=6, strategy="distributed")
        drv = bpe_learn_merges(docs, n_merges=6, strategy="driver")
        assert (
            [tuple(r) for r in dist.orderBy("merge_rank").collect()]
            == [tuple(r) for r in drv.orderBy("merge_rank").collect()]
        )

    def test_driver_loop_exhaustion_and_reference_parity(self, spark):
        # more merges than the corpus supports: the driver loop must break
        # early at exactly the reference trainer's stopping point
        texts = ["ababa cc", "ababa cc dd"]
        df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        rows = (
            bpe_learn_merges(df, n_merges=256, strategy="driver")
            .orderBy("merge_rank")
            .collect()
        )
        assert [(r.pair, r.total) for r in rows] == _reference_bpe(texts, 256)

    def test_auto_picks_driver_under_threshold(self, spark):
        df = spark.createDataFrame([(0, "aa ab aa")], ["doc_id", "text"])
        # auto with a generous threshold = driver result
        got = bpe_learn_merges(df, n_merges=2, strategy="auto")
        drv = bpe_learn_merges(df, n_merges=2, strategy="driver")
        assert (
            [tuple(r) for r in got.orderBy("merge_rank").collect()]
            == [tuple(r) for r in drv.orderBy("merge_rank").collect()]
        )

    def test_auto_falls_back_to_distributed(self, spark):
        df = spark.createDataFrame(
            [(0, "low lower low"), (1, "new newer new")], ["doc_id", "text"]
        )
        got = bpe_learn_merges(
            df, n_merges=3, strategy="auto", max_driver_words=1
        )
        dist = bpe_learn_merges(df, n_merges=3, strategy="distributed")
        assert (
            [tuple(r) for r in got.orderBy("merge_rank").collect()]
            == [tuple(r) for r in dist.orderBy("merge_rank").collect()]
        )


def _spark_merges_df(spark, df, n):
    rows = bpe_learn_merges(df, n_merges=n).orderBy("merge_rank").collect()
    return [(r.pair, r.total) for r in rows]
