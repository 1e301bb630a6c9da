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


class TestEncodeStrategyParity:
    """The batch (mapInPandas merge-loop) encode must be bit-identical to
    the expression (nested-transform) encode — the production 32k-vocab
    path and the codegen demo path are the same operator."""

    _TEXTS = [
        "lower newest lowest new low",
        "the newer the lower the wider",
        "estimate the estimates  Wide   wide",
        "",
        "a",
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            list(enumerate(self._TEXTS)), ["doc_id", "text"]
        )

    def _learned(self, spark, n=8):
        from crowdsorsa_etl_spark.operators.bpe import bpe_learn_merges

        rows = bpe_learn_merges(self._df(spark), n_merges=n).collect()
        return [tuple(r["pair"].split(" ")) for r in rows]

    def test_expression_vs_batch_bit_identical(self, spark):
        from crowdsorsa_etl_spark.operators.bpe import bpe_encode

        df, merges = self._df(spark), self._learned(spark)
        a = bpe_encode(df, merges, strategy="expression").orderBy("doc_id")
        b = bpe_encode(df, merges, strategy="batch").orderBy("doc_id")
        assert a.collect() == b.collect()

    def test_auto_always_batch_and_expression_capped(self, spark):
        # auto = batch at EVERY merge count (HOF lambdas are interpreted;
        # the batch path measured 11x faster even at 8 merges); the
        # expression path stays available explicitly, capped at the
        # codegen-safe limit
        from crowdsorsa_etl_spark.operators.bpe import (
            _EXPR_MERGE_LIMIT,
            bpe_encode,
        )

        df = self._df(spark)
        merges = self._learned(spark, 4) + [
            (f"zz{i}", f"qq{i}") for i in range(_EXPR_MERGE_LIMIT)
        ]
        out = bpe_encode(df, merges, strategy="auto")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "pythonUDF" in plan or "MapInPandas" in plan
        small = bpe_encode(df, self._learned(spark, 4), strategy="auto")
        plan_small = small._jdf.queryExecution().analyzed().toString()
        assert "MapInPandas" in plan_small
        with pytest.raises(ValueError, match="expression strategy"):
            bpe_encode(df, merges, strategy="expression")
        # padded no-op merges don't change the encoding
        assert (
            out.orderBy("doc_id").collect()
            == small.orderBy("doc_id").collect()
        )

    def test_sequential_once_skips_recreated_earlier_rank(self, spark):
        """A pair whose rank's stage already passed must stay unmerged even
        if a later merge recreates it — on BOTH paths. merges:
        rank1 = (xy, z) [symbol 'xy' doesn't exist yet — no-op],
        rank2 = (x, y)  [creates 'xy', now adjacent to 'z'].
        Sequential-once leaves 'xy z'; a min-rank re-loop would produce
        'xyz' and break parity with the trainer/oracle semantics."""
        from crowdsorsa_etl_spark.operators.bpe import bpe_encode

        df = spark.createDataFrame([(0, "xyz")], ["doc_id", "text"])
        merges = [("xy", "z"), ("x", "y")]
        a = bpe_encode(df, merges, strategy="expression").collect()
        b = bpe_encode(df, merges, strategy="batch").collect()
        assert a == b
        assert a[0]["n_tokens"] == 2  # 'xy z', NOT 'xyz'

    def test_batch_word_memoization_consistent(self, spark):
        """Repeated words across docs hit the per-batch cache — results
        must equal the uncached expression path exactly."""
        from crowdsorsa_etl_spark.operators.bpe import bpe_encode

        rows = [(i, "low lower low low newest") for i in range(50)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
        a = bpe_encode(df, merges, strategy="expression").orderBy("doc_id")
        b = bpe_encode(df, merges, strategy="batch").orderBy("doc_id")
        assert a.collect() == b.collect()


class TestTokenIds:
    def _fixture(self, spark):
        from crowdsorsa_etl_spark.operators.bpe import (
            bpe_learn_merges,
            bpe_vocab,
        )

        df = spark.createDataFrame(
            [(0, "low lower lowest"), (1, "new newest newer")],
            ["doc_id", "text"],
        )
        merges = [
            tuple(r["pair"].split(" "))
            for r in bpe_learn_merges(df, n_merges=4).collect()
        ]
        vocab_df = bpe_vocab(df, merges)
        vocab = {r["token"]: r["token_id"] for r in vocab_df.collect()}
        return df, merges, vocab

    def test_vocab_layout(self, spark):
        """Base chars id'd in sorted order from 0; merge symbols follow at
        n_base + rank - 1."""
        df, merges, vocab = self._fixture(spark)
        base = sorted(t for t in vocab if len(t) == 1)
        assert [vocab[c] for c in base] == list(range(len(base)))
        for r, (a, b) in enumerate(merges):
            assert vocab[a + b] == len(base) + r

    def test_ids_array_matches_md5_and_count(self, spark):
        import hashlib

        from crowdsorsa_etl_spark.operators.bpe import bpe_encode_ids

        df, merges, vocab = self._fixture(spark)
        out = bpe_encode_ids(
            df, merges, vocab, ids_col="token_ids"
        ).orderBy("doc_id")
        for row in out.collect():
            assert row["n_tokens"] == len(row["token_ids"])
            assert all(i is not None for i in row["token_ids"])
            joined = ",".join(str(i) for i in row["token_ids"])
            assert (
                hashlib.md5(joined.encode()).hexdigest() == row["ids_md5"]
            )

    def test_ids_decode_roundtrip(self, spark):
        """ids → tokens via the inverse vocab must rebuild the exact symbol
        stream the hash-gated encode produced."""
        import hashlib

        from crowdsorsa_etl_spark.operators.bpe import (
            bpe_encode,
            bpe_encode_ids,
        )

        df, merges, vocab = self._fixture(spark)
        inv = {v: k for k, v in vocab.items()}
        ids = {
            r["doc_id"]: r["token_ids"]
            for r in bpe_encode_ids(
                df, merges, vocab, ids_col="token_ids"
            ).collect()
        }
        for r in bpe_encode(df, merges).collect():
            stream = " ".join(inv[i] for i in ids[r["doc_id"]])
            assert (
                hashlib.md5(stream.encode()).hexdigest() == r["tokens_md5"]
            )

    def test_oov_is_loud_not_silent(self, spark):
        """A symbol missing from the vocabulary must poison ids_md5 (and
        yield NULL in the raw array), never silently drop."""
        from crowdsorsa_etl_spark.operators.bpe import bpe_encode_ids

        df, merges, vocab = self._fixture(spark)
        partial = {k: v for k, v in vocab.items() if k != "w"}
        full = bpe_encode_ids(df, merges, vocab, ids_col="token_ids")
        broken = bpe_encode_ids(df, merges, partial, ids_col="token_ids")
        f = {r["doc_id"]: r for r in full.collect()}
        b = {r["doc_id"]: r for r in broken.collect()}
        for d in f:
            assert f[d]["n_tokens"] == b[d]["n_tokens"]  # count keeps shape
        # every doc here contains 'w' ('low'/'new') → all hashes poisoned
        assert all(f[d]["ids_md5"] != b[d]["ids_md5"] for d in f)
        assert any(
            i is None for r in b.values() for i in r["token_ids"]
        )


class TestOovStats:
    def test_unseen_chars_count_as_oov(self, spark):
        from crowdsorsa_etl_spark.operators.bpe import (
            bpe_learn_merges,
            bpe_oov_stats,
            bpe_vocab,
        )

        train = spark.createDataFrame(
            [(0, "aa ab aa ab"), (2, "ba ba aa")], ["doc_id", "text"]
        )
        merges = [
            tuple(r["pair"].split(" "))
            for r in bpe_learn_merges(train, n_merges=2).collect()
        ]
        vocab = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(train, merges).collect()
        }
        assert set(vocab) >= {"a", "b"}
        ev = spark.createDataFrame(
            [(1, "aa zz"), (3, "qq qq")], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_oov)
            for r in bpe_oov_stats(ev, merges, vocab).collect()
        }
        # every symbol of 'zz'/'qq' words is outside the a/b vocabulary;
        # 'aa' tokenizes into known symbols
        assert got[1][1] >= 2 and got[1][1] < got[1][0]
        assert got[3][0] == got[3][1]  # all-unseen doc: every symbol OOV

    def test_in_vocab_corpus_has_zero_oov(self, spark):
        from crowdsorsa_etl_spark.operators.bpe import (
            bpe_learn_merges,
            bpe_oov_stats,
            bpe_vocab,
        )

        docs = spark.createDataFrame(
            [(0, "low lower lowest"), (1, "newer newest")],
            ["doc_id", "text"],
        )
        merges = [
            tuple(r["pair"].split(" "))
            for r in bpe_learn_merges(docs, n_merges=4).collect()
        ]
        vocab = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(docs, merges).collect()
        }
        rows = bpe_oov_stats(docs, merges, vocab).collect()
        assert rows and all(r.n_oov == 0 for r in rows)


class TestVocabCap:
    """Frequency-capped learn (``max_vocab_words``): the production-trainer
    dictionary discipline that keeps the driver merge loop bounded at any
    corpus size."""

    def test_cap_at_or_above_dict_size_is_identity(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        uncapped = bpe_learn_merges(docs, n_merges=6)
        capped = bpe_learn_merges(
            docs, n_merges=6, max_vocab_words=10_000_000
        )
        assert (
            [tuple(r) for r in capped.orderBy("merge_rank").collect()]
            == [tuple(r) for r in uncapped.orderBy("merge_rank").collect()]
        )

    def test_cap_keeps_top_words_by_count(self, spark):
        # 'zq' appears 5x, 'ab' 3x, 'cd' once; cap=2 drops 'cd', so the
        # (c,d) pair can never be learned while (z,q) and (a,b) are
        texts = ["zq zq zq zq zq ab ab ab cd"]
        df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        rows = (
            bpe_learn_merges(df, n_merges=8, max_vocab_words=2)
            .orderBy("merge_rank")
            .collect()
        )
        pairs = [r.pair for r in rows]
        assert "z q" in pairs and "a b" in pairs and "c d" not in pairs
        # weighted totals reflect only surviving words
        assert rows[0].pair == "z q" and rows[0].total == 5

    def test_cap_tie_break_is_rep_ascending(self, spark):
        # 'bb' and 'aa' both appear twice; cap=1 must keep 'aa'
        # ((cnt DESC, rep ASC) total order), so only (a,a) is learnable
        df = spark.createDataFrame(
            [(0, "bb aa bb aa")], ["doc_id", "text"]
        )
        rows = bpe_learn_merges(df, n_merges=4, max_vocab_words=1).collect()
        assert [(r.pair, r.total) for r in rows] == [("a a", 2)]

    def test_cap_makes_auto_driver_without_probe(self, spark):
        # auto + cap must match driver even when max_driver_words would
        # otherwise force the distributed loop via the count() probe
        df = spark.createDataFrame(
            [(0, "low lower low"), (1, "new newer new")], ["doc_id", "text"]
        )
        got = bpe_learn_merges(
            df,
            n_merges=3,
            strategy="auto",
            max_driver_words=3,
            max_vocab_words=3,
        )
        drv = bpe_learn_merges(
            df, n_merges=3, strategy="driver", max_vocab_words=3
        )
        assert (
            [tuple(r) for r in got.orderBy("merge_rank").collect()]
            == [tuple(r) for r in drv.orderBy("merge_rank").collect()]
        )

    def test_cap_rejects_bad_value(self, spark):
        df = spark.createDataFrame([(0, "aa")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="max_vocab_words"):
            bpe_learn_merges(df, n_merges=1, max_vocab_words=0)
