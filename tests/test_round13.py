"""Round-13 gates: exact shingle-Jaccard ground truth (the LSH audit's
truth tier), including the max_df stop-shingle cap the audit query itself
never exercises."""

from __future__ import annotations

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.dedup import (
    minhash_lsh_candidates,
    shingle_jaccard_pairs,
)


def _pairs_dict(df):
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in df.collect()}


class TestShingleJaccard:
    def _docs(self, spark):
        # doc 0 and 1 share a long run; doc 2 is disjoint vocabulary
        return spark.createDataFrame(
            [
                (0, "a b c d e f g h"),
                (1, "a b c d e f x y"),
                (2, "p q r s t u v w"),
            ],
            ["doc_id", "text"],
        )

    def test_matches_python_reference(self, spark):
        got = _pairs_dict(shingle_jaccard_pairs(self._docs(spark)))

        def shingle_set(words):
            # trailing shingles included (k=3, then 2, then 1 at the tail),
            # mirroring the null-skipping lead() combine
            out = set()
            for i in range(len(words)):
                out.add(tuple(words[i : i + 3]))
            return out

        docs = {
            0: "a b c d e f g h".split(),
            1: "a b c d e f x y".split(),
            2: "p q r s t u v w".split(),
        }
        for (ia, ib), jac in got.items():
            sa, sb = shingle_set(docs[ia]), shingle_set(docs[ib])
            want = round(len(sa & sb) / len(sa | sb), 6)
            assert jac == want
        # the disjoint doc never pairs
        assert all(2 not in p for p in got)
        assert (0, 1) in got

    def test_pairs_require_shared_shingle(self, spark):
        got = _pairs_dict(shingle_jaccard_pairs(self._docs(spark)))
        assert set(got) == {(0, 1)}

    def test_max_df_removes_hot_shingles_from_universe(self, spark):
        # the '(z,z,z)' boilerplate shingle appears in every doc -> df=3 >
        # cap=2, so with the cap the otherwise-disjoint pairs 0/2 and 1/2
        # stop pairing entirely, and 0/1 is rescored over the capped
        # universe: uncapped 4/10, capped 3/9 (zzz leaves both the
        # intersection and the union)
        docs = spark.createDataFrame(
            [
                (0, "z z z z a b c d"),
                (1, "z z z z a b c x"),
                (2, "z z z z p q r s"),
            ],
            ["doc_id", "text"],
        )
        uncapped = _pairs_dict(shingle_jaccard_pairs(docs))
        capped = _pairs_dict(shingle_jaccard_pairs(docs, max_df=2))
        assert set(uncapped) == {(0, 1), (0, 2), (1, 2)}
        assert uncapped[(0, 1)] == 0.4
        assert set(capped) == {(0, 1)}
        assert capped[(0, 1)] == round(3 / 9, 6)

    def test_portable_and_fast_hash_agree(self, spark):
        docs = self._docs(spark)
        assert _pairs_dict(shingle_jaccard_pairs(docs)) == _pairs_dict(
            shingle_jaccard_pairs(docs, portable=True)
        )

    def test_lsh_candidates_are_subset_of_truth_support(self, spark):
        # every band collision implies >= 1 shared shingle on this fixture
        docs = self._docs(spark)
        cand = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(docs).collect()
        }
        truth = set(_pairs_dict(shingle_jaccard_pairs(docs)))
        assert cand <= truth


class TestWordPiece:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(0, "hug hug hug pug pug hugs")], ["doc_id", "text"]
        )

    def test_learn_scores_likelihood_ratio(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import wordpiece_learn

        rows = wordpiece_learn(self._docs(spark), n_merges=1).collect()
        assert len(rows) == 1
        r = rows[0]
        # symbol counts: h=4, ##u=6, ##g=6, p=2, ##s=1
        # pair counts: (h,##u)=4, (##u,##g)=6, (p,##u)=2, (##g,##s)=1
        # scores: 4/24=.1667, 6/36=.1667, 2/12=.1667, 1/6=.1667 — all tie!
        # tie-break pair ASC: '##g ##s' < '##u ##g' < 'h ##u' < 'p ##u'
        assert r["pair"] == "##g ##s"
        assert r["merged"] == "##gs"
        assert r["total"] == 1
        assert r["score"] == 1 / 6

    def test_merged_symbol_strips_right_hashes_only(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import wordpiece_learn

        rows = wordpiece_learn(
            self._docs(spark), n_merges=3
        ).collect()
        for r in rows:
            a, b = r["pair"].split(" ")
            want = a + (b[2:] if b.startswith("##") else b)
            assert r["merged"] == want

    def test_encode_greedy_longest_match(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import (
            wordpiece_encode_words,
        )

        docs = spark.createDataFrame([(0, "hugs hug ugh")], ["doc_id", "text"])
        vocab = spark.createDataFrame(
            [("h",), ("u",), ("g",), ("s",), ("hug",), ("##u",), ("##g",),
             ("##s",), ("##gs",), ("##ugh",)],
            ["tok"],
        )
        got = {
            r["word"]: r["wp_tokens"]
            for r in wordpiece_encode_words(docs, vocab).collect()
        }
        # 'hugs': longest initial match 'hug', then '##s' (not '##gs' —
        # greedy already consumed the g)
        assert got["hugs"] == "hug ##s"
        assert got["hug"] == "hug"
        # 'ugh': 'u' then longest continuation... '##gh' absent -> '##g'
        # then '##h' absent -> whole word UNK
        assert got["ugh"] == "[UNK]"

    def test_encode_unk_on_unknown_alphabet(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import (
            wordpiece_encode_words,
        )

        docs = spark.createDataFrame([(0, "ab zq")], ["doc_id", "text"])
        vocab = spark.createDataFrame(
            [("a",), ("##b",), ("z",)], ["tok"]
        )
        got = {
            r["word"]: (r["n_wp_tokens"], r["wp_tokens"])
            for r in wordpiece_encode_words(docs, vocab).collect()
        }
        assert got["ab"] == (2, "a ##b")
        assert got["zq"] == (1, "[UNK]")

    def test_uncapped_oversized_dictionary_raises(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import wordpiece_learn

        docs = spark.createDataFrame(
            [(0, "one two three four five")], ["doc_id", "text"]
        )
        import pytest

        with pytest.raises(ValueError, match="max_vocab_words"):
            wordpiece_learn(docs, n_merges=1, max_driver_words=3)

    def test_vocab_contains_alphabet_and_merges(self, spark):
        from crowdsorsa_etl_spark.operators.wordpiece import (
            wordpiece_learn,
            wordpiece_vocab,
        )

        docs = self._docs(spark)
        merges = wordpiece_learn(docs, n_merges=2)
        toks = {r["tok"] for r in wordpiece_vocab(docs, merges).collect()}
        for ch in "hugps":
            assert ch in toks and f"##{ch}" in toks
        for r in merges.collect():
            assert r["merged"] in toks
