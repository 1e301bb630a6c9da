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
