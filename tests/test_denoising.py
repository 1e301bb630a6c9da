"""Denoising-objective transforms (operators/denoising.py): hand-computed
T5 span-corruption pairs and FIM splits, sentinel conventions, edge docs."""

from __future__ import annotations

import pytest

from crowdsorsa_etl_spark.operators.denoising import (
    fim_transform,
    span_corrupt,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return {r["doc_id"]: r for r in df.collect()}[doc_id]


class TestSpanCorrupt:
    def test_hand_computed_single_span(self, spark):
        # 12 tokens t0..t11: indices 4,5,6 masked (span 0), nothing else
        text = " ".join(f"t{i}" for i in range(12))
        r = _row(span_corrupt(_docs(spark, [(1, text)])), 1)
        assert r["n_tokens"] == 12 and r["n_spans"] == 1
        assert r["n_masked"] == 3
        assert (
            r["input_text"]
            == "t0 t1 t2 t3 <extra_id_0> t7 t8 t9 t10 t11"
        )
        assert r["target_text"] == "<extra_id_0> t4 t5 t6 <extra_id_1>"

    def test_truncated_second_span(self, spark):
        # 15 tokens: span 0 = {4,5,6}, span 1 starts at 14 and is cut by
        # the doc end — the start token alone is masked
        text = " ".join(f"t{i}" for i in range(15))
        r = _row(span_corrupt(_docs(spark, [(1, text)])), 1)
        assert r["n_spans"] == 2 and r["n_masked"] == 4
        assert r["input_text"].endswith("t13 <extra_id_1>")
        assert (
            r["target_text"]
            == "<extra_id_0> t4 t5 t6 <extra_id_1> t14 <extra_id_2>"
        )

    def test_short_doc_uncorrupted(self, spark):
        # 3 tokens: no index hits the mask rule — input is the normalized
        # doc, target is the lone final sentinel (the T5 convention)
        r = _row(span_corrupt(_docs(spark, [(1, "A  b C")])), 1)
        assert r["n_spans"] == 0 and r["n_masked"] == 0
        assert r["input_text"] == "a b c"  # normalize: lower + collapse ws
        assert r["target_text"] == "<extra_id_0>"

    def test_empty_doc_dropped(self, spark):
        assert span_corrupt(_docs(spark, [(1, "   "), (2, "x")])).count() == 1

    def test_corruption_rate_is_rule_exact(self, spark):
        # 100 tokens: 10 periods, each masks 3 tokens -> exactly 30
        text = " ".join(f"t{i}" for i in range(100))
        r = _row(span_corrupt(_docs(spark, [(1, text)])), 1)
        assert r["n_masked"] == 30 and r["n_spans"] == 10


class TestFimTransform:
    def test_hand_computed_psm(self, spark):
        # n=5: p1=1, p2=3 -> prefix [a], middle [b c], suffix [d e]
        r = _row(fim_transform(_docs(spark, [(1, "a b c d e")])), 1)
        assert r["n_tokens"] == 5
        assert (
            r["fim_text"]
            == "<fim_prefix> a <fim_suffix> d e <fim_middle> b c"
        )

    def test_min_three_tokens_all_regions_nonempty(self, spark):
        # n=3: p1=1, p2=2 -> every region exactly one token
        r = _row(fim_transform(_docs(spark, [(1, "x y z")])), 1)
        assert (
            r["fim_text"] == "<fim_prefix> x <fim_suffix> z <fim_middle> y"
        )

    def test_short_docs_dropped(self, spark):
        out = fim_transform(_docs(spark, [(1, "a b"), (2, "a b c")]))
        assert [r["doc_id"] for r in out.collect()] == [2]

    def test_regions_reassemble_to_original(self, spark):
        # PSM is a permutation: prefix + middle + suffix == the tokens
        text = " ".join(f"w{i}" for i in range(17))
        r = _row(fim_transform(_docs(spark, [(1, text)])), 1)
        s = r["fim_text"]
        pre = s.split("<fim_prefix> ")[1].split(" <fim_suffix>")[0]
        suf = s.split("<fim_suffix> ")[1].split(" <fim_middle>")[0]
        mid = s.split("<fim_middle> ")[1]
        assert f"{pre} {mid} {suf}" == text

    def test_min_tokens_guard(self):
        with pytest.raises(ValueError, match="min_tokens"):
            fim_transform(None, min_tokens=2)


class TestContainmentPairs:
    """Asymmetric containment (operators/dedup.shingle_containment_pairs):
    the quote-inside-wrapper case Jaccard misses."""

    def test_small_doc_quoted_in_large_one(self, spark):
        from crowdsorsa_etl_spark.operators.dedup import (
            shingle_containment_pairs,
            shingle_jaccard_pairs,
        )

        quote = "alpha beta gamma delta epsilon"
        filler = " ".join(f"w{i}" for i in range(40))
        # quote sits at doc 2's END so doc 1's trailing sub-shingles
        # ("delta epsilon", "epsilon") also occur there — a mid-document
        # quote shares only its full-width shingles (containment 3/5 here)
        df = spark.createDataFrame(
            [(1, quote), (2, f"{filler} {quote}")],
            "doc_id long, text string",
        )
        got = shingle_containment_pairs(df, threshold=0.9).collect()
        assert len(got) == 1
        r = got[0]
        # every shingle of doc 1 appears in doc 2 -> containment_a == 1.0
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["containment_a"] == 1.0
        assert r["n_shared"] == r["n_a"]
        # ... while Jaccard on the same universe is diluted by the wrapper
        jac = shingle_jaccard_pairs(df).collect()[0]["jaccard"]
        assert jac < 0.2
        assert r["containment_b"] < 0.2  # the big side is NOT contained

    def test_threshold_filters_both_directions(self, spark):
        from crowdsorsa_etl_spark.operators.dedup import (
            shingle_containment_pairs,
        )

        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "v w x y z")],
            "doc_id long, text string",
        )
        # disjoint docs share no shingles -> no pair row at any threshold
        assert shingle_containment_pairs(df, threshold=0.0).count() == 0
