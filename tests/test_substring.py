"""Exact substring dedup gates (Lee et al. EXACTSUBSTR tier): planted
duplicates are found with exact span boundaries, unique text is untouched,
within-doc repetition counts, and the removal step keeps precisely the
uncovered tokens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.substring import (
    duplicated_substring_spans,
    remove_duplicated_substrings,
)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])


def _spans(spark, texts, k):
    df = duplicated_substring_spans(_docs(spark, texts), min_run=k)
    return sorted(tuple(r) for r in df.collect())


W = "w{} "  # unique filler words


def _uniq(start, n):
    """n globally-unique tokens."""
    return " ".join(f"u{start + i}" for i in range(n))


class TestDuplicatedSubstringSpans:
    def test_planted_cross_doc_duplicate(self, spark):
        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
        texts = [
            _uniq(0, 5) + " " + dup + " " + _uniq(100, 4),  # dup at pos 5..14
            _uniq(200, 3) + " " + dup + " " + _uniq(300, 6),  # dup at pos 3..12
        ]
        got = _spans(spark, texts, 8)
        assert got == [(0, 5, 14, 10), (1, 3, 12, 10)]

    def test_unique_corpus_has_no_spans(self, spark):
        texts = [_uniq(0, 30), _uniq(1000, 30)]
        assert _spans(spark, texts, 8) == []

    def test_within_doc_repetition_counts(self, spark):
        phrase = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly k=8 tokens
        texts = [phrase + " " + _uniq(0, 10) + " " + phrase]
        got = _spans(spark, texts, 8)
        # both occurrences flagged: pos 0..7 and pos 18..25
        assert got == [(0, 0, 7, 8), (0, 18, 25, 8)]

    def test_overlapping_windows_coalesce_to_one_span(self, spark):
        dup = " ".join(f"d{i}" for i in range(20))  # 20-token duplicate
        texts = [dup + " " + _uniq(0, 5), _uniq(100, 5) + " " + dup]
        got = _spans(spark, texts, 8)
        # one maximal span per doc, not 13 window-sized ones
        assert got == [(0, 0, 19, 20), (1, 5, 24, 20)]

    def test_shorter_than_min_run_not_flagged(self, spark):
        dup7 = "s1 s2 s3 s4 s5 s6 s7"  # 7 tokens < min_run=8
        texts = [dup7 + " " + _uniq(0, 10), dup7 + " " + _uniq(100, 10)]
        assert _spans(spark, texts, 8) == []

    def test_docs_shorter_than_k_are_ignored(self, spark):
        texts = ["tiny doc here", "tiny doc here", ""]
        assert _spans(spark, texts, 8) == []
        # ... but count as duplicates at a smaller k
        got = _spans(spark, texts, 2)
        assert got == [(0, 0, 2, 3), (1, 0, 2, 3)]

    def test_normalization_applies(self, spark):
        dup = "A  B C D E F G H"  # normalizes to 'a b c d e f g h'
        texts = [dup + " " + _uniq(0, 4), "a b c d e f g h " + _uniq(100, 4)]
        got = _spans(spark, texts, 8)
        assert got == [(0, 0, 7, 8), (1, 0, 7, 8)]

    def test_rejects_bad_min_run(self, spark):
        with pytest.raises(ValueError):
            duplicated_substring_spans(_docs(spark, ["a b"]), min_run=1)


class TestRemoveDuplicatedSubstrings:
    def test_removal_keeps_exactly_uncovered_tokens(self, spark):
        dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 toks
        keep0, keep1 = _uniq(0, 6), _uniq(100, 6)
        texts = [keep0 + " " + dup, dup + " " + keep1]
        out = {
            r["doc_id"]: (r["n_kept"], r["clean_md5"])
            for r in remove_duplicated_substrings(
                _docs(spark, texts), min_run=8
            ).collect()
        }
        import hashlib

        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        assert out[0] == (6, md5(keep0))
        assert out[1] == (6, md5(keep1))

    def test_doc_fully_removed_hashes_empty(self, spark):
        dup = " ".join(f"x{i}" for i in range(12))
        out = {
            r["doc_id"]: (r["n_kept"], r["clean_md5"])
            for r in remove_duplicated_substrings(
                _docs(spark, [dup, dup]), min_run=8
            ).collect()
        }
        import hashlib

        empty = hashlib.md5(b"").hexdigest()
        assert out == {0: (0, empty), 1: (0, empty)}

    def test_untouched_docs_pass_through(self, spark):
        texts = [_uniq(0, 12), _uniq(100, 12)]
        out = remove_duplicated_substrings(_docs(spark, texts), min_run=8)
        rows = {r["doc_id"]: r["n_kept"] for r in out.collect()}
        assert rows == {0: 12, 1: 12}

    def test_plan_stays_jvm_side(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = duplicated_substring_spans(docs, min_run=8)._jdf.queryExecution().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan


class TestSubstringPlans:
    def test_spans_two_exchanges_no_python(self, spark):
        """The operator's scale contract: ONE data-sized shuffle on the
        shingle key + one per-doc shuffle for the island windows; the
        final span aggregation reuses the doc_id partitioning (no third
        exchange); scan pruned to (doc_id, text); zero Python stages."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            duplicated_substring_spans(docs, min_run=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 2
        assert "EvalPython" not in plan and "MapInPandas" not in plan
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


class TestSubstringDecontamination:
    def test_planted_eval_overlap_flagged(self, spark):
        from crowdsorsa_etl_spark.operators.substring import (
            substring_decontamination_spans,
        )

        leak = "q1 q2 q3 q4 q5 q6 q7 q8 q9"  # 9-token benchmark answer
        corpus = _docs(
            spark,
            [
                _uniq(0, 4) + " " + leak + " " + _uniq(50, 3),  # leaks at 4..12
                _uniq(100, 15),  # clean
            ],
        )
        eval_df = spark.createDataFrame(
            [(900, _uniq(200, 2) + " " + leak)], ["doc_id", "text"]
        )
        got = sorted(
            tuple(r)
            for r in substring_decontamination_spans(
                corpus, eval_df, min_run=8
            ).collect()
        )
        assert got == [(0, 4, 12, 9)]

    def test_within_corpus_dup_not_flagged(self, spark):
        """Corpus-internal duplication is llm_substring_dedup's job — the
        decontamination operator flags ONLY eval overlap."""
        from crowdsorsa_etl_spark.operators.substring import (
            substring_decontamination_spans,
        )

        dup = " ".join(f"c{i}" for i in range(10))
        corpus = _docs(spark, [dup + " " + _uniq(0, 3), dup + " " + _uniq(50, 3)])
        eval_df = spark.createDataFrame([(900, _uniq(500, 12))], ["doc_id", "text"])
        assert (
            substring_decontamination_spans(corpus, eval_df, min_run=8).count()
            == 0
        )


class TestSubstringIndexAtRest:
    LEAK = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"

    def _sets(self, spark):
        corpus = _docs(
            spark,
            [
                _uniq(0, 3) + " " + self.LEAK,        # overlaps eval
                _uniq(100, 14),                        # clean
            ],
        )
        ev1 = spark.createDataFrame(
            [(900, self.LEAK + " " + _uniq(300, 2))], ["doc_id", "text"]
        )
        ev2 = spark.createDataFrame(
            [(901, _uniq(400, 12))], ["doc_id", "text"]
        )
        return corpus, ev1, ev2

    def test_index_matches_direct_computation(self, spark, tmp_path):
        from crowdsorsa_etl_spark.operators.substring import (
            substring_append_index,
            substring_decontamination_spans,
            substring_match_index,
            substring_write_index,
        )

        corpus, ev1, ev2 = self._sets(spark)
        path = str(tmp_path / "subidx")
        substring_write_index(ev1, path)
        substring_append_index(ev2, path)  # incremental path included
        got = sorted(
            tuple(r)
            for r in substring_match_index(spark, path, corpus).collect()
        )
        want = sorted(
            tuple(r)
            for r in substring_decontamination_spans(
                corpus, ev1.unionByName(ev2), min_run=8
            ).collect()
        )
        assert got == want
        assert got == [(0, 3, 12, 10)]

    def test_match_scan_is_partition_pruned_and_broadcast(
        self, spark, tmp_path
    ):
        from crowdsorsa_etl_spark.operators.substring import (
            substring_match_index,
            substring_write_index,
        )

        corpus, ev1, ev2 = self._sets(spark)
        path = str(tmp_path / "subidx")
        substring_write_index(ev1.unionByName(ev2), path)
        plan = (
            substring_match_index(spark, path, corpus)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [pfx" in plan or "pfx IN" in plan, plan
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_empty_batch_returns_empty(self, spark, tmp_path):
        from crowdsorsa_etl_spark.operators.substring import (
            substring_match_index,
            substring_write_index,
        )

        corpus, ev1, _ = self._sets(spark)
        path = str(tmp_path / "subidx")
        substring_write_index(ev1, path)
        empty = corpus.filter(F.col("doc_id") < 0)
        assert substring_match_index(spark, path, empty).count() == 0

    def test_empty_batch_schema_follows_id_type(self, spark, tmp_path):
        """String doc ids: the empty-batch early return must carry the
        SAME id type as the non-empty path, not a hardcoded long."""
        from crowdsorsa_etl_spark.operators.substring import (
            substring_match_index,
            substring_write_index,
        )

        corpus, ev1, _ = self._sets(spark)
        str_corpus = corpus.withColumn(
            "doc_id", F.concat(F.lit("d"), F.col("doc_id").cast("string"))
        )
        path = str(tmp_path / "subidx")
        substring_write_index(ev1, path)
        nonempty = substring_match_index(spark, path, str_corpus)
        empty = substring_match_index(
            spark, path, str_corpus.filter(F.col("doc_id") == "never")
        )
        assert empty.schema == nonempty.schema
        assert empty.schema["doc_id"].dataType.typeName() == "string"
        assert empty.count() == 0


class TestSubstringSkewStress:
    """Adversarial 1000×-hot boilerplate shingle (round-9 verdict item):
    every document ends with the same 8-token boilerplate run — the shape
    that breaks a count-window-over-shingle formulation (all occurrences
    funnel through one sort partition, no partial-agg relief). The
    groupBy-count + semi-join form must (a) stay exact, and (b) collapse
    the hot key map-side: the only data-sized exchange keys on doc_id."""

    HOT = " ".join(f"boiler{j}" for j in range(8))  # exactly one k-window

    def _corpus(self, spark, n=400):
        rows = [
            (i, " ".join(f"u{i}w{j}" for j in range(10)) + " " + self.HOT)
            for i in range(n)
        ]
        # planted full-text duplicate: the one extra span pair expected
        rows.append((9000, rows[5][1]))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_exact_recall_under_hot_shingle(self, spark):
        from crowdsorsa_etl_spark.operators.substring import (
            duplicated_substring_spans,
        )

        n = 400
        docs = self._corpus(spark, n)
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicated_substring_spans(docs, min_run=8).collect()
        }
        # every doc's boilerplate tail (starts at 10, 8 tokens → 10..17) is
        # genuinely duplicated corpus-wide; docs 5/9000 duplicate entirely
        want = {(i, 10, 17) for i in range(n) if i != 5}
        want |= {(5, 0, 17), (9000, 0, 17)}
        assert got == want

    def test_hot_key_collapses_before_the_exchange(self, spark):
        """Plan gate: the count side pre-aggregates map-side
        (partial_count before its exchange), the duplicated-shingle set
        broadcasts into the semi join (no probe-side exchange on sh), and
        no Window is partitioned by the shingle key — the only data-sized
        hashpartitioning exchange keys on doc_id."""
        from crowdsorsa_etl_spark.operators.substring import (
            duplicated_substring_spans,
        )

        docs = self._corpus(spark)
        out = duplicated_substring_spans(docs, min_run=8)
        out.collect()  # AQE decides the join strategy from RUNTIME sizes
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "partial_count" in final
        # the count-filtered dup set is runtime-small → AQE broadcasts the
        # semi join; the hot key never keys a window or a sort partition
        assert "BroadcastHashJoin [sh" in final and "LeftSemi" in final
        assert "windowspecdefinition(sh" not in final
        assert "Exchange hashpartitioning(doc_id" in final

    def test_decontamination_exact_under_hot_shingle(self, spark):
        """Same fixture through the eval-overlap path: eval contains only
        the boilerplate run, so every corpus doc flags exactly its tail —
        the eval side broadcasts, no pairwise blowup."""
        from crowdsorsa_etl_spark.operators.substring import (
            substring_decontamination_spans,
        )

        n = 300
        docs = self._corpus(spark, n)
        eval_df = spark.createDataFrame([(100000, self.HOT)], ["doc_id", "text"])
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_decontamination_spans(
                docs, eval_df, min_run=8
            ).collect()
        }
        want = {(i, 10, 17) for i in range(n)} | {(9000, 10, 17)}
        assert got == want


class TestSpanContractProperty:
    """The executable approximation contract (VERDICT r11 next-#8): the
    k-shingle-run model flags EVERY duplicated span of >= k tokens (the
    guarantee), may miss spans < k (the documented approximation), and —
    stronger — equals a brute-force Python reference exactly on arbitrary
    corpora."""

    @staticmethod
    def _ref_spans(doc_tokens: dict, k: int):
        """Brute-force reference: k-window corpus counts -> flagged
        starts -> gap<=k islands -> (doc, start, end, n_tokens)."""
        from collections import Counter

        cnt = Counter()
        for toks in doc_tokens.values():
            for i in range(len(toks) - k + 1):
                cnt[tuple(toks[i : i + k])] += 1
        out = set()
        for d, toks in doc_tokens.items():
            flagged = [
                i
                for i in range(len(toks) - k + 1)
                if cnt[tuple(toks[i : i + k])] >= 2
            ]
            run: list[int] = []
            for p in flagged + [None]:
                if p is not None and (not run or p - run[-1] <= k):
                    run.append(p)
                    continue
                if run:
                    out.add((d, run[0], run[-1] + k - 1,
                             run[-1] - run[0] + k))
                run = [p] if p is not None else []
        return out

    def test_matches_bruteforce_reference_on_random_corpora(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        token = st.sampled_from(["aa", "ab", "ba", "bb", "cc"])
        doc = st.lists(token, min_size=0, max_size=28)

        @settings(max_examples=12, deadline=None)
        @given(
            docs=st.lists(doc, min_size=1, max_size=5),
            k=st.integers(min_value=2, max_value=5),
        )
        def check(docs, k):
            doc_tokens = {i: t for i, t in enumerate(docs)}
            got = set(
                _spans(spark, [" ".join(t) for t in docs], k)
            )
            assert got == self._ref_spans(doc_tokens, k)

        check()

    def test_every_planted_duplicate_ge_k_is_fully_covered(self, spark):
        """The guarantee direction, asserted directly: plant a shared
        substring of length L >= k into two docs of unique filler — the
        planted token range must be covered by emitted spans in BOTH
        docs; an L < k plant carries no guarantee (and with unique
        filler is provably missed)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=10, deadline=None)
        @given(
            k=st.integers(min_value=2, max_value=6),
            extra=st.integers(min_value=-1, max_value=6),
            off1=st.integers(min_value=0, max_value=8),
            off2=st.integers(min_value=0, max_value=8),
            data=st.data(),
        )
        def check(k, extra, off1, off2, data):
            L = k + extra  # extra == -1 -> the below-threshold case
            plant = [
                data.draw(st.sampled_from(["pa", "pb", "pc"]))
                for _ in range(L)
            ]
            d0 = [f"u{i}" for i in range(off1)] + plant + ["u90", "u91"]
            d1 = [f"v{i}" for i in range(off2)] + plant + ["v90"]
            got = _spans(spark, [" ".join(d0), " ".join(d1)], k)
            covered0 = set()
            covered1 = set()
            for doc_id, s, e, _n in got:
                tgt = covered0 if doc_id == 0 else covered1
                tgt.update(range(s, e + 1))
            plant0 = set(range(off1, off1 + L))
            plant1 = set(range(off2, off2 + L))
            if L >= k:
                assert plant0 <= covered0 and plant1 <= covered1
            else:
                # below threshold with unique filler: provably missed
                assert not got

        check()
