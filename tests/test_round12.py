"""Round-12 gates: iterated unigram-LM training (EM + prune convergence,
feasibility invariant), and the caption↔image paired-dedup class logic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.unigram import (
    piece_costs,
    unigram_em_counts,
    unigram_seed_vocab,
    unigram_train,
)


def _vocab_dict(df):
    return {r["piece"]: r["cnt"] for r in df.collect()}


class TestUnigramTrain:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "banana bandana banana"),
                (1, "bandana ban banana"),
                (2, "ana ban band banana"),
            ],
            ["doc_id", "text"],
        )

    def test_one_round_no_prune_equals_em_step(self, spark):
        # alpha=0: train(1 round) == seed costs -> em counts, chars floored
        docs = self._docs(spark)
        got = _vocab_dict(unigram_train(docs, n_rounds=1, prune_alpha=0.0))
        seed = unigram_seed_vocab(docs).collect()
        costs = piece_costs(seed)
        em = {
            r["piece"]: r["new_cnt"]
            for r in unigram_em_counts(docs, costs).collect()
        }
        chars = {r["piece"] for r in seed if len(r["piece"]) == 1}
        want = {p: c for p, c in em.items() if len(p) > 1}
        for ch in chars:
            want[ch] = max(em.get(ch, 0), 1)
        assert got == want

    def test_prune_drops_bottom_quarter_multichar_only(self, spark):
        docs = self._docs(spark)
        unpruned = _vocab_dict(unigram_train(docs, n_rounds=1, prune_alpha=0.0))
        pruned = _vocab_dict(unigram_train(docs, n_rounds=1, prune_alpha=0.25))
        multi = sorted(
            ((p, c) for p, c in unpruned.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        n_drop = len(multi) // 4
        dropped = {p for p, _ in multi[:n_drop]}
        assert set(unpruned) - set(pruned) == dropped
        # every single char survives pruning
        chars = {p for p in unpruned if len(p) == 1}
        assert chars <= set(pruned)

    def test_chars_always_feasible_at_extreme_prune(self, spark):
        # alpha near 1 prunes almost every multi-char piece; every corpus
        # word must still be segmentable (single chars floored at cnt 1)
        docs = self._docs(spark)
        vocab = _vocab_dict(unigram_train(docs, n_rounds=3, prune_alpha=0.875))
        chars = {p for p in vocab if len(p) == 1}
        corpus_chars = set("".join(r["text"] for r in docs.collect())) - {" "}
        assert corpus_chars <= chars
        assert all(c >= 1 for c in vocab.values())

    def test_convergence_vocab_stabilizes(self, spark):
        # once pruning stops removing pieces, further EM rounds are a
        # fixed point: train(k) == train(k+1) for some small k
        docs = self._docs(spark)
        prev = None
        for k in range(1, 7):
            cur = _vocab_dict(
                unigram_train(docs, n_rounds=k, prune_alpha=0.25)
            )
            if prev is not None and cur == prev:
                break
            prev = cur
        else:
            pytest.fail("vocabulary did not converge within 6 EM rounds")

    def test_rejects_bad_params(self, spark):
        docs = self._docs(spark)
        with pytest.raises(ValueError, match="n_rounds"):
            unigram_train(docs, n_rounds=0)
        with pytest.raises(ValueError, match="prune_alpha"):
            unigram_train(docs, prune_alpha=1.0)


class TestCaptionImageDups:
    def test_classes_partition_the_pair_set(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        out = QUERIES["llm_caption_image_dups"](
            spark, "/root/testdata/sf0.001"
        )
        rows = out.collect()
        assert rows, "paired tier produced no pairs at sf0.001"
        for r in rows:
            if r["dup_class"] == "both":
                assert r["hamming"] is not None and r["n_bands_matched"]
            elif r["dup_class"] == "image_only":
                assert r["hamming"] is not None
                assert r["n_bands_matched"] is None
            else:
                assert r["dup_class"] == "caption_only"
                assert r["hamming"] is None
        # pair keys are unique across the outer join
        keys = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(keys) == len(set(keys))


class TestMultipassLinkage:
    def test_union_blocking_recall_and_honest_residual(self, spark):
        """Multi-pass blocking must catch every record at most one of
        whose pass keys is mangled; the only permitted misses are records
        mangled in BOTH pass keys (k%12 == 0) — and those misses must
        actually exist (the residual is honest, not vacuous)."""
        from crowdsorsa_etl_spark.queries.round12_pack import (
            llm_record_linkage_multipass,
        )

        got = llm_record_linkage_multipass(
            spark, "/root/testdata/sf0.001"
        ).collect()
        true_found = {
            r["c_custkey"] for r in got if r["c_custkey"] == r["d_custkey"]
        }
        all_keys = {
            r["c_custkey"]
            for r in spark.read.parquet(
                "/root/testdata/sf0.001/customer.parquet"
            ).collect()
        }
        # the union of passes: any key NOT mangled in both block fields
        # must be blocked by at least one pass
        must_find = {k for k in all_keys if k % 3 != 0 or k % 4 != 0}
        assert must_find <= true_found
        missed = all_keys - true_found
        assert missed, "expected an honest residual (both keys mangled)"
        assert all(k % 12 == 0 for k in missed)
        # score level: any found true pair with < 3 perturbed fields
        # classifies match/possible (the r11 score-FN contract holds)
        by_key = {
            r["c_custkey"]: r
            for r in got
            if r["c_custkey"] == r["d_custkey"]
        }
        for k, r in by_key.items():
            n_pert = (k % 3 == 0) + (k % 4 == 0) + (k % 5 == 0)
            if n_pert < 3:
                assert r["fs_class"] in ("match", "possible"), r
        # dedup before scoring: each pair appears exactly once even when
        # both passes produce it
        pair_keys = [(r["c_custkey"], r["d_custkey"]) for r in got]
        assert len(pair_keys) == len(set(pair_keys))

    def test_multipass_rejects_empty_passes(self, spark):
        from crowdsorsa_etl_spark.operators.linkage import fs_link_multipass

        df = spark.createDataFrame([(1, "a")], "id long, blk string")
        with pytest.raises(ValueError, match="blocking pass"):
            fs_link_multipass(
                df,
                df.withColumnRenamed("id", "rid"),
                left_id="id",
                right_id="rid",
                block_passes=[],
                features={},
                weights={},
                upper=1.0,
                lower=0.0,
            )


class TestBitextMargin:
    def test_margin_demotes_popular_target(self, spark):
        """Artetxe-Schwenk's point: the margin re-ranks away from targets
        with inflated neighborhoods. In this 2-D fixture, target 3 is the
        'hub' (highest backward k-NN sum); source 2's best COSINE is 3 but
        its best MARGIN is 1 — asserted against a pure-python replay."""
        import math

        from crowdsorsa_etl_spark.operators.similarity import (
            bitext_margin_pairs,
        )

        src_vecs = {0: (1.0, 0.0), 2: (0.95, 0.31), 4: (0.31, 0.95),
                    6: (0.0, 1.0)}
        tgt_vecs = {1: (0.85, 0.53), 3: (0.98, 0.2)}
        k = 2
        emb = spark.createDataFrame(
            [(i, list(v)) for i, v in {**src_vecs, **tgt_vecs}.items()],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["src_id"]: (r["tgt_id"], r["margin"])
            for r in bitext_margin_pairs(
                emb.filter(F.col("vec_id") % 2 == 0),
                emb.filter(F.col("vec_id") % 2 == 1),
                k=k,
            ).collect()
        }

        def _cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(
                d
                / (
                    math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b))
                ),
                6,
            )

        c6 = {
            (s, t): int(round(_cos(sv, tv) * 1e6))
            for s, sv in src_vecs.items()
            for t, tv in tgt_vecs.items()
        }
        fa = {
            s: sum(sorted((c6[(s, t)] for t in tgt_vecs), reverse=True)[:k])
            for s in src_vecs
        }
        fb = {
            t: sum(sorted((c6[(s, t)] for s in src_vecs), reverse=True)[:k])
            for t in tgt_vecs
        }
        want = {}
        for s in src_vecs:
            best = max(
                tgt_vecs,
                key=lambda t: (
                    round((c6[(s, t)] * 2 * k) / (fa[s] + fb[t]), 6),
                    -t,
                ),
            )
            want[s] = (
                best,
                round((c6[(s, best)] * 2 * k) / (fa[s] + fb[best]), 6),
            )
        assert got == want
        # the flip itself: source 2's raw-cosine argmax is the hub (3)...
        assert c6[(2, 3)] > c6[(2, 1)]
        # ...but the margin picks 1
        assert got[2][0] == 1

    def test_rejects_bad_k(self, spark):
        from crowdsorsa_etl_spark.operators.similarity import (
            bitext_margin_pairs,
        )

        emb = spark.createDataFrame(
            [(0, [1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="k must be"):
            bitext_margin_pairs(emb, emb, k=0)


class TestEpochUpsample:
    def test_epoch_counts_and_weight_semantics(self, spark):
        from crowdsorsa_etl_spark.operators.curation import (
            epoch_upsample,
            hash_bucket,
        )

        docs = spark.createDataFrame(
            [(i, "wiki" if i % 2 == 0 else "web") for i in range(200)],
            "doc_id long, source string",
        )
        out = epoch_upsample(docs, {"wiki": 2.5, "web": 0.5}).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
        buckets = {
            r["doc_id"]: r["b"]
            for r in docs.select(
                "doc_id",
                hash_bucket(
                    F.concat(
                        F.lit("epoch:"), F.col("doc_id").cast("string")
                    )
                ).alias("b"),
            ).collect()
        }
        for i in range(200):
            w = 2.5 if i % 2 == 0 else 0.5
            extra = 1 if buckets[i] < int((w - int(w)) * 256) else 0
            want = int(w) + extra
            got = sorted(by_doc.get(i, []))
            assert got == list(range(want)), (i, w, got)
        # a 0-epoch doc (web, bucket >= 128) must exist and be absent
        assert any(i not in by_doc for i in range(1, 200, 2))
        # expected mass ~ w: wiki docs average ~2.5 epochs
        wiki_epochs = sum(len(v) for i, v in by_doc.items() if i % 2 == 0)
        assert 2.0 * 100 <= wiki_epochs <= 3.0 * 100

    def test_rejects_negative_weight(self, spark):
        from crowdsorsa_etl_spark.operators.curation import epoch_upsample

        docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError, match="negative weight"):
            epoch_upsample(docs, {"a": -1.0})


class TestTypeTokenGrowth:
    def test_cumulative_counts_match_bruteforce(self, spark):
        from crowdsorsa_etl_spark.operators.curation import type_token_growth

        rows = [
            (0, "a b c"),
            (1, "a b d d"),
            (2, "e"),
            (3, "a e f f f"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["bucket"]: (r["cum_tokens"], r["cum_vocab"])
            for r in type_token_growth(docs, buckets=2).collect()
        }
        # bucket 0 = docs 0-1 (floor((id-0)*2/4)): 7 tokens, types a b c d
        # bucket 1 = docs 2-3: +6 tokens, new types e f
        assert got == {0: (7, 4), 1: (13, 6)}

    def test_vocab_monotone_and_bounded_by_tokens(self, spark):
        from crowdsorsa_etl_spark.operators.curation import type_token_growth

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = type_token_growth(docs, buckets=5).orderBy("bucket").collect()
        assert len(out) == 5
        for prev, cur in zip(out, out[1:]):
            assert cur["cum_tokens"] >= prev["cum_tokens"]
            assert cur["cum_vocab"] >= prev["cum_vocab"]
        assert all(r["cum_vocab"] <= r["cum_tokens"] for r in out)

    def test_rejects_bad_buckets(self, spark):
        from crowdsorsa_etl_spark.operators.curation import type_token_growth

        docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="buckets"):
            type_token_growth(docs, buckets=0)


class TestCdcChunkDedup:
    def test_insertion_shifts_one_chunk(self, spark):
        """The CDC property fixed-size blocking lacks: inserting one byte
        near the front changes only the chunk containing the insertion —
        every later chunk (content-addressed) still dedups."""
        from crowdsorsa_etl_spark.operators.dedup import cdc_chunk_stats

        base = "the quick brown fox jumps over the lazy dog " * 5
        edited = "X" + base  # one-byte insertion at the very front
        docs = spark.createDataFrame(
            [(0, base), (1, edited)], ["doc_id", "text"]
        )
        dups = cdc_chunk_stats(docs).collect()
        # shared tail chunks dedup across the pair despite the shift
        assert any(r["n_docs"] == 2 for r in dups)

    def test_chunks_reassemble_exactly(self, spark):
        """Boundary bookkeeping: per-doc chunk lengths must sum to the
        byte length, for unicode and short/empty docs alike."""
        from crowdsorsa_etl_spark.operators.dedup import cdc_chunk_stats

        texts = ["abc", "", "ä" * 100, "z" * 300, None]
        # run the public operator on a corpus of two copies so every chunk
        # is a dup, then total dup bytes must equal twice the (truncated)
        # byte length of every document — unicode, empty, and None alike
        dup_docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)]
            + [(100 + i, t) for i, t in enumerate(texts)],
            ["doc_id", "text"],
        )
        out = cdc_chunk_stats(dup_docs).collect()
        total_dup_bytes = sum(r["chunk_len"] * r["n_copies"] for r in out)
        want = 2 * sum(
            min(len((t or "").encode("utf-8")), 256) for t in texts
        )
        assert total_dup_bytes == want

    def test_rejects_bad_k(self, spark):
        from crowdsorsa_etl_spark.operators.dedup import cdc_chunk_stats

        docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="k must be"):
            cdc_chunk_stats(docs, k=1)


class TestClusterPolicy:
    def test_flag_propagates_to_every_member(self, spark):
        from crowdsorsa_etl_spark.queries.round12_pack import (
            llm_cluster_policy,
        )

        rows = llm_cluster_policy(spark, "/root/testdata/sf0.001").collect()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        assert rows
        saw_propagation = False
        for members in by_cluster.values():
            any_restricted = any(m["restricted"] for m in members)
            # every member agrees with the cluster verdict
            assert all(
                m["cluster_tainted"] == any_restricted for m in members
            )
            if any_restricted and any(
                not m["restricted"] for m in members
            ):
                saw_propagation = True  # a clean doc tainted by a dup
        # the fixture must actually exercise cross-member propagation
        assert saw_propagation


class TestStratifiedSplit:
    def test_exact_counts_per_stratum(self, spark):
        from crowdsorsa_etl_spark.operators.curation import stratified_split

        rows = [(i, "a" if i < 37 else "b") for i in range(100)]
        docs = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = stratified_split(
            docs, strata_cols=["lang"], train_pct=90, val_pct=5
        ).collect()
        by = {}
        for r in out:
            by.setdefault(r["lang"], []).append(r["split"])
        # a: 37 docs -> 33 train / 1 val / 3 test; b: 63 -> 56/3/4
        for lang, n in (("a", 37), ("b", 63)):
            got = by[lang]
            assert got.count("train") == n * 90 // 100
            assert got.count("val") == n * 5 // 100
            assert got.count("test") == n - n * 90 // 100 - n * 5 // 100

    def test_deterministic_across_runs(self, spark):
        from crowdsorsa_etl_spark.operators.curation import stratified_split

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "lang")
        a = stratified_split(docs, strata_cols=["lang"]).collect()
        b = stratified_split(docs, strata_cols=["lang"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_rejects_bad_args(self, spark):
        from crowdsorsa_etl_spark.operators.curation import stratified_split

        docs = spark.createDataFrame([(1, "a")], ["doc_id", "lang"])
        with pytest.raises(ValueError, match="strata_cols"):
            stratified_split(docs, strata_cols=[])
        with pytest.raises(ValueError, match="percentages"):
            stratified_split(docs, strata_cols=["lang"], train_pct=99, val_pct=2)


class TestDatasetCard:
    def test_shares_and_dup_rates_consistent(self, spark):
        from crowdsorsa_etl_spark.queries.round12_pack import llm_dataset_card

        rows = llm_dataset_card(spark, "/root/testdata/sf0.001").collect()
        assert rows
        assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert 0 <= r["dup_rate"] <= 1
            assert r["n_exact_dup_docs"] <= r["n_docs"]
            assert r["n_langs"] >= 1
