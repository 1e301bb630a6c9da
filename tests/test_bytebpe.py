"""Byte-level BPE (operators/bytebpe.py): byte-fallback zero-OOV
guarantee, multibyte UTF-8 decomposition, learn semantics, and the
lossless decode property."""

from __future__ import annotations

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.bytebpe import (
    BYTE_ALPHABET,
    _byte_seed,
    _encode_word_seq,
    bytebpe_decode,
    bytebpe_encode,
    bytebpe_learn,
    bytebpe_oov_stats,
    bytebpe_vocab,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestByteSeed:
    def test_ascii(self):
        assert _byte_seed("he") == ["68", "65"]

    def test_multibyte_utf8(self):
        # 'é' is C3 A9 in UTF-8 — two base symbols, no OOV path
        assert _byte_seed("é") == ["C3", "A9"]
        assert _byte_seed("hät") == ["68", "C3", "A4", "74"]

    def test_alphabet_closed(self):
        assert len(BYTE_ALPHABET) == 256
        assert BYTE_ALPHABET[0] == "00" and BYTE_ALPHABET[255] == "FF"


class TestLearn:
    def test_hand_computed_merge(self, spark):
        # "ab ab ac": pair (61,62) appears twice -> first merge
        df = _docs(spark, [(1, "ab ab ac")])
        got = bytebpe_learn(df, n_merges=2).collect()
        assert (got[0]["merge_rank"], got[0]["pair"], got[0]["total"]) == (
            1,
            "61 62",
            2,
        )
        # after merging 61+62 -> 6162, remaining pairs: (61,63) x1 — and
        # no (6162, x): words are 2 symbols -> 1 symbol
        assert (got[1]["pair"], got[1]["total"]) == ("61 63", 1)

    def test_multibyte_merge_crosses_byte_boundary(self, spark):
        # 'éé' = C3 A9 C3 A9: top pair is a byte pair from INSIDE the
        # character stream — byte-level BPE merges sub-character units
        df = _docs(spark, [(1, "éé éé")])
        got = bytebpe_learn(df, n_merges=1).collect()
        assert got[0]["pair"] in ("A9 C3", "C3 A9")
        assert got[0]["total"] >= 2


class TestEncodeLossless:
    def test_tokens_decode_back_to_bytes(self, spark):
        """Concatenated token hex == the word's UTF-8 hex for every word:
        byte-level tokens are a lossless partition of the byte stream."""
        df = _docs(spark, [(1, "hello héllo"), (2, "ääkkönen")])
        merges = [
            tuple(r["pair"].split(" "))
            for r in bytebpe_learn(df, n_merges=4).collect()
        ]
        from crowdsorsa_etl_spark.operators.bytebpe import _encode_word_seq

        rank_of = {tuple(p): i for i, p in enumerate(merges)}
        pair_at = list(map(tuple, merges))
        for w in ("hello", "héllo", "ääkkönen"):
            syms = _encode_word_seq(_byte_seed(w), rank_of, pair_at)
            assert bytes.fromhex("".join(syms)) == w.encode("utf-8")

    def test_encode_output_shape(self, spark):
        df = _docs(spark, [(1, "aa aa"), (2, "")])
        merges = [("61", "61")]
        got = {r["doc_id"]: r["n_tokens"] for r in bytebpe_encode(df, merges).collect()}
        # "aa" = 61 61 -> one merged token; empty doc dropped (both engines)
        assert got == {1: 2}


class TestZeroOOV:
    def test_oov_exactly_zero_on_bpe_oov_probe(self, spark):
        """VERDICT r11 next-#2 'done' gate: on the llm_bpe_oov fixture
        (part p_name — its 'z'-bearing words are OOV for the char-level
        documents vocabulary), the byte-level vocabulary's measured OOV
        count is exactly 0."""
        from crowdsorsa_etl_spark.sources.parquet import load_table

        docs = load_table(spark, "documents", SF_DIR)
        part = load_table(spark, "part", SF_DIR)
        merges = [
            tuple(r["pair"].split(" "))
            for r in bytebpe_learn(docs, n_merges=12).collect()
        ]
        row = bytebpe_oov_stats(part, merges, text_col="p_name").collect()[0]
        assert row["n_unk"] == 0
        assert row["unk_frac"] == 0.0
        assert row["n_words"] > 0
        # contrast: the char-level gate on the same probe is NONZERO
        # (documents alphabet lacks 'z'), so zero here is the byte
        # fallback, not a degenerate probe
        probe_chars = set(
            "".join(
                r["word"]
                for r in part.select(
                    F.explode(F.split(F.lower(F.col("p_name")), " ")).alias(
                        "word"
                    )
                ).collect()
            )
        )
        doc_chars = set(
            "".join(r["text"].lower() for r in docs.select("text").collect())
        )
        assert probe_chars - doc_chars, "probe no longer exercises OOV"

    def test_control_bytes_and_emoji_encode(self, spark):
        df = _docs(spark, [(1, "ab ab")])
        merges = [
            tuple(r["pair"].split(" "))
            for r in bytebpe_learn(df, n_merges=1).collect()
        ]
        probe = _docs(spark, [(1, "\x01weird 🎉emoji")])
        row = bytebpe_oov_stats(probe, merges, text_col="text").collect()[0]
        assert row["n_unk"] == 0 and row["n_words"] == 2


class TestVocab:
    def test_fixed_base_plus_merges(self):
        vocab = bytebpe_vocab([("61", "62"), ("6162", "63")])
        assert len(vocab) == 258
        d = dict(vocab)
        assert d["00"] == 0 and d["FF"] == 255
        assert d["6162"] == 256 and d["616263"] == 257


class TestTokenIds:
    def test_structural_ids_and_stream(self, spark):
        import hashlib

        from crowdsorsa_etl_spark.operators.bytebpe import bytebpe_token_ids

        df = spark.createDataFrame(
            [(1, "ab ab"), (2, "")], "doc_id long, text string"
        )
        merges = [("61", "62")]  # 'ab' -> token id 256
        got = {
            r["doc_id"]: (r["n_tokens"], r["ids_md5"])
            for r in bytebpe_token_ids(df, merges).collect()
        }
        want = hashlib.md5(b"256,256").hexdigest()
        assert got == {1: (2, want)}  # empty doc dropped

    def test_collision_guard_raises(self, spark):
        import pytest

        from crowdsorsa_etl_spark.operators.bytebpe import bytebpe_token_ids

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        # two merge entries yielding the same token string
        with pytest.raises(ValueError, match="collide"):
            bytebpe_token_ids(df, [("61", "6263"), ("6162", "63")])


class TestDecodeRoundtripProperty:
    """decode(encode(w)) == w.encode('utf-8') for ARBITRARY unicode words
    under ARBITRARY merge tables — the losslessness contract as a
    hypothesis property, not a fixture spot-check. Pure-Python word level
    (the Arrow stage applies the identical _encode_word_seq per word), so
    the property runs at full example count without a Spark job."""

    @staticmethod
    def _merge_table(word_bytes: list[list[str]], picks: list[int]):
        """Build a deterministic merge list by repeatedly merging the
        pick-th adjacent pair of the evolving symbol sequences — every
        prefix of the result is a valid learned-table shape (each merged
        token's halves exist when the merge is declared)."""
        seqs = [list(s) for s in word_bytes]
        merges: list[tuple[str, str]] = []
        for p in picks:
            pairs = sorted(
                {
                    (s[i], s[i + 1])
                    for s in seqs
                    for i in range(len(s) - 1)
                }
            )
            if not pairs:
                break
            pair = pairs[p % len(pairs)]
            merges.append(pair)
            rank_of = {tuple(m): i for i, m in enumerate(merges)}
            pair_at = list(map(tuple, merges))
            seqs = [
                _encode_word_seq(s, rank_of, pair_at) for s in
                [list(s) for s in word_bytes]
            ]
        return merges

    def test_roundtrip_arbitrary_words_and_merges(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            words=st.lists(
                st.text(min_size=1, max_size=12), min_size=1, max_size=6
            ),
            picks=st.lists(
                st.integers(min_value=0, max_value=50),
                min_size=0,
                max_size=8,
            ),
        )
        def prop(words, picks):
            seeds = [_byte_seed(w) for w in words]
            merges = self._merge_table(seeds, picks)
            rank_of = {tuple(p): i for i, p in enumerate(merges)}
            pair_at = list(map(tuple, merges))
            vocab = {t for t, _ in bytebpe_vocab(merges)}
            for w, seed in zip(words, seeds):
                syms = _encode_word_seq(list(seed), rank_of, pair_at)
                # losslessness: decode inverts encode with no vocabulary
                assert bytebpe_decode(syms) == w.encode("utf-8")
                # closedness: every emitted symbol is in the vocab (zero
                # OOV by construction — the byte-fallback guarantee)
                assert set(syms) <= vocab
                assert 1 <= len(syms) <= len(seed)

        prop()
