"""Audio modality: WAV codec round-trip, decode guards, frame features."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.audiocodec import (
    decode_wav,
    encode_wav_pcm16,
)
from crowdsorsa_etl_spark.operators.multimodal import (
    attach_wav_payload,
    audio_frame_features,
)


class TestCodec:
    def test_roundtrip_mono(self):
        s = np.array([0, 1, -1, 32767, -32768, 256], dtype=np.int16)
        payload = encode_wav_pcm16(s, sample_rate=8000)
        back, rate, ch = decode_wav(payload)
        assert rate == 8000 and ch == 1
        assert np.array_equal(back, s)

    def test_roundtrip_stereo(self):
        s = np.arange(8, dtype=np.int16)
        payload = encode_wav_pcm16(s, sample_rate=44100, channels=2)
        back, rate, ch = decode_wav(payload)
        assert rate == 44100 and ch == 2
        assert back.shape == (4, 2)
        assert np.array_equal(back.reshape(-1), s)

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"\x89PNG\r\n\x1a\nrest")

    def test_rejects_truncated_container(self):
        payload = encode_wav_pcm16(np.array([1, 2, 3], dtype=np.int16))
        with pytest.raises(ValueError):
            decode_wav(payload[:10])


class TestFrameFeatures:
    def _features(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = audio_frame_features(attach_wav_payload(df)).collect()
        return {r["doc_id"]: r for r in rows}

    def test_sample_values_and_energy(self, spark):
        # 'A' = 0x41 = 65 -> sample (65-128)*256 = -16128
        got = self._features(spark, ["A"])[0]
        assert got["n_samples"] == 1
        assert got["sample_rate"] == 16000
        assert got["n_frames"] == 1
        assert got["energy_sum"] == 16128 * 16128
        assert got["max_frame_energy"] == 16128 * 16128
        assert got["zero_crossings"] == 0

    def test_zero_crossings_split_at_0x80(self, spark):
        # bytes: 'A'(65, neg) '\xc3\xa9' é utf-8 (195 pos, 169 pos) -> one crossing
        got = self._features(spark, ["Aé"])[0]
        assert got["n_samples"] == 3
        assert got["zero_crossings"] == 1

    def test_framing_matches_stft_convention(self, spark):
        text = "x" * 200  # 200 samples >= frame 64: (200-64)//32+1 = 5 frames
        got = self._features(spark, [text])[0]
        assert got["n_frames"] == 5
        v = (ord("x") - 128) * 256
        assert got["max_frame_energy"] == 64 * v * v
        assert got["energy_sum"] == 5 * 64 * v * v

    def test_empty_text_gets_one_zero_byte(self, spark):
        got = self._features(spark, [""])[0]
        assert got["n_samples"] == 1
        # byte 0 -> sample (0-128)*256
        assert got["energy_sum"] == (128 * 256) ** 2

    def test_guard(self, spark):
        df = attach_wav_payload(
            spark.createDataFrame([(1, "a")], "doc_id long, text string")
        )
        with pytest.raises(ValueError, match="frame"):
            audio_frame_features(df, frame=0)


class TestAudioFingerprintDups:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )

    def test_signatures_match_python_reference(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            _ahash_bands_from_flat,
            audio_frame_signatures,
        )

        texts = ["hello world " * 12, "ab"]
        wav = attach_wav_payload(self._docs(spark, texts))
        got = {
            (r.doc_id, r.frame_idx): list(r.bands)
            for r in audio_frame_signatures(wav).collect()
        }
        for doc_id, text in enumerate(texts):
            body = text.encode()[:256] or b"\x00"
            samples = [(b - 128) * 256 for b in body]
            nf = max(1, -(-len(samples) // 64))
            for f in range(nf):
                win = samples[f * 64 : (f + 1) * 64]
                assert got[(doc_id, f)] == _ahash_bands_from_flat(win)
        assert len(got) == sum(
            max(1, -(-len((t.encode()[:256] or b"\x00")) // 64))
            for t in texts
        )

    def test_duplicate_clips_match(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            audio_fingerprint_dups,
        )

        t = "same audio content " * 6  # 114 bytes -> 2 windows
        wav = attach_wav_payload(
            self._docs(spark, [t, t, "completely different signal " * 5])
        )
        rows = audio_fingerprint_dups(wav).collect()
        assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]
        assert rows[0].matched_frames == rows[0].n_sigs_a == rows[0].n_sigs_b

    def test_min_shared_and_guards(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            audio_fingerprint_dups,
        )

        base = bytes(range(64, 192)).decode("latin-1")  # 2 windows
        other = base[:64] + ("z" * 64)  # shares exactly window 0
        wav = attach_wav_payload(self._docs(spark, [base, base, other]))
        got2 = {
            (r.id_a, r.id_b)
            for r in audio_fingerprint_dups(wav, min_shared=2).collect()
        }
        assert (0, 1) in got2 and (0, 2) not in got2
        with pytest.raises(ValueError, match="min_shared"):
            audio_fingerprint_dups(wav, min_shared=0)
        with pytest.raises(ValueError, match="frame"):
            audio_fingerprint_dups(wav, frame=0)

    def test_malformed_payload_contributes_nothing(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            audio_frame_signatures,
        )

        bad = spark.createDataFrame(
            [(1, bytearray(b"not a wav")), (2, None)],
            "doc_id long, payload binary",
        )
        assert audio_frame_signatures(bad).count() == 0

    def test_pair_join_is_hash_keyed_on_bands(self, spark):
        import re

        from crowdsorsa_etl_spark.operators.multimodal import (
            audio_fingerprint_dups,
        )

        wav = attach_wav_payload(self._docs(spark, ["a" * 70, "b" * 70]))
        plan = audio_fingerprint_dups(wav)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert re.search(r"Join \[bands#\d+\], \[bands#\d+\]", plan)


class TestStopFingerprintKnob:
    def test_max_freq_drops_hot_fingerprint(self, spark):
        """The silence/black-frame case: many clips share one window, two
        also share a rare window. With max_freq the hot bucket vanishes
        from matching — pairs exist only via rare shared content, and the
        n_sigs_* counts reflect kept signatures only."""
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_wav_payload,
            audio_fingerprint_dups,
        )

        silence = "\x00" * 64  # identical window for every clip
        rare = bytes(range(100, 164)).decode("latin-1")
        texts = [silence + rare, silence + rare] + [
            silence + bytes(range(i, i + 64)).decode("latin-1")
            for i in range(3, 23)
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        wav = attach_wav_payload(docs)
        # without the knob: every pair of the 22 clips matches on silence
        n_all = audio_fingerprint_dups(wav).count()
        assert n_all == 22 * 21 // 2
        got = audio_fingerprint_dups(wav, max_freq=5).collect()
        # docs 0/1 match only via their rare windows (the >=0x80 chars
        # encode to 2 UTF-8 bytes, so 'rare' spans two windows)
        assert [(r.id_a, r.id_b, r.matched_frames) for r in got] == [
            (0, 1, 2)
        ]
        # counts exclude the dropped stop-fingerprint
        assert got[0].n_sigs_a == got[0].n_sigs_b == 2
        import pytest

        with pytest.raises(ValueError, match="max_freq"):
            audio_fingerprint_dups(wav, max_freq=0)

    def test_video_knob_threads_through(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            video_ahash_dups,
        )

        shared = "Z" * 64
        texts = [shared + "a", shared + "b", shared + "c", shared + "d"]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        avi = attach_avi_payload(docs, codec="raw")
        assert video_ahash_dups(avi).count() == 6  # all pairs via Z-frame
        assert video_ahash_dups(avi, max_freq=3).count() == 0
