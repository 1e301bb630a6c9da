"""MJPEG-in-AVI codec gates: genuine RIFF container round-trip, per-frame
pixel fidelity through the stdlib JPEG decoder, malformed-payload error
contract, and the Spark-side frame-sampling operator."""

from __future__ import annotations

import numpy as np
import pytest

from crowdsorsa_etl_spark.functions.jpegcodec import decode_jpeg
from crowdsorsa_etl_spark.functions.videocodec import (
    decode_avi,
    encode_avi_mjpeg,
)


def _frames(n=3, h=16, w=8, seed=0):
    rng = np.random.RandomState(seed)
    # smooth gradients keep JPEG quality-90 error small for fidelity asserts
    base = np.linspace(0, 200, h * w).reshape(h, w)
    return [
        np.clip(base + rng.randint(0, 40), 0, 255).astype(np.uint8)
        for _ in range(n)
    ]


class TestAviRoundtrip:
    def test_container_geometry(self):
        avi = encode_avi_mjpeg(_frames(3), fps=5)
        jpegs, codec, fps, w, h = decode_avi(avi)
        assert (len(jpegs), codec, fps, w, h) == (3, 'MJPG', 5, 8, 16)

    def test_frame_pixels_survive(self):
        frames = _frames(4)
        jpegs, *_ = decode_avi(encode_avi_mjpeg(frames, quality=95))
        for src, j in zip(frames, jpegs):
            got = decode_jpeg(j)[:, :, 0].astype(float)
            rmse = float(np.sqrt(np.mean((got - src.astype(float)) ** 2)))
            assert rmse < 12.0  # quality-95 gray: frames are recognizable

    def test_single_frame_and_odd_sizes(self):
        for h, w in ((8, 8), (24, 16), (9, 7)):
            f = [np.arange(h * w, dtype=np.uint8).reshape(h, w) % 255]
            jpegs, _, fps, gw, gh = decode_avi(encode_avi_mjpeg(f, fps=30))
            assert (len(jpegs), gw, gh) == (1, w, h)
            img = decode_jpeg(jpegs[0])
            assert img.shape[:2] == (h, w)

    def test_rgb_frames(self):
        rgb = [
            np.dstack([f, f, f[::-1]]).astype(np.uint8) for f in _frames(2)
        ]
        jpegs, _, _, w, h = decode_avi(encode_avi_mjpeg(rgb))
        assert (w, h) == (8, 16)
        assert decode_jpeg(jpegs[0]).shape == (16, 8, 3)


class TestAviValidation:
    def test_encode_rejects_bad_input(self):
        with pytest.raises(ValueError, match="at least one"):
            encode_avi_mjpeg([])
        with pytest.raises(ValueError, match="geometry"):
            encode_avi_mjpeg(
                [np.zeros((8, 8), np.uint8), np.zeros((16, 8), np.uint8)]
            )
        with pytest.raises(ValueError, match="fps"):
            encode_avi_mjpeg([np.zeros((8, 8), np.uint8)], fps=0)

    def test_decode_rejects_malformed(self):
        avi = encode_avi_mjpeg(_frames(2))
        with pytest.raises(ValueError, match="RIFF"):
            decode_avi(b"nope" + avi[4:])
        with pytest.raises(ValueError, match="not an AVI"):
            decode_avi(avi[:8] + b"WAVE" + avi[12:])
        with pytest.raises(ValueError, match="truncated"):
            decode_avi(avi[: len(avi) // 2])
        with pytest.raises(ValueError, match="codec"):
            decode_avi(avi.replace(b"vidsMJPG", b"vidsH264", 1))

    def test_decode_rejects_frame_count_mismatch(self):
        avi = bytearray(encode_avi_mjpeg(_frames(2)))
        # avih dwTotalFrames lives 16 bytes into the avih body
        pos = avi.find(b"avih") + 8 + 16
        avi[pos:pos + 4] = (99).to_bytes(4, "little")
        with pytest.raises(ValueError, match="frames"):
            decode_avi(bytes(avi))


class TestDecodeVideoFrames:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )

    def test_geometry_rule_and_sampling(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            decode_video_frames,
        )

        texts = ["x" * 3, "y" * 4, "z" * 5, ""]  # n_frames = 1, 2, 3, 1
        avi = attach_avi_payload(self._docs(spark, texts))
        out = {
            (r.doc_id, r.frame_idx): r
            for r in decode_video_frames(avi, every_n=2).collect()
        }
        # every-2nd sampling: doc2 (3 frames) keeps 0 and 2; others keep 0
        assert set(out) == {(0, 0), (1, 0), (2, 0), (2, 2), (3, 0)}
        for r in out.values():
            assert (r.format, r.fps, r.width, r.height) == (
                "avi/mjpeg", 10, 8, 8,
            )
            assert r.mean_luma is not None
        assert out[(2, 0)].n_frames == 3

    def test_max_frames_cap(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            decode_video_frames,
        )

        avi = attach_avi_payload(self._docs(spark, ["q" * 5]))  # 3 frames
        assert decode_video_frames(avi, every_n=1, max_frames=2).count() == 2

    def test_malformed_payload_degrades_to_row(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            decode_video_frames,
        )

        bad = spark.createDataFrame(
            [(1, bytearray(b"garbage bytes")), (2, None)],
            "doc_id long, payload binary",
        )
        rows = {r.doc_id: r for r in decode_video_frames(bad).collect()}
        assert set(rows) == {1, 2}
        for r in rows.values():
            assert r.format == "unsupported" and r.n_frames is None

    def test_rejects_bad_params(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            decode_video_frames,
        )

        df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="every_n"):
            decode_video_frames(df, every_n=0)
        with pytest.raises(ValueError, match="max_frames"):
            decode_video_frames(df, max_frames=0)


class TestAviRaw:
    def test_raw_roundtrip_is_exact(self):
        from crowdsorsa_etl_spark.functions.videocodec import (
            decode_dib_frame,
            encode_avi_raw,
        )

        frames = _frames(3)
        bodies, codec, fps, w, h = decode_avi(encode_avi_raw(frames, fps=7))
        assert (codec, fps, w, h, len(bodies)) == ("DIB", 7, 8, 16, 3)
        for src, body in zip(frames, bodies):
            got = decode_dib_frame(body, w, h)
            assert got.shape == (16, 8, 3)
            # lossless: every channel equals the source gray plane exactly
            assert (got[:, :, 0] == src).all() and (got[:, :, 2] == src).all()

    def test_raw_stride_padding(self):
        from crowdsorsa_etl_spark.functions.videocodec import (
            decode_dib_frame,
            encode_avi_raw,
        )

        # w=7 -> 21-byte rows pad to 24-byte stride; pixels must survive
        f = [(np.arange(63, dtype=np.uint8) * 4 % 251).reshape(9, 7)]
        bodies, codec, _, w, h = decode_avi(encode_avi_raw(f))
        assert (codec, w, h) == ("DIB", 7, 9)
        assert (decode_dib_frame(bodies[0], w, h)[:, :, 0] == f[0]).all()

    def test_raw_rgb_frames(self):
        from crowdsorsa_etl_spark.functions.videocodec import (
            decode_dib_frame,
            encode_avi_raw,
        )

        rgb = np.dstack(
            [np.full((4, 4), 10, np.uint8),
             np.full((4, 4), 20, np.uint8),
             np.full((4, 4), 30, np.uint8)]
        )
        bodies, _, _, w, h = decode_avi(encode_avi_raw([rgb]))
        assert (decode_dib_frame(bodies[0], w, h) == rgb).all()

    def test_dib_length_guard(self):
        from crowdsorsa_etl_spark.functions.videocodec import decode_dib_frame

        with pytest.raises(ValueError, match="DIB frame"):
            decode_dib_frame(b"\x00" * 10, 8, 8)


class TestVideoAhashDups:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )

    def test_signatures_match_python_reference(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            _ahash_bands_from_flat,
            attach_avi_payload,
            video_frame_signatures,
        )

        texts = ["hello world " * 10, "abc"]
        avi = attach_avi_payload(self._docs(spark, texts), codec="raw")
        got = {
            (r.doc_id, r.frame_idx): list(r.bands)
            for r in video_frame_signatures(avi).collect()
        }
        for doc_id, text in enumerate(texts):
            raw = text.encode()
            nf = (len(raw) % 3) + 1
            body = raw[: 64 * nf]
            for i in range(nf):
                chunk = body[64 * i : 64 * (i + 1)]
                flat = list(chunk) + [0] * (64 - len(chunk))
                assert got[(doc_id, i)] == _ahash_bands_from_flat(flat)

    def test_duplicate_videos_match_on_all_frames(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            video_ahash_dups,
        )

        t = "shared content " * 9  # 135 bytes -> nf = 1
        avi = attach_avi_payload(
            self._docs(spark, [t, t, "completely different " * 8])
        , codec="raw")
        rows = video_ahash_dups(avi).collect()
        assert [(r.id_a, r.id_b, r.matched_frames) for r in rows] == [
            (0, 1, 1)
        ]
        assert rows[0].n_sigs_a == rows[0].n_sigs_b == 1

    def test_min_shared_threshold(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            video_ahash_dups,
        )

        base = bytes(range(64)).decode("latin-1") * 2  # 128 bytes -> nf = 3
        other = base[:64] + ("Z" * 64)  # shares exactly frame 0 of 3
        docs = spark.createDataFrame(
            [(0, base), (1, base), (2, other)], ["doc_id", "text"]
        )
        avi = attach_avi_payload(docs, codec="raw")
        got1 = {
            (r.id_a, r.id_b): r.matched_frames
            for r in video_ahash_dups(avi, min_shared=1).collect()
        }
        assert got1[(0, 1)] >= 2  # full dup shares every distinct frame
        got2 = set(
            (r.id_a, r.id_b)
            for r in video_ahash_dups(avi, min_shared=2).collect()
        )
        assert (0, 1) in got2
        with pytest.raises(ValueError, match="min_shared"):
            video_ahash_dups(avi, min_shared=0)

    def test_malformed_payload_contributes_nothing(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            video_frame_signatures,
        )

        bad = spark.createDataFrame(
            [(1, bytearray(b"not an avi")), (2, None)],
            "doc_id long, payload binary",
        )
        assert video_frame_signatures(bad).count() == 0

    def test_pair_join_is_hash_keyed_on_bands(self, spark):
        """The near-dup pair join must be an equi-join KEYED ON the frame
        hash (bucketed at scale), never a cartesian/nested-loop pass."""
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_avi_payload,
            video_ahash_dups,
        )

        avi = attach_avi_payload(self._docs(spark, ["a" * 70, "b" * 70]),
                                 codec="raw")
        plan = video_ahash_dups(avi)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        import re

        # the pair join is keyed on the frame hash itself
        assert re.search(r"Join \[bands#\d+\], \[bands#\d+\]", plan)
