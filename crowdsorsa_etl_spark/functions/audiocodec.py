"""Stdlib-only audio codec: WAV (RIFF) PCM16 via the ``wave`` module.

The audio leg of the multimodal surface (SURVEY.md §2.2 — binary columns
with typed metadata; the container has no soundfile/ffmpeg, but WAV PCM
is fully served by the standard library, so encode AND decode are real
container round-trips, not fakes — the same posture as
``functions/imagecodec.py`` for PNG/BMP).

Scope: mono/stereo PCM16 little-endian, any sample rate. Decoded audio
is a numpy ``int16`` array (frames × channels flattened C-order for
mono, shaped (n, channels) otherwise). Runs inside Arrow-batched
``mapInPandas`` workers — CPU-on-local-bytes, no Spark state.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav_pcm16(
    samples: np.ndarray, *, sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """int16 samples → a genuine RIFF/WAVE container."""
    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 samples, sample_rate, channels). Raises
    ``ValueError`` on non-PCM16 or non-RIFF input (callers treat that as
    "unsupported", mirroring imagecodec)."""
    if payload[:4] != WAV_MAGIC:
        raise ValueError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only PCM16 supported; got sampwidth={w.getsampwidth()}"
                )
            channels = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error as exc:
        raise ValueError(f"WAV parse failed: {exc}") from exc
    samples = np.frombuffer(raw, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate, channels
