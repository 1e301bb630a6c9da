"""Stdlib-only video codec: MJPEG-in-AVI (RIFF container).

The video leg of the multimodal surface. AVI is a RIFF container (the
same chunk grammar as WAV, ``functions/audiocodec.py``); Motion-JPEG
stores one complete baseline JPEG per frame in ``00dc`` chunks, so the
frame decode reuses ``functions/jpegcodec.decode_jpeg`` verbatim — a
genuine container parse + genuine entropy decode, no ffmpeg and no
fakes, which covers the classic web-corpus MJPEG/AVI profile.

Scope: single video stream ('vids'/'MJPG'), uncompressed index optional
(ignored — frames are read by walking ``movi``). Encode produces a
spec-shaped file (avih + strh/strf headers, movi LIST, idx1 index) that
the decoder and common tools can read back. All errors raise
``ValueError`` so Spark-side callers keep the one-bad-payload-degrades-
to-a-row contract (`operators/multimodal._DECODE_ERRORS`).

Layout written by :func:`encode_avi_mjpeg` (and accepted, with
variations, by :func:`decode_avi`)::

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>      main header (usec/frame, frames, dims, ...)
        LIST <sz> 'strl'
          'strh' <56>    stream header ('vids', 'MJPG', scale/rate)
          'strf' <40>    BITMAPINFOHEADER (dims, 'MJPG')
      LIST <sz> 'movi'
        '00dc' <sz> <jpeg bytes>   (per frame, word-aligned)
      'idx1' <sz>        frame index (offset/length per frame)
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"

_AVIF_HASINDEX = 0x10


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    *,
    fps: int = 10,
    quality: int = 90,
) -> bytes:
    """Grayscale or RGB frames (equal shapes) → a genuine AVI/MJPG file."""
    from crowdsorsa_etl_spark.functions.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one geometry")
    if fps < 1:
        raise ValueError(f"fps must be >= 1; got {fps}")

    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I",
            0,  # dwFlags
            0,  # wPriority/wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(frames),  # dwLength
            0,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H6I",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        0, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc - 4
        movi_body += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, ln)
        for off, ln in zip(offsets, map(len, jpegs))
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


def decode_avi(
    payload: bytes,
) -> tuple[list[bytes], int, int, int]:
    """AVI bytes → (per-frame JPEG payloads, fps, width, height).

    Walks the RIFF tree: ``avih`` supplies geometry + frame timing,
    ``movi`` supplies the ``00dc``/``00db`` frame chunks (nested ``rec ``
    LISTs are descended). Raises ``ValueError`` on anything malformed —
    wrong magic, truncated chunks, a non-MJPG video stream, or a frame
    count that disagrees with the header.
    """
    if len(payload) < 12 or payload[:4] != AVI_MAGIC:
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF payload is not an AVI")

    avih = None
    compression = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal avih, compression
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_end = pos + 8 + sz
            if body_end > end:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                kind = buf[pos + 8 : pos + 12]
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(buf, pos + 12, body_end)
            elif fourcc == b"avih":
                if sz < 40:
                    raise ValueError("avih header too short")
                avih = struct.unpack("<10I", buf[pos + 8 : pos + 48])
            elif fourcc == b"strh":
                if buf[pos + 8 : pos + 12] == b"vids":
                    compression = buf[pos + 12 : pos + 16]
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(buf[pos + 8 : body_end])
            pos = body_end + (sz % 2)  # word alignment

    (riff_sz,) = struct.unpack("<I", payload[4:8])
    if 8 + riff_sz > len(payload):
        raise ValueError("truncated RIFF payload")
    walk(payload, 12, 8 + riff_sz)

    if avih is None:
        raise ValueError("AVI missing avih header")
    if compression is None:
        raise ValueError("AVI has no video stream")
    if compression not in (b"MJPG", b"mjpg"):
        raise ValueError(f"unsupported video codec {compression!r}")
    usec, _, _, _, total, _, _, _, w, h = avih
    if total != len(frames):
        raise ValueError(
            f"header declares {total} frames, movi carries {len(frames)}"
        )
    if not frames:
        raise ValueError("AVI carries no frames")
    fps = round(1_000_000 / usec) if usec else 0
    return frames, int(fps), int(w), int(h)
