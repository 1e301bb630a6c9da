"""Stdlib-only video codec: MJPEG-in-AVI (RIFF container).

The video leg of the multimodal surface. AVI is a RIFF container (the
same chunk grammar as WAV, ``functions/audiocodec.py``); Motion-JPEG
stores one complete baseline JPEG per frame in ``00dc`` chunks, so the
frame decode reuses ``functions/jpegcodec.decode_jpeg`` verbatim — a
genuine container parse + genuine entropy decode, no ffmpeg and no
fakes, which covers the classic web-corpus MJPEG/AVI profile.

Two genuine frame profiles:

- ``MJPG`` (:func:`encode_avi_mjpeg`): one complete baseline JPEG per
  ``00dc`` chunk — the lossy web-corpus profile.
- ``DIB`` (:func:`encode_avi_raw`): uncompressed 24-bit bottom-up BGR
  DIB frames in ``00db`` chunks (``biCompression = 0``, rows padded to
  4-byte stride) — the lossless archival profile, and the one that
  makes per-frame perceptual hashes exactly replayable cross-engine.

Scope: single video stream ('vids'), uncompressed index optional
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


def _check_frames(frames: list[np.ndarray], fps: int) -> tuple[int, int]:
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one geometry")
    if fps < 1:
        raise ValueError(f"fps must be >= 1; got {fps}")
    return h, w


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    *,
    fps: int = 10,
    quality: int = 90,
) -> bytes:
    """Grayscale or RGB frames (equal shapes) → a genuine AVI/MJPG file."""
    from crowdsorsa_etl_spark.functions.jpegcodec import encode_jpeg

    h, w = _check_frames(frames, fps)
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    return _build_avi(jpegs, b"MJPG", b"00dc", fps=fps, w=w, h=h)


def encode_avi_raw(
    frames: list[np.ndarray],
    *,
    fps: int = 10,
) -> bytes:
    """Grayscale or RGB frames → an uncompressed AVI (24-bit DIB frames:
    bottom-up row order, BGR byte order, 4-byte row stride — the genuine
    ``biCompression = 0`` layout). Lossless: ``decode_dib_frame`` returns
    the input pixels exactly, which is what lets per-frame perceptual
    hashes be replayed cross-engine from the source bytes."""
    h, w = _check_frames(frames, fps)
    stride = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        rgb = (
            np.dstack([f, f, f]) if f.ndim == 2 else f[:, :, :3]
        ).astype(np.uint8)
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # BGR
        dibs.append(rows[::-1].tobytes())  # bottom-up
    return _build_avi(dibs, b"DIB ", b"00db", fps=fps, w=w, h=h)


def decode_dib_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One 24-bit DIB frame body → (h, w, 3) RGB array (exact)."""
    stride = (w * 3 + 3) & ~3
    if len(data) != stride * h:
        raise ValueError(
            f"DIB frame is {len(data)} bytes; {w}x{h}x24 needs {stride * h}"
        )
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    bgr = rows[::-1, : w * 3].reshape(h, w, 3)
    return bgr[:, :, ::-1].copy()


def _build_avi(
    bodies: list[bytes], handler: bytes, frame_cc: bytes, *, fps, w, h
) -> bytes:
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
        len(bodies),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<10I",
            0,  # dwFlags
            0,  # wPriority/wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(bodies),  # dwLength
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
        0 if handler == b"DIB " else struct.unpack("<I", handler)[0],
        0, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []
    for b_ in bodies:
        offsets.append(len(movi_body))  # offset of the frame fourcc - 4
        movi_body += chunk(frame_cc, b_)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        frame_cc + struct.pack("<3I", 0x10, off, ln)
        for off, ln in zip(offsets, map(len, bodies))
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


def decode_avi(
    payload: bytes,
) -> tuple[list[bytes], str, int, int, int]:
    """AVI bytes → (per-frame payloads, codec, fps, width, height) with
    ``codec`` one of ``'MJPG'`` (JPEG frame bodies) or ``'DIB'`` (raw
    24-bit bottom-up frame bodies, see :func:`decode_dib_frame`).

    Walks the RIFF tree: ``avih`` supplies geometry + frame timing,
    ``movi`` supplies the ``00dc``/``00db`` frame chunks (nested ``rec ``
    LISTs are descended). Raises ``ValueError`` on anything malformed —
    wrong magic, truncated chunks, an unsupported video codec, or a frame
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
    if compression in (b"MJPG", b"mjpg"):
        codec = "MJPG"
    elif compression in (b"DIB ", b"RGB ", b"\x00\x00\x00\x00"):
        codec = "DIB"
    else:
        raise ValueError(f"unsupported video codec {compression!r}")
    usec, _, _, _, total, _, _, _, w, h = avih
    if total != len(frames):
        raise ValueError(
            f"header declares {total} frames, movi carries {len(frames)}"
        )
    if not frames:
        raise ValueError("AVI carries no frames")
    fps = round(1_000_000 / usec) if usec else 0
    return frames, codec, int(fps), int(w), int(h)
