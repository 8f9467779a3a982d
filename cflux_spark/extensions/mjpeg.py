"""Pure-Python MJPEG-in-AVI container codec (round 9).

With the baseline JPEG codec (extensions/jpeg.py) in hand, the
simplest real video format — Motion-JPEG frames in a RIFF/AVI
container, the shape IP cameras and many capture pipelines emit —
needs only RIFF chunk parsing, no ffmpeg. This closes the second half
of the multimodal import gate: ``sample_video_frames`` handles
MJPEG-AVI pure-Python and leaves the ``av`` bindings for the
inter-frame-coded tail (h264/vp9 in mp4/webm), exactly as PIL takes
JPEG's exotic tail.

Format notes (public AVI spec, msdn RIFF docs): an AVI is
``RIFF('AVI ' LIST('hdrl' avih, LIST('strl' strh strf)) LIST('movi'
00dc...))``; MJPG video frames sit in ``NNdc``/``NNdb`` chunks of the
'vids' stream, frame period from the stream header's scale/rate (or
the main header's microseconds-per-frame). Chunks pad to even sizes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


# --------------------------------------------------------------- encoder


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 2, quality: int = 85
) -> bytes:
    """Minimal MJPEG AVI from (h, w, 3) uint8 RGB frames at integer
    ``fps`` — each frame JPEG-encoded via the pure-numpy encoder. The
    decoder twin (and ffmpeg/av, where present) reads it back."""
    from cflux_spark.extensions.jpeg import encode_jpeg  # noqa: PLC0415

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    uspf = 1_000_000 // fps
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", uspf, maxbuf * fps, 0, 0x10, len(jpegs), 0, 1, maxbuf, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), maxbuf, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


# --------------------------------------------------------------- decoder


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, payload_start, payload_len) for the flat chunk run
    in data[pos:end]; LIST chunks yield their 4-byte kind as the tag
    with the payload positioned after it."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > len(data):
            size = max(0, len(data) - body)  # truncated tail: take what's there
        yield tag, body, size
        pos = body + size + (size & 1)


def iter_avi_mjpeg_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """(t_ms, jpeg_bytes) per video frame of an MJPEG AVI, in stream
    order. Raises ``ValueError`` for non-AVI bytes and
    ``NotImplementedError`` for AVI streams that are not MJPG-coded
    (DV, uncompressed, …) — the ``av`` path's territory."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    uspf = None
    vid_stream = None
    scale_rate: tuple[int, int] | None = None
    stream_no = -1
    frames: list[tuple[int, int]] = []  # (start, len) into data

    def walk(pos: int, end: int) -> None:
        nonlocal uspf, vid_stream, scale_rate, stream_no
        for tag, body, size in _walk_chunks(data, pos, end):
            if tag == b"LIST":
                walk(body + 4, body + size)
            elif tag == b"avih" and size >= 4:
                (uspf,) = struct.unpack("<I", data[body : body + 4])
            elif tag == b"strh" and size >= 28:
                stream_no += 1
                fcc_type = data[body : body + 4]
                if fcc_type == b"vids" and vid_stream is None:
                    handler = data[body + 4 : body + 8]
                    if handler not in (b"MJPG", b"mjpg", b"dmb1"):
                        raise NotImplementedError(
                            f"AVI video stream is {handler!r}-coded, not MJPG — "
                            "install the 'av' bindings for inter-frame codecs"
                        )
                    vid_stream = stream_no
                    scale, rate = struct.unpack("<II", data[body + 20 : body + 28])
                    if rate:
                        scale_rate = (scale or 1, rate)
            elif len(tag) == 4 and tag[2:4] in (b"dc", b"db"):
                try:
                    sn = int(tag[:2])
                except ValueError:
                    continue
                if vid_stream is None or sn == vid_stream:
                    frames.append((body, size))

    walk(12, len(data))
    if vid_stream is None and not frames:
        raise ValueError("no video stream found in AVI")
    if scale_rate:
        period_ms = 1000.0 * scale_rate[0] / scale_rate[1]
    elif uspf:
        period_ms = uspf / 1000.0
    else:
        period_ms = 1000.0 / 25.0  # spec default rate
    for i, (start, size) in enumerate(frames):
        yield int(round(i * period_ms)), data[start : start + size]


def sample_avi_frames(
    data: bytes, every_ms: int = 1000
) -> Iterator[tuple[int, np.ndarray]]:
    """Decode-and-sample: the first frame at or after each ``every_ms``
    grid point, as (t_ms, RGB array) — only sampled frames pay the
    JPEG decode."""
    from cflux_spark.extensions.jpeg import decode_jpeg  # noqa: PLC0415

    next_ms = 0.0
    for t_ms, jpeg in iter_avi_mjpeg_frames(data):
        if t_ms + 1e-9 < next_ms:
            continue
        arr = decode_jpeg(jpeg)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        yield t_ms, arr
        next_ms = (t_ms // every_ms + 1) * every_ms
