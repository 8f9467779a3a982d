"""Multimodal column plumbing + pure-Python media codecs (SURVEY.md §2.13 X5).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize run as Arrow-batched
``mapInPandas`` transforms.

Decode support, honestly tiered:

- **REAL, no external libs** — BMP (uncompressed 24/32-bit,
  ``struct`` + numpy), PNG (8-bit gray/RGB/RGBA, all five filter
  types, ``zlib`` + numpy), WAV (stdlib ``wave``, PCM 8/16-bit).
  These run in this container and are exact: tests round-trip
  encode→decode and the ``q_multimodal_decode``/``q_multimodal_audio``
  catalog queries are driver-oracle-checked end to end.
- **Import-gated** — JPEG and other compressed images use PIL when
  present; video frame sampling uses av when present. Absent libs
  raise ``NotImplementedError`` with a clear message (same gating
  pattern as the Kafka source).

Scale notes: one Python worker sees a whole Arrow batch; batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and media
blobs should be size-capped per row (store object-store pointers for
large assets — the content column then carries a fetch-on-decode key).
Decode is embarrassingly parallel: no shuffle, scales with executors.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


# --------------------------------------------------------------- BMP codec


def encode_bmp(arr: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP from a (H, W, 3) uint8 RGB array."""
    h, w, _ = arr.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(arr[y, :, ::-1].tobytes() + b"\x00" * pad)  # RGB→BGR
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from an uncompressed 24/32-bit BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    _hsize, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: compression={comp} bpp={bpp}")
    top_down, h = h < 0, abs(h)
    nb = bpp // 8
    row = w * nb
    pad = (4 - row % 4) % 4
    out = np.empty((h, w, 3), np.uint8)
    pos = off
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        line = np.frombuffer(data, np.uint8, row, pos).reshape(w, nb)
        out[y] = line[:, 2::-1]  # BGR(A) → RGB
        pos += row + pad
    return out


# --------------------------------------------------------------- PNG codec


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """(H, W, C) uint8 from an 8-bit non-interlaced PNG (gray/RGB/RGBA).

    Implements the full filter set (None/Sub/Up/Average/Paeth) over the
    zlib-inflated scanlines. Pure stdlib+numpy; compressed formats that
    genuinely need an external codec (JPEG) stay import-gated."""
    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, w, h, ct = len(_PNG_MAGIC), [], None, None, None
    while pos < len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, bitd, ct, _comp, _filt, inter = struct.unpack(">IIBBBBB", chunk)
            if bitd != 8 or inter != 0 or ct not in (0, 2, 6):
                raise ValueError(f"unsupported PNG: bit_depth={bitd} color={ct} interlace={inter}")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    nch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * nch
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        if f == 1:  # Sub — sequential in x (carry dependency)
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif f == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            line += prev
        elif f == 3:  # Average
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        prev = line
        out[y] = line
    return out.reshape(h, w, nch)


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG (filter 0 rows) from (H, W, C) uint8."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ct = {1: 0, 3: 2, 4: 6}[nch]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- WAV codec


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV from an int16 array (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, (n_samples, n_channels) int16 array) from PCM WAV."""
    with wave.open(io.BytesIO(data), "rb") as f:
        sr, nch, sw, n = f.getframerate(), f.getnchannels(), f.getsampwidth(), f.getnframes()
        raw = f.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, "<i2")
    elif sw == 1:  # 8-bit WAV is unsigned
        arr = np.frombuffer(raw, np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return sr, arr.reshape(-1, nch)


# ------------------------------------------------------- image dispatch


def _decode_image_bytes(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode. BMP/PNG/baseline-JPEG run
    pure-Python (round 9: the numpy baseline JPEG codec in
    extensions/jpeg.py closed the JPEG import gate); PIL, when
    importable, takes JPEG instead (libjpeg speed + the progressive/
    CMYK tail) and is the only path for other formats (WebP, …)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(data)
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency gate
    except ImportError as exc:
        if data[:2] == b"\xff\xd8":
            from cflux_spark.extensions.jpeg import decode_jpeg  # noqa: PLC0415

            try:
                return decode_jpeg(data)
            except NotImplementedError as nexc:
                # the JPEG CLASS is supported now — an exotic coding
                # process (progressive/arithmetic) in one object is
                # per-row data variance, isolated to an error row like
                # corruption, not a deployment error that kills the scan
                raise ValueError(str(nexc)) from None
        raise NotImplementedError(
            "only BMP, PNG and baseline JPEG decode without PIL; install "
            f"Pillow for other formats (magic bytes: {data[:4]!r})"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


DECODE_IMAGE_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, error string"
)


def decode_images(media: DataFrame) -> DataFrame:
    """Real image decode over the binary column: per-image dimensions +
    per-channel means. A corrupt/unsupported blob yields an ``error``
    row instead of failing the job (at 100 TB one bad object must not
    kill the scan); genuinely-missing codecs still raise loudly via
    the NotImplementedError path so absent capability is never silent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = _decode_image_bytes(bytes(content))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    ch_means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                    m = [float(ch_means[i]) if i < arr.shape[2] else float(ch_means[0]) for i in range(3)]
                    rows.append((mid, arr.shape[1], arr.shape[0], arr.shape[2], *m, None))
                except NotImplementedError:
                    raise  # missing codec is a deployment error, not data
                except Exception as exc:  # noqa: BLE001 — corrupt data row
                    rows.append((mid, None, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b", "error",
                ],
            )

    return media.mapInPandas(run, schema=DECODE_IMAGE_SCHEMA)


DECODE_AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_ms long, rms double, error string"
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Real WAV decode over the binary column: rate, length, RMS."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    sr, arr = decode_wav(bytes(content))
                    n = arr.shape[0]
                    rms = float(np.sqrt(np.mean(arr.astype(np.float64) ** 2)))
                    rows.append((mid, sr, n, int(n * 1000 // sr), rms, None))
                except Exception as exc:  # noqa: BLE001 — corrupt data row
                    rows.append((mid, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_ms", "rms", "error"],
            )

    return media.mapInPandas(run, schema=DECODE_AUDIO_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy index mapping — real, no libs),
    re-encoded as BMP. The standard thumbnail step before feature
    extraction; per-row independent, shuffle-free."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = _decode_image_bytes(bytes(content))
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                if arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                h, w = arr.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = arr[ys][:, xs]
                rows.append((mid, out_w, out_h, encode_bmp(np.ascontiguousarray(small))))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


DHASH_SCHEMA = "media_id long, dhash long, error string"


def image_dhash(
    media: DataFrame,
    hash_w: int = 8,
    hash_h: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual difference-hash over the binary image column — the
    standard near-duplicate signature for image corpora (crops,
    re-encodes, and light edits keep the hash within a few bits while
    cryptographic hashes scatter). Per image: REAL decode
    (BMP/PNG/JPEG via the module's codecs), grayscale by channel mean,
    nearest-neighbor resample to (hash_w+1)×hash_h, then one bit per
    cell: bit(r,c) = gray[r,c+1] > gray[r,c], packed row-major into a
    64-bit long (bit index r·hash_w + c, two's complement).

    Pair the output with :func:`cflux_spark.extensions.dedup.
    hamming_near_pairs` for exact pigeonhole-banded near-dup pairs —
    the same banding engine the text SimHash tier uses, so image dedup
    inherits its scale shape (no all-pairs; one band-key shuffle).

    Map-only Arrow batches, per-row corrupt isolation (``error``
    column), no shuffle — linear at any corpus size."""
    n_bits = hash_w * hash_h
    if n_bits > 64:
        raise ValueError("hash_w * hash_h must fit in 64 bits")
    idx = np.arange(n_bits, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    arr = _decode_image_bytes(bytes(content))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    if arr.shape[2] == 4:
                        arr = arr[:, :, :3]
                    gray = arr.astype(np.float64).mean(axis=2)
                    h, w = gray.shape
                    ys = (np.arange(hash_h) * h) // hash_h
                    xs = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                    g = gray[ys][:, xs]
                    bits = (g[:, 1:] > g[:, :-1]).ravel().astype(np.uint64)
                    val = np.uint64((bits << idx).sum(dtype=np.uint64))
                    rows.append((mid, int(val.astype(np.int64)), None))
                except NotImplementedError:
                    raise  # missing codec is a deployment error, not data
                except Exception as exc:  # noqa: BLE001 — corrupt data row
                    rows.append((mid, None, str(exc)))
            yield pd.DataFrame(rows, columns=["media_id", "dhash", "error"])

    return media.mapInPandas(run, schema=DHASH_SCHEMA)


def synthetic_family_images(
    df: DataFrame, id_col: str = "doc_id", family: int = 5
) -> DataFrame:
    """Deterministic 9×8 grayscale BMPs with PLANTED near-duplicate
    families for the image-dedup oracle: ids sharing ``id // family``
    render the same base image except pixel (0,0), which shifts by
    5·(id % family) — so family members differ in at most the single
    dHash bit pixel (0,0) feeds, while distinct families are
    effectively random patterns. Every pixel is closed-form in the id
    via md5 (both engines have it, and proper mixing keeps
    cross-family Hamming collisions ~zero at any corpus size — a weak
    arithmetic mix measured 92k incidental pairs at 5k docs, md5
    measured none):
    v(d, r, c) = (int(md5("{d//family}:{r}:{c}")[:2], 16)
                  + [r=0 ∧ c=0]·5·(d%family)) mod 256,
    r=g=b=v — so a SQL oracle can regenerate the grayscale grid, the
    dHash packing, and the exact Hamming pairs without touching the
    codec, while the engine path exercises the REAL encode→decode."""
    import hashlib  # noqa: PLC0415 — worker-side closure import

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                fam = mid // family
                v = np.empty((8, 9), np.int64)
                for r in range(8):
                    for c in range(9):
                        v[r, c] = int(
                            hashlib.md5(f"{fam}:{r}:{c}".encode()).hexdigest()[:2], 16
                        )
                v[0, 0] = (v[0, 0] + 5 * (mid % family)) % 256
                px = np.repeat(v[:, :, None].astype(np.uint8), 3, axis=2)
                rows.append((mid, "image", encode_bmp(px)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    return _spread(df.select(id_col), id_col).mapInPandas(
        run, schema="media_id long, kind string, content binary"
    )


VIDEO_FRAME_SCHEMA = (
    "media_id long, t_ms long, width int, height int, frame binary, error string"
)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling over the binary column: emit the first
    frame at or after each ``every_ms`` grid point, BMP-re-encoded so
    sampled frames flow straight into the existing image surface
    (decode_images / resize_images / extract_features).

    Container dispatch (round 9, mirroring the JPEG decision):
    MJPEG-in-AVI decodes PURE-PYTHON (extensions/mjpeg.py — RIFF
    parsing over the baseline JPEG codec, the IP-camera/capture
    format); everything inter-frame-coded (mp4/h264, webm/vp9) takes
    the ``av``/ffmpeg bindings when importable. A row neither path can
    handle — non-AVI without av, or a non-MJPG AVI stream — yields an
    ``error`` row NAMING the missing capability: per-object data
    variance is isolated like corruption, never a dead 100 TB scan,
    and never silent.

    Scale shape matches decode_images: ``mapInPandas`` row-independent
    Arrow batches, per-row corrupt isolation; the only fan-out is
    frames-per-video ≈ duration/every_ms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cflux_spark.extensions.mjpeg import sample_avi_frames  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                try:
                    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                        for t_ms, arr in sample_avi_frames(data, every_ms):
                            rows.append(
                                (
                                    mid,
                                    int(t_ms),
                                    arr.shape[1],
                                    arr.shape[0],
                                    encode_bmp(np.ascontiguousarray(arr)),
                                    None,
                                )
                            )
                        continue
                    try:
                        import av  # noqa: PLC0415 — optional dependency gate
                    except ImportError:
                        raise NotImplementedError(
                            "only MJPEG-AVI samples without the 'av' (ffmpeg) "
                            f"bindings; this container is {data[:4]!r}… — "
                            "install av for inter-frame codecs"
                        ) from None
                    with av.open(io.BytesIO(data)) as container:
                        stream = container.streams.video[0]
                        next_ms = 0.0
                        for frame in container.decode(stream):
                            t_ms = float(frame.time or 0.0) * 1000.0
                            if t_ms + 1e-9 < next_ms:
                                continue
                            arr = frame.to_ndarray(format="rgb24")
                            rows.append(
                                (
                                    mid,
                                    int(round(t_ms)),
                                    arr.shape[1],
                                    arr.shape[0],
                                    encode_bmp(np.ascontiguousarray(arr)),
                                    None,
                                )
                            )
                            next_ms = (t_ms // every_ms + 1) * every_ms
                except Exception as exc:  # noqa: BLE001 — corrupt/unsupported row
                    rows.append((mid, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "t_ms", "width", "height", "frame", "error"],
            )

    return media.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


# ------------------------------------------------- feature extraction


def _fake_feature(content: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: derives a
    stable pseudo-feature from the bytes so the pipeline shape (binary
    in → float vector out) is exercised honestly. A deployment swaps in
    a model; the Spark plumbing is identical."""
    if content is None:
        return [0.0] * dim
    h = 1469598103934665603  # FNV-1a 64
    out = []
    for i in range(dim):
        for b in content[i::dim] or b"\x00":
            h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
        out.append(((h % 2_000_001) - 1_000_000) / 1_000_000.0)
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)).astype("int32"),
                    "feature": pdf["content"].map(lambda c: _fake_feature(c, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------- synthetic media builders


def attach_media_stub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: text bytes as
    the binary payload (deterministic), typed metadata attached."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _spread(ids: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition an ID-ONLY frame before a generator kernel
    (round-12, guide §2.5 input parallelism): the media fixtures hang
    a Python encode kernel directly off the documents scan, and a
    small single-file scan plans as ONE partition - serializing the
    whole codec pipeline on one core (measured: q_multimodal_video
    ran its entire 7.7 s encode+sample+decode chain in one task).
    Only the ids move (the payloads are generated AFTER the
    exchange), so the shuffle is bytes-per-row tiny at any scale. The
    partition count is pinned to the session's core count
    (defaultParallelism — scale-adaptive, not a constant): a keyed
    repartition WITHOUT an explicit count is an AQE-coalescible
    shuffle, and the id rows are so small that AQE folds them back to
    ONE partition — re-serializing the codec kernel it was meant to
    spread (measured: q_multimodal_video flat at 7.5 s until the
    count was pinned)."""
    n = max(ids.sparkSession.sparkContext.defaultParallelism, 8)
    return ids.repartition(n, F.col(id_col))


def synthetic_images(df: DataFrame, id_col: str = "doc_id", fmt: str = "bmp") -> DataFrame:
    """Deterministic per-row test images: width 3+id%5, height 2+id%4,
    constant channels (r,g,b) = (id%256, 2*id%256, 7*id%256). Every
    derived quantity is a closed-form function of the id, so a SQL
    oracle can verify a full encode→decode round trip value-exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fmt == "jpeg":
            # uniform GRAYSCALE at quality 95: the 8×8 blocks are
            # DC-only and the scaled luma quant step (2) divides the
            # DC coefficient 8·(g−128) exactly, so the lossy format
            # round-trips VALUE-EXACTLY — decoded mean == g, giving a
            # closed-form SQL oracle for a real entropy-coded JPEG
            from cflux_spark.extensions.jpeg import encode_jpeg  # noqa: PLC0415

            def enc(px: np.ndarray) -> bytes:
                return encode_jpeg(px[:, :, 0], quality=95)

        else:
            enc = encode_bmp if fmt == "bmp" else encode_png
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 3 + mid % 5, 2 + mid % 4
                px = np.empty((h, w, 3), np.uint8)
                if fmt == "jpeg":
                    px[:, :] = (mid % 256,) * 3
                else:
                    px[:, :] = (mid % 256, (2 * mid) % 256, (7 * mid) % 256)
                rows.append((mid, "image", enc(px)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    # spread only the JPEG path: the entropy-coded encode is the heavy
    # kernel worth an exchange; BMP/PNG encodes are header+memcpy and
    # measured 3x SLOWER with the spread (0.51 s -> 1.61 s at sf0.1 -
    # the exchange and 32-task dispatch dwarf the kernel)
    ids = df.select(id_col)
    if fmt == "jpeg":
        ids = _spread(ids, id_col)
    return ids.mapInPandas(
        run, schema="media_id long, kind string, content binary"
    )


def synthetic_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-row MJPEG-AVI clips (round 9): 2 + id%3
    frames of 16×8 uniform gray (frame i = (id + 40·i) % 256 in all
    channels) at 2 fps. Uniform gray survives the lossy JPEG
    VALUE-EXACTLY at quality 95 (DC-only luma, zero chroma — the
    q_multimodal_jpeg argument), so a sampled frame's decoded mean is
    a closed-form function of (id, t_ms) for the SQL oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cflux_spark.extensions.mjpeg import encode_avi_mjpeg  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 2 + mid % 3
                frames = [
                    np.full((8, 16, 3), (mid + 40 * i) % 256, np.uint8)
                    for i in range(n)
                ]
                rows.append((mid, "video", encode_avi_mjpeg(frames, fps=2, quality=95)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    return _spread(df.select(id_col), id_col).mapInPandas(
        run, schema="media_id long, kind string, content binary"
    )


def synthetic_audio(df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000) -> DataFrame:
    """Deterministic per-row WAV clips: n = 800 + (id%10)*80 samples of
    constant amplitude id%1000 → duration_ms = 100 + (id%10)*10 and
    rms = id%1000 exactly (closed-form for the SQL oracle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = 800 + (mid % 10) * 80
                samples = np.full(n, mid % 1000, dtype=np.int16)
                rows.append((mid, "audio", encode_wav(samples, sample_rate)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    # no spread: the stdlib WAV encode is header+memcpy (the BMP
    # lesson — an exchange would cost more than the kernel)
    return df.select(id_col).mapInPandas(
        run, schema="media_id long, kind string, content binary"
    )
