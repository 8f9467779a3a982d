"""Pure-numpy baseline JPEG codec (round 9).

The container has no Pillow, which left ``decode_images``' JPEG branch
an honest-but-untestable import gate across rounds 5–8 (the suite's
skips). Web corpora are overwhelmingly JPEG, so the 100 TB pipeline
needs the path to be REAL: this module implements baseline sequential
JFIF (SOF0/SOF1) decode and a matching encoder from the public JPEG
spec (ITU-T T.81) — Huffman entropy coding, dequant/quant, 8×8
DCT-II/III as numpy matrix products, subsampled-chroma upsampling,
JFIF YCbCr↔RGB. No third-party deps; PIL, when present, still takes
the exotic-format tail (progressive SOF2, CMYK, EXIF transforms).

Scope is the standard web-JPEG shape: 8-bit baseline, 1–4 components,
sampling factors 1–2 (4:4:4, 4:2:2, 4:2:0), restart markers. Anything
else raises ``ValueError``/``NotImplementedError`` loudly — the
``decode_images`` kernel isolates that to an error row per object.

Performance note: entropy decode is a Python bit loop — fine for the
thumbnail/feature-extract sizes the tests pin and honest about being
the slow path; a production cluster would install PIL/libjpeg-turbo
and the magic-byte dispatch in ``multimodal._decode_image_bytes``
prefers it automatically when importable.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 reference quantization tables
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: forward F = D @ b @ D.T,
# inverse b = D.T @ F @ D
_D = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality→scale mapping over the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (_Q_LUMA, _Q_CHROMA):
        tq = (t * scale + 50) // 100
        out.append(np.clip(tq, 1, 255).astype(np.int32))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical JPEG Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the decoder-side view."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, value bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0].astype(np.float64), arr[..., 1].astype(np.float64), arr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def encode_jpeg(arr: np.ndarray, quality: int = 85, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encode of an (h, w) grayscale or (h, w, 3) RGB
    uint8 array: 4:4:4 (no subsampling), Annex K quant tables at the
    libjpeg quality scaling, Annex K typical Huffman tables. The
    decoder twin round-trips it bit-exactly at the block level.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (what IP-camera MJPEG streams do — and the
    round-trip test for the decoder's segment-split path)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        comps = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        comps = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)
    ncomp = len(comps)

    dc_tabs = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    preds = [0] * ncomp
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for c in comps:
        p = np.pad(c, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        padded.append(p)
    qtabs = [qy] + [qc] * (ncomp - 1)
    # Batched forward DCT + quantization (round 13, guide §4.2): one
    # stacked matmul / round / zigzag-gather per COMPONENT instead of
    # ~8 small numpy calls per BLOCK — the per-call overhead dominated
    # the encode kernel at thumbnail sizes. Identical math in the same
    # order (the stacked matmul runs the same 8×8 GEMM per slice), so
    # the emitted bytes are bit-identical; the entropy loop below is
    # unchanged and reads plain Python ints.
    zz_all: list[list] = []
    lastnz_all: list[list] = []
    for ci in range(ncomp):
        blocks = padded[ci].reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3) - 128.0
        coef = _D @ blocks @ _D.T
        qt8 = qtabs[ci].reshape(8, 8)
        quant = np.round(coef / qt8).astype(np.int64)
        zzc = quant.reshape(bh, bwid, 64)[:, :, ZIGZAG]
        acmask = zzc[:, :, :0:-1] != 0  # zz[63], …, zz[1]
        has_ac = acmask.any(axis=2)
        lastnz = np.where(has_ac, 63 - np.argmax(acmask, axis=2), 0)
        zz_all.append(zzc.tolist())
        lastnz_all.append(lastnz.tolist())
    mcu_count = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # RST markers are byte-aligned
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                )
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                zz = zz_all[ci][by][bx]
                ti = 0 if ci == 0 else 1
                # DC
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                s, bits = _magnitude(diff)
                code, length = dc_tabs[ti][s]
                bw.write(code, length)
                if s:
                    bw.write(bits, s)
                # AC with run-length, ZRL, EOB
                run = 0
                last_nz = lastnz_all[ci][by][bx]
                for i in range(1, last_nz + 1):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[ti][0xF0]
                        bw.write(code, length)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, length = ac_tabs[ti][(run << 4) | s]
                    bw.write(code, length)
                    bw.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, length = ac_tabs[ti][0x00]
                    bw.write(code, length)
    bw.flush()

    def marker(tag: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += marker(0xDB, b"\x00" + bytes(qy[ZIGZAG].astype(np.uint8)))  # DQT 0
    if ncomp == 3:
        out += marker(0xDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    # SOF0: precision 8, dims, components (id, h|v sampling=0x11, qtab)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += marker(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )[: 2 * ncomp if ncomp > 1 else 2]:
        out += marker(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += marker(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += struct.pack(">BB", ci + 1, (tid << 4) | tid)
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, approx 0
    out += marker(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


def _extend(bits: int, s: int) -> int:
    """Inverse of magnitude coding."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _huff_lut(table: dict[tuple[int, int], int]) -> tuple[list[int], list[int]]:
    """Flatten a (length, code) → symbol Huffman table into a 16-bit
    peek LUT: ``sym[peek]``/``ln[peek]`` give the symbol and its code
    length for ANY 16-bit window starting at the code (codes are ≤ 16
    bits, so one table lookup replaces the bit-by-bit walk — the
    round-10 fast path; ln == 0 marks an invalid prefix). Plain Python
    lists: int indexing them is faster than numpy scalar extraction
    in the per-symbol loop."""
    sym = np.zeros(65536, np.int16)
    ln = np.zeros(65536, np.int16)
    for (length, code), s in table.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym.tolist(), ln.tolist()


@functools.lru_cache(maxsize=64)
def _huff_lut_cached(dht_payload: bytes) -> tuple[list[int], list[int]]:
    """LUT keyed by the raw DHT (bits ‖ vals) payload. Building the
    64Ki-entry LUT costs more than decoding a thumbnail, and virtually
    every stream uses the Annex K typical tables (an MJPEG stream
    repeats ITS tables per frame) — so the cache makes the LUT a
    one-time cost per distinct table, not per image."""
    bits = list(dht_payload[:16])
    vals = list(dht_payload[16:])
    return _huff_lut(_decode_table(bits, vals))


def _split_entropy_segments(data: bytes, pos: int) -> list[bytes]:
    """Cut the scan's entropy stream into de-stuffed restart segments:
    stuffed 0xFF00 bytes are literal 0xFF data, 0xFFD0–D7 are RST
    boundaries (segment separators), any other marker — or EOF — ends
    the scan. C-level ``find``/``replace`` do the byte work, so the
    Python loop runs once per marker, not per byte."""
    segs: list[bytes] = []
    start = p = pos
    n = len(data)
    while True:
        q = data.find(b"\xff", p)
        if q == -1 or q + 1 >= n:
            segs.append(data[start : n if q == -1 else q])
            break
        nxt = data[q + 1]
        if nxt == 0x00:
            p = q + 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            segs.append(data[start:q])
            start = p = q + 2
            continue
        segs.append(data[start:q])  # real marker (EOI): end of scan
        break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


class _FastBits:
    """Bit cursor over one de-stuffed entropy segment. The accumulator
    refills six bytes at a time; terminal 16-bit peeks may extend into
    zero padding, but CONSUMING past the segment's real bits raises
    the module's truncation ValueError."""

    __slots__ = ("buf", "n", "p", "acc", "nbits", "total", "used")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.n = len(buf)
        self.p = 0
        self.acc = 0
        self.nbits = 0
        self.total = 8 * len(buf)
        self.used = 0

    def _fill(self, need: int) -> None:
        acc = self.acc & ((1 << self.nbits) - 1)  # drop consumed high bits
        nbits, p = self.nbits, self.p
        while nbits < need:
            take = self.n - p
            if take <= 0:
                acc <<= 16  # zero padding: peekable, not consumable
                nbits += 16
                continue
            if take > 6:
                take = 6
            acc = (acc << (8 * take)) | int.from_bytes(self.buf[p : p + take], "big")
            p += take
            nbits += 8 * take
        self.acc, self.nbits, self.p = acc, nbits, p

    def read_symbol(self, sym: list[int], ln: list[int]) -> int:
        if self.nbits < 16:
            self._fill(16)
        peek = (self.acc >> (self.nbits - 16)) & 0xFFFF
        length = ln[peek]
        if length == 0:
            raise ValueError("invalid Huffman code")
        self.nbits -= length
        self.used += length
        if self.used > self.total:
            raise ValueError("truncated JPEG (entropy data ends mid-scan)")
        return sym[peek]

    def take(self, k: int) -> int:
        if self.nbits < k:
            self._fill(k)
        self.nbits -= k
        self.used += k
        if self.used > self.total:
            raise ValueError("truncated JPEG (entropy data ends mid-scan)")
        return (self.acc >> self.nbits) & ((1 << k) - 1)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JFIF decode → (h, w, 3) RGB uint8 (or
    (h, w) for single-component). Supports 8-bit SOF0/SOF1, sampling
    factors 1–2, restart markers; progressive (SOF2) and other coding
    processes raise ``NotImplementedError`` naming PIL as the path."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (stream ends inside a marker)")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (stream ends inside a segment header)")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if pos + 2 + seglen > len(data):
            raise ValueError("truncated JPEG (segment length overruns the stream)")
        seg = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    t = np.frombuffer(seg[o : o + 64], np.uint8).astype(np.int32)
                    o += 64
                else:
                    t = np.frombuffer(seg[o : o + 128], ">u2").astype(np.int32)
                    o += 128
                inv = np.empty(64, np.int32)
                inv[ZIGZAG] = t  # stored in zigzag order
                qtabs[tq] = inv
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                # store the raw payload: the LUT builder caches on it
                htabs[(cls, tid)] = bytes(bits) + bytes(vals)
                o += 17 + n
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 baseline(+extended) sequential
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) decodes without "
                f"PIL; got SOF marker 0xFF{m:02X} (progressive/arithmetic/"
                "lossless) — install Pillow for the exotic tail"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns < len(frame["comps"]):
                # a non-interleaved file carries one scan per component;
                # returning after the first would silently yield a
                # single-channel plane with the others zeroed
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG not "
                    "supported — install Pillow"
                )
            scomp = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                (comp,) = [c for c in frame["comps"] if c["id"] == cs]
                scomp.append((comp, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            return _decode_scan(
                data, pos, frame, scomp, qtabs, htabs, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scomp, qtabs, htabs, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _dc, _ac in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError("sampling factors beyond 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * len(comps)
    luts = {key: _huff_lut_cached(payload) for key, payload in htabs.items()}
    segments = _split_entropy_segments(data, pos)
    seg_i = 0
    br = _FastBits(segments[0])
    mcu_count = 0
    # The entropy walk stays a Python loop (inherently serial bit
    # cursor); the per-block numpy work (zigzag scatter, dequant, IDCT,
    # plane placement — ~7 small numpy calls per block, the dominant
    # cost at thumbnail sizes) is deferred: collect each block's 64
    # coefficients and batch the lot per COMPONENT below (round 13,
    # guide §4.2). Same ops in the same per-slice order → bit-identical
    # planes.
    comp_zz: list[list[list[int]]] = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # next RST segment, reset predictors
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("truncated JPEG (missing RST marker)")
                br = _FastBits(segments[seg_i])
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, dct, act) in enumerate(scomp):
                dc_sym, dc_ln = luts[(0, dct)]
                ac_sym, ac_ln = luts[(1, act)]
                for _vy in range(comp["v"]):
                    for _vx in range(comp["h"]):
                        s = br.read_symbol(dc_sym, dc_ln)
                        if s:
                            bits = br.take(s)
                            preds[ci] += (
                                bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
                            )
                        zz = [0] * 64
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_sym, ac_ln)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            s = rs & 0x0F
                            if s:  # s == 0 outside EOB/ZRL leaves a 0 coeff
                                bits = br.take(s)
                                zz[k] = (
                                    bits
                                    if bits >= (1 << (s - 1))
                                    else bits - (1 << s) + 1
                                )
                            k += 1
                        comp_zz[ci].append(zz)
    # batched dequant + IDCT + grid placement per component: block
    # append order above is (my, mx, vy, vx) — exactly the reshape
    # below; transpose lays rows as (my, vy, 8) and cols as (mx, vx, 8)
    planes = []
    for ci, (comp, _dct, _act) in enumerate(scomp):
        cv, ch = comp["v"], comp["h"]
        qt = qtabs[comp["tq"]]
        zzs = np.array(comp_zz[ci], np.int64).reshape(mcuy, mcux, cv, ch, 64)
        quant = np.zeros((mcuy, mcux, cv, ch, 64), np.int64)
        quant[..., ZIGZAG] = zzs
        coef = (quant * qt).reshape(mcuy, mcux, cv, ch, 8, 8).astype(np.float64)
        blocks = _D.T @ coef @ _D + 128.0
        planes.append(
            blocks.transpose(0, 2, 4, 1, 3, 5).reshape(mcuy * cv * 8, mcux * ch * 8)
        )
    # upsample to full resolution and crop — triangle filter for the
    # 2× case (libjpeg's "fancy upsampling": out[2i] = ¾in[i]+¼in[i-1],
    # out[2i+1] = ¾in[i]+¼in[i+1], edges clamped), which is what every
    # mainstream decoder renders; plain replication is spec-legal but
    # diverges visibly at chroma edges
    def _up2(p: np.ndarray, axis: int) -> np.ndarray:
        lo = np.roll(p, 1, axis=axis)
        hi = np.roll(p, -1, axis=axis)
        edge = [slice(None)] * p.ndim
        edge[axis] = 0
        lo[tuple(edge)] = p[tuple(edge)]
        edge[axis] = -1
        hi[tuple(edge)] = p[tuple(edge)]
        a = 0.75 * p + 0.25 * lo
        b = 0.75 * p + 0.25 * hi
        return np.stack([a, b], axis=axis + 1).reshape(
            *p.shape[:axis], 2 * p.shape[axis], *p.shape[axis + 1 :]
        )

    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if vmax // comp["v"] == 2:
            p = _up2(p, 0)
        if hmax // comp["h"] == 2:
            p = _up2(p, 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component JPEG not supported (CMYK?)")
