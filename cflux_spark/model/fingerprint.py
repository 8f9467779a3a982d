"""Series identity: canonical label JSON → 64-bit fingerprint.

The reference fingerprints a series as
``parseInt(shortHash(JSON.stringify(tags + {__name__: field})), 16)``
(cflux.js:133-137, 322-325). Two deliberate deviations, documented in
SURVEY.md §5/§7:

1. **Canonicalization.** The reference hashes the tag array in arrival
   order, so ``m,a=1,b=2`` and ``m,b=2,a=1`` become *different* series.
   We sort tag keys before serializing, so identity is permutation
   invariant (what InfluxDB itself does).
2. **Hash function.** The fingerprint is an internal identifier, never
   exposed through the API, so any stable 64-bit hash is faithful. We
   use Spark's built-in ``xxhash64`` (JVM-side, codegen'd) and
   replicate it bit-exactly in pure Python for driver-side/unit use.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F

NAME_LABEL = "__name__"


def canonical_labels_json(tags: dict[str, str], name: str | None = None) -> str:
    """Sorted-key JSON of the tag set (+ optional __name__ entry).

    Separators match Spark's ``to_json`` output (no spaces) so the
    Python and column implementations produce identical strings.
    """
    labels = dict(tags or {})
    if name is not None:
        labels[NAME_LABEL] = name
    return json.dumps({k: str(labels[k]) for k in sorted(labels)}, separators=(",", ":"))


def fingerprint_py(tags: dict[str, str], name: str | None = None) -> int:
    """Pure-Python fingerprint == xxhash64(canonical_labels_json, seed=42).

    Spark's ``xxhash64`` is XXH64 with seed 42 over the UTF-8 bytes of
    the string; `_xxh64` below implements the public XXH64 spec.
    """
    data = canonical_labels_json(tags, name).encode("utf-8")
    return _xxh64(data, seed=42)


def fingerprint_col(labels_json: Column) -> Column:
    """Column form: xxhash64 over the canonical labels JSON string."""
    return F.xxhash64(labels_json)


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (public algorithm), returned as a *signed* 64-bit int to
    match Spark's LongType output of ``xxhash64``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    # two's-complement to signed, matching Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h
