"""WARC (ISO 28500 / Common Crawl) reading and writing.

A 100 TB pretraining corpus usually STARTS life as WARC: Common Crawl
publishes ~100k ``.warc.gz`` segment files per crawl, each a
concatenation of per-record gzip members. This module gives the engine
that ingestion path — a distributed WARC record parser with per-record
corruption isolation, plus a writer used both for round-trip testing
and for re-exporting curated subsets in the archival format.

The reference engine (metrico/cFlux) has no file-corpus surface at all
(cflux.js only speaks line protocol over HTTP); this is part of the
beyond-reference LLM-pipeline tier (SURVEY.md §2.13).

Scale design (100 TB):
- Parallelism is FILE-level, exactly how Common Crawl is consumed: one
  task per ``.warc.gz`` (they're ~1 GB each; 100k files saturate any
  cluster). ``spark.read.format("binaryFile")`` + ``mapInPandas``
  keeps the bytes executor-side; nothing routes through the driver.
- Per-record gzip members mean a task never inflates more than one
  record at a time (the writer emits that layout, like wget/heritrix);
  a monolithic-gzip WARC still parses, just without the member
  boundaries to resync on.
- Corruption is isolated per record: a bad member/length/header yields
  an error row naming the defect and the parser RESYNCS at the next
  gzip member instead of abandoning the file.
- Pure stdlib (zlib) inside Arrow-batched ``mapInPandas`` — no
  row-at-a-time UDFs, no external deps.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "build_warc_gz",
    "iter_warc_records",
    "parse_warc_blobs",
    "read_warc",
    "docs_to_warc_shards",
    "warc_roundtrip",
]

_CRLF = b"\r\n"

#: schema of parsed records — `error` is non-null for isolated bad
#: records (payload columns null), never an exception.
RECORD_SCHEMA = (
    "warc_type string, target_uri string, warc_date string, "
    "record_id string, content_type string, http_status int, "
    "payload binary, error string"
)


def _record_bytes(
    payload: bytes,
    uri: str,
    date: str = "2024-01-01T00:00:00Z",
    record_id: str | None = None,
    warc_type: str = "response",
    http_content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """One WARC record: version line, WARC headers, blank line, HTTP
    response block + payload, then the mandatory two CRLFs."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + http_content_type.encode("ascii") + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        + _CRLF
        + payload
    )
    rid = record_id or f"<urn:cflux:{zlib.crc32(uri.encode('utf-8')):08x}>"
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + http + _CRLF + _CRLF


def build_warc_gz(records, compress: bool = True) -> bytes:
    """Serialize (uri, payload_bytes) pairs as a WARC stream — one
    gzip member per record when ``compress`` (the Common Crawl
    layout), plain concatenation otherwise. Deterministic: no
    timestamps beyond the fixed WARC-Date, gzip mtime pinned to 0."""
    out = bytearray()
    for uri, payload in records:
        raw = _record_bytes(payload, uri)
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            # wbits 16+15 = gzip container; zlib sets MTIME=0 (unlike
            # the gzip module, which stamps wall-clock time)
            out += co.compress(raw) + co.flush()
        else:
            out += raw
    return bytes(out)


def _split_gzip_members(blob: bytes) -> list[bytes] | None:
    """Inflate a concatenated-gzip stream member by member. Returns
    None when the blob isn't gzip at all (plain WARC). A member that
    fails to inflate ends the scan — the caller reports what it got
    plus one error record for the trailing garbage."""
    if len(blob) < 2 or blob[:2] != b"\x1f\x8b":
        return None
    members: list[bytes] = []
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            members.append(d.decompress(blob[pos:]))
        except zlib.error:
            members.append(b"")  # poisoned member → error record
            break
        if not d.eof:  # truncated member
            members.append(b"")
            break
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return members


def _parse_one(raw: bytes, out: list[dict]) -> int:
    """Parse one WARC record from ``raw`` starting at 0; append a row
    to ``out``; return bytes consumed (0 = unrecoverable here)."""

    def err(msg: str) -> int:
        out.append({"error": msg})
        return 0

    nl = raw.find(_CRLF)
    if nl < 0 or not raw[:nl].startswith(b"WARC/"):
        return err("missing WARC/ version line")
    hdr_end = raw.find(_CRLF + _CRLF, nl)
    if hdr_end < 0:
        return err("truncated WARC header block")
    headers: dict[str, str] = {}
    for line in raw[nl + 2 : hdr_end].split(_CRLF):
        k, _, v = line.partition(b":")
        if not _:
            return err(f"malformed WARC header line {line[:40]!r}")
        headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        return err("missing/bad Content-Length")
    body_start = hdr_end + 4
    body = raw[body_start : body_start + clen]
    if len(body) < clen:
        return err(f"record body truncated ({len(body)}/{clen} bytes)")
    row = {
        "warc_type": headers.get("warc-type"),
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "record_id": headers.get("warc-record-id"),
        "content_type": headers.get("content-type"),
        "http_status": None,
        "payload": body,
        "error": None,
    }
    if (headers.get("content-type") or "").startswith("application/http"):
        # split the HTTP response block: status line, headers, body
        he = body.find(_CRLF + _CRLF)
        sl = body.find(_CRLF)
        if he < 0 or sl < 0 or not body[:5] in (b"HTTP/",):
            row["error"] = "malformed HTTP block"
            row["payload"] = None
        else:
            parts = body[:sl].split(b" ")
            try:
                row["http_status"] = int(parts[1])
            except (IndexError, ValueError):
                row["error"] = "malformed HTTP status line"
            row["payload"] = body[he + 4 :]
    consumed = body_start + clen
    # the record terminator (2 CRLFs) — tolerate its absence at EOF
    if raw[consumed : consumed + 4] == _CRLF + _CRLF:
        consumed += 4
    out.append(row)
    return consumed


def iter_warc_records(blob: bytes) -> list[dict]:
    """Parse a WARC blob (gzip-membered, monolithic-gzip, or plain)
    into record dicts. Per-record errors become rows with ``error``
    set; parsing continues at the next gzip member / header scan."""
    members = _split_gzip_members(blob)
    rows: list[dict] = []
    if members is None:
        members = [blob]
    for m in members:
        if not m:
            rows.append({"error": "undecodable gzip member"})
            continue
        pos = 0
        while pos < len(m):
            consumed = _parse_one(m[pos:], rows)
            if consumed <= 0:
                break  # error row already appended; resync = next member
            pos += consumed
            # skip stray CRLF padding between records
            while m[pos : pos + 2] == _CRLF:
                pos += 2
    for r in rows:
        for k in (
            "warc_type",
            "target_uri",
            "warc_date",
            "record_id",
            "content_type",
            "http_status",
            "payload",
            "error",
        ):
            r.setdefault(k, None)
    return rows


def parse_warc_blobs(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """Distributed WARC parse: one input row per WARC file/blob →
    one output row per record (RECORD_SCHEMA). Arrow-batched
    ``mapInPandas``; per-record errors isolate, never raise."""
    import pandas as pd

    cols = [
        "warc_type",
        "target_uri",
        "warc_date",
        "record_id",
        "content_type",
        "http_status",
        "payload",
        "error",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf[blob_col]:
                rows.extend(iter_warc_records(bytes(blob)))
            yield pd.DataFrame(
                {c: pd.Series([r[c] for r in rows], dtype=object) for c in cols}
            ) if rows else pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    return df.select(blob_col).mapInPandas(gen, RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files under ``path`` into record
    rows. binaryFile gives file-level parallelism (the Common Crawl
    unit of work); each task parses its own file."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_blobs(files, "content")


def docs_to_warc_shards(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    uri_prefix: str = "https://corpus.invalid/doc/",
) -> DataFrame:
    """Serialize a document table into in-memory WARC shards:
    (shard, warc blob). One groupBy shuffle into an applyInPandas
    serializer — each task owns a whole shard, rows ordered by id so
    the bytes are deterministic. The in-memory form feeds round-trip
    verification; production export would write each blob to shared
    storage exactly like sampling.export_tar_shards."""
    import pandas as pd

    shard = F.crc32(F.col(id_col).cast("string")) % n_shards

    def ser(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        blob = build_warc_gz(
            (uri_prefix + str(i), t.encode("utf-8"))
            for i, t in zip(pdf[id_col], pdf[text_col])
        )
        return pd.DataFrame({"shard": [int(pdf["_shard"].iloc[0])], "warc": [blob]})

    return (
        docs.select(id_col, text_col, shard.alias("_shard"))
        .groupBy("_shard")
        .applyInPandas(ser, "shard int, warc binary")
    )


def warc_roundtrip(docs: DataFrame, n_shards: int = 16, uri_prefix: str = "https://corpus.invalid/doc/") -> DataFrame:
    """documents → WARC shards → parse → (doc_id, text) back. The
    end-to-end ingestion proof the catalog oracle checks against the
    original table."""
    shards = docs_to_warc_shards(docs, n_shards=n_shards, uri_prefix=uri_prefix)
    recs = parse_warc_blobs(shards, "warc")
    return recs.filter(F.col("error").isNull() & (F.col("warc_type") == "response")).select(
        F.replace(F.col("target_uri"), F.lit(uri_prefix), F.lit("")).cast("long").alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
    )
