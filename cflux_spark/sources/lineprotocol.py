"""InfluxDB line-protocol parser (reference: lineparser.js:3-47).

Grammar (InfluxDB 1.x line protocol):

    measurement[,tag_key=tag_val...] field_key=field_val[,...] [timestamp_ns]

Escaping rules: in measurement names ``,`` and space are escaped with a
backslash; in tag/field keys and tag values ``,``, ``=`` and space are
escaped; string field values are double-quoted with ``\"`` and ``\\``
escapes.

Type routing (deliberate fixes over the reference, SURVEY.md §1.2):

- the reference routes with ``parseFloat(v)`` truthiness
  (cflux.js:362-363), which misroutes 0 / 0.0 / false to the string
  path. We route by line-protocol type: bare/``i``-suffixed numerics →
  float (so ``idle=0`` stays a float), quoted strings → string,
  booleans → string ("true"/"false", documented policy in FIXTURES.md).
- timestamps: nanoseconds preserved exactly (``ts_ns``); the reference
  truncates to ms (cflux.js:360).

This module is pure Python (no Spark imports) so it can run inside
``mapInPandas`` workers and in unit tests without a session.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_MEASUREMENT = "ts1"  # reference default table, lineparser.js:5


@dataclass
class ParsedLine:
    measurement: str
    tags: dict[str, str] = field(default_factory=dict)
    float_fields: dict[str, float] = field(default_factory=dict)
    string_fields: dict[str, str] = field(default_factory=dict)
    ts_ns: int | None = None
    error: str | None = None


_TRUE = {"t", "T", "true", "True", "TRUE"}
_FALSE = {"f", "F", "false", "False", "FALSE"}


def _split_unescaped(s: str, sep: str) -> list[str]:
    """Split on `sep` except where preceded by a backslash."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _unescape(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 1 < n and s[i + 1] in (",", "=", " ", "\\"):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _split_fields_section(s: str) -> list[str]:
    """Split the field section on commas that are neither escaped nor
    inside a quoted string value."""
    parts: list[str] = []
    buf: list[str] = []
    in_quotes = False
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_quotes = not in_quotes
            buf.append(c)
        elif c == "," and not in_quotes:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _split_field_kv(item: str) -> list[str]:
    """Split one field item on the first ``=`` outside quotes."""
    in_quotes = False
    i, n = 0, len(item)
    while i < n:
        c = item[i]
        if c == "\\" and i + 1 < n:
            i += 2
            continue
        if c == '"':
            in_quotes = not in_quotes
        elif c == "=" and not in_quotes:
            return [item[:i], item[i + 1 :]]
        i += 1
    return [item]


def _split_toplevel_spaces(line: str) -> list[str]:
    """Split the line into ≤3 sections (key part, field part, ts) on
    spaces that are neither backslash-escaped nor inside quotes."""
    sections: list[str] = []
    buf: list[str] = []
    in_quotes = False
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(line[i + 1])
            i += 2
            continue
        if c == '"':
            in_quotes = not in_quotes
            buf.append(c)
        elif c == " " and not in_quotes:
            if buf:
                sections.append("".join(buf))
                buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        sections.append("".join(buf))
    return sections


def _parse_field_value(raw: str) -> tuple[str, float | str]:
    """Return ("float", x) or ("string", s) per line-protocol typing."""
    if len(raw) >= 2 and raw[0] == '"' and raw[-1] == '"':
        inner = raw[1:-1]
        out: list[str] = []
        i, n = 0, len(inner)
        while i < n:
            if inner[i] == "\\" and i + 1 < n and inner[i + 1] in ('"', "\\"):
                out.append(inner[i + 1])
                i += 2
            else:
                out.append(inner[i])
                i += 1
        return "string", "".join(out)
    if raw in _TRUE:
        return "string", "true"
    if raw in _FALSE:
        return "string", "false"
    body = raw[:-1] if raw and raw[-1] in ("i", "u") else raw
    try:
        return "float", float(body)
    except ValueError:
        return "string", raw


def parse_line(line: str) -> ParsedLine | None:
    """Parse one line. Returns None for blank/comment lines; a
    ParsedLine with .error set for malformed ones (kept, so ingest can
    count/route rejects instead of dropping silently)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    sections = _split_toplevel_spaces(line)
    if not sections:
        return None

    key_part = sections[0]
    key_items = _split_unescaped(key_part, ",")
    measurement = _unescape(key_items[0]) or DEFAULT_MEASUREMENT
    tags: dict[str, str] = {}
    for item in key_items[1:]:
        if not item:
            continue
        kv = _split_unescaped(item, "=")
        if len(kv) != 2 or not kv[0]:
            return ParsedLine(measurement, error=f"bad tag {item!r}")
        key = _unescape(kv[0])
        if key == "__name__":
            # reserved: ingest appends __name__ to the tag map for the
            # series identity (cflux.js:322-325 analogue); a literal
            # tag with this key would be a duplicate map key that kills
            # the whole batch under Spark's mapKeyDedupPolicy=EXCEPTION.
            # Reject THIS line (keep-and-route policy), not the batch.
            return ParsedLine(measurement, error=f"reserved tag key {key!r}")
        tags[key] = _unescape(kv[1])

    if len(sections) < 2:
        return ParsedLine(measurement, tags, error="missing fields")

    floats: dict[str, float] = {}
    strings: dict[str, str] = {}
    for item in _split_fields_section(sections[1]):
        if not item:
            continue
        kv = _split_field_kv(item)
        if len(kv) != 2 or not kv[0]:
            return ParsedLine(measurement, tags, error=f"bad field {item!r}")
        k = _unescape(kv[0])
        kind, val = _parse_field_value(kv[1])
        if kind == "float":
            floats[k] = val  # type: ignore[assignment]
        else:
            strings[k] = val  # type: ignore[assignment]
    if not floats and not strings:
        return ParsedLine(measurement, tags, error="no fields")

    ts_ns: int | None = None
    if len(sections) >= 3:
        try:
            ts_ns = int(sections[2])
        except ValueError:
            return ParsedLine(measurement, tags, floats, strings, error=f"bad ts {sections[2]!r}")
        # int64 bounds: an out-of-range timestamp must become a parse
        # error on ITS line, not an Arrow overflow that kills the batch
        if not (-(1 << 63) <= ts_ns < (1 << 63)):
            return ParsedLine(measurement, tags, floats, strings, error=f"ts out of int64 range {sections[2]!r}")
    return ParsedLine(measurement, tags, floats, strings, ts_ns)


def parse_lines(text: str) -> list[ParsedLine]:
    """Parse a \\n-separated batch (the /write body, cflux.js:317)."""
    out: list[ParsedLine] = []
    for raw in text.split("\n"):
        p = parse_line(raw)
        if p is not None:
            out.append(p)
    return out


def format_line(p: ParsedLine) -> str:
    """Inverse of parse_line (property-test round-trip support)."""

    def esc_key(s: str) -> str:
        return s.replace("\\", "\\\\").replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")

    def esc_meas(s: str) -> str:
        return s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")

    parts = [esc_meas(p.measurement)]
    for k in p.tags:
        parts.append(f"{esc_key(k)}={esc_key(p.tags[k])}")
    key_part = ",".join(parts)
    fields = []
    for k, v in p.float_fields.items():
        fields.append(f"{esc_key(k)}={v!r}")
    for k, v in p.string_fields.items():
        sv = v.replace("\\", "\\\\").replace('"', '\\"')
        fields.append(f'{esc_key(k)}="{sv}"')
    out = f"{key_part} {','.join(fields)}"
    if p.ts_ns is not None:
        out += f" {p.ts_ns}"
    return out
