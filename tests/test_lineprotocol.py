"""Golden + property tests for the line-protocol parser (SURVEY §5.2/§5.4).

Covers the FIXTURES.md §B corpus: basic lines, multi-field fan-out,
missing timestamps/tags, string fields, the zero-value misroute fix,
integer suffixes, booleans, escapes, tag-order canonicalization.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cflux_spark.model.fingerprint import canonical_labels_json, fingerprint_py
from cflux_spark.sources.lineprotocol import (
    ParsedLine,
    format_line,
    parse_line,
    parse_lines,
)


def test_basic():
    p = parse_line("cpu,host=a,region=eu user=0.64 1545424651000000000")
    assert p.measurement == "cpu"
    assert p.tags == {"host": "a", "region": "eu"}
    assert p.float_fields == {"user": 0.64}
    assert p.ts_ns == 1545424651000000000
    assert p.error is None


def test_multi_field_fanout():
    # README.md:47 example shape: several fields on one line
    p = parse_line("stat,cseq=OPTIONS 100=1,OPTIONS=1 1545424651000000000")
    assert p.float_fields == {"100": 1.0, "OPTIONS": 1.0}
    assert p.tags == {"cseq": "OPTIONS"}


def test_no_timestamp():
    p = parse_line("cpu,host=a user=1")
    assert p.ts_ns is None
    assert p.float_fields == {"user": 1.0}


def test_no_tags():
    p = parse_line("cpu user=1 1545424651000000000")
    assert p.tags == {}
    assert p.float_fields == {"user": 1.0}


def test_string_field():
    p = parse_line('app,host=a status="ok"')
    assert p.string_fields == {"status": "ok"}
    assert p.float_fields == {}


def test_string_field_with_comma_space_quote():
    p = parse_line('app,host=a status="ok there, \\"x\\"" 5')
    assert p.string_fields == {"status": 'ok there, "x"'}
    assert p.ts_ns == 5


def test_zero_stays_float():
    # deviation from reference: cflux.js:362-363 misroutes 0 to string
    p = parse_line("cpu,host=a idle=0")
    assert p.float_fields == {"idle": 0.0}
    assert p.string_fields == {}


def test_integer_suffix():
    p = parse_line("net,host=a bytes=123i")
    assert p.float_fields == {"bytes": 123.0}


def test_boolean_routes_to_string():
    p = parse_line("up,host=a ok=true,down=F")
    assert p.string_fields == {"ok": "true", "down": "false"}


def test_escapes():
    p = parse_line("disk,path=/var\\ log,d\\,c=x\\=y used=1")
    assert p.measurement == "disk"
    assert p.tags == {"path": "/var log", "d,c": "x=y"}


def test_escaped_measurement():
    p = parse_line("my\\ meas,t=1 f=2")
    assert p.measurement == "my meas"


def test_blank_and_comment_skipped():
    assert parse_line("") is None
    assert parse_line("   ") is None
    assert parse_line("# comment") is None


def test_missing_fields_is_error():
    p = parse_line("cpu,host=a")
    assert p.error is not None


def test_batch():
    text = "cpu,host=a user=1 1\ncpu,host=b user=2 2\n\nmem,host=a used=3 3"
    ps = parse_lines(text)
    assert len(ps) == 3
    assert {p.measurement for p in ps} == {"cpu", "mem"}


def test_fingerprint_tag_order_invariant():
    # deviation from reference (cflux.js:323-325 hashes arrival order)
    a = fingerprint_py({"a": "1", "b": "2"}, "cpu.user")
    b = fingerprint_py({"b": "2", "a": "1"}, "cpu.user")
    assert a == b


def test_fingerprint_distinguishes_name_and_tags():
    base = fingerprint_py({"a": "1"}, "cpu.user")
    assert fingerprint_py({"a": "1"}, "cpu.sys") != base
    assert fingerprint_py({"a": "2"}, "cpu.user") != base
    assert fingerprint_py({}, "cpu.user") != base


def test_canonical_json_shape():
    s = canonical_labels_json({"b": "2", "a": "1"}, "m.f")
    assert s == '{"__name__":"m.f","a":"1","b":"2"}'


_key = st.text(alphabet=string.ascii_letters + string.digits + "_-./ ,=", min_size=1, max_size=12).filter(
    lambda s: s.strip() == s and s
)
_val = _key
_num = st.floats(allow_nan=False, allow_infinity=False, width=32)


@given(
    meas=_key,
    tags=st.dictionaries(_key, _val, max_size=4),
    floats=st.dictionaries(_key, _num, min_size=1, max_size=4),
    strings=st.dictionaries(_key, st.text(max_size=20), max_size=3),
    ts=st.one_of(st.none(), st.integers(min_value=0, max_value=2**62)),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip(meas, tags, floats, strings, ts):
    src = ParsedLine(meas, tags, floats, strings, ts)
    line = format_line(src)
    out = parse_line(line)
    assert out is not None and out.error is None, (line, out)
    assert out.measurement == meas
    assert out.tags == tags
    assert out.float_fields == floats
    assert out.string_fields == strings
    assert out.ts_ns == ts


def test_timestamp_out_of_int64_range_is_error():
    p = parse_line("m,host=a v=1 17040670000000000000")
    assert p.error is not None and "int64" in p.error
    p2 = parse_line(f"m,host=a v=1 {2**63 - 1}")
    assert p2.error is None and p2.ts_ns == 2**63 - 1


def test_reserved_name_tag_is_rejected():
    """A literal '__name__' tag would duplicate the reserved label key
    at fingerprint time (mapKeyDedupPolicy=EXCEPTION would kill the
    whole ingest batch); the parser rejects the line instead."""
    p = parse_line("m,__name__=x v=1 1704067200000000000")
    assert p is not None and p.error is not None and "__name__" in p.error
    # the rest of a batch containing such a line still ingests
    batch = parse_lines("m,__name__=x v=1\nm,host=a v=2")
    assert [p.error is None for p in batch] == [False, True]
