"""Property-based tests (hypothesis) for the pure-Python pieces of the
InfluxQL front-end — no SparkSession needed, so these run in
milliseconds and explore far more of the input space than the
example-based suites: the arithmetic expression parser must agree
with Python's own evaluator on every generated expression, and the
quote/paren-aware splitters must partition without losing characters.
"""

import math
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflux_spark.plans.influxql import (  # noqa: E402
    InfluxQLError,
    _parse_arith,
    _parse_show,
    _split_on_word,
)


# ---------------------------------------------------------- arithmetic


def _eval(node, env):
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "field":
        return env[node[1]]
    if kind == "agg":
        return env[(node[1], node[2])]
    if kind == "neg":
        return -_eval(node[1], env)
    op, left, right = node[1], _eval(node[2], env), _eval(node[3], env)
    if op == "+":
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    return left / right


@st.composite
def arith_exprs(draw, depth=0):
    """Random arithmetic over two fields and numeric literals, as both
    source text and expected value under a fixed environment."""
    env = {"user": 3.5, "sys": -2.25}
    if depth >= 3 or draw(st.booleans()):
        leaf = draw(st.sampled_from(["num", "user", "sys"]))
        if leaf == "num":
            v = draw(st.integers(min_value=0, max_value=999))
            return f"{v}", float(v)
        return leaf, env[leaf]
    op = draw(st.sampled_from("+-*/"))
    ls, lv = draw(arith_exprs(depth=depth + 1))
    rs, rv = draw(arith_exprs(depth=depth + 1))
    if op == "/" and rv == 0:
        op = "+"
    text = f"({ls} {op} {rs})"
    return text, _eval(("op", op, ("num", lv), ("num", rv)), {})


@settings(max_examples=300, deadline=None)
@given(arith_exprs())
def test_parse_arith_agrees_with_python_eval(case):
    text, want = case
    node = _parse_arith(text)
    env = {"user": 3.5, "sys": -2.25}
    got = _eval(node, env)
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12), (text, got, want)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="()+-*/ 1ab\"'", max_size=24))
def test_parse_arith_never_hangs_or_crashes_unexpectedly(s):
    """Arbitrary operator soup either parses or raises InfluxQLError —
    never an IndexError/ValueError/infinite loop."""
    try:
        _parse_arith(s)
    except InfluxQLError:
        pass


# ------------------------------------------------------------ splitters


def _well_formed(s: str) -> bool:
    """Quote state closed and parens balanced OUTSIDE quotes, under
    the same scanning rules the splitter uses."""
    quote = None
    depth = 0
    for c in s:
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return quote is None and depth == 0


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab'\"() =", min_size=1, max_size=12).filter(
            lambda s: _well_formed(s) and "AND" not in s.upper()
        ),
        min_size=1,
        max_size=5,
    )
)
def test_split_on_word_partitions_without_loss(parts):
    """Joining balanced AND-free fragments with ' AND ' and splitting
    again recovers exactly the fragments (the paren/quote awareness
    must not eat or duplicate characters)."""
    joined = " AND ".join(parts)
    got = _split_on_word(joined, "AND")
    assert [g.strip() for g in got] == [p.strip() for p in parts], joined


# ---------------------------------------------------------- SHOW clauses

# quoted tag values: anything printable except the quote itself —
# including the clause keywords the old regex carver choked on
_SHOW_VALUE = st.text(
    alphabet="abcWHERELIMITOFSshow ()=~.0123456789", min_size=1, max_size=20
)


@settings(max_examples=300, deadline=None)
@given(
    val=_SHOW_VALUE,
    limit=st.one_of(st.none(), st.integers(0, 99)),
    offset=st.one_of(st.none(), st.integers(0, 99)),
)
def test_parse_show_carves_clauses_exactly(val, limit, offset):
    """Round-trip property for the quote-aware SHOW tokenizer: a
    statement assembled from a quoted WHERE value (which may contain
    keyword lookalikes like ' LIMIT 5') plus optional LIMIT/OFFSET
    tails decomposes into exactly those pieces — the WHERE text keeps
    its quotes intact and keyword text inside quotes never becomes a
    clause."""
    qs = f"SHOW MEASUREMENTS WHERE label = '{val}'"
    if limit is not None:
        qs += f" LIMIT {limit}"
    if offset is not None:
        qs += f" OFFSET {offset}"
    sc = _parse_show(qs)
    assert sc.where == f"label = '{val}'"
    assert sc.limit == limit and sc.offset == offset
    assert sc.head == "SHOW MEASUREMENTS"


@settings(max_examples=200, deadline=None)
@given(name=st.text(alphabet="ab c.d-0", min_size=1, max_size=15))
def test_parse_show_from_name_survives_quoting(name):
    """FROM "any name" round-trips through from_name verbatim —
    spaces, dots and dashes included (quoted identifiers must not be
    split on '.')."""
    sc = _parse_show(f'SHOW TAG KEYS FROM "{name}" LIMIT 3')
    assert sc.from_name == name and sc.limit == 3


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab()'\" ANDOR=", max_size=40))
def test_split_on_word_conserves_characters(s):
    """Whatever the input, the split never loses non-keyword text:
    rejoining with the keyword has the same length as the input."""
    got = _split_on_word(s, "AND")
    assert len(" AND".join(got)) >= len(s) - 4  # at most trailing keyword slack
    assert sum(len(g) for g in got) <= len(s)


# ------------------------------------------------- multi-field merge

from cflux_spark.plans.influxql import _merge_series_columns  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    data=st.dictionaries(
        st.sampled_from(["f1", "f2", "f3"]),
        st.lists(
            st.tuples(st.integers(0, 5), st.integers(-9, 9)), min_size=0, max_size=6
        ),
        min_size=1,
        max_size=3,
    ),
    desc=st.booleans(),
    limit=st.one_of(st.none(), st.integers(1, 8)),
    offset=st.one_of(st.none(), st.integers(0, 4)),
)
def test_merge_series_grid_conserves_values(data, desc, limit, offset):
    """Property: merging per-field 2-col series onto the statement
    grid (a) keeps columns = time + ordered union of value columns,
    (b) places every input value in its own column slot exactly once
    (before slicing), (c) orders rows by time per ORDER BY, and
    (d) applies OFFSET/LIMIT to the MERGED rows."""
    # per-field series arrive time-ordered from the engine (each frame
    # is orderBy'd before collect) — the generator honors the invariant
    series = [
        {
            "name": "m",
            "columns": ["time", f],
            "values": [[t, v] for t, v in sorted(pts, key=lambda p: p[0], reverse=desc)],
        }
        for f, pts in data.items()
        if pts
    ]
    if not series:
        return
    fields = [s["columns"][1] for s in series]
    out = _merge_series_columns(
        [dict(s) for s in series], desc, limit, offset, slice_unmerged=True
    )
    assert len(out) == 1
    se = out[0]
    if len(fields) == 1:
        assert se["columns"] == ["time", fields[0]]
    else:
        assert se["columns"] == ["time"] + fields
    # rebuild the unsliced merged grid independently
    full = _merge_series_columns([dict(s) for s in series], desc, None, None, True)[0]
    n_in = sum(len(s["values"]) for s in series)
    n_cells = sum(1 for row in full["values"] for v in row[1:] if v is not None)
    assert n_cells == n_in  # every value lands exactly once
    ts = [row[0] for row in full["values"]]
    assert ts == sorted(ts, reverse=desc)
    lo = offset or 0
    hi = lo + limit if limit is not None else None
    assert se["values"] == full["values"][lo:hi]
