"""Oracle parity for every catalog query at sf0.001 (fast CI tier).

The driver runs the same comparison at sf0.01; tests/oracle_check.py
runs it standalone at any SF.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_check import check  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _names():
    import __spark_entry__ as e

    return list(e.queries())


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(name, spark, duck):
    ok, msg, _rec = check(name, spark, SF_DIR, duck)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"event_type", "minute", "mean"}
