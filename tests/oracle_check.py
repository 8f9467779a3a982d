"""Local oracle-parity harness: runs each queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet, compares row count,
column names, and order-insensitive values (floats to 1e-9 after the
in-query rounding).

Usage:
    python tests/oracle_check.py [query ...]      # default: all with oracles
    SF=/root/testdata/sf0.01 python tests/oracle_check.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**52 else v
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def check(name: str, spark, sf_dir: str, con) -> tuple[bool, str]:
    import __spark_entry__ as e

    qfn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        return (len(srows) >= 0, f"rows-only: {len(srows)} rows")
    orel = con.execute(sql)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count: spark={len(srows)} oracle={len(orows)}"
    ns, no = normalize(srows, scols), normalize(orows, ocols)
    bad = [(a, b) for a, b in zip(ns, no) if a != b]
    if bad:
        return False, f"{len(bad)}/{len(ns)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}"
    return True, f"OK: {len(srows)} rows"


def main() -> int:
    import __spark_entry__ as e
    from cflux_spark.session import get_spark

    sf_dir = os.environ.get("SF", "/root/testdata/sf0.01")
    spark = get_spark("oracle_check", cpus=8)
    con = duckdb.connect()
    # a runaway oracle (e.g. an exact all-pairs join at a large SF)
    # should fail ITS query, not OOM-kill the box: cap DuckDB when
    # asked (the sf1 probe passes ORACLE_DUCKDB_MEM=60GB)
    mem = os.environ.get("ORACLE_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = sys.argv[1:] or list(e.queries())
    n_ok = 0
    failures = []
    for name in names:
        try:
            ok, msg = check(name, spark, sf_dir, con)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(ex).__name__}: {str(ex).splitlines()[0][:300]}"
        print(f"{'PASS' if ok else 'FAIL'}  {name:26s} {msg}")
        n_ok += ok
        if not ok:
            failures.append(name)
    print(f"\n{n_ok}/{len(names)} pass")
    if failures:
        print("failing:", " ".join(failures))
    spark.stop()
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
