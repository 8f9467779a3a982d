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


def check(name: str, spark, sf_dir: str, con) -> tuple[bool, str, dict]:
    """Returns (ok, message, record) — record is the driver's
    CORRECTNESS_r{N}.json per-query shape, so a run with
    CORRECTNESS_OUT set persists a comparable artifact (round 10:
    the sf1 signal of record, VERDICT r9 item 2)."""
    import __spark_entry__ as e

    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    qfn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rec["spark_rows"] = len(srows)
    if sql is None:
        rec["err"] = "no_oracle"
        return (len(srows) >= 0, f"rows-only: {len(srows)} rows", rec)
    orel = con.execute(sql)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    rec["oracle_rows"] = len(orows)
    rec["schema_match"] = sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in ocols
    )
    if not rec["schema_match"]:
        return False, f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}", rec
    rec["rows_match"] = len(srows) == len(orows)
    if not rec["rows_match"]:
        return False, f"row count: spark={len(srows)} oracle={len(orows)}", rec
    ns, no = normalize(srows, scols), normalize(orows, ocols)
    bad = [(a, b) for a, b in zip(ns, no) if a != b]
    rec["hash_match"] = not bad
    if bad:
        return False, f"{len(bad)}/{len(ns)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}", rec
    return True, f"OK: {len(srows)} rows", rec


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
    records: dict[str, dict] = {}
    for name in names:
        try:
            ok, msg, rec = check(name, spark, sf_dir, con)
        except Exception as ex:  # noqa: BLE001
            msg = f"EXCEPTION: {type(ex).__name__}: {str(ex).splitlines()[0][:300]}"
            ok, rec = False, {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None, "err": msg,
            }
        print(f"{'PASS' if ok else 'FAIL'}  {name:26s} {msg}")
        n_ok += ok
        records[name] = rec
        if not ok:
            failures.append(name)
    print(f"\n{n_ok}/{len(names)} pass")
    if failures:
        print("failing:", " ".join(failures))
    out = os.environ.get("CORRECTNESS_OUT")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump(records, fh, indent=1)
        print(f"wrote {out} ({len(records)} records, sf_dir={sf_dir})")
    spark.stop()
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
