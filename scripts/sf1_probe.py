"""sf1 promotion probe (round 9, VERDICT r8 item #4): one measured 10×
step of the ACTUAL catalog, not a synthetic kernel.

Synthesizes an sf1-scale dataset (10× sf0.1) into ``--out`` by
replicating each table with foreign-key-consistent key offsets
(replica i adds i·10⁹ to every key column on BOTH sides of each FK, so
joins stay consistent within a replica and keys never collide; 10⁹ is
divisible by 256/4/5/8/1000, so the catalog's doc_id%k closed-form
oracles keep their alignment). Documents get a per-replica text suffix
(so replicas are near-dups, not byte-dups — the realistic shape for
the dedup tiers); events get a +i µs timestamp jitter (distinct point
identities, same bucket structure). Correctness at sf1 does NOT depend
on any of this — the DuckDB oracle reads the same files — it only
shapes the workload realistically.

Then:
  1. full-catalog oracle parity at sf1 (tests/oracle_check.py),
  2. the bench sweep at sf1 (bench.py with SPARK_GRAFT_SF_DIR).

Usage:
    python scripts/sf1_probe.py [--out /tmp/sf1] [--skip-gen]
        [--parity] [--bench]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
N_REP = 10
OFF = 10**9

# key columns per table — the SAME offset lands on both sides of every
# foreign key, so replica-local joins reproduce the sf0.1 join graph
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def generate(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        t0 = time.time()
        if not keys:  # dimension tables stay as-is
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)"
            )
            print(f"  {table:10s} copied           {time.time() - t0:6.1f}s")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f'"{c}" + i * {OFF} AS "{c}"')
            elif table == "documents" and c == "text":
                sel.append("CASE WHEN i = 0 THEN text ELSE text || ' rep' || i END AS text")
            elif table == "events" and c == "ts":
                sel.append("ts + to_microseconds(i) AS ts")
            else:
                sel.append(f'"{c}"')
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{src}'), "
            f"range({N_REP}) t(i)) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"  {table:10s} {n:>12,} rows {time.time() - t0:6.1f}s")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--parity", action="store_true", help="run full-catalog oracle parity")
    ap.add_argument("--bench", action="store_true", help="run the bench sweep")
    ap.add_argument(
        "--correctness-out",
        default=None,
        help="persist the parity run as a CORRECTNESS-shaped JSON (the "
        "sf1 signal of record; e.g. CORRECTNESS_sf1_r10.json). "
        "Regenerate with: python scripts/sf1_probe.py --parity "
        "--correctness-out CORRECTNESS_sf1_rN.json",
    )
    args = ap.parse_args()
    if not args.skip_gen:
        print(f"generating sf1 at {args.out} (10x {SRC})")
        t0 = time.time()
        generate(args.out)
        print(f"generation wall {time.time() - t0:.1f}s")
    rc = 0
    if args.parity:
        print("\n=== full-catalog oracle parity at sf1 ===")
        env = {**os.environ, "SF": args.out}
        env.setdefault("ORACLE_DUCKDB_MEM", "60GB")
        if args.correctness_out:
            env["CORRECTNESS_OUT"] = os.path.abspath(args.correctness_out)
        rc |= subprocess.run(
            [sys.executable, os.path.join(REPO, "tests", "oracle_check.py")],
            env=env, cwd=REPO,
        ).returncode
    if args.bench:
        print("\n=== bench sweep at sf1 ===")
        env = {**os.environ, "SPARK_GRAFT_SF_DIR": args.out}
        rc |= subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")], env=env, cwd=REPO
        ).returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
