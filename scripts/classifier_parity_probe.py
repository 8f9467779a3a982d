"""Round-13 probe for the q_quality_classifier driver-side hash
mismatch (VERDICT r12 item 1, the only red correctness row).

Hypothesis under test: tests/oracle_check.py canonicalizes floats with
round(v, 9), so a sub-1e-9 Spark-vs-DuckDB difference passes the
builder's gate but can fail a driver that hashes exact values. This
probe compares BIT-EXACTLY (repr of the raw doubles) and under varied
Spark session shapes (core count / locale / timezone), printing every
row whose float differs by ANY amount.

Usage: python scripts/classifier_parity_probe.py [sf_dir] [cpus ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def spark_rows(sf_dir: str, cpus: int, extra_conf: str = ""):
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = extra_conf
    import __spark_entry__ as e
    from cflux_spark.session import get_spark

    spark = get_spark(f"clf_probe_{cpus}", cpus=cpus)
    df = e.queries()["q_quality_classifier"](spark, sf_dir)
    rows = {r["doc_id"]: (r["n_grams"], r["log_odds"], r["keep"]) for r in df.collect()}
    spark.stop()
    return rows


def duck_rows(sf_dir: str):
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.execute(e.oracle_sql()["q_quality_classifier"])
    cols = [d[0] for d in rel.description]
    out = {}
    for r in rel.fetchall():
        d = dict(zip(cols, r))
        out[d["doc_id"]] = (d["n_grams"], d["log_odds"], d["keep"])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus_list = [int(c) for c in sys.argv[2:]] or [8]
    oracle = duck_rows(sf_dir)
    ref = None
    for cpus in cpus_list:
        rows = spark_rows(sf_dir, cpus)
        diffs = []
        for k, (ng, lo, keep) in rows.items():
            ong, olo, okeep = oracle[k]
            if int(ng) != int(ong) or repr(float(lo)) != repr(float(olo)) or bool(keep) != bool(okeep):
                diffs.append((k, (ng, repr(lo), keep), (ong, repr(olo), okeep)))
        print(f"cpus={cpus}: {len(rows)} rows, {len(diffs)} BIT-exact diffs vs oracle")
        for d in diffs[:10]:
            print("   ", d)
        if ref is None:
            ref = rows
        else:
            sd = [k for k in rows if repr(rows[k][1]) != repr(ref[k][1])]
            print(f"   vs first spark run: {len(sd)} differing log_odds")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
