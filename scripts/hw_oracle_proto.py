"""Derivation record: the fixed-parameter Holt-Winters recursive-CTE
oracle validated bit-for-bit against the numpy kernel
(operators/forecast.py) before landing in the catalog. The CANONICAL
oracle lives in plans/queries.py (q_holt_winters) — this standalone
replay exists so the fp-shape argument can be re-checked without
Spark (DuckDB + numpy only).
Run: python scripts/hw_oracle_proto.py [sf_dir]
"""
import sys

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")
from cflux_spark.operators.forecast import _forecast_series  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

HOURLY = """
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100 AS mv
      FROM events GROUP BY 1, 2
"""

ORACLE = f"""
WITH RECURSIVE h AS ({HOURLY}),
r AS (
  SELECT event_type, hour, mv,
         row_number() OVER (PARTITION BY event_type ORDER BY hour) AS t,
         count(*) OVER (PARTITION BY event_type) AS tn
  FROM h
),
sa AS (
  SELECT event_type, (t - 1) // 24 AS i, avg(mv) AS savg
  FROM r WHERE t <= (tn // 24) * 24
  GROUP BY 1, 2
),
ix AS (
  SELECT r.event_type, (r.t - 1) % 24 AS j,
         coalesce(avg(CASE WHEN sa.savg <> 0 THEN r.mv / sa.savg END), 1.0) AS idx0
  FROM r JOIN sa ON sa.event_type = r.event_type AND sa.i = (r.t - 1) // 24
  WHERE r.t <= (r.tn // 24) * 24
  GROUP BY 1, 2
),
s0 AS (
  SELECT event_type,
         list(CASE WHEN idx0 = 0 THEN 1.0 ELSE idx0 END ORDER BY j) AS seas
  FROM ix GROUP BY 1
),
ini AS (
  SELECT event_type,
         avg(mv) FILTER (t <= 24) AS lvl,
         avg((mv - lag24) / 24.0) FILTER (t BETWEEN 25 AND 48) AS tr
  FROM (SELECT event_type, t, mv,
               lag(mv, 24) OVER (PARTITION BY event_type ORDER BY t) AS lag24
        FROM r)
  GROUP BY 1
),
k AS (
  SELECT ini.event_type AS event_type, 24 AS t,
         ini.lvl AS level, ini.tr AS trend, s0.seas AS seas
  FROM ini JOIN s0 USING (event_type)
  UNION ALL
  SELECT event_type, t, nl,
         0.25 * (nl - level) + 0.75 * trend,
         seas[1:ph] ||
           [0.25 * mv / (CASE WHEN nl = 0 THEN 1.0 ELSE nl END) + 0.75 * sph] ||
           seas[ph + 2 : 24]
  FROM (
    SELECT *,
           0.5 * mv / (CASE WHEN sph = 0 THEN 1.0 ELSE sph END)
             + 0.5 * (level + trend) AS nl
    FROM (
      SELECT k.event_type AS event_type, r.t AS t, r.mv AS mv,
             k.level AS level, k.trend AS trend, k.seas AS seas,
             CAST((r.t - 1) % 24 AS INTEGER) AS ph,
             k.seas[CAST((r.t - 1) % 24 AS INTEGER) + 1] AS sph
      FROM k JOIN r ON r.event_type = k.event_type AND r.t = k.t + 1
    )
  )
),
lastb AS (
  SELECT event_type, max(epoch_ms(hour)) AS last_ms, max(t) AS tn
  FROM r GROUP BY 1
),
fin AS (
  SELECT k.* FROM k JOIN lastb l
  ON l.event_type = k.event_type AND k.t = l.tn
)
SELECT f.event_type AS event_type,
       l.last_ms + 3600000 * g.kk AS ts_ms,
       round((f.level + CAST(g.kk AS DOUBLE) * f.trend)
             * f.seas[CAST((l.tn + g.kk - 1) % 24 AS INTEGER) + 1], 6) AS forecast
FROM fin f JOIN lastb l USING (event_type)
CROSS JOIN (SELECT unnest(generate_series(1, 24)) AS kk) g
ORDER BY event_type, ts_ms
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
oracle = con.execute(ORACLE).fetchall()
print(f"oracle rows: {len(oracle)}")

# numpy replay of the kernel on the identical hourly frame
hourly = con.execute(
    f"SELECT event_type, epoch_ms(hour) AS ms, mv FROM ({HOURLY}) ORDER BY event_type, hour"
).fetchall()
by_et: dict[str, list[tuple[int, float]]] = {}
for et, ms, mv in hourly:
    by_et.setdefault(et, []).append((ms, mv))

expect = []
for et, rows in sorted(by_et.items()):
    y = np.array([mv for _, mv in rows], dtype=float)
    last = rows[-1][0]
    _, preds = _forecast_series(y, 24, 24, params=np.array([0.5, 0.25, 0.25]))
    for i, p in enumerate(preds, 1):
        expect.append((et, last + 3_600_000 * i, round(float(p), 6)))

assert len(oracle) == len(expect), (len(oracle), len(expect))
bad = 0
for (a, b, c), (d, e, f) in zip(oracle, expect):
    if (a, b) != (d, e) or abs(c - f) > 0:
        if bad < 10:
            print("MISMATCH", (a, b, c), (d, e, f))
        bad += 1
print(f"mismatches: {bad}/{len(expect)}")
