"""Vector similarity search over embedding columns (SURVEY.md §2.13 X3).

Two tiers:

- brute-force cosine top-k: exact; dot product via the higher-order
  ``aggregate``/``zip_with`` built-ins (JVM-side, no Python). Cost is
  |Q|×|C| — right when the query set is small (broadcast queries) or
  as the verifier behind an ANN tier.
- LSH-bucketed (random hyperplane signs): candidates restricted to
  equal-signature buckets (with multi-probe via several tables),
  turning the cross join into an equi-join — the 100 TB path.

Scale notes: candidates are never collected; top-k is a per-query-id
window rank, which AQE executes as a partial top-k per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query. Output: query_id, neighbor_id, sim.

    The query side is broadcast (assumed small); ties broken by
    neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _rh_signature(vec: Column, dim: int, planes: int, seed: int, table: int) -> Column:
    """Random-hyperplane sign signature as a long. Hyperplane
    components are deterministic pseudo-randoms derived from
    xxhash64(seed, table, plane, coordinate) — no driver-side state,
    fully codegen'd."""
    bits = []
    for p in range(planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i, p=p: (
                F.xxhash64(F.concat_ws(":", F.lit(seed), F.lit(table), F.lit(p), i.cast("string")))
                .cast("double")
                / F.lit(float(1 << 63))
            ),
        )
        proj = F.aggregate(
            F.zip_with(vec, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    return sum(bits)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 12,
    tables: int = 6,
    seed: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH, `tables`
    independent signatures, candidates = union of equal-signature
    buckets, exact cosine re-rank on candidates only."""
    def sigs(df: DataFrame, out_id: str) -> DataFrame:
        cols = [F.col(id_col).alias(out_id), F.col(vec_col).alias(f"{out_id}_v")]
        return df.select(
            *cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_id"),
                            _rh_signature(F.col(vec_col), dim, planes, seed, t).alias("sig"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("s"),
        ).select(out_id, f"{out_id}_v", F.col("s.table_id"), F.col("s.sig"))

    qs = sigs(queries, "query_id")
    cs = sigs(candidates, "neighbor_id")
    cand = (
        cs.join(F.broadcast(qs), ["table_id", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
    )
    scored = cand.withColumn(
        "sim", F.round(cosine_sim(F.col("query_id_v"), F.col("neighbor_id_v")), round_to)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
