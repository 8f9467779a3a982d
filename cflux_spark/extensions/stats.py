"""Robust per-group feature statistics (SURVEY.md §2.13 X49/X53).

Quality-score distributions differ wildly across corpus sources (a
news crawl's length histogram is nothing like a forum dump's), so
production filters threshold on PER-SOURCE ROBUST POSITION rather
than raw values: the median/IQR z-score (outlier-insensitive, the
scikit RobustScaler recipe) and the empirical CDF rank.

Float parity: medians/quartiles use CONTINUOUS interpolation
(pos = p·(n−1), linear between neighbors — the ANSI/NumPy default
shared by Spark ``percentile`` and DuckDB ``quantile_cont``); with
integer-valued inputs every interpolated value is a DYADIC rational
(f ∈ {0, .25, .5, .75}), hence an exact double in both engines, and
the z-score is one correctly-rounded division of exact doubles — no
transcendentals anywhere (functions/parity.py tier "pure rational").
``cume_dist`` is rows≤current / n, an integer ratio.

Scale shape (100 TB): quartiles are one groupBy aggregate over the
value column (map-side combine; group cardinality = sources,
broadcast back); the per-row z is a map-side expression after the
broadcast join. cume_dist is a per-group window — parallel across
groups, the one per-group sort this operator genuinely needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def corr_matrix(
    df: DataFrame, cols: list[str], round_to: int = 6
) -> DataFrame:
    """Pearson correlation over every unordered pair of INTEGRAL
    feature columns — the quality-signal redundancy audit a pipeline
    runs before thresholding on correlated features. One aggregation
    pass computes n, Σx, Σx², and Σxy for all pairs (map-side
    combine); the matrix assembles driver-free from the single
    result row.

    Float parity: the sums are EXACT long arithmetic
    (order-independent under any shuffle); corr = (n·Σxy − Σx·Σy) /
    (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) touches floats only through
    sqrt/×/÷ — all IEEE correctly-rounded, so both engines emit the
    identical double (functions/parity.py tier "pure rational +
    sqrt"). Long sums hold to ~10^9 rows of 10^4-magnitude features;
    beyond that promote the sums to DECIMAL(38,0) — same shape.

    Output: (col_x, col_y, n, corr) for each pair x < y in the given
    order; corr is NULL when either column has zero variance."""
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        v = F.col(c).cast("long")
        aggs.append(F.sum(v).alias(f"_s_{c}"))
        aggs.append(F.sum(v * v).alias(f"_ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a).cast("long") * F.col(b).cast("long")).alias(f"_sp_{a}_{b}")
        )
    one = df.agg(*aggs)
    n = F.col("_n")

    def corr(a: str, b: str):
        num = n * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")
        vx = n * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
        vy = n * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
        return F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), round_to),
        )

    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_x"),
                        F.lit(b).alias("col_y"),
                        n.alias("n"),
                        corr(a, b).alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("_p")
    ).select("_p.col_x", "_p.col_y", "_p.n", "_p.corr")


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 10, round_to: int = 6
) -> DataFrame:
    """Join/shuffle-key skew audit: the top-k hottest keys with their
    row share and cumulative share, plus the global key-count
    coefficient of variation — the numbers that decide whether a
    planned groupBy/join needs salting or AQE skew handling BEFORE
    the 100 TB run is launched. cv = σ/μ of per-key counts computed
    from exact integer sums (cv = √(k·Σc² − (Σc)²) / Σc — one
    correctly-rounded sqrt + division, bit-identical cross-engine).

    Scale shape: one key-count aggregation (map-side combine), a
    3-number global aggregate broadcast back, and a top-k — no
    corpus-sized sort. Output: (key, cnt, rank, share, cum_share,
    n_keys, cv), top-k rows ordered by (cnt desc, key)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    g = counts.agg(
        F.count("*").alias("_k"),
        F.sum("cnt").alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("_ss"),
    )
    top = counts.orderBy(F.col("cnt").desc(), "key").limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), "key")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("_cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(F.broadcast(g))
        .select(
            "key",
            "cnt",
            "rank",
            F.round(F.col("cnt") / F.col("_s"), round_to).alias("share"),
            F.round(F.col("_cum") / F.col("_s"), round_to).alias("cum_share"),
            F.col("_k").alias("n_keys"),
            F.round(
                F.sqrt(
                    (F.col("_k") * F.col("_ss") - F.col("_s") * F.col("_s")).cast(
                        "double"
                    )
                )
                / F.col("_s"),
                round_to,
            ).alias("cv"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Map each group's value distribution onto the GLOBAL
    distribution (the microarray-era quantile-normalization recipe,
    Bolstad 2003 — public paper): a value at within-group rank k of
    n_s lands at global position p = (k−1)/(n_s−1) and takes the
    globally-ranked value there, linearly interpolated. The
    cross-source score calibration a pipeline runs so one threshold
    means the same thing in every corpus slice.

    Float parity: the interpolation position is kept as EXACT
    integers — pos_num = (k−1)·(n_g−1), denom = max(n_s−1, 1), lo =
    pos_num div denom, rem = pos_num mod denom — and the interpolated
    value v_lo + (v_hi − v_lo)·rem/denom touches floats only through
    one division and one multiply-add of exact integers (correctly
    rounded, bit-identical cross-engine). Within-group rank
    tie-breaks on (value, id) for determinism; GLOBAL rank order
    among equal values is irrelevant — only the value at each rank
    is read, and tied ranks hold equal values. Single-row groups map
    to the global minimum (p = 0), documented.

    Scale shape (100 TB): one window per side (within-group rank is
    group-parallel; the global rank is the one genuine global sort —
    at production scale swap the exact ranked frame for a sampled
    quantile table, same join shape) + two rank-keyed joins. The
    (id, group, value) projection is consumed four times (ranks,
    sizes, total, global rank) — each is a pruned columnar rescan;
    persist the input upstream if the scan itself is expensive.
    Output: (id, group, value, normalized)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    base = df.select(F.col(id_col), F.col(group_col), v.alias("value"))
    wg = Window.partitionBy(group_col).orderBy("value", id_col)
    ranked = base.withColumn("_k", F.row_number().over(wg))
    sizes = base.groupBy(group_col).agg(F.count("*").alias("_ns"))
    n_g = base.agg(F.count("*").alias("_ng"))
    g = base.select("value").withColumn(
        "_r", F.row_number().over(Window.orderBy("value"))
    )
    pos = (
        ranked.join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(n_g))
        .withColumn("_denom", F.greatest(F.col("_ns") - 1, F.lit(1)).cast("long"))
        .withColumn("_pn", (F.col("_k") - 1).cast("long") * (F.col("_ng") - 1))
        .withColumn("_lo", ((F.col("_pn") - F.pmod("_pn", F.col("_denom"))) / F.col("_denom")).cast("long"))
        .withColumn("_rem", F.pmod("_pn", F.col("_denom")))
    )
    glo = g.select(F.col("_r").alias("_lo1"), F.col("value").alias("_vlo"))
    ghi = g.select(F.col("_r").alias("_hi1"), F.col("value").alias("_vhi"))
    out = (
        pos.join(glo, pos["_lo"] + 1 == glo["_lo1"])
        .join(ghi, pos["_lo"] + 2 == ghi["_hi1"], "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("value"),
            F.round(
                F.col("_vlo")
                + F.when(
                    F.col("_rem") > 0,
                    (F.coalesce(F.col("_vhi"), F.col("_vlo")) - F.col("_vlo"))
                    * (F.col("_rem") / F.col("_denom")),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("normalized"),
        )
    )
    return out


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-group robust scaling of a numeric column. Output:
    (id, group, value, median, iqr, robust_z, pct_rank) where
    robust_z = (value − median)/iqr (0.0 when the group's IQR is 0 —
    a constant group has no spread to scale by) and pct_rank is the
    within-group cume_dist (fraction of rows ≤ this value)."""
    v = F.col(value_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.25)).alias("_q1"),
        F.percentile(v, F.lit(0.5)).alias("median"),
        F.percentile(v, F.lit(0.75)).alias("_q3"),
    )
    w = Window.partitionBy(group_col).orderBy(v)
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("_iqr", F.col("_q3") - F.col("_q1"))
        .select(
            F.col(id_col),
            F.col(group_col),
            v.alias("value"),
            "median",
            F.col("_iqr").alias("iqr"),
            F.when(F.col("_iqr") == 0, F.lit(0.0))
            .otherwise(F.round((v - F.col("median")) / F.col("_iqr"), round_to))
            .alias("robust_z"),
            F.round(F.cume_dist().over(w), round_to).alias("pct_rank"),
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table — the CDC
    audit an incremental pipeline runs before promoting a refreshed
    corpus (what changed, how much, and is the churn plausible).
    Rows classify as ``added`` (key only in new), ``removed`` (key
    only in old), ``changed`` (key in both, any compared column
    differs), or ``unchanged``.

    Change detection compares an md5 CONTENT FINGERPRINT of the
    compared columns (null-tagged, unit-separator-joined — the
    fingerprint discipline of model/fingerprint.py) rather than
    column-by-column equality, so the comparison cost is one hash per
    side regardless of column count, and the SQL oracle replays it
    byte-identically.

    Scale shape (100 TB): one full outer join on the key (both sides
    shuffle once on the key — the minimum any diff pays; co-locate
    with bucketed storage to eliminate it) with the hash computed
    map-side before the join. Output: (key, status) plus per-side
    fingerprints for changed-row drill-down."""
    # one fingerprint expression, resolved against each side
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
                    F.col(c).cast("string")
                )
                for c in compare_cols
            ],
        )
    )
    o = old.select(F.col(key_col).alias("key"), fp.alias("old_fp"))
    n = new.select(F.col(key_col).alias("key"), fp.alias("new_fp"))
    j = o.join(n, "key", "full")
    return j.select(
        "key",
        "old_fp",
        "new_fp",
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def profile_table(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-column data profile — row count, null count, exact
    distinct count, and lexicographic min/max of the STRING cast
    (documented: string order, so the output type is uniform and the
    comparison is byte-identical in every engine; numeric columns
    wanting numeric extremes use their own aggregates). The
    dataset-card summary a pipeline publishes with every export.

    One aggregation pass for counts/extremes + one count-distinct per
    column (Spark rewrites multiple exact distincts via expand — at
    production scale swap approx_count_distinct in, same shape).
    Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
        aggs.append(F.min(s).alias(f"_min_{c}"))
        aggs.append(F.max(s).alias(f"_max_{c}"))
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"_nulls_{c}").alias("n_nulls"),
                        F.col(f"_dist_{c}").alias("n_distinct"),
                        F.col(f"_min_{c}").alias("min_str"),
                        F.col(f"_max_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("_p")
    ).select("_p.*")


def welch_ttest(
    df: DataFrame,
    value_col: str = "value",
    split: Column | None = None,
    by: str = "event_type",
    cents: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Welch two-sample t-test (unequal variances) between
    the A/B populations selected by `split` (default: even vs odd
    user_id) — the experiment-analysis primitive a metrics store
    runs constantly.

    Determinism contract: values quantize to exact integer
    `cents`-ths (the 2-decimal value column is exact at 100), so n /
    Σv / Σv² are order-independent integer aggregates; every
    downstream op (mean, Welch variance, t, Satterthwaite df) is a
    fixed tree of +,−,×,÷,sqrt — all IEEE correctly rounded — so
    both engines emit bit-identical doubles BEFORE the final
    round(…, 6). Σv² is computed as double(v)·double(v) products
    summed in integer cents² space via long Σv² (exact below 2^63:
    |v| ≤ 9.6e4 cents ⇒ v² ≤ 9.2e9, 10^9 rows fit).

    Scale shape: one (by)-keyed aggregate with map-side combine —
    conditional sums fold A and B in a single pass; output is
    one row per group. Output: (by, n_a, n_b, mean_a, mean_b,
    t_stat, df)."""
    if split is None:
        split = F.col("user_id") % 2 == 0
    v = F.round(F.col(value_col) * cents).cast("long")
    a = F.when(split, v)
    b = F.when(~split, v)
    g = df.groupBy(by).agg(
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
        F.sum(a).alias("_sa"),
        F.sum(b).alias("_sb"),
        F.sum(a * a).alias("_ssa"),
        F.sum(b * b).alias("_ssb"),
    )
    # fixed expression tree, mirrored token-for-token in the oracle
    ma = F.col("_sa").cast("double") / F.col("n_a")
    mb = F.col("_sb").cast("double") / F.col("n_b")
    va = (
        F.col("_ssa").cast("double")
        - F.col("_sa").cast("double") * F.col("_sa").cast("double") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    vb = (
        F.col("_ssb").cast("double")
        - F.col("_sb").cast("double") * F.col("_sb").cast("double") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    sea = va / F.col("n_a")
    seb = vb / F.col("n_b")
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1)
    )
    # degenerate guards (NULL, mirrored in the oracle): a mean needs
    # n ≥ 1, the test needs both n ≥ 2 AND nonzero pooled variance —
    # nested CASEs so no division-by-zero is ever evaluated (ANSI)
    both = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return g.select(
        by,
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, F.round(ma / cents, round_to)).alias("mean_a"),
        F.when(F.col("n_b") > 0, F.round(mb / cents, round_to)).alias("mean_b"),
        F.when(both, F.when(se2 > 0, F.round(t, round_to))).alias("t_stat"),
        F.when(both, F.when(se2 > 0, F.round(dof, round_to))).alias("df"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str = "value",
    split: Column | None = None,
    by: str = "event_type",
    cents: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Mann–Whitney U (Wilcoxon rank-sum) between the A/B
    populations selected by `split` — the non-parametric sibling of
    :func:`welch_ttest` for non-normal metric distributions.

    Midrank ties stay EXACT integers via the doubled-rank identity:
    over the per-group value histogram ordered by v,
    2·midrank(v) = 2·cum_before(v) + cnt(v) + 1, so
    2R_A = Σ_v a_v·(2·cum_before + cnt + 1) and
    U2 = 2U_A = 2R_A − n_a(n_a+1) are order-independent long sums.
    z uses the tie-corrected variance
    var = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))) with Σ(t³−t) an
    exact long sum (constraint: per-value tie group < 2^21 rows —
    beyond that t³ overflows; a coarser `cents` makes ties larger,
    a finer one smaller), then one fixed ÷/sqrt tree. Continuity
    correction omitted (both engines would replay it identically;
    the plain z matches SciPy's default asymptotic form).

    Scale shape: histogram aggregate on (by, v) with map-side
    combine — window runs over DISTINCT values, never rows; one
    (by)-keyed reduction. Output: (by, n_a, n_b, u2, z)."""
    if split is None:
        split = F.col("user_id") % 2 == 0
    v = F.round(F.col(value_col) * cents).cast("long")
    hist = df.groupBy(F.col(by).alias("_by"), v.alias("_v")).agg(
        F.sum(F.when(split, 1).otherwise(0)).alias("_a"),
        F.sum(F.when(~split, 1).otherwise(0)).alias("_b"),
    )
    w = (
        Window.partitionBy("_by")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.col("_a") + F.col("_b")
    hist = hist.withColumn(
        "_cum", F.coalesce(F.sum(F.col("_a") + F.col("_b")).over(w), F.lit(0))
    )
    g = hist.groupBy(F.col("_by").alias(by)).agg(
        F.sum("_a").alias("n_a"),
        F.sum("_b").alias("n_b"),
        F.sum(F.col("_a") * (2 * F.col("_cum") + cnt + 1)).alias("_r2a"),
        F.sum(cnt * cnt * cnt - cnt).alias("_ties"),
    )
    u2 = F.col("_r2a") - F.col("n_a") * (F.col("n_a") + 1)
    n = F.col("n_a") + F.col("n_b")
    var = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("_ties").cast("double") / (n.cast("double") * (n - 1))
        )
    )
    z = (u2.cast("double") - F.col("n_a").cast("double") * F.col("n_b")) / (
        2.0 * F.sqrt(var)
    )
    # degenerate guards (NULL, mirrored in the oracle): z needs both
    # sides populated, n ≥ 2, and nonzero tie-corrected variance —
    # nested CASEs so no division-by-zero is ever evaluated (ANSI)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (n > 1)
    return g.select(
        by,
        "n_a",
        "n_b",
        u2.cast("long").alias("u2"),
        F.when(ok, F.when(var > 0, F.round(z, round_to))).alias("z"),
    )


def cusum_alerts(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "event_type",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) on per-bucket
    event counts — the drift/changepoint monitor a metrics store
    runs on ingest volumes. Exact-integer end to end.

    The sequential recurrence s_t = max(0, s_{t-1} + y_t) is NOT a
    window function, but its closed form is: with C_t = Σ_{j≤t} y_j,

        s_t = C_t − min_{j≤t} C_j   (min over the prefix, seeded 0)

    (the running min is the last time the counter reset). y_t =
    cnt_t − k with target k = floor(total/buckets) per group, so
    everything is long arithmetic. A bucket SPINE (dense range
    min..max bucket per group) is generated so silent buckets count
    as zero events — exactly the case CUSUM must see. Alarm when
    s_t > k (one target's worth of excess accumulation).

    Scale shape: one (by, bucket) count aggregate, a per-group
    4-number stats frame exploded into the spine (sequence() —
    bounded by time range, not row count), one left join, one
    ordered window per group. Output: (by, bucket, cnt, cusum,
    alarm)."""
    # integer `div`, NOT double division + cast: a correctly-rounded
    # double quotient can land one ulp under an exact integer and
    # truncate to bucket−1
    b = F.expr(f"unix_micros({ts_col}) div {bucket_seconds * 1_000_000}")
    counts = df.groupBy(F.col(by).alias("_by"), b.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    g = counts.groupBy("_by").agg(
        F.min("bucket").alias("_lo"),
        F.max("bucket").alias("_hi"),
        F.sum("cnt").alias("_tot"),
    )
    spine = g.select(
        "_by",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket"),
        # integer div again (see bucket index comment)
        F.expr("_tot div (_hi - _lo + 1)").alias("_k"),
    )
    w = Window.partitionBy("_by").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dense = (
        spine.join(counts, ["_by", "bucket"], "left")
        .select(
            "_by",
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            "_k",
        )
        .withColumn("_c", F.sum(F.col("cnt") - F.col("_k")).over(w))
        .withColumn("_m", F.least(F.lit(0).cast("long"), F.min("_c").over(w)))
    )
    return dense.select(
        F.col("_by").alias(by),
        "bucket",
        "cnt",
        (F.col("_c") - F.col("_m")).alias("cusum"),
        ((F.col("_c") - F.col("_m")) > F.col("_k")).alias("alarm"),
    )
