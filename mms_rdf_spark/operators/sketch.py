"""Deterministic KMV (k-minimum-values) sketches.

The "novel sketch" slot of the task brief, designed so the SAME sketch
is computable by any engine — unlike HLL (whose register layout is
implementation-defined, so approx_count_distinct can never be
cross-engine-checked), KMV over md5 is a pure function of the input
set. That makes it the rare approximate operator that still passes the
exact DuckDB hash-match gate.

Theory (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-value
synopses"): hash every distinct value to [0,1); keep the k smallest
hashes. If the kth smallest is U_(k), then E[U_(k)] ~ k/(D+1), so
D_hat = (k-1)/U_(k) is (nearly) unbiased with relative error
~1/sqrt(k-2). The sketch is a bounded set of k hashes, so it is:

- mergeable: bottom-k of a union = bottom-k of the concatenated
  sketches — partial sketches combine associatively across partitions,
  days, or tables (kmv_merge);
- similarity-capable: for sets A and B, the bottom-k of A u B is a
  uniform sample of the union, so the fraction of it present in BOTH
  per-set sketches estimates Jaccard(A,B) (Beyer et al. §4).

Plan shape at 100 TB: `orderBy(h).limit(k)` compiles to
TakeOrderedAndProject — each task keeps its own k smallest, the driver
merges P*k values; no full sort, no wide shuffle. The hash fraction
uses the first 12 hex chars (48 bits) so the integer is exact in a
double in every engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_BITS = 48  # 12 hex chars: exact in an IEEE double everywhere


def _frac(h: Column) -> Column:
    """Hash fraction in [0,1): first 48 bits of the md5 hex / 2^48."""
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("double")
            / float(2 ** HASH_BITS))


def kmv_sketch(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The sketch itself: the k smallest distinct md5 hashes of `col`
    (fixed-width lowercase hex, so lexicographic order IS numeric
    order). One column `h`; <=k rows."""
    return (df.select(F.md5(F.col(col).cast("string")).alias("h"))
            .distinct().orderBy("h").limit(k))


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two KMV sketches: bottom-k of the union. Associative and
    commutative — the property that lets per-partition / per-day
    sketches roll up without touching raw data again."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Single-row distinct-count estimate: (k_used, kth_hash,
    est_distinct). If the input has fewer than k distinct values the
    sketch IS the value set and the count is exact; otherwise
    D_hat = (k-1)/frac(kth smallest hash), rounded to 4 so both engines
    agree bit-for-bit after formatting."""
    s = kmv_sketch(df, col, k)
    kth = F.max("h")
    n = F.count(F.lit(1))
    est = F.when(n < k, n.cast("double")) \
        .otherwise(F.lit(float(k - 1)) / _frac(kth))
    return s.agg(
        n.cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_jaccard(
    a: DataFrame, b: DataFrame, col: str, k: int = 64,
) -> DataFrame:
    """Single-row Jaccard estimate between the distinct `col` sets of
    two DataFrames: the bottom-k of A u B is a uniform sample of the
    union; the fraction of those hashes found in both per-set sketches
    estimates |A n B| / |A u B|. Exact when |A u B| <= k."""
    sa, sb = kmv_sketch(a, col, k), kmv_sketch(b, col, k)
    u = kmv_merge(sa, sb, k)
    both = (u.join(sa.withColumnRenamed("h", "ha"),
                   u["h"] == F.col("ha"), "left")
            .join(sb.withColumnRenamed("h", "hb"),
                  u["h"] == F.col("hb"), "left"))
    return both.agg(
        F.count(F.lit(1)).cast("int").alias("k_used"),
        F.sum((F.col("ha").isNotNull() & F.col("hb").isNotNull())
              .cast("int")).cast("int").alias("n_both"),
        F.round(
            F.sum((F.col("ha").isNotNull() & F.col("hb").isNotNull())
                  .cast("int"))
            / F.count(F.lit(1)), 4).alias("jaccard"),
    )


def grouped_quantiles(
    df: DataFrame, key: str, value: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group quantiles (linear interpolation): one row per
    key with a round-6 column per requested percentile (q50, q90, ...).

    The exact baseline for any approximate-quantile rollout (the same
    role cosine_topk plays for ANN): `percentile` in Spark and
    `quantile_cont` in DuckDB share the (n-1)*p linear-interpolation
    definition, so the oracle matches after rounding. Exact grouped
    percentiles sort within each group — fine while single groups fit
    an executor (our event_type-style keys); for unbounded cardinality
    swap in approx_percentile with the same output schema."""
    pcts = F.percentile(F.col(value), F.array(*[F.lit(p) for p in ps]))
    return (df.groupBy(key)
            .agg(*[F.round(pcts[i], 6).alias(f"q{round(p * 100)}")
                   for i, p in enumerate(ps)]))


def kth_smallest(
    df: DataFrame,
    value_col: str,
    q: float = 0.5,
    n_bins: int = 4096,
) -> DataFrame:
    """Exact order statistic (the ceil(q*n)-th smallest value) in TWO
    scans and zero global sorts — the distributed-selection algorithm
    that makes exact medians feasible at 100 TB where
    grouped_quantiles' per-group sort would not be:

      pass 1: equi-width histogram of the value range (map-side
              combined to n_bins rows) + the total count;
      locate: cumulative-sum over the tiny bin frame finds the bin
              holding the k-th element and the residual offset;
      pass 2: only that bin's rows (~n/n_bins of the data) go through
              a TakeOrdered of the residual offset — per-task top-k,
              never a full shuffle-sort.

    Returns one row (n, k, kth). Exact under duplicates (bin
    assignment is a pure function of the value). Degenerate all-equal
    input collapses to bin 0 and still answers exactly; the bin-2 top-k
    is bounded by the worst bin's population, so a pathological
    single-value distribution degrades to TakeOrdered(k) — the honest
    worst case, not a wrong answer.
    """
    if not 0 < q <= 1:
        raise ValueError("kth_smallest: 0 < q <= 1")
    b = df.agg(F.min(value_col).alias("_lo"),
               F.max(value_col).alias("_hi"),
               F.count(F.lit(1)).alias("_n"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binned = (df.crossJoin(F.broadcast(b))
              .select(F.col(value_col).alias("_v"), "_lo", "_n",
                      F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
                      .otherwise(F.least(
                          F.floor((F.col(value_col) - F.col("_lo"))
                                  / width),
                          F.lit(n_bins - 1))).cast("long")
                      .alias("_b")))
    hist = (binned.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_c"),
                 F.first("_n").alias("_n")))
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    k_expr = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n"))
                        .cast("long"))
    located = (hist
               .withColumn("_before",
                           F.coalesce(F.sum("_c").over(w), F.lit(0)))
               .withColumn("_k", k_expr)
               .where((F.col("_before") < F.col("_k"))
                      & (F.col("_before") + F.col("_c") >= F.col("_k")))
               .select("_b", "_before", "_k", "_n"))
    # the located bin is ONE row — a scalar fetch (limit() needs a
    # Python int), not a data collect
    row = located.collect()[0]
    offset = int(row["_k"] - row["_before"])
    in_bin = binned.where(F.col("_b") == row["_b"]).select("_v")
    # TakeOrdered of the residual offset within the one located bin
    kth = in_bin.orderBy("_v").limit(offset).agg(
        F.max("_v").alias("kth"))
    return kth.select(F.lit(int(row["_n"])).alias("n"),
                      F.lit(int(row["_k"])).alias("k"), "kth")


def approx_grouped_quantiles(
    df: DataFrame, key: str, value: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate companion to `grouped_quantiles` (same output
    schema, so the rollout its docstring names is a drop-in swap):
    per-group approx_percentile (Greenwald-Khanna style sketch, rank
    error <= 1/accuracy) instead of the exact per-group sort. The
    sketch is mergeable across partitions — map-side partials of
    bounded size — so unbounded group cardinality and 100-TB groups
    both hold, where the exact form's per-group sort would not.

    Approximate outputs are engine-specific, so this form is NOT
    oracle-hash-checkable; `quantile_rank_certificate` is the
    contract-gate companion that is."""
    pcts = F.approx_percentile(
        F.col(value), F.array(*[F.lit(p) for p in ps]), F.lit(accuracy))
    return (df.groupBy(key)
            .agg(*[F.round(pcts[i], 6).alias(f"q{round(p * 100)}")
                   for i, p in enumerate(ps)]))


def quantile_rank_certificate(
    df: DataFrame, key: str, value: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    slack: float = 2.0,
) -> DataFrame:
    """Cross-engine-checkable error bound for approx_grouped_quantiles:
    (key, n, ok) where `ok` certifies that EVERY requested percentile's
    approximate value sits within `slack`/accuracy rank error of its
    target rank — checked against the data itself (count of values
    strictly below / at-or-below the sketch output), never against
    another engine's sketch. The DuckDB oracle emits the exact n and a
    literal TRUE, so the driver's hash-match gate fails exactly when a
    sketch violates its bound: the exact operator is the oracle for its
    approximate companion (the rollout pairing grouped_quantiles'
    docstring calls for). `slack` doubles the nominal bound to absorb
    rank-vs-interpolation granularity at small n."""
    eps = slack / accuracy
    a = df.groupBy(key).agg(F.approx_percentile(
        F.col(value), F.array(*[F.lit(p) for p in ps]),
        F.lit(accuracy)).alias("_ap"))
    j = df.select(key, value).join(F.broadcast(a), on=key)
    aggs = [F.count(value).alias("_n")]
    for i in range(len(ps)):
        v, ap = F.col(value), F.col("_ap")[i]
        aggs.append(F.sum((v < ap).cast("long")).alias(f"_lt{i}"))
        aggs.append(F.sum((v <= ap).cast("long")).alias(f"_le{i}"))
    g = j.groupBy(key).agg(*aggs)
    ok = F.lit(True)
    for i, p in enumerate(ps):
        n = F.col("_n")
        ok = ok & (F.col(f"_lt{i}") <= (p + eps) * n) \
               & (F.col(f"_le{i}") >= (p - eps) * n)
    return g.select(key, F.col("_n").alias("n"), ok.alias("ok"))


def hll_distinct(df: DataFrame, key: str, col: str,
                 rsd: float = 0.05) -> DataFrame:
    """Approximate companion to the KMV sketch: per-group HyperLogLog++
    distinct count (`approx_count_distinct`) — constant 2^p-register
    state per group, map-side mergeable, the production path at 100 TB
    where even KMV's k-row sketches multiply by group count. Output
    (key, n_approx). Engine-specific register layout means no oracle
    hash-match; `hll_certificate` is the contract-gate companion."""
    return (df.groupBy(key)
            .agg(F.approx_count_distinct(col, rsd).alias("n_approx")))


def hll_certificate(df: DataFrame, key: str, col: str,
                    rsd: float = 0.05, sigmas: float = 4.0) -> DataFrame:
    """Cross-engine-checkable error bound for hll_distinct: (key,
    n_exact, ok) with ok = |approx - exact| <= sigmas·rsd·exact — the
    HLL++ relative-standard-deviation guarantee at a `sigmas`-sigma
    cushion (4σ default: violation probability ~6e-5 per group, and a
    violation is exactly what the gate SHOULD flag). The exact
    countDistinct is the oracle-side value, computed here in the same
    aggregate; small groups certify trivially (the absolute error
    cushion floors at 1)."""
    g = df.groupBy(key).agg(
        F.countDistinct(col).alias("n_exact"),
        F.approx_count_distinct(col, rsd).alias("_na"))
    bound = F.greatest(F.lit(1.0),
                       F.lit(sigmas * rsd) * F.col("n_exact"))
    ok = F.abs(F.col("_na") - F.col("n_exact")) <= bound
    return g.select(key, "n_exact", ok.alias("ok"))


def _cms_rows(df: DataFrame, col: str, depth: int,
              width: int) -> DataFrame:
    """(d, w) per input OCCURRENCE: row d's bucket for the value is
    the first 24 bits of md5('<d>|<value>') mod width — a pure
    function of (d, value), so any engine rebuilds the identical
    sketch (the KMV design argument applied to count-min)."""
    v = F.col(col).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            (F.conv(F.substring(
                F.md5(F.concat_ws("|", F.lit(str(d)), v)), 1, 6),
                16, 10).cast("long") % width).alias("w"))
        for d in range(depth)])
    return df.select(F.explode(cells).alias("_c")) \
        .select(F.col("_c.d").alias("d"), F.col("_c.w").alias("w"))


def cms_build(df: DataFrame, col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Deterministic count-min sketch of a column's value frequencies:
    (d, w, c, width) with at most depth*width rows — a broadcastable
    constant regardless of corpus size (width is stamped on every row
    so estimate/merge recover the build parameters from the sketch). Mergeable by cell-wise sum (cms_merge),
    so per-partition / per-day sketches roll up without re-reading raw
    data. Point estimates (cms_estimate) overestimate only: for any
    value, est >= true count, and est <= true + 2N/width with
    probability 1 - 2^-depth (Cormode & Muthukrishnan 2005). One
    explode (xdepth) + one map-side-combined aggregate."""
    return (_cms_rows(df, col, depth, width)
            .groupBy("d", "w").agg(F.count(F.lit(1)).alias("c"))
            .withColumn("width", F.lit(width)))


def _cms_params(cms: DataFrame) -> tuple[int, int]:
    """(depth, width) recovered from the sketch itself: width is
    stamped on every row at build time, depth = max(d)+1 (every depth
    row exists for any non-empty input). One bounded action over a
    broadcast-sized frame."""
    row = cms.agg(F.max("d").alias("d"), F.min("width").alias("w0"),
                  F.max("width").alias("w1")).first()
    if row.d is None:
        raise ValueError("cannot infer (depth, width) from an empty "
                         "sketch — pass depth=/width= explicitly")
    if row.w0 != row.w1:
        raise ValueError(f"sketch mixes widths {row.w0} != {row.w1}")
    return int(row.d) + 1, int(row.w0)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches — associative/commutative
    roll-up. Fails loudly when the two sketches were built with
    different widths (their cells are incomparable); the check is one
    action over two broadcast-sized frames."""
    _, wa = _cms_params(a)
    _, wb = _cms_params(b)
    if wa != wb:
        raise ValueError(f"cannot merge sketches of widths {wa} != {wb}")
    return (a.unionByName(b).groupBy("d", "w")
            .agg(F.sum("c").alias("c"))
            .withColumn("width", F.lit(wa)))


def cms_estimate(cms: DataFrame, probes: DataFrame, col: str,
                 depth: int | None = None,
                 width: int | None = None) -> DataFrame:
    """Point-query the sketch for every probe value: (value, est) with
    est = min over rows d of the value's cell count (absent cell = 0).
    The sketch broadcasts (<= depth*width rows); probes never shuffle
    against raw data.

    (depth, width) are DERIVED from the sketch (round-4 advice: an
    independent default here could silently probe the wrong cells and
    under-estimate, breaking the overestimate-only guarantee); passing
    them explicitly is allowed but validated against the sketch."""
    d_sk, w_sk = _cms_params(cms)
    if depth is not None and depth != d_sk:
        raise ValueError(f"depth={depth} != sketch depth {d_sk}")
    if width is not None and width != w_sk:
        raise ValueError(f"width={width} != sketch width {w_sk}")
    depth, width = d_sk, w_sk
    pb = probes.select(F.col(col).cast("string").alias("value")) \
        .distinct()
    pcells = pb.select(
        "value",
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                (F.conv(F.substring(
                    F.md5(F.concat_ws("|", F.lit(str(d)), F.col("value"))),
                    1, 6), 16, 10).cast("long") % width).alias("w"))
            for d in range(depth)])).alias("_c")) \
        .select("value", F.col("_c.d").alias("d"),
                F.col("_c.w").alias("w"))
    return (pcells.join(F.broadcast(cms), on=["d", "w"], how="left")
            .select("value", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
            .groupBy("value").agg(F.min("c").alias("est")))


def mg_heavy_hitters(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Misra-Gries heavy hitters with k counters — the deterministic
    frequent-items summary (mergeable form, Agarwal et al. PODS 2012):
    per-partition MG summaries (Arrow mapInPandas, k counters each)
    merge by summing per-item counts and subtracting the (k+1)-st
    largest merged count from every item (the mergeability theorem —
    error bounds ADD across merges and stay <= n/(k+1)).

    Returns (item, est_count): every item with true count > n/(k+1)
    is guaranteed present; each estimate satisfies
    true - n/(k+1) <= est <= true. The SUMMARY CONTENTS depend on
    partition layout (like any MG deployment), so the contract row is
    the self-certifying companion `mg_certificate` (the
    quantiles/HLL/CMS pattern): the guarantee is cross-engine
    checkable even though the summary is not.

    Scale shape: one corpus scan; each task carries k counters; the
    driver merges P summaries of <= k rows (P·k integers, not data).
    """
    if k < 1:
        raise ValueError("mg_heavy_hitters: k >= 1")

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col].astype(str):
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    drop = [key for key in counters
                            if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in drop:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters),
                            "cnt": [counters[i] for i in counters]})

    partial = df.select(F.col(col).cast("string").alias(col)) \
        .mapInPandas(_mg, "item string, cnt long")
    rows = partial.groupBy("item").agg(F.sum("cnt").alias("cnt")) \
        .collect()  # <= P*k rows by construction — a driver fold
    merged = sorted(((r.item, int(r.cnt)) for r in rows),
                    key=lambda t: (-t[1], t[0]))
    sub = merged[k][1] if len(merged) > k else 0
    out = [(i, c - sub) for i, c in merged[:k] if c - sub > 0]
    spark = df.sparkSession
    return spark.createDataFrame(out, "item string, est_count long")


def mg_certificate(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Self-certifying gate for mg_heavy_hitters (the HLL/CMS cert
    pattern): ONE row (n, n_over_k1, n_guaranteed, ok) with ok = TRUE
    iff (a) every item whose EXACT count exceeds n/(k+1) appears in
    the summary, and (b) every reported estimate e satisfies
    exact - n/(k+1) <= e <= exact. A violation of either clause is a
    bug in the sketch, and it fails the contract hash loudly."""
    hh = mg_heavy_hitters(df, col, k)
    exact = (df.select(F.col(col).cast("string").alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).alias("n_true")))
    n = df.count()
    bound = n / (k + 1)
    j = exact.join(hh, on="item", how="full_outer")
    bad_missing = j.where(F.col("n_true") > bound) \
        .where(F.col("est_count").isNull()).count()
    bad_est = j.where(F.col("est_count").isNotNull()).where(
        (F.col("est_count") > F.col("n_true"))
        | (F.col("est_count") < F.col("n_true") - bound)).count()
    n_guar = exact.where(F.col("n_true") > bound).count()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(n), float(round(bound, 6)), int(n_guar),
          bad_missing == 0 and bad_est == 0)],
        "n long, n_over_k1 double, n_guaranteed long, ok boolean")


def ams_f2(df: DataFrame, value_col: str, seeds: int = 9) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996,
    the tug-of-war sketch): per seed r, sketch_r = sum_v n_v * s_r(v)
    with s_r(v) in {-1,+1} an independent md5 sign bit (the
    feature_hash idiom). est_r = sketch_r^2 is an unbiased estimator
    of F2 = sum_v n_v^2 — the SELF-JOIN SIZE of the column, exactly
    the fan-out a skew planner needs before keying a join on it;
    Var(est) <= 2*F2^2, so callers take the median over the R seeds
    (ams_f2_estimate).

    Returns the R-row sketch table (seed, sketch, est) — sketches are
    MERGEABLE by per-seed addition across partitions, tables, or
    stream batches, and est re-derives after any merge. Unlike the
    bound-certified sketches (CMS/KMV/MG) this one's VALUES are fully
    deterministic (md5 signs, exact long sums), so the DuckDB oracle
    hash-matches the sketch itself, not just a certificate.

    Scale shape: one (value) aggregate collapses the corpus to
    distinct values, a seeds-wide generate fans each to R sign rows,
    one R-row aggregate. sketch^2 overflows long only past |sketch| ~
    3e9 — sketch concentrates at ~sqrt(F2), so the bound is ~9e18
    self-join pairs; past that, lift est to DECIMAL (documented
    trade).
    """
    cnt = (df.where(F.col(value_col).isNotNull())
           .groupBy(F.col(value_col).cast("string").alias("_v"))
           .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    x = cnt.select(
        "_v", "_n",
        F.explode(F.sequence(F.lit(0), F.lit(seeds - 1)))
        .alias("seed"))
    sgn = F.when(
        F.substring(F.md5(F.concat_ws(
            "|", F.col("seed").cast("string"), F.col("_v"))), 1, 1)
        .isin(*"01234567"), F.lit(1)).otherwise(F.lit(-1))
    sk = (x.select("seed", (F.col("_n") * sgn).alias("_t"))
          .groupBy("seed")
          .agg(F.sum("_t").cast("long").alias("sketch")))
    return sk.select(
        "seed", "sketch",
        (F.col("sketch") * F.col("sketch")).cast("long").alias("est"))


def ams_f2_estimate(sketch: DataFrame) -> DataFrame:
    """Median-of-seeds F2 estimate from an ams_f2 sketch table (lower
    order statistic under (est, seed) for even counts — no
    interpolation, the theil_sen rule). One row (n_seeds, f2_est)."""
    n = sketch.count()
    if n == 0:
        return sketch.sparkSession.createDataFrame(
            [], "n_seeds long, f2_est long")
    mid = (sketch.orderBy("est", "seed")
           .limit((n + 1) // 2).orderBy(F.desc("est"), "seed")
           .limit(1))
    return mid.select(F.lit(n).cast("long").alias("n_seeds"),
                      F.col("est").alias("f2_est"))


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimate from two count-min sketches (Cormode &
    Muthukrishnan 2005 inner product): est = min over depth rows d of
    sum_w a_c(d,w) * b_c(d,w). DETERMINISTIC guarantees: J <= est
    (colliding values only ADD cross terms) and est <= n_a * n_b
    (every cell sum is bounded by the column totals); in expectation
    est - J <= n_a*n_b/width per row, hence the min. This answers the
    planner question "how many rows will `a JOIN b ON v` produce?"
    from two broadcast-sized summaries, never touching raw data —
    the two-table complement of ams_f2's self-join estimate.

    Fails loudly on depth/width mismatch (incomparable cells — the
    cms_estimate lesson). Returns one row (est). The sketch cells are
    md5-deterministic, so est is exactly reproducible cross-engine
    (query sketch_cms_join_cert hash-matches value + guarantee).
    """
    da, wa = _cms_params(a)
    db, wb = _cms_params(b)
    if (da, wa) != (db, wb):
        raise ValueError(
            f"cannot inner-product sketches of shape ({da},{wa}) != "
            f"({db},{wb})")
    j = (a.select("d", "w", F.col("c").alias("_ca"))
         .join(b.select("d", "w", F.col("c").alias("_cb")),
               on=["d", "w"])
         .groupBy("d")
         .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long")
              .alias("_ip")))
    # a depth row with NO coinciding cells has inner product 0 — it
    # must participate in the min, not vanish with the inner join
    dd = a.select("d").distinct()
    j = (dd.join(j, on="d", how="left")
         .select(F.coalesce(F.col("_ip"), F.lit(0)).cast("long")
                 .alias("_ip")))
    return j.agg(F.min("_ip").cast("long").alias("est")) \
        .where(F.col("est").isNotNull())
