"""Event-sequence / behavioral analytics operators.

Product-analytics families a transcript/event warehouse needs beside the
KG pipeline (reference scope: the mms-rdf converter feeds dashboards of
element activity — `/root/reference/README.md` describes query access
patterns; these are the Spark-native batch analogs):

- `funnel_steps`: ordered-funnel completion (step1 -> step2 -> step3
  with strictly increasing timestamps) per key. Implemented as three
  STACKED conditional-min window expressions over the SAME partition
  key, then a groupBy on that key: Catalyst plans ONE exchange (the
  later windows and the final aggregate reuse the hash partitioning)
  and one sort — never a per-user collect or a self-join per step.
- `time_moving_avg`: sliding time-range mean (RANGE frame over epoch
  seconds, peers included) — the batch analog of the streaming
  watermarked window; one shuffle on the key.
- `transition_probs`: first-order Markov transition matrix over the
  per-key event sequence (lead() bigrams -> count -> normalize by
  source row-total). The normalizing sum runs as a window over the
  tiny (src,dst) aggregate, not a rescan of the fact table.
- `cohort_retention`: classic cohort analysis — cohort = first active
  day per key (window min, same exchange as the offset computation),
  then countDistinct keys per (cohort_day, day_offset).
- `value_histogram`: equi-width histogram. Global min/max is a 1-row
  aggregate broadcast back over the scan; bin math is pure column
  arithmetic, so the histogram costs one scan + one tiny shuffle.

Scale notes (100 TB): every operator shuffles the fact table at most
once, on the analysis key (user/conv); hot keys fall under the AQE
skew-split evidence in tests/test_aqe_skew.py. The second exchange in
transitions/retention/histogram is over the aggregate's key space
(types^2, cohort-days x offsets, n_bins) — thousands of rows, not the
corpus. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mms_rdf_spark.operators.temporal import _epoch_s, _reserve


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per `key`, earliest completion times of an ordered funnel.

    Step i's timestamp is the minimum `ts_col` of an event of type
    steps[i] that is STRICTLY after step i-1's timestamp (the standard
    "ordered funnel" semantic: a purchase before the click does not
    count). Returns one row per key with `t1_s..tN_s` (epoch seconds,
    NULL when the step was never reached in order) and `steps_reached`.

    Plan shape: N stacked window projections partitioned by `key`
    followed by a groupBy on `key` — one exchange total; the aggregate
    reuses the window's hash partitioning.
    """
    if not 1 <= len(steps) <= 8:
        raise ValueError("funnel_steps: 1..8 steps supported")
    _reserve(events, tuple(f"_t{i}" for i in range(1, len(steps) + 1)),
             "funnel_steps")
    w = Window.partitionBy(key)
    df = events.select(key, type_col, ts_col)
    prev = None
    names = []
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"_t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
        names.append(name)
    reached = sum(
        (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names),
        F.lit(0))
    out_cols = [F.first(_epoch_s(n)).alias(f"t{i}_s")
                for i, n in enumerate(names, start=1)]
    return (df.withColumn("_reached", reached)
            .groupBy(key)
            .agg(*out_cols, F.first("_reached").alias("steps_reached")))


def time_moving_avg(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    ndigits: int | None = 4,
) -> DataFrame:
    """Sliding time-window mean: for each event, the average of
    `value_col` over this key's events in the trailing
    `window_seconds` (inclusive frame ends; RANGE semantics, so
    same-timestamp peers are all included — identical in ANSI SQL).

    One shuffle on `key`; the frame is evaluated in a single sorted
    pass per partition. `ndigits=None` skips rounding (callers that
    average pre-scaled integer units divide and round themselves — the
    cross-engine-exact recipe from NOTES.md).
    """
    _reserve(events, ("ts_s", "moving_avg"), "time_moving_avg")
    w = (Window.partitionBy(key).orderBy("ts_s")
         .rangeBetween(-window_seconds, 0))
    ma = F.avg(value_col).over(w)
    if ndigits is not None:
        ma = F.round(ma, ndigits)
    return (events
            .withColumn("ts_s", _epoch_s(ts_col))
            .withColumn("moving_avg", ma)
            .drop(ts_col))


def transition_probs(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    ndigits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: P(dst | src) with counts, ordered deterministically by
    (ts, tiebreak). Terminal events (no successor within the key) are
    dropped — they contribute no transition.

    Plan: one exchange on `key` for the lead(), one tiny exchange on
    (src, dst) for the counts; the row-normalizing sum is a window over
    the |types|^2-row aggregate. Counting shares `_transition_counts`
    with markov_stationary (one seam, no drift).
    """
    counts = _transition_counts(events, key, type_col, ts_col,
                                tiebreak_col)
    wsrc = Window.partitionBy("src")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wsrc), ndigits))


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: cohort_day_s = the key's first active day
    (UTC-day floor of its earliest event); for each (cohort, offset in
    days) the number of distinct keys active that day.

    Plan: window-min over `key` (one fact-table exchange), then a
    distinct aggregate over (cohort_day_s, day_offset, key) — the
    second exchange is the per-day active-key set, already collapsed
    per key/day map-side.
    """
    _reserve(events, ("_day_s", "_cohort_s"), "cohort_retention")
    day = (F.floor(_epoch_s(ts_col) / 86400) * 86400).cast("long")
    w = Window.partitionBy(key)
    return (events
            .withColumn("_day_s", day)
            .withColumn("_cohort_s", F.min("_day_s").over(w))
            .groupBy(F.col("_cohort_s").alias("cohort_day_s"),
                     ((F.col("_day_s") - F.col("_cohort_s")) / 86400)
                     .cast("long").alias("day_offset"))
            .agg(F.countDistinct(key).alias("active_keys")))


def value_histogram(
    events: DataFrame,
    value_col: str = "value",
    n_bins: int = 20,
) -> DataFrame:
    """Equi-width histogram of `value_col`: global [min, max] split into
    `n_bins` bins; the max value lands in the last bin. Returns
    (bin, lo, hi, n) for non-empty bins.

    The 1-row min/max aggregate is broadcast back over the scan
    (crossJoin with a broadcast hint), so the fact table is read twice
    but never shuffled; the final groupBy moves at most `n_bins` rows
    per task. Bin arithmetic is plain IEEE double math — identical in
    any ANSI engine, which is what makes the histogram oracle-able.
    """
    if n_bins < 1:
        raise ValueError("value_histogram: n_bins >= 1")
    _reserve(events, ("_lo", "_hi", "_width"), "value_histogram")
    bounds = events.agg(F.min(value_col).alias("_lo"),
                        F.max(value_col).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    # degenerate all-equal input: width 0 would NULL the division; park
    # every row in bin 0 instead
    bin_expr = F.when(F.col("_width") == 0.0, F.lit(0)).otherwise(
        F.least(F.floor((F.col(value_col) - F.col("_lo"))
                        / F.col("_width")),
                F.lit(n_bins - 1)))
    binned = (events.crossJoin(F.broadcast(bounds))
              .withColumn("_width", width)
              .select(bin_expr.cast("long").alias("bin"),
                      "_lo", "_width"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.first("_lo") + F.col("bin") * F.first("_width"),
                         6).alias("lo"),
                 F.round(F.first("_lo")
                         + (F.col("bin") + 1) * F.first("_width"),
                         6).alias("hi"))
            .select("bin", "lo", "hi", "n"))


def pivot_counts(
    df: DataFrame,
    row_key,
    pivot_col: str,
    pivot_values: list[str],
) -> DataFrame:
    """Wide crosstab: one row per `row_key`, one count column per value
    in `pivot_values` (missing cells 0). The value list is EXPLICIT —
    passing it skips Spark's extra distinct-values collect job and
    makes the output schema deterministic (a scan-order-dependent
    column order would break any downstream schema contract).

    One shuffle on `row_key`; the pivot itself is a map-side
    conditional aggregate, so unknown pivot values are dropped, not
    errored (filter first if that should be a failure).
    """
    if not pivot_values:
        raise ValueError("pivot_counts: pivot_values must be explicit")
    return (df.groupBy(row_key)
            .pivot(pivot_col, pivot_values)
            .agg(F.count(F.lit(1)))
            .na.fill(0, pivot_values))


def cube_counts(
    df: DataFrame,
    dims: list[str],
    all_sentinels: dict[str, object] | None = None,
) -> DataFrame:
    """CUBE over `dims`: counts for every subset of the dimensions in
    ONE pass (grouping-sets aggregate — partial aggregation covers all
    2^|dims| levels map-side; no per-level rescan). NULL grouping slots
    are replaced by per-column sentinels (default "__all__") so the
    output is join- and hash-friendly — the caller's dims must be
    non-null (sentinel collision would conflate a real NULL with the
    total row).
    """
    if not dims:
        raise ValueError("cube_counts: dims must be non-empty")
    sent = all_sentinels or {}
    out = (df.cube(*dims).agg(F.count(F.lit(1)).alias("n")))
    for d in dims:
        out = out.withColumn(
            d, F.coalesce(F.col(d).cast("string"),
                          F.lit(str(sent.get(d, "__all__")))))
    return out


def grouped_zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z_thresh: float = 3.0,
    unit: int = 100,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group z-score anomaly detection: rows whose value deviates
    from the group mean by at least `z_thresh` population standard
    deviations. Returns (id, group, value, z).

    Determinism recipe: mean and variance are derived from EXACT
    integer sums (value scaled by `unit` into longs; n, sum, sum of
    squares), then converted to doubles once — no float accumulation
    order anywhere, so a SQL oracle computing the same three sums
    hash-matches. Var uses the fixed formula s2/n - mean^2 (mirrored
    verbatim in the oracle; don't "simplify" one side).

    Plan: one map-side-combined aggregate to |groups| rows, broadcast
    back over the scan — the fact table is never shuffled. Note the
    long sum-of-squares: at ~1e12 rows of 5-digit units it approaches
    int64 range; scale `unit` down or switch the sums to
    decimal(38,0) at that point.
    """
    _reserve(df, ("_u", "_n", "_s1", "_s2"), "grouped_zscore_outliers")
    d = df.withColumn(
        "_u", F.round(F.col(value_col) * unit).cast("long"))
    stats = (d.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum("_u").alias("_s1"),
                  F.sum(F.col("_u") * F.col("_u")).alias("_s2")))
    mean = F.col("_s1") / F.col("_n")
    var = F.col("_s2") / F.col("_n") - mean * mean
    std = F.sqrt(var)
    return (d.join(F.broadcast(stats), on=group_col)
            .withColumn("z", F.round((F.col("_u") - mean) / std, ndigits))
            .where(std > 0)
            .where(F.abs(F.col("z")) >= z_thresh)
            .select(id_col, group_col, value_col, "z"))


def grouped_ntiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    n: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Within-group rank statistics: ntile bucket (1..n) and
    percent_rank for every row, ordered by (value, tiebreak) — the
    unique tiebreak makes both engine-independent (peer-order inside a
    tile is otherwise undefined). One shuffle on the group key.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    return (df.select(
        tiebreak_col, group_col, value_col,
        F.ntile(n).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), ndigits).alias("pct_rank")))


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    lower: float = 0.05,
    upper: float = 0.99,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group winsorization: clip `value_col` to the group's
    [lower, upper] exact interpolated percentiles (the quantile_cont
    definition shared with sketch.grouped_quantiles). Returns
    (id, group, value, clipped).

    The two percentiles per group are a tiny aggregate broadcast back
    over the scan — the robust-stats sibling of
    grouped_zscore_outliers, same no-fact-shuffle plan. Exact
    percentiles sort within the aggregate; at extreme group sizes swap
    in approx_percentile and accept the documented error band.
    """
    _reserve(df, ("_plo", "_phi"), "winsorize")
    stats = (df.groupBy(group_col)
             .agg(F.percentile(value_col, F.lit(lower)).alias("_plo"),
                  F.percentile(value_col, F.lit(upper)).alias("_phi")))
    return (df.join(F.broadcast(stats), on=group_col)
            .select(id_col, group_col, value_col,
                    F.round(F.least(F.greatest(F.col(value_col),
                                               F.col("_plo")),
                                    F.col("_phi")), ndigits)
                    .alias("clipped")))


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D skyline (minimize x, maximize y): the (x, best_y) points not
    dominated by any other point. Two steps, both one exchange over the
    tiny distinct-x space after a map-side-combined max: collapse to
    max(y) per x, then a single ordered window pass keeps x's whose
    best y strictly beats every smaller x's cumulative best — no
    pairwise dominance join (the naive skyline is O(n^2); this is the
    sort-scan formulation, O(n log n) and distributable because the
    per-x collapse happens before the one-partition window over
    |distinct x| rows, never the fact table).
    """
    _reserve(df, ("_best", "_cm"), "pareto_frontier_2d")
    per_x = df.groupBy(x_col).agg(F.max(y_col).alias("_best"))
    w = (Window.orderBy(x_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (per_x
            .withColumn("_cm", F.max("_best").over(w))
            .where(F.col("_cm").isNull()
                   | (F.col("_best") > F.col("_cm")))
            .select(x_col, F.col("_best").alias("best_" + y_col)))


def grouped_ols_trend(
    df: DataFrame,
    group_col: str,
    x_expr,
    value_col: str,
    unit: int = 100,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit of value against an
    integer regressor (`x_expr`, e.g. hours since an epoch — keep it
    small-ranged so the exact moment sums below stay in int64).
    Returns (group, n, slope, intercept), slope in value-units per x.

    Determinism: the five sums n, Σx, Σu, Σxu, Σx² (u = value·unit as
    long) are exact integers; slope = (nΣxu − ΣxΣu)/(nΣx² − (Σx)²) and
    intercept = (Σu − slope·Σx)/n are each ONE float expression over
    them — the grouped_zscore_outliers recipe extended to regression.
    Degenerate groups (all x equal) are dropped. One map-side-combined
    aggregate; nothing else moves.
    """
    d = df.select(
        F.col(group_col),
        x_expr.cast("long").alias("_x"),
        F.round(F.col(value_col) * unit).cast("long").alias("_u"))
    s = (d.groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("_x").alias("_sx"),
              F.sum("_u").alias("_su"),
              F.sum(F.col("_x") * F.col("_u")).alias("_sxu"),
              F.sum(F.col("_x") * F.col("_x")).alias("_sxx")))
    den = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = ((F.col("n") * F.col("_sxu")
              - F.col("_sx") * F.col("_su")) / den / F.lit(float(unit)))
    intercept = ((F.col("_su") / F.lit(float(unit))
                  - slope * F.col("_sx")) / F.col("n"))
    return (s.where(den != 0)
            .select(group_col, "n",
                    F.round(slope, ndigits).alias("slope"),
                    F.round(intercept, ndigits).alias("intercept")))


def change_point(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    unit: int = 100,
    ndigits: int = 4,
) -> DataFrame:
    """CUSUM-style change-point estimate per group: the timestamp
    where the running sum of deviations from the group mean attains
    its maximum absolute value — the classic single-change-point
    location statistic (argmax |S_t|, S_t = Σ(x_i - mean)).

    Exact arithmetic end-to-end: deviations are integer units scaled
    by the group count (x_i·n - Σx avoids the fractional mean), so
    the cumulative sum is an exact long and the argmax total-orders on
    (|S|, ts, tiebreak). Two passes sharing one hash partitioning:
    the moment aggregate broadcasts back, then one ordered window
    computes the cumsum and one ranks the argmax. Returns
    (group, change_ts_s, cusum_max) with cusum_max rescaled to value
    units.
    """
    _reserve(df, ("_u", "_n", "_s1", "_c", "_ts_s"), "change_point")
    d = (df.withColumn("_u", F.round(F.col(value_col) * unit)
                       .cast("long"))
         .withColumn("_ts_s", _epoch_s(ts_col)))
    stats = (d.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum("_u").alias("_s1")))
    wc = (Window.partitionBy(group_col)
          .orderBy("_ts_s", tiebreak_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    wr = Window.partitionBy(group_col).orderBy(
        F.abs(F.col("_c")).desc(), "_ts_s", tiebreak_col)
    return (d.join(F.broadcast(stats), on=group_col)
            .withColumn("_c", F.sum(F.col("_u") * F.col("_n")
                                    - F.col("_s1")).over(wc))
            .withColumn("_rn", F.row_number().over(wr))
            .where(F.col("_rn") == 1)
            .select(group_col,
                    F.col("_ts_s").alias("change_ts_s"),
                    F.round(F.col("_c")
                            / (F.col("_n") * F.lit(float(unit))),
                            ndigits).alias("cusum_max")))


def top_paths(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_len: int = 8,
    k: int = 10,
) -> DataFrame:
    """Most common event-type journeys: each key's first `max_len`
    events (by ts, tiebreak) joined into a ">"-separated path string,
    then the top `k` paths by frequency (ties -> lexicographic path).

    The ordered fold is sort_array over (rank, type) structs collected
    AFTER a rank<=max_len filter — collect_list order is undefined in
    a distributed run, sorting the struct restores determinism and the
    cap bounds per-key state. One key exchange + one tiny path count.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    ranked = (events.select(key, type_col, ts_col, tiebreak_col)
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= max_len))
    paths = (ranked.groupBy(key)
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("_rn", type_col))),
                     lambda x: x[type_col]),
                 ">").alias("path")))
    return (paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "path").limit(k))


def ab_test_zstats(
    events: DataFrame,
    group_col: str,
    arm_col,
    value_col: str = "value",
    unit: int = 100,
    ndigits: int = 4,
) -> DataFrame:
    """Two-sample z statistics per group: users split by the caller's
    deterministic `arm_col` expression (0 = control, 1 = treatment);
    returns (group, n_a, n_b, diff, z) with
    z = (mean_b - mean_a) / sqrt(var_a/n_a + var_b/n_b).

    Same exact-integer-moment-sum discipline as
    grouped_zscore_outliers, conditional per arm, so ONE map-side
    aggregate produces all six sums and every float op is a final
    conversion. Degenerate groups (an empty arm or zero variance in
    both) are dropped.
    """
    d = events.withColumn(
        "_u", F.round(F.col(value_col) * unit).cast("long")) \
        .withColumn("_arm", arm_col.cast("int"))

    def _s(arm, expr, name):
        return F.sum(F.when(F.col("_arm") == arm, expr)
                     .otherwise(F.lit(0))).alias(name)

    s = (d.groupBy(group_col)
         .agg(_s(0, F.lit(1), "n_a"), _s(1, F.lit(1), "n_b"),
              _s(0, F.col("_u"), "sa"), _s(1, F.col("_u"), "sb"),
              _s(0, F.col("_u") * F.col("_u"), "qa"),
              _s(1, F.col("_u") * F.col("_u"), "qb")))
    ma = F.col("sa") / F.col("n_a")
    mb = F.col("sb") / F.col("n_b")
    va = F.col("qa") / F.col("n_a") - ma * ma
    vb = F.col("qb") / F.col("n_b") - mb * mb
    se = F.sqrt(va / F.col("n_a") + vb / F.col("n_b"))
    return (s.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
            .where(se > 0)
            .select(group_col, "n_a", "n_b",
                    F.round((mb - ma) / F.lit(float(unit)), ndigits)
                    .alias("diff"),
                    F.round((mb - ma) / se, ndigits).alias("z")))


def period_over_period(
    events: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    period_seconds: int = 604800,
    ndigits: int = 6,
) -> DataFrame:
    """Period-over-period volume change per group: counts per
    (group, period bucket) with the previous period's count and the
    relative change ((n - prev)/prev; NULL for a group's first
    period). One count aggregate, then a lag window over the tiny
    (group, period) space.
    """
    bucket = (F.floor(_epoch_s(ts_col) / period_seconds)
              * period_seconds).cast("long")
    counts = (events.groupBy(F.col(group_col),
                             bucket.alias("period_s"))
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(group_col).orderBy("period_s")
    prev = F.lag("n").over(w)
    return (counts.withColumn("prev_n", prev)
            .withColumn("pct_change",
                        F.round((F.col("n") - F.col("prev_n"))
                                / F.col("prev_n"), ndigits)))


def activity_entropy(
    df: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ndigits: int = 6,
) -> DataFrame:
    """Shannon entropy (nats) of each key's event-type distribution —
    the behavioral-diversity signal (bots repeat one action; humans
    mix). Returns (key, n, entropy).

    Exactness: H = -(1/T)·Σ cnt·ln(cnt/T). The only transcendental,
    ln(cnt/T), is rounded to 6dp and scaled to integer micro-nats
    BEFORE the weighted sum, so Σ cnt·µln is an exact long and the
    final division is one float op (the bm25 round-the-log recipe +
    the integer micro-unit rule from NOTES.md — a float Σ here would
    flip last digits between engines). Two aggregates sharing the key
    partitioning: (key, type) counts, then the per-key fold.
    """
    cnts = (df.groupBy(key, type_col)
            .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy(key)
    mu_ln = F.round(
        F.log(F.col("_c") / F.col("_t")), 6) * 1e6
    return (cnts
            .withColumn("_t", F.sum("_c").over(w))
            .withColumn("_mu", F.round(mu_ln).cast("long"))
            .groupBy(key)
            .agg(F.first("_t").alias("n"),
                 F.round(-F.sum(F.col("_c") * F.col("_mu"))
                         / (F.first("_t") * F.lit(1e6)), ndigits)
                 .alias("entropy")))


def gini_concentration(
    df: DataFrame,
    key: str = "user_id",
    ndigits: int = 6,
) -> DataFrame:
    """Gini coefficient of activity concentration across keys (0 =
    everyone equally active, ->1 = one key dominates) — the corpus-
    inequality diagnostic for spotting bot-dominated traffic or
    crawler-skewed document sources. Returns one row (n_keys, gini).

    G = (2·Σ rank·x) / (n·Σx) − (n+1)/n over counts ranked ascending.
    Ranks come from link.global_rank (range-repartition + per-partition
    offsets), NOT a single-partition window, so the rank pass scales to
    any key cardinality; the two moment sums are exact longs and G is
    one float expression.
    """
    from mms_rdf_spark.operators.link import global_rank

    x = df.groupBy(key).agg(F.count(F.lit(1)).alias("_x"))
    ranked = global_rank(x, "_x", key)
    return (ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("rank") * F.col("_x")).alias("_srx"))
        .select("n_keys",
                F.round((2.0 * F.col("_srx"))
                        / (F.col("n_keys") * F.col("_sx"))
                        - (F.col("n_keys") + 1) / F.col("n_keys"),
                        ndigits).alias("gini")))


def chi_square_cells(
    df: DataFrame,
    a_col: str,
    b_col,
    ndigits: int = 6,
) -> DataFrame:
    """Chi-square independence contributions per contingency cell of
    a_col x b_col: observed, expected (row·col/total) and
    (o−e)²/e. Per-cell values are single float expressions over exact
    integer marginals — engine-deterministic without any float
    accumulation (summing the statistic would reintroduce order
    dependence; downstream sums should use the micro-unit rule).
    Returns (a, b, o, e, contrib).

    One fact-table aggregate to |cells| rows; the two marginals are
    windows over that tiny frame.
    """
    cells = (df.select(F.col(a_col).alias("a"),
                       b_col.alias("b") if not isinstance(b_col, str)
                       else F.col(b_col).alias("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("o")))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wn = Window.partitionBy()
    e = (F.col("_ra") * F.col("_cb")) / F.col("_n")
    return (cells
            .withColumn("_ra", F.sum("o").over(wa))
            .withColumn("_cb", F.sum("o").over(wb))
            .withColumn("_n", F.sum("o").over(wn))
            .select("a", "b", "o",
                    F.round(e, 4).alias("e"),
                    F.round((F.col("o") - e) * (F.col("o") - e) / e,
                            ndigits).alias("contrib")))


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    ndigits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimator over (duration, event) rows
    (event = 1 observed, 0 right-censored): for every distinct event
    time t, the at-risk count, observed events d, and the survival
    probability S(t) = Π(1 − d_i/n_i) for i ≤ t. Returns
    (t, n_at_risk, d, survival), rows only at times with d > 0 plus
    censoring-only times (standard KM support).

    Determinism: the product becomes a SUM of ln(1 − d/n) terms, each
    rounded to 6dp and scaled to integer micro-units BEFORE the
    cumulative window sum (exact long), with exp applied once at the
    end — the float-product order problem never arises. d = n (the
    risk set dies out) uses a −10^12 micro-unit sentinel so S rounds
    to exactly 0 on every engine. Plan: one aggregate to |distinct
    times| rows, then two windows over that tiny frame.
    """
    per_t = (durations.groupBy(F.col(duration_col).alias("t"))
             .agg(F.count(F.lit(1)).alias("_m"),
                  F.sum(event_col).cast("long").alias("d")))
    prior = (Window.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, -1))
    upto = (Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0))
    total = Window.partitionBy()
    term_mu = F.when(
        F.col("d") >= F.col("n_at_risk"), F.lit(-1000000000000)
    ).when(F.col("d") > 0, F.round(
        F.round(F.log(1.0 - F.col("d") / F.col("n_at_risk")), 6)
        * 1e6).cast("long")
    ).otherwise(F.lit(0))
    return (per_t
            .withColumn("n_at_risk",
                        (F.sum("_m").over(total)
                         - F.coalesce(F.sum("_m").over(prior),
                                      F.lit(0))).cast("long"))
            .withColumn("_mu", term_mu)
            .withColumn("survival",
                        F.round(F.exp(F.sum("_mu").over(upto) / 1e6),
                                ndigits))
            .select("t", "n_at_risk", "d", "survival"))


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Population-stability-index cells between a reference and a
    current sample of `value_col`: fixed [lo, hi) equi-width bins
    (caller-pinned edges — deriving them from data couples the two
    samples), Laplace-smoothed shares p (ref) and q (cur), and the PSI
    term (p − q)·ln(p/q) per bin. Returns (bin, p, q, term); sum the
    terms with the micro-unit rule for the scalar (>0.2 = major
    drift).

    Each side is one map-side-combined bin count; shares and terms are
    single float expressions over exact counts with the ln rounded to
    6dp. Out-of-range values clamp to the edge bins so totals are
    never silently dropped.
    """
    if n_bins < 1 or hi <= lo:
        raise ValueError("psi_drift: need n_bins >= 1 and hi > lo")
    width = (hi - lo) / float(n_bins)

    def _bins(df, name):
        b = F.least(F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0)), F.lit(n_bins - 1)).cast("long")
        return df.select(b.alias("bin")).groupBy("bin") \
            .agg(F.count(F.lit(1)).alias(name))
    grid = ref.sparkSession.range(n_bins).select(
        F.col("id").alias("bin"))
    cells = (grid
             .join(_bins(ref, "_cr"), on="bin", how="left")
             .join(_bins(cur, "_cc"), on="bin", how="left")
             .na.fill(0, ["_cr", "_cc"]))
    tot = Window.partitionBy()
    p = ((F.col("_cr") + 1)
         / (F.sum("_cr").over(tot) + F.lit(n_bins)))
    q = ((F.col("_cc") + 1)
         / (F.sum("_cc").over(tot) + F.lit(n_bins)))
    term = (p - q) * F.round(F.log(p / q), 6)
    return cells.select(
        "bin", F.round(p, ndigits).alias("p"),
        F.round(q, ndigits).alias("q"),
        F.round(term, ndigits).alias("term"))


def ewma_smooth(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    window: int = 8,
    unit: int = 100,
    ndigits: int = 4,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) as an exact
    FIR filter: each event's smoothed value is the weight-2^j
    combination of the trailing `window` events (newest weight
    2^(window−1), oldest 1), normalized by the weights actually
    present (early rows use shorter windows — no warm-up bias).
    Returns (key, rank, ts_s, value, ewma).

    Exactness: weights are powers of two as longs, values integer
    `unit`s, so numerator and denominator are exact and the division
    happens once — the recursive EWMA's float accumulation (engine-
    order-dependent) is replaced by a bounded-support filter with
    identical weights. Plan: one rank window, an explode bounded by
    `window`, one (key, rank) aggregate — all on the same key
    partitioning.
    """
    if not 1 <= window <= 62:
        raise ValueError("ewma_smooth: 1 <= window <= 62")
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    base = (events
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_ts_s", _epoch_s(ts_col))
            .withColumn("_u", F.round(F.col(value_col) * unit)
                        .cast("long")))
    probes = (base.select(
        key, "_rn", "_u",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("_j"))
        .withColumn("_orn", F.col("_rn") + F.col("_j"))
        .withColumn("_w", F.expr(
            f"shiftleft(1L, cast({window - 1} - _j as int))")))
    contrib = (probes.groupBy(key, F.col("_orn").alias("_rn"))
               .agg(F.sum(F.col("_u") * F.col("_w")).alias("_num"),
                    F.sum("_w").alias("_den")))
    return (base.join(contrib, on=[key, "_rn"])
            .select(key, F.col("_rn").alias("rank"),
                    F.col("_ts_s").alias("ts_s"),
                    F.round(F.col("_u") / F.lit(float(unit)), 2)
                    .alias("value"),
                    F.round((F.col("_num") / F.col("_den"))
                            / F.lit(float(unit)), ndigits)
                    .alias("ewma")))


def _ntile_from_rank(rank: Column, cnt: int, n: int) -> Column:
    """Exact ntile(n) tile for a 1-based global `rank` over `cnt`
    rows: the first cnt % n tiles hold cnt//n + 1 rows, the rest
    cnt//n — the same arithmetic Spark's NTile window expression uses,
    so tiles derived from link.global_rank are row-identical to the
    window form. `greatest(base, 1)` keeps the (never-taken) second
    branch division safe under ANSI when cnt < n."""
    base, rem = cnt // n, cnt % n
    cut = rem * (base + 1)
    return F.when(
        rank <= cut, F.ceil(rank / F.lit(base + 1))
    ).otherwise(
        rem + F.ceil((rank - cut) / F.greatest(F.lit(base), F.lit(1)))
    ).cast("int")


def _rfm_distributed_tiles(per: DataFrame, key: str,
                           n_tiles: int) -> DataFrame:
    """Scale path for rfm_segments: one link.global_rank per dimension
    (range-repartitioned, no single-partition window), tiles from the
    exact ntile arithmetic, joined back on the key."""
    from mms_rdf_spark.operators.link import global_rank

    cnt = per.count()
    # global_rank orders ascending on a column; encode desc by negation
    ordered = per.withColumn("_rneg", -F.col("recency_s"))
    order_cols = {"r": "_rneg", "f": "n_tx", "m": "_mc"}
    out = per
    for tile_name, order_col in order_cols.items():
        ranked = global_rank(
            ordered.select(key, order_col), order_col, key)
        tiles = ranked.select(
            key, _ntile_from_rank(F.col("rank"), cnt,
                                  n_tiles).alias(tile_name))
        out = out.join(tiles, on=key)
    return out


def rfm_segments(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
    unit: int = 100,
    scale_threshold: int = 10_000_000,
) -> DataFrame:
    """RFM customer segmentation: per key, recency (seconds since its
    last event, measured from the corpus max), frequency (event
    count), monetary (exact integer-unit sum), each scored 1..n_tiles
    by ntile with best = n_tiles, plus the composite segment code
    (r·100 + f·10 + m). Returns
    (key, recency_s, n_tx, monetary, r, f, m, segment).

    Ordering ties break on `key`, so tiles are engine-deterministic.
    Up to `scale_threshold` keys the ntiles run as a single-partition
    window over the per-key aggregate; above it (the 10^9-key case)
    each dimension's tile derives from link.global_rank
    (range-repartition + per-partition offsets — never one partition)
    via the exact ntile arithmetic, so both paths are row-identical
    (pinned in tests; the cc.py driver/distributed threshold pattern).
    The aggregate itself is one map-side combined pass either way.
    """
    g = events.agg(F.max(_epoch_s(ts_col)).alias("_gm"))
    per = (events
           .groupBy(key)
           .agg(F.max(_epoch_s(ts_col)).alias("_last"),
                F.count(F.lit(1)).alias("n_tx"),
                F.sum(F.round(F.col(value_col) * unit).cast("long"))
                .alias("_mc"))
           .crossJoin(F.broadcast(g))
           .withColumn("recency_s", F.col("_gm") - F.col("_last")))
    if per.count() <= scale_threshold:
        # best-last ordering: the highest tile is the best score
        r_w = Window.orderBy(F.col("recency_s").desc(), key)
        f_w = Window.orderBy(F.col("n_tx").asc(), key)
        m_w = Window.orderBy(F.col("_mc").asc(), key)
        out = (per
               .withColumn("r", F.ntile(n_tiles).over(r_w))
               .withColumn("f", F.ntile(n_tiles).over(f_w))
               .withColumn("m", F.ntile(n_tiles).over(m_w)))
    else:
        out = _rfm_distributed_tiles(per, key, n_tiles)
    return out.select(
        key, "recency_s", "n_tx",
        F.round(F.col("_mc") / F.lit(float(unit)), 2).alias("monetary"),
        "r", "f", "m",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int").alias("segment"))


def touch_attribution(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conversion: str = "purchase",
    ndigits: int = 6,
) -> DataFrame:
    """First/last-touch conversion attribution: every `conversion`
    event is credited to (a) the earliest non-conversion event in the
    key's history ("first" model) and (b) the most recent
    non-conversion event before it ("last" model). Returns
    (model, channel, n, share); conversions with no preceding touch
    fall into channel '(none)'.

    One exchange on `key` serves both window passes (ignore-nulls
    first/last over the ordered frame); the aggregate is over
    |models|x|channels| rows, with the share normalized per model via
    a window over that tiny frame.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    touch = F.when(F.col(type_col) != conversion, F.col(type_col))
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    d = (events
         .select(key, type_col, ts_col, tiebreak_col)
         .withColumn("_first", F.first(touch, ignorenulls=True)
                     .over(prev))
         .withColumn("_last", F.last(touch, ignorenulls=True)
                     .over(prev))
         .where(F.col(type_col) == conversion))
    long = (d.select(F.lit("first").alias("model"),
                     F.coalesce(F.col("_first"), F.lit("(none)"))
                     .alias("channel"))
            .unionByName(
                d.select(F.lit("last").alias("model"),
                         F.coalesce(F.col("_last"), F.lit("(none)"))
                         .alias("channel"))))
    counts = long.groupBy("model", "channel") \
        .agg(F.count(F.lit(1)).alias("n"))
    wm = Window.partitionBy("model")
    return counts.withColumn(
        "share", F.round(F.col("n") / F.sum("n").over(wm), ndigits))


def cumulative_uniques(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Growth accounting per UTC day: daily active keys (dau), keys
    seen for the first time (new_keys), and the cumulative distinct
    count (cum_keys — computed as the running sum of new_keys, which
    turns the classic "cumulative COUNT DISTINCT" — unwindowable
    without holding every id — into one tiny cumsum over days).
    Returns (day_s, dau, new_keys, cum_keys).

    Two map-side-combined aggregates: distinct (day, key) for dau and
    min-day per key for new_keys; the cumsum runs over |days| rows.
    Days with activity but no new keys report new_keys = 0; cum_keys
    carries forward.
    """
    day = (F.floor(_epoch_s(ts_col) / 86400) * 86400).cast("long")
    dk = events.select(day.alias("day_s"), F.col(key).alias("_k")) \
        .distinct()
    dau = dk.groupBy("day_s").agg(F.count(F.lit(1)).alias("dau"))
    first = (dk.groupBy("_k").agg(F.min("day_s").alias("day_s"))
             .groupBy("day_s").agg(F.count(F.lit(1)).alias("new_keys")))
    w = (Window.orderBy("day_s")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (dau.join(first, on="day_s", how="left")
            .na.fill(0, ["new_keys"])
            .withColumn("cum_keys", F.sum("new_keys").over(w))
            .select("day_s", "dau", "new_keys", "cum_keys"))


def lagged_crosscorr(
    events: DataFrame,
    type_a: str,
    type_b: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    max_lag: int = 6,
    ndigits: int = 6,
) -> DataFrame:
    """Lagged cross-correlation between two event-type time series:
    Pearson r between count(type_a at t) and count(type_b at t+lag)
    for lag 0..max_lag buckets — "do clicks lead purchases, and by how
    long?". Returns (lag, n, r); degenerate lags (constant series)
    are dropped.

    The bucket grid densifies from a broadcast 1-row min/max (missing
    buckets count 0 — skipping them would bias r), lag alignment is an
    equi-join on (bucket + lag·step), and each lag's five moment sums
    are exact longs folded in one aggregate — no per-lag rescan of the
    fact table, only of the tiny per-bucket series. Variance-product
    promoted to double between exact factors (assortativity guard).
    """
    step = F.lit(bucket_seconds)
    bucket = (F.floor(_epoch_s(ts_col) / bucket_seconds)
              * bucket_seconds).cast("long")
    d = events.select(F.col(type_col).alias("_ty"),
                      bucket.alias("_t"))
    bounds = d.agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
    grid = (bounds.select(F.explode(
        F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("_t")))

    def _series(ty):
        return (d.where(F.col("_ty") == ty)
                .groupBy("_t").agg(F.count(F.lit(1)).alias("_c")))
    a = _series(type_a)
    b = _series(type_b)
    lags = grid.crossJoin(
        F.broadcast(events.sparkSession.range(max_lag + 1)
                    .select(F.col("id").alias("lag"))))
    joined = (lags
              .join(a, on="_t", how="left")
              .withColumnRenamed("_c", "_x")
              .withColumn("_tb",
                          F.col("_t") + F.col("lag") * step)
              .join(b.withColumnRenamed("_t", "_tb"), on="_tb",
                    how="left")
              .withColumnRenamed("_c", "_y")
              .join(F.broadcast(bounds), how="cross")
              .where(F.col("_tb") <= F.col("_hi"))
              .select("lag",
                      F.coalesce(F.col("_x"), F.lit(0)).alias("x"),
                      F.coalesce(F.col("_y"), F.lit(0)).alias("y")))
    s = (joined.groupBy("lag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    den = F.sqrt((F.col("n") * F.col("sxx")
                  - F.col("sx") * F.col("sx")) * F.lit(1.0)
                 * (F.col("n") * F.col("syy")
                    - F.col("sy") * F.col("sy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (s.where(den > 0)
            .select(F.col("lag").cast("int").alias("lag"), "n",
                    F.round(num / den, ndigits).alias("r")))


def burst_detection(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    baseline_buckets: int = 24,
    factor: int = 3,
) -> DataFrame:
    """Spike detection per group: buckets whose event count exceeds
    `factor`x the trailing `baseline_buckets` average. Returns
    (group, bucket_s, n, baseline_n, window_n) for flagged buckets.

    ALL-INTEGER test: n·window > factor·baseline_sum (no float mean,
    no rounding rule needed — the comparison is exact by
    construction). The trailing window runs over the per-bucket count
    series (RANGE frame on bucket seconds so silent gaps shorten the
    baseline window correctly instead of stretching it). One
    fact-table aggregate + one tiny window.
    """
    bucket = (F.floor(_epoch_s(ts_col) / bucket_seconds)
              * bucket_seconds).cast("long")
    counts = (events.groupBy(F.col(group_col).alias("grp"),
                             bucket.alias("bucket_s"))
              .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("grp").orderBy("bucket_s")
         .rangeBetween(-baseline_buckets * bucket_seconds, -1))
    return (counts
            .withColumn("baseline_n",
                        F.coalesce(F.sum("n").over(w), F.lit(0)))
            .withColumn("window_n", F.count(F.lit(1)).over(w))
            .where((F.col("window_n") > 0)
                   & (F.col("n") * F.col("window_n")
                      > F.lit(factor) * F.col("baseline_n")))
            .select(F.col("grp").alias(group_col), "bucket_s", "n",
                    "baseline_n", "window_n"))


def robust_zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z_thresh: float = 3.5,
    ndigits: int = 4,
) -> DataFrame:
    """Median/MAD outlier detection (the robust sibling of
    grouped_zscore_outliers — a single 10^9 outlier cannot drag the
    center the way it drags a mean): modified z
    0.6745·(x − median)/MAD, rows with |z| >= z_thresh. Returns
    (id, group, value, rz). Zero-MAD groups are silent.

    Two tiny grouped percentile aggregates (the exact interpolated
    percentile whose cross-engine parity grouped_quantiles pins),
    each broadcast back over the scan — the fact table never
    shuffles. The 0.6745 consistency constant is applied engine-side.
    """
    _reserve(df, ("_med", "_mad"), "robust_zscore_outliers")
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"))
    d = df.join(F.broadcast(med), on=group_col)
    mad = d.groupBy(group_col).agg(
        F.percentile(F.abs(F.col(value_col) - F.col("_med")),
                     F.lit(0.5)).alias("_mad"))
    rz = F.round(F.lit(0.6745) * (F.col(value_col) - F.col("_med"))
                 / F.col("_mad"), ndigits)
    return (d.join(F.broadcast(mad), on=group_col)
            .where(F.col("_mad") > 0)
            .withColumn("rz", rz)
            .where(F.abs(F.col("rz")) >= z_thresh)
            .select(id_col, group_col, value_col, "rz"))


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, computed EXACTLY:
    D = max over values of |F_a − F_b| evaluated as the integer
    |ca·nb − cb·na| (cumulative counts cross-multiplied by the sample
    sizes), with ONE division at the very end — no float CDF ever
    exists, so there is nothing to round-drift. The nonparametric
    sibling of psi_drift (no bins to pin). Returns (n_a, n_b, ks).

    Ties collapse per distinct value before the cumulative pass (the
    sup is evaluated after consuming all equal values — the correct KS
    convention). The cumulative window runs over the distinct-value
    axis; at 10^9+ distinct values swap the global window for
    link.global_rank's range-partitioned rank. Overflow: ca·nb caps at
    n_a·n_b — fine through ~3·10^9 rows per side.
    """
    na = a.count()
    nb = b.count()
    if na == 0 or nb == 0:
        raise ValueError("ks_statistic: both samples must be non-empty")
    merged = (a.select(F.col(value_col).alias("_v"),
                       F.lit(1).alias("_a"), F.lit(0).alias("_b"))
              .unionByName(
                  b.select(F.col(value_col).alias("_v"),
                           F.lit(0).alias("_a"), F.lit(1).alias("_b"))))
    per_v = merged.groupBy("_v").agg(F.sum("_a").alias("_da"),
                                     F.sum("_b").alias("_db"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    gaps = (per_v
            .withColumn("_ca", F.sum("_da").over(w))
            .withColumn("_cb", F.sum("_db").over(w))
            .select(F.abs(F.col("_ca") * F.lit(nb)
                          - F.col("_cb") * F.lit(na)).alias("_g")))
    return (gaps.agg(F.max("_g").alias("_mx"))
            .select(F.lit(na).alias("n_a"), F.lit(nb).alias("n_b"),
                    F.round(F.col("_mx") / F.lit(float(na) * nb),
                            ndigits).alias("ks")))


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str,
    ndigits: int = 6,
    scale_threshold: int = 100_000,
) -> DataFrame:
    """Exact Kendall tau-a rank correlation between two columns: the
    signed concordant-minus-discordant pair count over all n(n-1)/2
    pairs (ties contribute 0) — rank agreement with NO ranks, means,
    or float CDFs anywhere. The outlier-immune complement to the
    Pearson moment-sum operators. Returns (n, n_pairs, tau).

    Two row-identical paths (the rfm_segments pattern):
      - below `scale_threshold` rows: pair self-join on `order_col`
        inequality — O(n^2), fine for series-sized inputs (hourly
        aggregates, percentile grids); every term is
        sign((x_i-x_j)(y_i-y_j)) in {-1,0,1}.
      - at/above: distributed inversion counting (Knight 1966
        decomposition, round-4 verdict #8) — tau from
        S = n0 - n1 - n2 + n3 - 2D where n0..n3 are pair/tie counts
        (one aggregate each) and D, the discordant-pair count, is the
        number of y-inversions under the (x, y) total order, counted
        in O(n log n) work: see _kendall_inversions.
    """
    s = df.select(F.col(order_col).alias("_t"),
                  F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    n = s.count()
    if n >= scale_threshold:
        return _kendall_inversions(s, n, ndigits)
    a = s.select(F.col("_t").alias("_t1"), F.col("_x").alias("_x1"),
                 F.col("_y").alias("_y1"))
    b = s.select(F.col("_t").alias("_t2"), F.col("_x").alias("_x2"),
                 F.col("_y").alias("_y2"))
    pairs = a.join(b, F.col("_t1") < F.col("_t2"))
    sgn = (F.signum((F.col("_x1") - F.col("_x2"))
                    * (F.col("_y1") - F.col("_y2")))
           .cast("long"))
    agg = pairs.agg(F.count(F.lit(1)).alias("n_pairs"),
                    F.sum(sgn).alias("_s"))
    return (agg.select(F.lit(n).alias("n"), "n_pairs",
                       F.round(F.col("_s") / F.col("n_pairs"),
                               ndigits).alias("tau")))


def _np_inversions(y) -> int:
    """#pairs i<j with y[i] > y[j] — vectorized divide-and-conquer
    (np.searchsorted cross-counts + sorted merges): O(m log^2 m) numpy
    work, O(log m) Python frames. Exact (Python-int accumulation)."""
    import numpy as np

    def rec(x):
        m = len(x)
        if m <= 1:
            return x, 0
        left, il = rec(x[:m // 2])
        right, ir = rec(x[m // 2:])
        # every right element sits after every left element in the
        # original order; strictly-greater left elements invert it
        cross = int((len(left)
                     - np.searchsorted(left, right, side="right")).sum())
        return np.sort(np.concatenate([left, right])), il + ir + cross

    return rec(np.asarray(y))[1]


def _kendall_inversions(s: DataFrame, n: int, ndigits: int,
                        n_chunks: int = 64,
                        n_buckets: int = 64) -> DataFrame:
    """Distributed exact discordant-pair count.

    Sort rows by (x, y): D = #pairs where the later row has a strictly
    smaller y (x-tied pairs are ordered y-ascending, so they never
    count — correct, they are ties). Counting those inversions
    distributes by double bucketing:

      chunk c = range bucket of the (x, y) position     (global_rank)
      ybkt  b = range bucket of the dense y-rank        (ties in y
                share a dense rank, so a tie never spans buckets and
                cross-bucket order == strict y order)

      D = cross-cell pairs (c1<c2, b1>b2): exact from the BOUNDED
          (n_chunks x n_buckets) count matrix — a driver fold of at
          most 4096 longs, the players^2 pattern;
        + within-chunk inversions (exact y values, one applyInPandas
          merge-count per chunk, parallel);
        + within-bucket inversions ACROSS chunks (same applyInPandas
          per bucket, minus the per-(chunk,bucket) cell counts that
          the chunk pass already covered).

    Every Python lane is an Arrow-batched grouped map over ~n/64
    rows; no data-proportional collect. Output arithmetic (S/n0,
    rounding) happens ENGINE-side so both kendall paths hash-match
    the same oracle."""
    from mms_rdf_spark.operators.link import global_rank

    spark = s.sparkSession
    n0 = n * (n - 1) // 2
    if n0 == 0:
        return spark.createDataFrame(
            [(n, 0, None)], "n int, n_pairs long, tau double")

    def tie_pairs(*cols) -> int:
        g = s.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
        row = g.agg(F.sum(F.col("_c") * (F.col("_c") - 1) / 2)
                    .cast("long").alias("t")).first()
        return int(row.t or 0)

    n1, n2, n3 = tie_pairs("_x"), tie_pairs("_y"), tie_pairs("_x", "_y")

    # dense y-rank -> y bucket (a tie class never spans buckets)
    dy = s.select("_y").distinct()
    d_y = dy.count()
    dyr = global_rank(dy, "_y", "_y").withColumn(
        "_b", ((F.col("rank") - 1) * n_buckets / d_y)
        .cast("long").cast("int")).drop("rank")
    # (x, y) position -> chunk
    ranked = global_rank(s.withColumn("_ord", F.struct("_x", "_y")),
                         "_ord", "_t")
    rows = (ranked.withColumn(
        "_c", ((F.col("rank") - 1) * n_chunks / n).cast("long")
        .cast("int"))
        .withColumnRenamed("rank", "_px")
        .join(dyr, on="_y")
        .select("_px", "_c", "_b", "_y")).localCheckpoint()

    def inv_group(pdf):
        import pandas as pd
        o = pdf.sort_values("_px")["_y"].to_numpy()
        return pd.DataFrame({"inv": [_np_inversions(o)]})

    def inv_sum(grouped) -> int:
        out = grouped.applyInPandas(inv_group, "inv long") \
            .agg(F.sum("inv").alias("t")).first()
        return int(out.t or 0)

    inv_chunk = inv_sum(rows.groupBy("_c"))
    inv_bucket = inv_sum(rows.groupBy("_b"))
    inv_cell = inv_sum(rows.groupBy("_c", "_b"))

    # bounded (chunk, bucket) count matrix -> exact cross-cell count:
    # one chunk-ordered sweep maintaining ge[b] = rows in EARLIER
    # chunks with bucket >= b (pure Python ints, exact)
    by_chunk: dict[int, list[tuple[int, int]]] = {}
    for r in rows.groupBy("_c", "_b").agg(
            F.count(F.lit(1)).alias("m")).collect():
        by_chunk.setdefault(r._c, []).append((r._b, r.m))
    cross = 0
    ge = [0] * (n_buckets + 2)
    for c in sorted(by_chunk):
        for b, m in by_chunk[c]:
            cross += m * ge[b + 1]  # earlier chunk, strictly larger y
        add = [0] * (n_buckets + 2)
        for b, m in by_chunk[c]:
            add[b] += m
        run = 0
        for b in range(n_buckets, -1, -1):
            run += add[b]
            ge[b] += run

    D = cross + inv_chunk + (inv_bucket - inv_cell)
    S = n0 - n1 - n2 + n3 - 2 * D
    # final arithmetic engine-side (rounding parity with the oracle)
    # n int / n_pairs long: the exact schema of the pair-join path
    # (F.lit(n) is IntegerType), so the two paths are frame-identical
    one = spark.createDataFrame([(n, n0, S)],
                                "n int, n_pairs long, _s long")
    return one.select("n", "n_pairs",
                      F.round(F.col("_s") / F.col("n_pairs"),
                              ndigits).alias("tau"))


def mann_whitney_auc(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Mann-Whitney U as the ROC-AUC P(A > B) + ½P(A = B), computed
    EXACTLY: per distinct value, sample-a counts multiply twice the
    strictly-smaller b-count plus the tied b-count — all longs, halved
    by a single final division by 2·n_a·n_b. The rank-sum complement
    to ks_statistic (stochastic dominance vs sup-gap), with the same
    distinct-value cumulative pass and the same global_rank swap-in
    note at extreme distinct-value cardinality.
    Returns (n_a, n_b, auc); 0.5 = no separation.
    """
    na = a.count()
    nb = b.count()
    if na == 0 or nb == 0:
        raise ValueError("mann_whitney_auc: both samples non-empty")
    merged = (a.select(F.col(value_col).alias("_v"),
                       F.lit(1).alias("_a"), F.lit(0).alias("_b"))
              .unionByName(
                  b.select(F.col(value_col).alias("_v"),
                           F.lit(0).alias("_a"), F.lit(1).alias("_b"))))
    per_v = merged.groupBy("_v").agg(F.sum("_a").alias("_da"),
                                     F.sum("_b").alias("_db"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wins2 = (per_v
             .withColumn("_cb", F.sum("_db").over(w))
             .select((F.col("_da")
                      * (2 * (F.col("_cb") - F.col("_db"))
                         + F.col("_db"))).alias("_w2")))
    return (wins2.agg(F.sum("_w2").alias("_s"))
            .select(F.lit(na).alias("n_a"), F.lit(nb).alias("n_b"),
                    F.round(F.col("_s")
                            / F.lit(2.0 * na * nb), ndigits)
                    .alias("auc")))


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes
    (y_j−y_i)/(x_j−x_i) over x_i < x_j — up to ~29% outliers cannot
    move it, the robust complement to grouped_ols_trend. Returns one
    row (n_pairs, slope).

    Each slope is ONE float division rounded to `ndigits` BEFORE the
    median (so the order statistic compares identical values on every
    engine); the median is the lower order statistic by
    (slope, xi, xj) total order — no interpolation, no float
    averaging. O(n²) pair join: series-sized inputs (aggregate
    first), same honest bound as kendall_tau.
    """
    s = df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    a = s.select(F.col("_x").alias("_xi"), F.col("_y").alias("_yi"))
    b = s.select(F.col("_x").alias("_xj"), F.col("_y").alias("_yj"))
    slopes = (a.join(b, F.col("_xi") < F.col("_xj"))
              .select(F.round((F.col("_yj") - F.col("_yi"))
                              / (F.col("_xj") - F.col("_xi")),
                              ndigits).alias("_s"),
                      "_xi", "_xj"))
    w = Window.orderBy("_s", "_xi", "_xj")
    ranked = slopes.withColumn("_rn", F.row_number().over(w))
    n_pairs = slopes.count()
    k = max(1, (n_pairs + 1) // 2)
    return (ranked.where(F.col("_rn") == k)
            .select(F.lit(n_pairs).alias("n_pairs"),
                    F.col("_s").alias("slope")))


def json_field_stats(events: DataFrame, field: str = "k",
                     buckets: int = 8) -> DataFrame:
    """JSON payload audit over the semi-structured `props` column:
    extract `$.field`, bucket it, and report per-bucket counts + range
    — the schema-on-read sanity pass a pipeline runs before promoting
    a JSON field to a real column. get_json_object stays JVM-side
    (Jackson), no UDF; missing/malformed extractions land in the NULL
    bucket instead of erroring (audit semantics).
    """
    v = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    return (events
            .select(v.alias("_v"))
            .groupBy(F.when(F.col("_v").isNull(), F.lit(None))
                     .otherwise(F.pmod("_v", F.lit(buckets)))
                     .cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min("_v").alias("min_v"),
                 F.max("_v").alias("max_v")))


def seasonal_decompose(
    events: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    period: int = 24,
    ndigits: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition of the bucketed
    event-count series: y = trend + seasonal + residual, with trend a
    centered 2x`period` moving average, seasonal the mean detrended
    value per phase (hour-of-day for 3600/24) re-centered to sum to
    ~zero, residual the leftover. Returns (bucket_s, y, trend,
    seasonal, resid) for interior rows (the first/last period/2
    buckets have no full trend window). The residual column is the
    seasonality-adjusted anomaly signal grouped_zscore misses when
    traffic has a strong daily shape.

    Exact-arithmetic determinism: the grid densifies (missing buckets
    count 0), the 2xP moving average is kept in 2P-ths as a LONG
    (2*inner sum + the two half-weighted ends), detrended values are
    exact longs in 2P-ths, per-phase means and the grand mean round
    once to nano-units as longs — every cross-engine sum is integer.

    Scale: one fact-table aggregate to the bucket series; everything
    after runs on the series, whose length is bounded by TIME (years
    x 8760 for hourly), not data volume — the single-partition window
    is a series property, same as events_acf/xcorr."""
    from pyspark.sql.window import Window

    half = period // 2
    step = F.lit(bucket_seconds)
    bucket = (F.floor(_epoch_s(ts_col) / bucket_seconds)
              * bucket_seconds).cast("long")
    d = events.select(bucket.alias("_t"))
    bounds = d.agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
    grid = bounds.select(F.explode(
        F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("_t"))
    y = (grid.join(d.groupBy("_t").agg(F.count(F.lit(1)).alias("_n")),
                   on="_t", how="left")
         .select("_t", F.coalesce(F.col("_n"), F.lit(0))
                 .cast("long").alias("y")))
    w = Window.orderBy("_t")
    w_in = w.rowsBetween(-(half - 1), half - 1)
    t2p = (2 * F.sum("y").over(w_in)
           + F.lag("y", half).over(w) + F.lead("y", half).over(w))
    m = (y.withColumn("_t2p", t2p.cast("long"))
         .where(F.col("_t2p").isNotNull()))
    denom = F.lit(2 * period)
    i = (m.withColumn("_d2p", (denom * F.col("y") - F.col("_t2p"))
                      .cast("long"))
         .withColumn("_ph", ((F.col("_t") % 86400) / bucket_seconds)
                     .cast("long") % period)).localCheckpoint()
    s = (i.groupBy("_ph")
         .agg(F.round(F.sum("_d2p") / F.count(F.lit(1)) / denom * 1e9)
              .cast("long").alias("_smu")))
    g = s.agg(F.round(F.sum("_smu") / F.count(F.lit(1)))
              .cast("long").alias("_gmu"))
    seas = (s.crossJoin(F.broadcast(g))
            .select("_ph",
                    F.round((F.col("_smu") - F.col("_gmu")) / 1e9,
                            ndigits).alias("seasonal")))
    trend = F.round(F.col("_t2p") / denom, ndigits)
    return (i.join(F.broadcast(seas), on="_ph")
            .select(F.col("_t").alias("bucket_s"), "y",
                    trend.alias("trend"), "seasonal",
                    F.round(F.col("y") - trend - F.col("seasonal"),
                            ndigits).alias("resid")))


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two groups —
    the non-parametric sibling of the A/B z-test for metrics whose
    distributions are skewed or heavy-tailed (latencies, token
    counts): does group A stochastically dominate group B? Returns
    one row (n_a, n_b, u_a, z) with the tie-corrected normal
    approximation; z is NULL when the variance degenerates (one
    group empty or all values identical).

    Exact arithmetic: ranks never exist as floats — per DISTINCT
    value the frame carries (cnt, cnt_a), the inclusive global cumsum
    of cnt gives max_rank, and the DOUBLED tied rank-sum
    2R_A = sum(cnt_a * (2*cum - cnt + 1)) is an exact long, as are
    the tie term sum(t^3 - t) and 2U_A = 2R_A - n_a(n_a+1). The final
    u_a/z are single fixed-order float expressions over those longs,
    rounded 6 — the DuckDB oracle (events_mannwhitney) mirrors them.

    Scale shape: one (value)-keyed map-side-combined aggregate
    collapses the corpus to |distinct values| rows; the cumsum is the
    distributed two-phase scan (prefix.global_cumsum — range
    partition + P-long offset broadcast, NO single-partition window);
    the finale is a 1-row aggregate.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    sub = (df.where(F.col(group_col).isin([group_a, group_b]))
           .select((F.col(group_col) == group_a).cast("long")
                   .alias("_isa"),
                   F.col(value_col).alias("_v")))
    per = sub.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"),
                                F.sum("_isa").alias("_ca"))
    cum = global_cumsum(per, "_v", "_v", "_cnt")
    st = cum.agg(
        F.sum("_ca").cast("long").alias("na"),
        F.sum(F.col("_cnt") - F.col("_ca")).cast("long").alias("nb"),
        F.sum(F.col("_ca")
              * (2 * F.col("cum") - F.col("_cnt") + 1))
        .cast("long").alias("r2a"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
              - F.col("_cnt")).cast("long").alias("ties"))
    nn = F.col("na") + F.col("nb")
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    sig2 = (F.col("na") * F.col("nb") / F.lit(12.0)) \
        * ((nn + 1) - F.col("ties") / (nn * (nn - F.lit(1.0))))
    z = (u2 / F.lit(2.0) - F.col("na") * F.col("nb") / F.lit(2.0)) \
        / F.sqrt(sig2)
    return st.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.round(u2 / F.lit(2.0), 6).alias("u_a"),
        F.when((F.col("na") > 0) & (F.col("nb") > 0) & (sig2 > 0),
               F.round(z, 6)).alias("z"))


def sequence_pattern(
    events: DataFrame,
    pattern: str,
    mapping: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern matching over each user's
    time-ordered event-type sequence. Every mapped event type becomes
    one character (`mapping`: type -> single char); the per-user
    sequence is the chars ordered by (ts, event_id); matches are the
    standard leftmost non-overlapping greedy regex matches (identical
    across Java and RE2 for the alternation/star/plus pattern class —
    avoid lazy quantifiers and lookarounds if an oracle must agree).

    Returns (user_id, match_idx, matched): the 0-based match ordinal
    within the user's sequence and the matched substring. Unmapped
    event types are EXCLUDED from the sequence (they are
    non-participating, like undeclared MATCH_RECOGNIZE variables) —
    so a pattern like "sc+p" means "signup, then clicks, then
    purchase with no OTHER MAPPED event between them".

    Scale shape: one groupBy(user) exchange (collect_list is
    partial-aggregated object-hash); each user's string is
    activity-bounded and the regex runs JVM-side per row. Hot users
    make long strings, not hot partitions — one row per user either
    way. The whole op is two narrow projections around one exchange.
    """
    if any(len(c) != 1 for c in mapping.values()):
        raise ValueError("sequence_pattern: mapping values must be "
                         "single characters")
    ch = F.element_at(
        F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]),
        F.col(type_col))
    seq = (events
           .where(F.col(type_col).isin(*mapping.keys()))
           .select(F.col(user_col).alias("user_id"),
                   F.struct(F.col(ts_col).alias("ts"),
                            F.col(id_col).alias("eid"),
                            ch.alias("ch")).alias("ev"))
           .groupBy("user_id")
           .agg(F.array_join(
               F.transform(F.sort_array(F.collect_list("ev")),
                           lambda x: x["ch"]), "").alias("seq")))
    return (seq
            .select("user_id",
                    F.posexplode(
                        F.regexp_extract_all("seq", F.lit(pattern),
                                             F.lit(0)))
                    .alias("match_idx", "matched"))
            .select("user_id",
                    F.col("match_idx").cast("long").alias("match_idx"),
                    "matched"))


def ljung_box(
    events: DataFrame,
    event_type: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    max_lag: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test (Ljung & Box 1978) over an
    event-count series: Q = n(n+2)·Σ_{k=1..h} ρ_k²/(n−k), the standard
    "is this series white noise / did my model leave structure in the
    residuals" QC statistic, composed over the SAME per-lag Pearson
    estimator as lagged_crosscorr (events_acf) so the two can never
    drift. Returns ONE row (n, h, q): n = lag-0 series length, h =
    surviving lags (degenerate constant-overlap lags drop, matching
    the ACF operator), q compared against χ²(h).

    Determinism: each lag's term rounds to 12dp and lifts to an exact
    pico long BEFORE the cross-lag sum (float summation order never
    matters), then one double multiply against n(n+2). Empty/constant
    series (no lag-0 row) yield an empty frame rather than a fake 0."""
    acf = lagged_crosscorr(events, event_type, event_type,
                           type_col=type_col, ts_col=ts_col,
                           bucket_seconds=bucket_seconds,
                           max_lag=max_lag)
    base = acf.where(F.col("lag") == 0) \
        .select(F.col("n").alias("n0"))
    terms = (acf.where(F.col("lag") >= 1)
             .select(F.round(F.round(F.col("r") * F.col("r")
                                     / F.col("n"), 12) * 1e12)
                     .cast("long").alias("_t")))
    s = terms.agg(F.count(F.lit(1)).alias("h"),
                  F.sum("_t").alias("_st"))
    return (base.crossJoin(F.broadcast(s))
            .select(F.col("n0").alias("n"), "h",
                    F.round((F.col("n0") * (F.col("n0") + 2))
                            * (F.col("_st") / F.lit(1e12)), 6)
                    .alias("q")))


def _transition_counts(events: DataFrame, key: str, type_col: str,
                       ts_col: str, tiebreak_col: str) -> DataFrame:
    """(src, dst, n) transition counts over per-key event sequences —
    the single seam shared by transition_probs and markov_stationary
    so the two can never drift."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    pairs = (events
             .select(key, type_col, ts_col, tiebreak_col)
             .withColumn("_dst", F.lead(type_col).over(w))
             .where(F.col("_dst").isNotNull()))
    return (pairs.groupBy(F.col(type_col).alias("src"),
                          F.col("_dst").alias("dst"))
            .agg(F.count(F.lit(1)).alias("n")))


def markov_stationary(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    iters: int = 6,
    fold: str = "driver",
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (the long-run state occupancy that transition_probs'
    one-step matrix only hints at), by EXACT-INTEGER power iteration:

      - transitions restricted in one pass to dst states that are
        themselves sources (terminal-only states carry no out-edges;
        mass reaching a state whose every out-edge was dropped is
        lost and the final vector renormalizes — documented, and moot
        on cyclic event corpora);
      - x starts uniform at 10^9 // n_states nanos; each step
        x'_j = sum_i (x_i * n_ij) // out_i with per-term integer
        floor division — every iterate is an exact long, so both
        engines walk the IDENTICAL integer trajectory (the repo's
        answer to the grid-aligned-average float lesson: iterated
        values must never re-enter float sums);
      - after `iters` steps, pi = round(x / sum(x), 6).

    Returns (state, pi_nano, pi); pi_nano is the raw exact long so
    the cross-engine hash pins the whole trajectory, not just 6dp.

    Scale: the transition matrix is |event types|^2 — schema-sized —
    so the default fold="driver" collects it and iterates in pure
    Python ints (the ivf_train static-fold precedent; the collect is
    bounded by construction, never by data volume). fold="joins" is
    the distributed path for huge state spaces (URL- or doc-level
    chains): `iters` tiny (join + groupBy) rounds, row-identical to
    the driver fold (pinned in tests/test_analytics.py).
    """
    spark = events.sparkSession
    counts = _transition_counts(events, key, type_col, ts_col,
                                tiebreak_col)
    srcs = counts.select("src").distinct()
    restricted = counts.join(srcs.select(F.col("src").alias("dst")),
                             on="dst", how="left_semi")
    out_n = restricted.groupBy("src").agg(
        F.sum("n").cast("long").alias("out_n"))
    edges = restricted.join(out_n, on="src")

    if fold == "driver":
        rows = edges.collect()
        states = sorted({r.src for r in rows})
        if not states:
            return spark.createDataFrame(
                [], "state string, pi_nano long, pi double")
        x = {s: 10**9 // len(states) for s in states}
        for _ in range(iters):
            nxt = {s: 0 for s in states}
            for r in rows:
                if r.dst in nxt:
                    nxt[r.dst] += x[r.src] * r.n // r.out_n
            x = nxt
        vec = spark.createDataFrame(
            [(s, x[s]) for s in states], "state string, pi_nano long")
    elif fold == "joins":
        n_states = out_n.count()
        if n_states == 0:
            return spark.createDataFrame(
                [], "state string, pi_nano long, pi double")
        vec = out_n.select(
            F.col("src").alias("state"),
            F.lit(10**9 // n_states).cast("long").alias("pi_nano"))
        for _ in range(iters):
            agg = (edges.join(vec, edges["src"] == vec["state"])
                   .select("dst", F.expr(
                       "CAST(pi_nano * n AS BIGINT) div out_n")
                       .alias("_t"))
                   .groupBy(F.col("dst").alias("state"))
                   .agg(F.sum("_t").cast("long").alias("_v")))
            vec = (out_n.select(F.col("src").alias("state"))
                   .join(agg, on="state", how="left")
                   .select("state", F.coalesce("_v", F.lit(0))
                           .cast("long").alias("pi_nano"))
                   .localCheckpoint())
    else:
        raise ValueError(f"markov_stationary: unknown fold {fold!r}")

    tot = vec.agg(F.sum("pi_nano").cast("long").alias("_tot"))
    return (vec.crossJoin(F.broadcast(tot))
            .select("state", "pi_nano",
                    F.round(F.col("pi_nano")
                            / F.col("_tot").cast("double"), 6)
                    .alias("pi")))


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    unit: int = 100,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups — the
    parametric sibling of mann_whitney_u (and the small-sample /
    unequal-variance upgrade of ab_test_zstats' z): does the mean of
    group B differ from group A when neither equal variances nor
    equal sizes can be assumed? Returns one row
    (n_a, n_b, mean_a, mean_b, t, df) with the Welch-Satterthwaite
    degrees of freedom; t/df are NULL when a group has <2 rows or the
    pooled standard error degenerates.

    Exact arithmetic: values ride as integer `unit`ths (default
    cents), so ONE conditional map-side aggregate produces all six
    moment sums (n, sum, sumsq per arm) as exact longs; every float
    op after is a fixed-order expression over those longs, mirrored
    textually by the SQL oracle (s*s is computed via CAST(s AS
    DOUBLE)*s so the square never overflows the long). Sample
    variance uses the n-1 denominator (vs the population form in
    ab_test_zstats). sumsq overflows long when n*u^2 > 2^63 — at that
    scale pre-aggregate per partition into DECIMAL; documented trade.

    Scale shape: one exchange (the 2-row groupBy), then a 1-row
    projection.
    """
    sub = (df.where(F.col(group_col).isin([group_a, group_b]))
           .select((F.col(group_col) == group_a).alias("_isa"),
                   F.round(F.col(value_col) * unit).cast("long")
                   .alias("_u")))

    def _s(isa, expr, name):
        return F.sum(F.when(F.col("_isa") == isa, expr)
                     .otherwise(F.lit(0))).alias(name)

    st = sub.agg(
        _s(True, F.lit(1), "na"), _s(False, F.lit(1), "nb"),
        _s(True, F.col("_u"), "sa"), _s(False, F.col("_u"), "sb"),
        _s(True, F.col("_u") * F.col("_u"), "qa"),
        _s(False, F.col("_u") * F.col("_u"), "qb"))
    st = st.where(F.col("na").isNotNull()
                  & ((F.col("na") + F.col("nb")) > 0))
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    va = (F.col("qa") - sa.cast("double") * sa / na) / (na - 1)
    vb = (F.col("qb") - sb.cast("double") * sb / nb) / (nb - 1)
    ra, rb = va / na, vb / nb
    t = F.round((sb / nb - sa / na) / F.sqrt(ra + rb), 6)
    dof = F.round((ra + rb) * (ra + rb)
                  / (ra * ra / (na - 1) + rb * rb / (nb - 1)), 6)
    ok = (na > 1) & (nb > 1) & ((ra + rb) > 0)
    return st.select(
        na.alias("n_a"), nb.alias("n_b"),
        F.round(sa / na / unit, 6).alias("mean_a"),
        F.round(sb / nb / unit, 6).alias("mean_b"),
        F.when(ok, t).alias("t"),
        F.when(ok, dof).alias("df"))


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation — Pearson over
    AVERAGE ranks, the monotone-association complement to kendall_tau
    (same question, rank-moment form: O(n) after two distinct-value
    passes instead of pair counting). Returns one row (n, rho); rho
    is NULL when either column has zero rank variance.

    Exact arithmetic: ranks never exist as floats — per column the
    DOUBLED average rank of a tie class, 2r = 2*cum_below + cnt + 1,
    is an exact long (the roc_auc/mann_whitney_u recipe, via
    prefix.global_cumsum — no single-partition window); the doubling
    cancels in the correlation. Moment sums of the doubled ranks
    accumulate as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so they
    stay exact past the long range (sum of squares is ~4n^3); rho is
    ONE fixed-order float expression over those exact sums, rounded.

    Scale shape: two distinct-value aggregates + cumsums, two hash
    joins back on the value keys, one 1-row moment aggregate.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))

    def _ranks(col: str) -> DataFrame:
        per = (s.groupBy(F.col(col).alias("_v"))
               .agg(F.count(F.lit(1)).alias("_cnt")))
        c = global_cumsum(per, "_v", "_v", "_cnt")
        return c.select(
            F.col("_v").alias(col),
            (2 * (F.col("cum") - F.col("_cnt")) + F.col("_cnt") + 1)
            .cast("long").alias(f"{col}r"))

    j = (s.join(_ranks("_x"), on="_x").join(_ranks("_y"), on="_y"))

    def _dsum(expr, name):
        return F.sum(expr.cast("decimal(38,0)")).alias(name)

    st = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dsum(F.col("_xr"), "sx"), _dsum(F.col("_yr"), "sy"),
        _dsum(F.col("_xr") * F.col("_xr"), "sxx"),
        _dsum(F.col("_yr") * F.col("_yr"), "syy"),
        _dsum(F.col("_xr") * F.col("_yr"), "sxy"))
    st = st.where(F.col("n") > 0)
    n = F.col("n")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sxd * syd
    vx = n * F.col("sxx").cast("double") - sxd * sxd
    vy = n * F.col("syy").cast("double") - syd * syd
    return st.select(
        "n",
        F.when((vx > 0) & (vy > 0),
               F.round(num / (F.sqrt(vx) * F.sqrt(vy)), ndigits))
        .alias("rho"))


def benford_digits(
    df: DataFrame,
    value_col: str = "value",
    unit: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data /
    instrumentation-bug forensic: naturally-occurring positive
    magnitudes put digit d first with probability log10(1 + 1/d);
    synthetic or truncated feeds don't. Returns one row per leading
    digit 1..9 present: (digit, n, obs_p, exp_p, chi2_term); the
    portmanteau chi-square is sum(chi2_term) driver-side.

    Robust digit extraction: values ride as positive integer
    `unit`ths (cents), so the leading digit is pure long-to-string
    math — identical on every engine, no log10-of-double boundary
    flips (Benford is scale-invariant, so auditing cents IS auditing
    the values). exp_p = round(log10(1 + 1/d), 9), the transcendental
    rounding discipline; obs_p rounds 6dp and chi2_term is computed
    from the ROUNDED probabilities so both engines divide identical
    doubles. Zero/negative/null values are excluded (Benford is
    defined on positive magnitudes).

    Scale shape: one map-side-combined 9-row aggregate; the total is
    a broadcast window over those 9 rows.
    """
    c = F.round(F.col(value_col) * unit).cast("long")
    d = (df.select(c.alias("_c")).where(F.col("_c") > 0)
         .select(F.substring(F.col("_c").cast("string"), 1, 1)
                 .cast("int").alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).cast("long")
                               .alias("n")))
    w = Window.partitionBy()
    tot = F.sum("n").over(w)
    obs = F.round(F.col("n") / tot, 6)
    exp = F.round(F.log10(1 + 1.0 / F.col("digit")), 9)
    return d.select(
        "digit", "n", obs.alias("obs_p"), exp.alias("exp_p"),
        F.round(tot * (obs - exp) * (obs - exp) / exp, 6)
        .alias("chi2_term"))


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA F-test across k groups — the k-sample extension
    of welch_ttest's two arms (classic equal-variance form): does the
    group mean differ anywhere, before pairwise drill-down? Values
    must already be exact integers (counts, or pre-scaled units).

    Exact arithmetic: ONE map-side-combined aggregate produces the
    per-group moment sums — n_g/s_g exact longs, q_g as
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so squared cents-scale
    values never overflow; each group's between-term is the exact
    FLOOR division s_g^2 div n_g (Spark `div` over a decimal square,
    DuckDB `//` over HUGEINT — bit-identical, no round()-of-a-huge-
    double whose last-ulp behavior differs between engines; the
    LESSON from the first cut, which 6dp-micro-gridded the term and
    diverged by one ulp at 1e17 magnitudes), so the cross-group sum
    is exact and order-free; truncation understates SS_between by at
    most k integer units — negligible against cents^2 magnitudes and
    identical on both engines. Every float op after is a fixed-order
    expression over those exact sums, mirrored textually by the SQL
    oracle. The floored quotient must fit a long (~9e18): fine
    through n*mean^2 of cents-scale data at 1e8 rows; past that,
    pre-scale units down.

    Returns one row (k, n, ss_between, ss_within, f, eta_sq); f is
    NULL when k<2, n<=k, or ss_within degenerates; eta_sq (effect
    size SS_b/SS_t) is NULL when the total variance is 0.

    Scale shape: one exchange (the k-row groupBy), then a 1-row fold.
    """
    v = F.col(value_col).cast("long")
    g = (df.groupBy(F.col(group_col).alias("_g"))
         .agg(F.count(F.lit(1)).cast("long").alias("_n"),
              F.sum(v).cast("long").alias("_s"),
              F.sum(v.cast("decimal(38,0)") * v)
              .cast("decimal(38,0)").alias("_q")))
    g = g.withColumn(
        "_s2", F.col("_s").cast("decimal(38,0)") * F.col("_s"))
    term = F.expr("_s2 div _n")
    st = g.agg(F.count(F.lit(1)).cast("long").alias("k"),
               F.sum("_n").cast("long").alias("n"),
               F.sum("_s").cast("long").alias("_ss"),
               F.sum("_q").cast("decimal(38,0)").alias("_qq"),
               F.sum(term.cast("decimal(38,0)"))
               .cast("decimal(38,0)").alias("_bm"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    n, k = F.col("n"), F.col("k")
    b = F.col("_bm").cast("double")
    grand = F.col("_ss").cast("double") * F.col("_ss") / n
    qq = F.col("_qq").cast("double")
    # SS_between >= 0 mathematically; floor truncation only ever
    # understates it, so the clamp corrects truncation, never hides
    ssb = F.greatest(b - grand, F.lit(0.0))
    ssw, sst = qq - b, qq - grand
    ok = (k > 1) & (n > k) & (ssw > 0)
    # ss_* ride UNROUNDED: they can reach 1e18 (cents^2), where
    # DuckDB's round(x, 6) perturbs the last ulp while Spark's
    # BigDecimal round is the identity — the raw doubles are
    # bit-identical across engines by construction. f/eta_sq are
    # O(1) ratios, where 6dp rounding is safe on both.
    return st.select(
        "k", "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(ok, F.round((ssb / (k - 1)) / (ssw / (n - k)), 6))
        .alias("f"),
        F.when(sst > 0, F.round(ssb / sst, 6)).alias("eta_sq"))


def jarque_bera(
    df: DataFrame,
    value_col: str,
    unit: int = 100,
) -> DataFrame:
    """Jarque-Bera normality test — the skewness/kurtosis portmanteau
    (Jarque & Bera 1980): JB = n/6 * (S^2 + K^2/4) where S is sample
    skewness and K excess kurtosis; under normality JB ~ chi2(2).
    The distribution-shape audit next to ks_statistic (which needs a
    reference CDF) — JB needs only moments, so it is one aggregate.

    Exact arithmetic: values ride as integer `unit`ths (cents); the
    four raw moment sums accumulate as DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) so u^4 sums stay exact far past the long range
    (u^4 fits 38 digits for |u| < ~3e9); skew/kurt are fixed-order
    float expressions over those exact sums — both scale-invariant,
    so cent moments ARE the value moments — rounded 6dp, and JB is
    computed from the ROUNDED pair so both engines square identical
    doubles. NULL values are excluded; skew/kurt/jb are NULL when
    n < 2 or the variance degenerates.

    Returns one row (n, mean, skew, kurt, jb); mean is back in value
    units. Scale shape: ONE map-side-combined 1-row aggregate.
    """
    c = F.round(F.col(value_col) * unit).cast("long")
    d = c.cast("decimal(38,0)")
    s = (df.where(F.col(value_col).isNotNull())
         .select(c.alias("_c"), d.alias("_d")))
    st = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_c").cast("long").alias("s1"),
        F.sum(F.col("_d") * F.col("_d")).cast("decimal(38,0)")
        .alias("s2"),
        F.sum(F.col("_d") * F.col("_d") * F.col("_d"))
        .cast("decimal(38,0)").alias("s3"),
        F.sum(F.col("_d") * F.col("_d") * F.col("_d") * F.col("_d"))
        .cast("decimal(38,0)").alias("s4"))
    st = st.where(F.col("s1").isNotNull() & (F.col("n") > 0))
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    ok = (n > 1) & (m2 > 0)
    skew = F.round(m3 / (F.sqrt(m2) * m2), 6)
    kurt = F.round(m4 / (m2 * m2) - 3, 6)
    return st.select(
        "n",
        F.round(mu / unit, 6).alias("mean"),
        F.when(ok, skew).alias("skew"),
        F.when(ok, kurt).alias("kurt"),
        F.when(ok, F.round(n / 6.0 * (skew * skew
                                      + kurt * kurt / 4), 6))
        .alias("jb"))


def durbin_watson(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Durbin-Watson autocorrelation test on the residuals of an OLS
    trend fit — the "is the trend model missing serial structure?"
    companion to ljung_box (which tests the raw series): DW near 2
    means independent residuals, near 0 positive lag-1 correlation,
    near 4 negative. The regressor is the observation INDEX under the
    `order_col` total order (standard trend form); values must be
    exact integers (counts / pre-scaled units).

    Exact arithmetic: DW is a RATIO of residual sums of squares, so
    the OLS denominator n*Sxx cancels — the scaled residual
    R_i = Sxx*(n*y_i - Sy) - Sxy*(n*i - Sx) is an exact integer, and
    both sums accumulate as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).
    No float enters until the final num/den and slope divisions,
    mirrored textually by the SQL oracle. R_i^2 must fit 38 digits:
    |R_i| <~ 3e18 bounds the series length x magnitude (fine for
    hourly/daily seams; pre-scale y beyond that, documented trade).

    Returns one row (n, slope, dw); slope is the OLS trend per index
    step, NULL when n < 2; dw is NULL when the residuals are exactly
    0 (perfect fit) or n < 2. Scale shape: ranks via global_cumsum
    (no single-partition window), one 1-row totals aggregate
    broadcast back, a rank-shift self-join for the lag, two 1-row
    folds.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = df.select(F.col(order_col).alias("_t"),
                  F.col(value_col).cast("long").alias("_y"),
                  F.lit(1).alias("_one"))
    r = global_cumsum(s, "_t", "_t", "_one").select(
        F.col("cum").cast("long").alias("_i"), "_y")

    def _d(c):
        return c.cast("decimal(38,0)")

    tot = r.agg(F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_i").cast("long").alias("_sx"),
                F.sum("_y").cast("long").alias("_sy"),
                F.sum(_d(F.col("_i")) * F.col("_i"))
                .cast("decimal(38,0)").alias("_qx"),
                F.sum(_d(F.col("_i")) * F.col("_y"))
                .cast("decimal(38,0)").alias("_qxy"))
    tot = tot.where(F.col("_sx").isNotNull() & (F.col("_n") > 0)) \
        .select("_n", "_sx", "_sy",
                (_d(F.col("_n")) * F.col("_qx")
                 - _d(F.col("_sx")) * F.col("_sx")).alias("_sxx"),
                (_d(F.col("_n")) * F.col("_qxy")
                 - _d(F.col("_sx")) * F.col("_sy")).alias("_sxy"))
    res = r.crossJoin(F.broadcast(tot)).select(
        "_i", "_n", "_sxx", "_sxy",
        (F.col("_sxx") * (_d(F.col("_n")) * F.col("_y")
                          - _d(F.col("_sy")))
         - F.col("_sxy") * (_d(F.col("_n")) * F.col("_i")
                            - _d(F.col("_sx")))).alias("_r"))
    den = res.agg(
        F.max("_n").alias("n"), F.max("_sxx").alias("_sxx"),
        F.max("_sxy").alias("_sxy"),
        F.sum(F.col("_r") * F.col("_r")).cast("decimal(38,0)")
        .alias("_den"))
    prev = res.select((F.col("_i") + 1).alias("_i"),
                      F.col("_r").alias("_rp"))
    num = (res.join(prev, on="_i")
           .agg(F.sum((F.col("_r") - F.col("_rp"))
                      * (F.col("_r") - F.col("_rp")))
                .cast("decimal(38,0)").alias("_num")))
    j = den.where(F.col("n").isNotNull()) \
        .crossJoin(F.broadcast(num))
    ok = (F.col("n") > 1) & (F.col("_sxx").cast("double") > 0)
    return j.select(
        "n",
        F.when(ok, F.round(F.col("_sxy").cast("double")
                           / F.col("_sxx").cast("double"), 6))
        .alias("slope"),
        F.when(ok & (F.col("_den").cast("double") > 0),
               F.round(F.col("_num").cast("double")
                       / F.col("_den").cast("double"), 6))
        .alias("dw"))


def runs_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test — the nonparametric randomness check
    that needs NO distributional model (vs durbin_watson's linear
    residual form): dichotomize the ordered series at its median,
    count maximal same-sign runs, and compare against the run count a
    random shuffle would produce. Too FEW runs = positive serial
    dependence / clustering; too many = alternation. Values ride as
    exact integer longs; ties AT the median are dropped (the standard
    procedure — they carry no sign).

    Exact arithmetic: the median is the exact lower median by global
    rank (no float percentile); signs, the run-boundary count, and
    n1/n2 are exact longs; mu/sigma^2/z are fixed-order float
    expressions over those longs, mirrored textually by the SQL
    oracle.

    Returns one row (n1, n2, runs, z): counts above/below, observed
    runs, and the normal-approximation z; z is NULL when either side
    is empty or the variance degenerates; the frame is empty when
    every value ties the median. Scale shape: two global_cumsum rank
    passes (no single-partition window), a rank-shift self-join for
    boundaries, two 1-row folds.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = df.select(F.col(order_col).alias("_t"),
                  F.col(value_col).cast("long").alias("_y"),
                  F.lit(1).alias("_one"))
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("_nt"))
    byval = global_cumsum(s, "_y", "_t", "_one")
    med = (byval.crossJoin(F.broadcast(tot))
           .where(F.col("cum") == F.floor((F.col("_nt") + 1) / 2))
           .select(F.col("_y").alias("_m")))
    f = (s.crossJoin(F.broadcast(med))
         .where(F.col("_y") != F.col("_m"))
         .select("_t", (F.col("_y") > F.col("_m")).cast("long")
                 .alias("_s"), "_one"))
    r = global_cumsum(f, "_t", "_t", "_one").select(
        F.col("cum").cast("long").alias("_i"), "_s")
    cnt = r.agg(F.sum("_s").cast("long").alias("n1"),
                F.sum(1 - F.col("_s")).cast("long").alias("n2"))
    cnt = cnt.where(F.col("n1").isNotNull())
    prev = r.select((F.col("_i") + 1).alias("_i"),
                    F.col("_s").alias("_sp"))
    bnd = (r.join(prev, on="_i")
           .agg(F.sum((F.col("_s") != F.col("_sp")).cast("long"))
                .alias("_b")))
    j = cnt.crossJoin(F.broadcast(bnd))
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    runs = F.lit(1) + F.coalesce(F.col("_b"), F.lit(0))
    mu = 2.0 * n1 * n2 / nn + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)
           / (nn * nn) / (nn - 1.0))
    ok = (n1 > 0) & (n2 > 0) & (nn > 2) & (var > 0)
    return j.select(
        "n1", "n2", runs.cast("long").alias("runs"),
        F.when(ok, F.round((runs - mu) / F.sqrt(var), 6)).alias("z"))


def friedman_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test — the nonparametric repeated-measures ANOVA
    (Friedman 1937): rank k treatments WITHIN each block, then ask
    whether any treatment consistently outranks the others; the
    block design removes the between-block level anova_oneway would
    confound. Input must carry one value per (block, treatment)
    cell; incomplete blocks (fewer than k distinct treatments) are
    excluded per the definition. Values ride as exact integer longs.

    Exact arithmetic: within-block tie-averaged ranks ride DOUBLED
    (2r = 2*below + eq + 1, exact longs — the spearman/roc_auc
    recipe), and the /4 of the tie-corrected statistic cancels:

      chi2 = (k-1) * sum_j (D_j - b(k+1))^2
             / (sum_ij (2r_ij)^2 - b k (k+1)^2),   D_j = sum_i 2r_ij

    so EVERYTHING up to the single final division is exact long
    math, mirrored textually by the SQL oracle. Kendall's W
    (= chi2 / (b(k-1))) rides along as the effect size. chi2/w are
    NULL when k < 2 or the denominator degenerates (all-tied
    blocks).

    Returns one row (k, b, chi2, w). Scale shape: blocks are width-k
    (small) so the within-block rank window is bounded; one
    (block, value) aggregate, one semi-join on complete blocks, a
    k-row treatment fold and two 1-row finales.
    """
    from pyspark.sql.window import Window

    s = df.select(F.col(block_col).alias("_b"),
                  F.col(treat_col).alias("_g"),
                  F.col(value_col).cast("long").alias("_v"))
    kf = s.agg(F.countDistinct("_g").cast("long").alias("k"))
    bs = (s.groupBy("_b")
          .agg(F.count(F.lit(1)).cast("long").alias("_cb"),
               F.countDistinct("_g").cast("long").alias("_gb")))
    complete = (bs.crossJoin(F.broadcast(kf))
                .where((F.col("_cb") == F.col("k"))
                       & (F.col("_gb") == F.col("k")))
                .select("_b"))
    f = s.join(complete, on="_b", how="left_semi")
    pv = (f.groupBy("_b", "_v")
          .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    w_blk = (Window.partitionBy("_b").orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, 0))
    pv = pv.withColumn("_cum", F.sum("_cnt").over(w_blk)) \
        .select("_b", "_v",
                (2 * (F.col("_cum") - F.col("_cnt"))
                 + F.col("_cnt") + 1).cast("long").alias("_r2"))
    ranked = f.join(pv, on=["_b", "_v"])
    dj = (ranked.groupBy("_g")
          .agg(F.sum("_r2").cast("long").alias("_dj")))
    a2 = ranked.agg(
        F.sum(F.col("_r2") * F.col("_r2")).cast("long").alias("_a2"))
    bcnt = complete.agg(F.count(F.lit(1)).cast("long").alias("b"))
    base = (kf.crossJoin(bcnt).crossJoin(a2)
            .where(F.col("b") > 0))
    num = (dj.crossJoin(F.broadcast(base))
           .agg(F.sum((F.col("_dj") - F.col("b") * (F.col("k") + 1))
                      * (F.col("_dj") - F.col("b") * (F.col("k") + 1)))
                .cast("long").alias("_num")))
    j = base.crossJoin(F.broadcast(num))
    k, b = F.col("k"), F.col("b")
    den = (F.col("_a2") - b * k * (k + 1) * (k + 1))
    ok = (k > 1) & (den > 0)
    chi2 = (k - 1) * F.col("_num").cast("double") / den
    return j.select(
        "k", "b",
        F.when(ok, F.round(chi2, 6)).alias("chi2"),
        F.when(ok, F.round(F.col("_num").cast("double") / den / b, 6))
        .alias("w"))


def cvar_tail(
    df: DataFrame,
    value_col: str,
    pct: int = 95,
    unit: int = 100,
) -> DataFrame:
    """CVaR / expected shortfall — the tail-severity companion to the
    exact-quantile operators: VaR (the pct-th empirical quantile)
    says where the tail starts, CVaR averages the k = n - ceil(pct
    n/100) + 1 LARGEST observations, i.e. how bad the tail actually
    is. The level is an integer percent so the rank target
    ceil(pct*n/100) is pure integer math — no 0.95*n float whose
    IEEE representation can flip the ceil at exact-multiple
    boundaries.

    Exact arithmetic: values ride as integer `unit`ths (cents);
    ranks come from a distinct-value count cumsum (global_cumsum, no
    single-partition window); the tail sum splits exactly at the
    threshold value (cum_vt - r0 copies of the threshold + all
    strictly-greater mass), all exact longs; the single final
    division is mirrored textually by the SQL oracle.

    Returns one row (n, tail_n, var_value, cvar). Raises on pct
    outside [1, 99]. Scale shape: one distinct-value aggregate +
    cumsum, a 1-row TakeOrdered threshold probe, one filtered tail
    aggregate, a 1-row finale.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    if not 1 <= pct <= 99:
        raise ValueError("pct must be an integer percent in [1, 99]")
    c = F.round(F.col(value_col) * unit).cast("long")
    per = (df.where(F.col(value_col).isNotNull())
           .select(c.alias("_v"))
           .groupBy("_v").agg(F.count(F.lit(1)).cast("long")
                              .alias("_cnt")))
    tot = per.agg(F.sum("_cnt").cast("long").alias("_n"))
    cum = global_cumsum(per, "_v", "_v", "_cnt")
    j = cum.crossJoin(F.broadcast(tot.where(F.col("_n") > 0)))
    r0 = (F.floor((F.lit(pct) * F.col("_n") + 99) / F.lit(100.0))
          .cast("long") - 1)
    thr = (j.withColumn("_r0", r0)
           .where(F.col("cum") >= F.col("_r0") + 1)
           .orderBy("_v").limit(1)
           .select(F.col("_v").alias("_vt"),
                   F.col("cum").alias("_cumvt"), "_n", "_r0"))
    hi = (per.crossJoin(F.broadcast(thr))
          .where(F.col("_v") > F.col("_vt"))
          .agg(F.sum(F.col("_v") * F.col("_cnt")).cast("long")
               .alias("_hi")))
    out = thr.crossJoin(F.broadcast(hi))
    tail_sum = (F.col("_vt") * (F.col("_cumvt") - F.col("_r0"))
                + F.coalesce(F.col("_hi"), F.lit(0)))
    k = F.col("_n") - F.col("_r0")
    return out.select(
        F.col("_n").alias("n"), k.alias("tail_n"),
        F.round(F.col("_vt") / F.lit(float(unit)), 6)
        .alias("var_value"),
        F.round(tail_sum / k / F.lit(float(unit)), 6).alias("cvar"))


def dispersion_test(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Poisson dispersion test — the variance-to-mean audit for count
    data: under a Poisson arrival model VMR = 1, and the index of
    dispersion D = sum (y - ybar)^2 / ybar is ~ chi2(n-1);
    VMR >> 1 flags clumped / bursty arrivals (the per-entity
    companion to burst_detection's time-local view). Values must be
    exact integer counts.

    Exact arithmetic: both statistics clear denominators to integer
    forms — D = (n Q - S^2)/S and VMR = (n Q - S^2)/((n-1) S) with
    S = sum y, Q = sum y^2 exact longs from ONE map-side-combined
    aggregate — so a single fixed-order float division ends each,
    mirrored textually by the SQL oracle. n*Q must fit a long
    (pre-aggregate into DECIMAL past ~3e18; documented trade).

    Returns one row (n, mean, vmr, d); vmr/d are NULL when n < 2 or
    the mean is 0. Scale shape: ONE 1-row aggregate.
    """
    v = F.col(value_col).cast("long")
    st = (df.where(F.col(value_col).isNotNull())
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(v).cast("long").alias("_s"),
               F.sum(v * v).cast("long").alias("_q")))
    st = st.where(F.col("_s").isNotNull() & (F.col("n") > 0))
    n, s, qq = F.col("n"), F.col("_s"), F.col("_q")
    num = n * qq - s * s
    ok = (n > 1) & (s > 0)
    return st.select(
        "n",
        F.round(s / n, 6).alias("mean"),
        F.when(ok, F.round(num / ((n - 1) * s), 6)).alias("vmr"),
        F.when(ok, F.round(num / s, 6)).alias("d"))


def cochran_q(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    x_col: str,
) -> DataFrame:
    """Cochran's Q test — the binary-outcome member of the
    matched-design family (friedman_test for ranks, mcnemar_test for
    its k=2 special case): across k treatments measured on the same
    blocks, do the success PROPORTIONS differ anywhere? x must be
    0/1; blocks missing any treatment are excluded per the
    definition.

    Exact arithmetic: the textbook numerator telescopes —
    sum_j (C_j - N/k)^2 = sum C_j^2 - N^2/k — so

      Q = (k-1) (k sum_j C_j^2 - N^2) / (k N - sum_i R_i^2)

    is integer-over-integer with ONE final float division, mirrored
    textually by the SQL oracle (column totals C_j, block totals R_i,
    grand total N, all exact longs). Q is NULL when k < 2 or the
    denominator degenerates (every block all-0 or all-1 — no
    within-block information).

    Returns one row (k, b, n_success, q). Scale shape: one
    completeness semi-join, one block fold + one treatment fold, a
    1-row finale.
    """
    s = df.select(F.col(block_col).alias("_b"),
                  F.col(treat_col).alias("_g"),
                  F.col(x_col).cast("long").alias("_x"))
    kf = s.agg(F.countDistinct("_g").cast("long").alias("k"))
    bs = (s.groupBy("_b")
          .agg(F.count(F.lit(1)).cast("long").alias("_cb"),
               F.countDistinct("_g").cast("long").alias("_gb"),
               F.sum("_x").cast("long").alias("_r")))
    complete = (bs.crossJoin(F.broadcast(kf))
                .where((F.col("_cb") == F.col("k"))
                       & (F.col("_gb") == F.col("k"))))
    rows = (complete.agg(F.count(F.lit(1)).cast("long").alias("b"),
                         F.sum("_r").cast("long").alias("_n"),
                         F.sum(F.col("_r") * F.col("_r"))
                         .cast("long").alias("_rr")))
    cols = (s.join(complete.select("_b"), on="_b", how="left_semi")
            .groupBy("_g").agg(F.sum("_x").cast("long").alias("_c"))
            .agg(F.sum(F.col("_c") * F.col("_c")).cast("long")
                 .alias("_cc")))
    j = (kf.crossJoin(rows).crossJoin(cols)
         .where(F.col("_n").isNotNull() & (F.col("b") > 0)))
    k, n = F.col("k"), F.col("_n")
    den = k * n - F.col("_rr")
    ok = (k > 1) & (den > 0)
    return j.select(
        "k", "b", n.alias("n_success"),
        F.when(ok, F.round((k - 1) * (k * F.col("_cc") - n * n)
                           / den, 6)).alias("q"))


def levene_bf(
    df: DataFrame,
    group_col: str,
    value_col: str,
    unit: int = 100,
) -> DataFrame:
    """Brown-Forsythe / Levene test — equal-VARIANCE across k groups
    (the assumption anova_oneway and pooled t-tests lean on):
    one-way ANOVA on z_ij = |x_ij - median_j|, the median-centered
    robust form (Brown & Forsythe 1974). Values ride as integer
    `unit`ths, so each group's exact LOWER median is an integer and
    every deviation is an exact long — anova_oneway's micro-long
    machinery applies unchanged.

    Per-group medians come from the distinct-value frame: one
    (group, value) aggregate, then a per-group cumulative count —
    one task per group over its DISTINCT values (the honest trade at
    few groups; swap in a grouped histogram selection past ~1e7
    distinct values per group).

    Returns anova_oneway's row (k, n, ss_between, ss_within, f,
    eta_sq) computed over the deviations; f is the Brown-Forsythe W.
    """
    from pyspark.sql.window import Window

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.round(F.col(value_col) * unit).cast("long")
                 .alias("_v")))
    pv = (s.groupBy("_g", "_v")
          .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    wg = (Window.partitionBy("_g").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = pv.withColumn("_cum", F.sum("_cnt").over(wg))
    ng = s.groupBy("_g").agg(F.count(F.lit(1)).cast("long")
                             .alias("_ng"))
    med = (cum.join(ng, on="_g")
           .where((F.col("_cum") - F.col("_cnt"))
                  < F.floor((F.col("_ng") + 1) / F.lit(2.0)))
           .where(F.col("_cum")
                  >= F.floor((F.col("_ng") + 1) / F.lit(2.0)))
           .select("_g", F.col("_v").alias("_m")))
    z = (s.join(med, on="_g")
         .select("_g", F.abs(F.col("_v") - F.col("_m")).alias("_z")))
    return anova_oneway(z, "_g", "_z")


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal-Wallis H test — the rank-based one-way ANOVA across k
    groups (the k-sample extension of mann_whitney_u, and the
    non-parametric twin of anova_oneway for skewed/heavy-tailed
    metrics): does ANY group's distribution sit higher than another's?

    Exact arithmetic, the mann_whitney_u discipline extended to k
    groups: ranks never exist as floats. One (group, value) aggregate
    collapses the corpus; re-aggregating it by value gives the
    distinct-value frame whose inclusive global cumsum
    (prefix.global_cumsum — range partition + P-long offset broadcast,
    no single-partition window) yields, per distinct value, the
    DOUBLED tied average rank 2r = 2*cum - cnt + 1 (an exact long).
    Joining that back to the (group, value) counts gives each group's
    doubled rank sum 2R_g = sum(c_gv * (2*cum - cnt + 1)) exactly; the
    tie term sum(t^3 - t) is exact on the same frame.

    The statistic H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1) is
    assembled from per-group micro-longs: each group's scaled term
    u_g = ((2R_g)^2/(4 n_g)) * 12/(N(N+1)) is an O(N)-magnitude
    fixed-order float expression over exact longs, rounded to integer
    1e-6 units, so the cross-group sum is order-free; the tie
    correction C = 1 - sum(t^3-t)/(N^3-N) divides once at the end.
    (2R_g)^2 is a double*double product of identical inputs on both
    engines — IEEE-deterministic; only SUMS of floats are ordering
    hazards, and none remain.

    Returns one row (k, n, h, h_tie): h is the uncorrected statistic,
    h_tie = h / C; both NULL when k < 2, h_tie also NULL when ties
    degenerate C to <= 0 (all values identical).

    Scale shape: two map-side-combined aggregates, one distributed
    scan, one aggregated-table join keyed on the value, then a k-row
    fold. No pairwise anything.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).alias("_v")))
    pgv = (s.groupBy("_g", "_v")
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pv = pgv.groupBy("_v").agg(F.sum("_c").cast("long").alias("_cnt"))
    cum = global_cumsum(pv, "_v", "_v", "_cnt")
    per_g = (pgv.join(cum, on="_v")
             .groupBy("_g")
             .agg(F.sum("_c").cast("long").alias("_n"),
                  F.sum(F.col("_c")
                        * (2 * F.col("cum") - F.col("_cnt") + 1))
                  .cast("long").alias("_r2")))
    tot = cum.agg(
        F.sum("_cnt").cast("long").alias("_nn"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
              - F.col("_cnt")).cast("long").alias("_ties"))
    nd = F.col("_nn").cast("double")
    r2d = F.col("_r2").cast("double")
    u = (r2d * r2d / (4.0 * F.col("_n"))) * 12.0 / (nd * (nd + 1.0))
    j = (per_g.crossJoin(F.broadcast(tot))
         .select(F.round(u * 1e6).cast("long").alias("_u"),
                 "_nn", "_ties"))
    st = (j.groupBy("_nn", "_ties")
          .agg(F.count(F.lit(1)).cast("long").alias("k"),
               F.sum("_u").cast("long").alias("_um")))
    st = st.where(F.col("_nn").isNotNull() & (F.col("_nn") > 0))
    n2 = F.col("_nn").cast("double")
    h = F.col("_um") / 1e6 - 3.0 * (n2 + 1.0)
    c = 1.0 - F.col("_ties") / (n2 * n2 * n2 - n2)
    return st.select(
        F.col("k"), F.col("_nn").alias("n"),
        F.when(F.col("k") > 1, F.round(h, 6)).alias("h"),
        F.when((F.col("k") > 1) & (c > 0), F.round(h / c, 6))
        .alias("h_tie"))


def wilcoxon_signed_rank(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Wilcoxon signed-rank test over matched pairs — the paired
    complement of mann_whitney_u (which assumes independent groups):
    per unit, did metric A sit above metric B more often/further than
    chance? The classic before/after test for non-normal paired
    metrics. Both columns must already be exact integers (counts or
    pre-scaled units) so the differences are exact longs.

    Semantics: zero differences are DROPPED (Wilcoxon's original
    procedure), |d| is ranked with tie averaging, W+ = sum of ranks
    of the positive differences, and z is the tie-corrected normal
    approximation z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 -
    sum(t^3-t)/48).

    Exact arithmetic (the mann_whitney_u discipline on |d|): per
    DISTINCT |d| the frame carries (cnt, cnt_pos); the inclusive
    global cumsum of cnt (prefix.global_cumsum — no single-partition
    window) gives the DOUBLED tied rank 2r = 2*cum - cnt + 1, so
    2W+ = sum(cnt_pos * (2*cum - cnt + 1)) is an exact long, as are
    the tie term and the scaled z pieces 4*(W+ - E) = 2*(2W+) -
    n(n+1) and 48*sigma^2 = 2n(n+1)(2n+1) - sum(t^3-t). One division
    and one sqrt at the end, mirrored textually by the SQL oracle.

    Returns one row (n, w_plus, z): n = non-zero pairs; z NULL when
    the variance degenerates (n = 0, or every |d| identical with...
    sigma > 0 always holds for n >= 1 since t^3-t < 2n(n+1)(2n+1)
    strictly — the guard is belt-and-braces). Empty input: 0 rows.

    Scale shape: one map-side-combined distinct-|d| aggregate, one
    distributed scan, a 1-row fold.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    d = F.col(col_a).cast("long") - F.col(col_b).cast("long")
    nz = (df.where(F.col(col_a).isNotNull()
                   & F.col(col_b).isNotNull())
          .select(d.alias("_d")).where(F.col("_d") != 0))
    per = (nz.select(F.abs(F.col("_d")).alias("_ad"),
                     (F.col("_d") > 0).cast("long").alias("_p"))
           .groupBy("_ad")
           .agg(F.count(F.lit(1)).cast("long").alias("_cnt"),
                F.sum("_p").cast("long").alias("_cp")))
    cum = global_cumsum(per, "_ad", "_ad", "_cnt")
    st = cum.agg(
        F.sum("_cnt").cast("long").alias("n"),
        F.sum(F.col("_cp") * (2 * F.col("cum") - F.col("_cnt") + 1))
        .cast("long").alias("_w2"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
              - F.col("_cnt")).cast("long").alias("_ties"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    n = F.col("n")
    num4 = 2 * F.col("_w2") - n * (n + 1)
    sig48 = 2 * n * (n + 1) * (2 * n + 1) - F.col("_ties")
    z = (num4 / 4.0) / F.sqrt(sig48 / 48.0)
    return st.select(
        "n",
        F.round(F.col("_w2") / 2.0, 6).alias("w_plus"),
        F.when(sig48 > 0, F.round(z, 6)).alias("z"))


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Bartlett's test for equal variances across k groups — the
    parametric, more powerful sibling of levene_bf (which is the
    robust choice under non-normality): T = [(N-k) ln(S_p^2) -
    sum_j (n_j-1) ln(s_j^2)] / C with the standard correction
    C = 1 + (sum_j 1/(n_j-1) - 1/(N-k)) / (3(k-1)). Values must
    already be exact integers (counts or pre-scaled units).

    Exact arithmetic: ONE map-side-combined aggregate gives per-group
    (n, s, q) with q as DECIMAL(38,0)/HUGEINT; each group's exact
    variance NUMERATOR e = n*q - s^2 stays decimal (never a long —
    at cents-scale order totals s^2/n alone overflows int64, the
    sf0.1 lesson), and SS_within = sum(e div n) uses the exact
    decimal floor division (e % n is exact, (e - e%n)/n is an
    integral decimal; DuckDB mirrors with HUGEINT //). Each group's
    ln(s_j^2) rounds to integer NANO units so the weighted
    cross-group sum (n_j-1)*l_j is an exact long and order-free;
    1/(n_j-1) likewise rides as rounded nano longs. The only floats
    are fixed-order expressions over those longs plus TWO final
    transcendentals (ln of the pooled variance, rounded 9dp before
    use), mirrored textually in SQL.

    Semantics: groups with n_j < 2 are EXCLUDED (their sample
    variance is undefined); t is NULL when fewer than 2 groups
    remain, when any kept group has zero variance (ln degenerates),
    or when the pooled variance degenerates.

    Returns one row (k, n, t) over the kept groups.

    Scale shape: one k-row groupBy exchange, then a 1-row fold.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    v = F.col(value_col).cast("long")
    g = (df.where(F.col(value_col).isNotNull())
         .groupBy(F.col(group_col).alias("_g"))
         .agg(F.count(F.lit(1)).cast("long").alias("_n"),
              F.sum(v).cast("long").alias("_s"),
              F.sum(v.cast("decimal(38,0)") * v)
              .cast("decimal(38,0)").alias("_q"))
         .where(F.col("_n") >= 2))
    nd = F.col("_n").cast("double")
    e = (F.col("_n").cast("decimal(38,0)") * F.col("_q")
         - F.col("_s").cast("decimal(38,0)") * F.col("_s"))
    g = g.select("_n", e.cast("decimal(38,0)").alias("_e"))
    s2 = F.col("_e").cast("double") / (nd * (nd - 1.0))
    g = g.select(
        "_n",
        ((F.col("_e") - F.col("_e") % F.col("_n")) / F.col("_n"))
        .cast("decimal(38,0)").alias("_fl"),
        s2.alias("_s2"),
        F.when(s2 > 0,
               (F.col("_n") - 1)
               * F.round(F.log(s2) * 1e9).cast("long"))
        .alias("_w"),
        F.round(1e9 / (F.col("_n") - 1)).cast("long").alias("_inv"))
    st = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_fl").cast("decimal(38,0)").alias("_fls"),
        F.sum("_w").cast("long").alias("_ws"),
        F.sum("_inv").cast("long").alias("_invs"),
        F.sum(F.when(F.col("_s2") <= 0, 1).otherwise(0))
        .cast("long").alias("_bad"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    n, k = F.col("n"), F.col("k")
    ssw = F.col("_fls").cast("double")
    lp = F.round(F.log(ssw / (n - k)) * 1e9).cast("long")
    num = ((n - k) * lp - F.col("_ws")) / 1e9
    invp = F.round(1e9 / (n - k)).cast("long")
    c = 1.0 + ((F.col("_invs") - invp) / 1e9) / (3.0 * (k - 1.0))
    ok = (k > 1) & (n > k) & (ssw > 0) & (F.col("_bad") == 0)
    return st.select(
        "k", "n", F.when(ok, F.round(num / c, 6)).alias("t"))


def grubbs_statistic(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Grubbs' outlier statistic G = max|x - mean| / s — the classic
    single-outlier screen (compare G against the t-based critical
    value for the chosen alpha off-engine; the engine's job is the
    exact statistic over the full column). Values must already be
    exact integers (counts or pre-scaled units).

    Exact arithmetic: max|x - mean| = greatest(max - mean, mean -
    min), so ONE map-side-combined aggregate (n, sum, sumsq as
    DECIMAL(38,0)/HUGEINT, min, max) is the whole scan — no second
    pass, no per-row deviation. Everything after is a fixed-order
    float expression over those exact values, mirrored textually in
    the SQL oracle (orders_grubbs).

    Returns one row (n, g, side): side is 'high' when the max
    deviation is above the mean, 'low' otherwise (ties -> 'high');
    g NULL when n < 3 or the variance degenerates. Empty: 0 rows.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    v = F.col(value_col).cast("long")
    st = (df.where(F.col(value_col).isNotNull())
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(v).cast("long").alias("_s"),
               F.sum(v.cast("decimal(38,0)") * v)
               .cast("decimal(38,0)").alias("_q"),
               F.min(v).alias("_lo"),
               F.max(v).alias("_hi")))
    st = st.where(F.col("n") > 0)
    nd = F.col("n").cast("double")
    mu = F.col("_s").cast("double") / nd
    var = ((F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s") / nd)
           / (nd - 1.0))
    dev_hi = F.col("_hi").cast("double") - mu
    dev_lo = mu - F.col("_lo").cast("double")
    g = F.greatest(dev_hi, dev_lo) / F.sqrt(var)
    ok = (F.col("n") >= 3) & (var > 0)
    return st.select(
        "n",
        F.when(ok, F.round(g, 6)).alias("g"),
        F.when(ok, F.when(dev_hi >= dev_lo, F.lit("high"))
               .otherwise(F.lit("low"))).alias("side"))


def lorenz_curve(
    df: DataFrame,
    key: str,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Lorenz curve table — the distributional view behind
    gini_concentration's scalar: keys ranked ascending by their exact
    total, cut into `n_buckets` equal-population tiles, with each
    tile's cumulative population and value share. The standard
    "bottom 50% of users hold x% of spend" audit. `value_col` must
    already be exact integers (pre-scaled units) so per-key and
    per-tile totals are exact longs.

    Exact arithmetic: per-key totals and per-tile sums are exact
    longs; tiles come from link.global_rank (range repartition +
    P-long offsets, no single-partition window) and the exact
    _ntile_from_rank arithmetic (row-identical to SQL NTILE);
    cumulative tile sums ride prefix.global_cumsum over the
    n_buckets-row frame. Shares are single divisions of exact longs,
    rounded 6.

    Returns n_buckets rows (bucket, n_keys, cum_keys_share,
    cum_value_share), bucket 1 = poorest tile; fewer rows when there
    are fewer keys than buckets. Empty input: 0 rows.

    Scale shape: one key-grouped exchange, one global rank, one
    tile-grouped aggregate of n_buckets rows, then bounded-frame
    scans. The .count() for the ntile arithmetic is one bounded job
    (the rfm_segments precedent).

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from mms_rdf_spark.operators.link import global_rank
    from mms_rdf_spark.operators.prefix import global_cumsum

    per = (df.where(F.col(value_col).isNotNull())
           .groupBy(F.col(key).alias("_k"))
           .agg(F.sum(F.col(value_col).cast("long"))
                .cast("long").alias("_x")))
    cnt = per.count()
    if cnt == 0:
        return per.select(
            F.lit(0).cast("int").alias("bucket"),
            F.lit(0).cast("long").alias("n_keys"),
            F.lit(0.0).alias("cum_keys_share"),
            F.lit(0.0).alias("cum_value_share")).where(F.lit(False))
    ranked = global_rank(per, "_x", "_k")
    tiled = (ranked.select(
        _ntile_from_rank(F.col("rank"), cnt, n_buckets)
        .alias("bucket"), "_x")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
             F.sum("_x").cast("long").alias("_sx")))
    cumv = global_cumsum(tiled, "bucket", "bucket", "_sx") \
        .withColumnRenamed("cum", "_cv")
    cumk = global_cumsum(cumv, "bucket", "bucket", "n_keys") \
        .withColumnRenamed("cum", "_ck")
    tot = tiled.agg(F.sum("n_keys").cast("long").alias("_tk"),
                    F.sum("_sx").cast("long").alias("_tv"))
    return (cumk.crossJoin(F.broadcast(tot))
            .select("bucket", "n_keys",
                    F.round(F.col("_ck") / F.col("_tk"), 6)
                    .alias("cum_keys_share"),
                    F.round(F.col("_cv") / F.col("_tv"), 6)
                    .alias("cum_value_share")))


def anderson_darling_k(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """k-sample Anderson-Darling test (Scholz & Stephens 1987, the
    tie-adjusted midrank version A2akN) — the tail-sensitive sibling
    of ks_statistic: do the k groups share one distribution, with
    extra power in the tails where KS is weakest? Rank-based, so the
    statistic is invariant under any strictly monotone transform of
    the values (pinned in tests).

    A2akN = (N-1)/N * sum_i 1/n_i * sum_j (l_j/N)
            * (N*M_ij - n_i*B_j)^2 / (B_j(N-B_j) - N*l_j/4)
    over the J distinct pooled values, with midrank cumulatives
    M_ij = cumG_ij - l_ij/2 and B_j = cum_j - l_j/2.

    Exact arithmetic: the halves clear by DOUBLING — 2M = 2*cumG -
    l_ij and 2B = 2*cum - l_j are exact longs, the numerator
    num2 = N*2M - n_i*2B (= 2x) and denominator den4 = 2B*(2N-2B) -
    N*l_j (= 4x) are exact longs whose 4s cancel in the ratio; each
    cell's term rounds to integer NANO units so the cross-cell sum
    is order-free, then one final fixed-order expression. Pooled
    cumulatives ride prefix.global_cumsum; the per-group cumulative
    runs over the k x J grid with one window task per group over its
    DISTINCT pooled values — the levene_bf honest trade at few
    groups (the grid is k x |distinct|, never k x rows).

    Returns one row (k, n, a2): a2 NULL when k < 2 or all values
    identical (J = 1 degenerates every denominator). Empty: 0 rows.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).alias("_v")))
    pgv = (s.groupBy("_g", "_v")
           .agg(F.count(F.lit(1)).cast("long").alias("_lij")))
    pooled = pgv.groupBy("_v").agg(F.sum("_lij").cast("long")
                                   .alias("_l"))
    pooledc = global_cumsum(pooled, "_v", "_v", "_l")
    groups = pgv.groupBy("_g").agg(F.sum("_lij").cast("long")
                                   .alias("_ni"))
    tot = pooledc.agg(F.sum("_l").cast("long").alias("_nn"),
                      F.count(F.lit(1)).cast("long").alias("_jj"))
    grid = (pooledc.crossJoin(F.broadcast(groups))
            .join(pgv, on=["_g", "_v"], how="left")
            .select("_g", "_v", "_l", "cum", "_ni",
                    F.coalesce(F.col("_lij"), F.lit(0)).cast("long")
                    .alias("_lij2")))
    wg = (Window.partitionBy("_g").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    grid = (grid.withColumn("_cumg", F.sum("_lij2").over(wg))
            .crossJoin(F.broadcast(tot)))
    nn = F.col("_nn")
    m2 = 2 * F.col("_cumg") - F.col("_lij2")
    b2 = 2 * F.col("cum") - F.col("_l")
    num2 = nn * m2 - F.col("_ni") * b2
    den4 = b2 * (2 * nn - b2) - nn * F.col("_l")
    term = ((num2.cast("double") * num2.cast("double"))
            / den4.cast("double")) \
        * F.col("_l") / (nn * F.col("_ni"))
    cells = grid.select(
        F.when(den4 > 0, F.round(term * 1e9).cast("long"))
        .alias("_t"),
        (den4 <= 0).cast("long").alias("_bad"),
        "_nn", "_jj")
    st = (cells.groupBy("_nn", "_jj")
          .agg(F.sum("_t").cast("long").alias("_ts"),
               F.sum("_bad").cast("long").alias("_nbad")))
    st = (st.crossJoin(F.broadcast(
        groups.agg(F.count(F.lit(1)).cast("long").alias("k"))))
        .where(F.col("_nn").isNotNull() & (F.col("_nn") > 0)))
    nnd = F.col("_nn").cast("double")
    a2 = ((nnd - 1.0) / nnd) * (F.col("_ts") / 1e9)
    ok = (F.col("k") > 1) & (F.col("_jj") > 1) & (F.col("_nbad") == 0)
    return st.select(
        "k", F.col("_nn").alias("n"),
        F.when(ok, F.round(a2, 6)).alias("a2"))


def mood_median_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mood's median test across k groups — the bluntest, most
    outlier-proof location test (kruskal_wallis's poor relation, but
    valid under arbitrary group-specific tail shapes): classify every
    value as above / not-above the GRAND median and chi-square the
    resulting 2 x k contingency table.

    Semantics: the grand median is the exact LOWER median (the
    levene_bf convention); values equal to it count as "not above".

    Exact arithmetic: the distinct-value frame's inclusive global
    cumsum (prefix.global_cumsum) locates the median; per-group
    (above, total) counts are exact longs; each group's chi-square
    contribution is a fixed-order float over exact longs rounded to
    integer MICRO units so the cross-group sum is order-free; one
    final division each for the expected counts, mirrored textually
    in SQL.

    Returns one row (k, n, median, chi2, dof): chi2 NULL when k < 2
    or the median is extreme (a margin empty). Empty input: 0 rows.

    Scale shape: one distinct-value aggregate + distributed scan for
    the median, one k-row group aggregate, a 1-row fold.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).alias("_v")))
    pv = s.groupBy("_v").agg(F.count(F.lit(1)).cast("long")
                             .alias("_cnt"))
    cum = global_cumsum(pv, "_v", "_v", "_cnt")
    tot = cum.agg(F.sum("_cnt").cast("long").alias("_nn"))
    med = (cum.crossJoin(F.broadcast(tot))
           .where(F.col("cum")
                  >= F.floor((F.col("_nn") + 1) / F.lit(2.0)))
           .agg(F.min("_v").alias("_m")))
    per = (s.crossJoin(F.broadcast(med))
           .groupBy("_g")
           .agg(F.count(F.lit(1)).cast("long").alias("_ni"),
                F.sum((F.col("_v") > F.col("_m")).cast("long"))
                .cast("long").alias("_ai")))
    marg = per.agg(F.sum("_ni").cast("long").alias("_nn"),
                   F.sum("_ai").cast("long").alias("_aa"))
    j = per.crossJoin(F.broadcast(marg)).crossJoin(F.broadcast(med))
    nnd = F.col("_nn").cast("double")
    ea = F.col("_ni") * F.col("_aa") / nnd
    eb = F.col("_ni") * (F.col("_nn") - F.col("_aa")) / nnd
    da = F.col("_ai").cast("double") - ea
    db = (F.col("_ni") - F.col("_ai")).cast("double") - eb
    t = da * da / ea + db * db / eb
    healthy = (F.col("_aa") > 0) & (F.col("_aa") < F.col("_nn"))
    st = (j.groupBy("_nn", "_aa", "_m")
          .agg(F.count(F.lit(1)).cast("long").alias("k"),
               F.sum(F.when(healthy,
                            F.round(t * 1e6).cast("long")))
               .cast("long").alias("_tm")))
    st = st.where(F.col("_nn").isNotNull() & (F.col("_nn") > 0))
    ok = ((F.col("k") > 1) & (F.col("_aa") > 0)
          & (F.col("_aa") < F.col("_nn")))
    return st.select(
        "k", F.col("_nn").alias("n"), F.col("_m").alias("median"),
        F.when(ok, F.round(F.col("_tm") / 1e6, 6)).alias("chi2"),
        F.when(ok, (F.col("k") - 1).cast("long")).alias("dof"))


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Cliff's delta — the non-parametric EFFECT SIZE companion to
    mann_whitney_u's significance: P(a > b) - P(a < b) in [-1, 1]
    (|0.147| small / |0.33| medium / |0.474| large by Romano's rule
    of thumb). Significance without magnitude is how trivially-true
    A/B differences ship; this is the magnitude.

    delta = 2*U_A/(n_a*n_b) - 1 with the half-tie U, so it composes
    EXACTLY over mann_whitney_u's doubled rank sums: u_a is an
    integer-or-half value carried exactly in double (mann_whitney_u
    rounds at 6dp, the identity for .0/.5 values), and delta is one
    fixed-order division mirrored in SQL.

    Returns one row (n_a, n_b, delta); delta NULL when either group
    is empty.
    """
    mw = mann_whitney_u(df, group_col, value_col, group_a, group_b)
    prod = F.col("n_a") * F.col("n_b")
    return mw.select(
        "n_a", "n_b",
        F.when(prod > 0,
               F.round((2 * F.col("u_a") - prod) / prod, 6))
        .alias("delta"))


def powerlaw_alpha(
    df: DataFrame,
    value_col: str,
    d_min: int = 5,
) -> DataFrame:
    """Discrete power-law exponent by the Hill / continuous MLE
    approximation (Clauset, Shalizi & Newman 2009 eq. 3.1):
    alpha = 1 + n / sum(ln(d_i / (d_min - 1/2))) over the tail
    d_i >= d_min — the standard heavy-tail diagnostic for degree and
    activity distributions (is this graph/user base scale-free, and
    how heavy is the tail?). Values must be positive integers
    (degrees, counts).

    Exact arithmetic: one map-side-combined aggregate collapses the
    corpus to the (distinct value, count) frame — ln runs once per
    DISTINCT value, rounded to integer NANO units, so the tail sum
    sum(cnt * (ln_d - ln_dmin)) is an exact long and order-free; one
    fixed-order finale mirrored textually in SQL. The standard error
    (alpha - 1)/sqrt(n) rides along.

    Returns one row (n_tail, d_min, alpha, se); alpha NULL when the
    tail is empty or degenerate (all tail values at d_min with zero
    log sum). Empty input: 0 rows.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    import math

    lm = F.lit(int(round(math.log(d_min - 0.5) * 1e9)))
    v = F.col(value_col).cast("long")
    per = (df.where(v.isNotNull() & (v > 0))
           .groupBy(v.alias("_d"))
           .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    tail = per.where(F.col("_d") >= d_min)
    st = tail.agg(
        F.sum("_cnt").cast("long").alias("n_tail"),
        F.sum(F.col("_cnt")
              * (F.round(F.log(F.col("_d")) * 1e9).cast("long") - lm))
        .cast("long").alias("_ls"))
    st = st.where(F.col("n_tail").isNotNull() & (F.col("n_tail") > 0))
    alpha = 1.0 + F.col("n_tail") / (F.col("_ls") / 1e9)
    ok = F.col("_ls") > 0
    return st.select(
        "n_tail", F.lit(d_min).cast("int").alias("d_min"),
        F.when(ok, F.round(alpha, 6)).alias("alpha"),
        F.when(ok, F.round((alpha - 1.0)
                           / F.sqrt(F.col("n_tail").cast("double")),
                           6)).alias("se"))


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
    order: list,
) -> DataFrame:
    """Page's L trend test (Page 1963) — friedman_test's ORDERED
    alternative: with treatments in a pre-specified order (doses,
    days, model sizes), is the response monotonically increasing
    along it? Far more powerful than Friedman when the order is the
    hypothesis. `order` lists the treatments in hypothesized
    ascending order; blocks must be complete (the Friedman
    convention), and treatments outside `order` raise.

    L = sum_j pos_j * R_j over per-treatment rank sums. Exact
    arithmetic: within-block tie-averaged ranks ride DOUBLED (the
    friedman recipe), so 2L, the scaled mean b*k*(k+1)^2 (= 4E[L])
    and the conditional tie-adjusted variance pieces are all exact
    longs: Var(2L) = k(k^2-1)/12(k-1) * sum_i S_i with per-block
    S_i = sum_j (2r_ij)^2 - k(k+1)^2 (zero when the whole block
    ties). One final division + sqrt, mirrored textually in SQL.

    Returns one row (k, b, l, z): z NULL when k < 2 or the variance
    degenerates (every block fully tied). Empty / no complete
    blocks: 0 rows.

    Scale shape: friedman_test's — bounded within-block windows, one
    treatment fold, 1-row finales.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    from pyspark.sql.window import Window

    k_lit = len(order)
    pos = df.sparkSession.createDataFrame(
        [(t, i + 1) for i, t in enumerate(order)], "_g string, _c int")
    s = df.select(F.col(block_col).alias("_b"),
                  F.col(treat_col).cast("string").alias("_g"),
                  F.col(value_col).cast("long").alias("_v"))
    extra = s.join(F.broadcast(pos), on="_g", how="left_anti")
    if extra.take(1):
        raise ValueError("page_trend_test: treatments outside "
                         "`order` present")
    bs = (s.groupBy("_b")
          .agg(F.count(F.lit(1)).cast("long").alias("_cb"),
               F.countDistinct("_g").cast("long").alias("_gb")))
    complete = (bs.where((F.col("_cb") == k_lit)
                         & (F.col("_gb") == k_lit))
                .select("_b"))
    f = s.join(complete, on="_b", how="left_semi")
    pv = (f.groupBy("_b", "_v")
          .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    w_blk = (Window.partitionBy("_b").orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, 0))
    pv = pv.withColumn("_cum", F.sum("_cnt").over(w_blk)) \
        .select("_b", "_v",
                (2 * (F.col("_cum") - F.col("_cnt"))
                 + F.col("_cnt") + 1).cast("long").alias("_r2"))
    ranked = f.join(pv, on=["_b", "_v"]).join(F.broadcast(pos),
                                              on="_g")
    st = ranked.agg(
        F.sum(F.col("_c") * F.col("_r2")).cast("long").alias("_l2"),
        F.sum(F.col("_r2") * F.col("_r2")).cast("long").alias("_a2"))
    bcnt = complete.agg(F.count(F.lit(1)).cast("long").alias("b"))
    j = st.crossJoin(F.broadcast(bcnt)).where(F.col("b") > 0)
    k = F.lit(k_lit).cast("long")
    b = F.col("b")
    e4 = b * k * (k + 1) * (k + 1)
    ss = F.col("_a2") - e4  # sum_i S_i, since sum_i k(k+1)^2 = e4
    var12 = k * (k * k - 1) * ss  # 12(k-1) * Var(2L)
    z = ((F.col("_l2") - e4 / F.lit(2.0))
         / F.sqrt(var12 / (12.0 * (k - F.lit(1.0)))))
    ok = (k > 1) & (var12 > 0)
    return j.select(
        k.cast("long").alias("k"), "b",
        F.round(F.col("_l2") / 2.0, 6).alias("l"),
        F.when(ok, F.round(z, 6)).alias("z"))


def forecast_accuracy(
    series: DataFrame,
    t_col: str,
    y_col: str,
    season_s: int,
    step_s: int,
) -> DataFrame:
    """Forecast-accuracy table for the SEASONAL-NAIVE forecast
    (y_hat_t = y_{t-season}) against the one-step-naive baseline —
    the standard sanity floor every real forecaster must beat, and
    the denominator convention behind MASE (Hyndman & Koehler 2006).
    Input is a regular integer-valued series (t in epoch seconds on
    a `step_s` grid, y exact integer counts/units).

    Metrics over the timestamps where BOTH forecast and actual
    exist: MAE, RMSE, MAPE (zero-actual points excluded, the
    standard caveat), and MASE = MAE_forecast / MAE_naive1 with the
    baseline MAE over its own valid points.

    Exact arithmetic: lags come from EQUI-JOINS on t - season_s /
    t - step_s (no single-partition window over the series); |e|,
    e^2 sums are exact longs/DECIMAL(38,0); per-point MAPE terms
    round to integer NANO units so the sum is order-free. One
    division each at the finale, mirrored textually in SQL.

    Returns one row (n_points, mae, rmse, mape, mase): mase NULL
    when the baseline error is zero; mape NULL when every actual is
    zero. Empty overlap: 0 rows.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    s = series.select(F.col(t_col).cast("long").alias("_t"),
                      F.col(y_col).cast("long").alias("_y"))
    f = s.select((F.col("_t") + season_s).alias("_t"),
                 F.col("_y").alias("_f"))
    b = s.select((F.col("_t") + step_s).alias("_t"),
                 F.col("_y").alias("_b"))
    jf = s.join(f, on="_t")
    e = F.abs(F.col("_y") - F.col("_f"))
    stf = jf.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(e).cast("long").alias("_ae"),
        F.sum(e.cast("decimal(38,0)") * e).cast("decimal(38,0)")
        .alias("_se"),
        F.sum(F.when(F.col("_y") != 0,
                     F.round(e / F.abs(F.col("_y")) * 1e9)
                     .cast("long"))).cast("long").alias("_pe"),
        F.sum(F.when(F.col("_y") != 0, 1).otherwise(0))
        .cast("long").alias("_np"))
    stb = (s.join(b, on="_t")
           .agg(F.count(F.lit(1)).cast("long").alias("_nb"),
                F.sum(F.abs(F.col("_y") - F.col("_b")))
                .cast("long").alias("_ab")))
    j = stf.crossJoin(F.broadcast(stb))
    j = j.where(F.col("n_points").isNotNull()
                & (F.col("n_points") > 0))
    n = F.col("n_points")
    mae = F.col("_ae") / n
    rmse = F.sqrt(F.col("_se").cast("double") / n)
    mape = F.col("_pe") / 1e9 / F.col("_np")
    mase_den = F.col("_ab") / F.col("_nb")
    ok_b = (F.col("_nb") > 0) & (F.col("_ab") > 0)
    return j.select(
        "n_points",
        F.round(mae, 6).alias("mae"),
        F.round(rmse, 6).alias("rmse"),
        F.when(F.col("_np") > 0, F.round(mape, 6)).alias("mape"),
        F.when(ok_b, F.round(mae / mase_den, 6)).alias("mase"))


def theils_u(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil's U (uncertainty coefficient) U(X|Y) — the ASYMMETRIC
    categorical-association measure: what fraction of X's entropy
    does knowing Y remove? Complements chi_square_cells / Cramer's V
    (symmetric, magnitude-blind) for feature-leak audits ("does the
    hour of day determine the event type?"), where direction
    matters.

    U = (H(X) - H(X|Y)) / H(X), and with counts every entropy
    collapses to count-log sums: H(X) = ln N - S_x/N and
    H(X|Y) = (S_y - S_xy)/N with S_* = sum(n ln n). Exact
    arithmetic: each ln rounds to integer NANO units once per
    distinct cell/margin, giving exact longs A = N*LN - (S_x + S_y
    - S_xy) and D = N*LN - S_x, so U = A/D is ONE division of exact
    integers — no float sums anywhere. Rows with NULL in either
    column are excluded.

    Returns one row (n, h_x, h_x_given_y, u): u NULL when X is
    constant (H(X) = 0). Empty: 0 rows.

    Scale shape: one (x,y) cell aggregate (map-side combined), two
    margin re-aggregates of the cell table, a 1-row fold.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference analytics suite.
    """
    s = (df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
         .select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y")))
    cells = s.groupBy("_x", "_y").agg(F.count(F.lit(1)).cast("long")
                                      .alias("_n"))

    def _s(dfc, name):
        return dfc.agg(
            F.sum("_n").cast("long").alias(f"_n{name}"),
            F.sum(F.col("_n")
                  * F.round(F.log("_n") * 1e9).cast("long"))
            .cast("long").alias(f"_s{name}"))

    sxy = _s(cells, "xy")
    sx = _s(cells.groupBy("_x").agg(F.sum("_n").cast("long")
                                    .alias("_n")), "x")
    sy = _s(cells.groupBy("_y").agg(F.sum("_n").cast("long")
                                    .alias("_n")), "y")
    j = (sxy.crossJoin(F.broadcast(sx)).crossJoin(F.broadcast(sy))
         .where(F.col("_nxy").isNotNull() & (F.col("_nxy") > 0)))
    n = F.col("_nxy")
    ln_nano = F.round(F.log(n) * 1e9).cast("long")
    a = n * ln_nano - (F.col("_sx") + F.col("_sy") - F.col("_sxy"))
    d = n * ln_nano - F.col("_sx")
    return j.select(
        n.alias("n"),
        F.round(d / (n * 1e9), 6).alias("h_x"),
        F.round((F.col("_sy") - F.col("_sxy")) / (n * 1e9), 6)
        .alias("h_x_given_y"),
        F.when(d > 0, F.round(a / d, 6)).alias("u"))


def wilson_rates(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Per-group binomial rate with the Wilson score interval — the
    interval that stays sane at small n and extreme rates (where the
    naive Wald p +/- z*sqrt(pq/n) collapses), i.e. what ab_test_zstats
    should be read with: per arm, (n, successes, rate, lo, hi).

    center = (p + z^2/2n) / (1 + z^2/n),
    halfwidth = z * sqrt(pq/n + z^2/4n^2) / (1 + z^2/n).

    Exact arithmetic: one conditional aggregate gives exact (n, s)
    per group; everything after is a per-group fixed-order float
    expression over those two longs (no cross-row float sums),
    mirrored textually in SQL. `success_col` must be 0/1 integers.

    Returns one row per group (group, n, successes, rate, lo, hi),
    all rates rounded 6; groups with n = 0 cannot occur (groupBy).

    Reference provenance: no analog in the reference; beyond-
    reference analytics suite.
    """
    s = df.select(F.col(group_col).alias("grp"),
                  F.col(success_col).cast("long").alias("_s"))
    per = (s.where(F.col("_s").isNotNull())
           .groupBy("grp")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_s").cast("long").alias("successes")))
    nd = F.col("n").cast("double")
    p = F.col("successes") / nd
    z2 = z * z
    denom = 1.0 + z2 / nd
    center = (p + z2 / (2.0 * nd)) / denom
    half = (z * F.sqrt(p * (1.0 - p) / nd
                       + z2 / (4.0 * nd * nd))) / denom
    return per.select(
        "grp", "n", "successes",
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("lo"),
        F.round(center + half, 6).alias("hi"))


def hurst_exponent(
    series: DataFrame,
    t_col: str,
    y_col: str,
    step_s: int,
    scales: tuple = (1, 2, 4, 8, 16, 32),
) -> DataFrame:
    """Hurst exponent by the aggregated-variance method (Beran 1994
    / Taqqu, Teverovsky & Willinger 1995): long-range dependence of
    a regular integer series. For each block size m, average the
    series over calendar-aligned blocks of m points and take the
    sample variance of the block means; Var(m) ~ m^(2H-2), so H =
    1 + slope/2 of the log-log fit. H ~ 0.5 = short memory, -> 1 =
    persistent (bursty load that stays bursty at every aggregation
    level — the capacity-planning signal).

    Exact arithmetic: per (scale, block) sums are exact longs;
    incomplete blocks are EXCLUDED; each scale's variance numerator
    e = n*S2 - S^2 rides DECIMAL(38,0)/HUGEINT; ln(v) and ln(m)
    round to integer NANO units and the tiny (<= |scales|-point)
    log-log OLS uses the heaps_fit moment recipe. Scales with
    fewer than 2 complete blocks or zero variance drop out.

    Returns one row (n_scales, slope, hurst): NULL when fewer than
    2 usable scales remain. Empty: 0 rows.

    Scale shape: one crossJoin with the |scales|-row broadcast, one
    (scale, block) aggregate, one scale aggregate, a bounded fold.

    Reference provenance: no analog in the reference; beyond-
    reference analytics suite.
    """
    spark = series.sparkSession
    ms = spark.createDataFrame([(int(m),) for m in scales], "m int")
    s = series.select(F.col(t_col).cast("long").alias("_t"),
                      F.col(y_col).cast("long").alias("_y"))
    g = (s.crossJoin(F.broadcast(ms))
         .groupBy("m", F.floor(F.col("_t") / (F.col("m") * step_s))
                  .alias("_blk"))
         .agg(F.count(F.lit(1)).cast("long").alias("_c"),
              F.sum("_y").cast("long").alias("_s")))
    per = (g.where(F.col("_c") == F.col("m"))
           .groupBy("m")
           .agg(F.count(F.lit(1)).cast("long").alias("_nb"),
                F.sum("_s").cast("long").alias("_ss"),
                F.sum(F.col("_s").cast("decimal(38,0)")
                      * F.col("_s")).cast("decimal(38,0)")
                .alias("_s2")))
    per = per.where(F.col("_nb") >= 2)
    nb = F.col("_nb").cast("double")
    e = (F.col("_nb").cast("decimal(38,0)") * F.col("_s2")
         - F.col("_ss").cast("decimal(38,0)") * F.col("_ss"))
    v = (e.cast("double") / (nb * (nb - 1.0))
         / (F.col("m").cast("double") * F.col("m")))
    pts = (per.select(
        F.round(F.log(F.col("m")) * 1e9).cast("long").alias("_x"),
        F.when(v > 0, F.round(F.log(v) * 1e9).cast("long"))
        .alias("_y"))
        .where(F.col("_y").isNotNull()))
    st = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_scales"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_x"))
        .cast("decimal(38,0)").alias("_sxx"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_y"))
        .cast("decimal(38,0)").alias("_sxy"))
    st = st.where(F.col("n_scales").isNotNull()
                  & (F.col("n_scales") > 0))
    nd = F.col("n_scales").cast("double")
    sxd = F.col("_sx").cast("double")
    syd = F.col("_sy").cast("double")
    num = nd * F.col("_sxy").cast("double") - sxd * syd
    den = nd * F.col("_sxx").cast("double") - sxd * sxd
    slope = F.round(num / den, 6)
    ok = (F.col("n_scales") > 1) & (den > 0)
    return st.select(
        "n_scales",
        F.when(ok, slope).alias("slope"),
        F.when(ok, F.round(1.0 + slope / 2.0, 6)).alias("hurst"))


def spectral_power(
    series: DataFrame,
    t_col: str,
    y_col: str,
    step_s: int,
    periods: tuple = (6, 12, 24, 48),
) -> DataFrame:
    """Mean-centered spectral power of a regular integer series at
    FIXED candidate periods (in steps) — the "which cycle dominates,
    daily or weekly?" probe (a Goertzel-style single-bin DFT per
    candidate, not an FFT): P = |sum_t y'_t e^{-2pi i t/T}|^2 / N.

    Cross-engine exactness trick: the only transcendentals are
    cos/sin at T distinct phases per period, so they are computed
    ONCE in PYTHON as integer NANO literals and joined as a
    broadcast table — both engines multiply identical integers, no
    engine trig, no float sums. Mean-centering is algebraic:
    N*y - Sy replaces y - mean, keeping every sum an exact
    long/DECIMAL; two squares and one division at the finale.

    Returns one row per period (period_steps, power), power rounded
    6 and in y-units^2 (comparable across the table; argmax = the
    dominant cycle). Empty: 0 rows.

    Scale shape: one broadcast phase-table join per row (|periods| x
    T literal rows), one per-period aggregate.

    Reference provenance: no analog in the reference; beyond-
    reference analytics suite.
    """
    import math

    spark = series.sparkSession
    rows = []
    for p in periods:
        for ph in range(p):
            th = 2.0 * math.pi * ph / p
            rows.append((int(p), int(ph),
                         int(round(math.cos(th) * 1e9)),
                         int(round(math.sin(th) * 1e9))))
    tab = spark.createDataFrame(
        rows, "p int, ph int, c long, s long")
    sv = series.select(F.col(t_col).cast("long").alias("_t"),
                       F.col(y_col).cast("long").alias("_y"))
    ps = spark.createDataFrame([(int(p),) for p in periods], "p int")
    j = (sv.crossJoin(F.broadcast(ps))
         .withColumn("ph", F.pmod(F.floor(F.col("_t") / step_s),
                                  F.col("p")).cast("int"))
         .join(F.broadcast(tab), on=["p", "ph"]))
    per = j.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_y") * F.col("c")).cast("decimal(38,0)")
        .alias("_sc"),
        F.sum(F.col("_y") * F.col("s")).cast("decimal(38,0)")
        .alias("_ss"),
        F.sum("c").cast("long").alias("_tc"),
        F.sum("s").cast("long").alias("_ts"))
    nd = F.col("_n").cast("double")
    a = ((F.col("_n").cast("decimal(38,0)") * F.col("_sc")
          - F.col("_sy").cast("decimal(38,0)") * F.col("_tc"))
         .cast("double") / (nd * 1e9))
    b = ((F.col("_n").cast("decimal(38,0)") * F.col("_ss")
          - F.col("_sy").cast("decimal(38,0)") * F.col("_ts"))
         .cast("double") / (nd * 1e9))
    return per.select(
        F.col("p").alias("period_steps"),
        F.round((a * a + b * b) / nd, 6).alias("power"))


def _survival_cells(durations, group_col, duration_col, event_col):
    """Shared per-event-time confusion cells for two-sample survival
    tests (logrank_test, gehan_test): (cells with _na/_nb at risk and
    _da/_db events per _t, names 1-row frame, groups 2-row frame)."""
    from pyspark.sql.window import Window

    s = (durations
         .where(F.col(duration_col).isNotNull()
                & F.col(event_col).isNotNull())
         .select(F.col(group_col).cast("string").alias("_g"),
                 F.col(duration_col).cast("long").alias("_t"),
                 F.col(event_col).cast("long").alias("_e")))
    n_groups = s.select("_g").distinct().count()
    if n_groups > 2:
        raise ValueError("logrank_test: exactly two groups expected")
    pgt = (s.groupBy("_g", "_t")
           .agg(F.count(F.lit(1)).cast("long").alias("_m"),
                F.sum("_e").cast("long").alias("_d")))
    times = pgt.select("_t").distinct()
    groups = (pgt.groupBy("_g")
              .agg(F.sum("_m").cast("long").alias("_tot")))
    grid = (times.crossJoin(F.broadcast(groups))
            .join(pgt, on=["_g", "_t"], how="left")
            .select("_g", "_t", "_tot",
                    F.coalesce(F.col("_m"), F.lit(0)).cast("long")
                    .alias("_m2"),
                    F.coalesce(F.col("_d"), F.lit(0)).cast("long")
                    .alias("_d2")))
    wg = (Window.partitionBy("_g").orderBy("_t")
          .rowsBetween(Window.unboundedPreceding, 0))
    grid = grid.withColumn(
        "_atrisk",
        F.col("_tot") - (F.sum("_m2").over(wg) - F.col("_m2")))
    names = groups.agg(F.min("_g").alias("group_a"),
                       F.max("_g").alias("group_b"))
    grid = (grid.crossJoin(F.broadcast(names))
            .withColumn("_isa", F.col("_g") == F.col("group_a")))
    cells = (grid.groupBy("_t")
             .agg(F.sum(F.when(F.col("_isa"), F.col("_atrisk"))
                        .otherwise(0)).cast("long").alias("_na"),
                  F.sum(F.when(~F.col("_isa"), F.col("_atrisk"))
                        .otherwise(0)).cast("long").alias("_nb"),
                  F.sum(F.when(F.col("_isa"), F.col("_d2"))
                        .otherwise(0)).cast("long").alias("_da"),
                  F.sum(F.when(~F.col("_isa"), F.col("_d2"))
                        .otherwise(0)).cast("long").alias("_db")))
    return cells, names, groups


def logrank_test(
    durations: DataFrame,
    group_col: str,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test — kaplan_meier's
    inferential companion: do two groups share one survival curve,
    with right-censoring handled exactly like the KM estimator
    (censored rows leave the risk set, never count as events)?
    Input rows are (group, duration, event 0/1); exactly two
    distinct groups (more raise).

    At each pooled distinct time with >= 1 event: n_gj at risk,
    d_gj events; O_a = sum d_a, E_a = sum d * n_a/n, V = sum
    d * (n_a/n)(n_b/n)(n-d)/(n-1); z = (O_a - E_a)/sqrt(V),
    chi2 = z^2.

    Exact arithmetic: at-risk counts come from TOTAL minus the
    within-group cumulative over the pooled time grid (one window
    task per group over the DISTINCT pooled times — the levene_bf /
    anderson_darling_k honest trade at 2 groups); every count is an
    exact long; each time's E and V terms round to integer NANO
    units so the cross-time sums are order-free; one division +
    sqrt at the end, mirrored textually in SQL. Groups are ordered
    lexically: group_a = the smaller label.

    Returns one row (group_a, group_b, n_a, n_b, o_a, e_a, chi2,
    z): NULL stats when V degenerates. Empty: 0 rows.

    Reference provenance: no analog in the reference; beyond-
    reference analytics suite.
    """
    cells, names, groups = _survival_cells(
        durations, group_col, duration_col, event_col)
    n = F.col("_na") + F.col("_nb")
    d = F.col("_da") + F.col("_db")
    e_term = d * F.col("_na") / n
    v_term = (d.cast("double") * F.col("_na") / n
              * F.col("_nb") / n
              * (n - d) / (n - 1))
    contrib = cells.where(d > 0).select(
        F.col("_da"),
        F.round(e_term * 1e9).cast("long").alias("_en"),
        F.when(n > 1, F.round(v_term * 1e9).cast("long"))
        .otherwise(F.lit(0)).alias("_vn"))
    st = contrib.agg(
        F.sum("_da").cast("long").alias("_oa"),
        F.sum("_en").cast("long").alias("_es"),
        F.sum("_vn").cast("long").alias("_vs"))
    ta = (groups.crossJoin(F.broadcast(names))
          .agg(F.sum(F.when(F.col("_g") == F.col("group_a"),
                            F.col("_tot"))).cast("long").alias("n_a"),
               F.sum(F.when(F.col("_g") == F.col("group_b"),
                            F.col("_tot"))).cast("long")
               .alias("n_b")))
    j = (st.crossJoin(F.broadcast(names)).crossJoin(F.broadcast(ta))
         .where(F.col("_oa").isNotNull()))
    z = (F.col("_oa") - F.col("_es") / 1e9) \
        / F.sqrt(F.col("_vs") / 1e9)
    ok = F.col("_vs") > 0
    return j.select(
        "group_a", "group_b", "n_a", "n_b",
        F.col("_oa").alias("o_a"),
        F.round(F.col("_es") / 1e9, 6).alias("e_a"),
        F.when(ok, F.round(z * z, 6)).alias("chi2"),
        F.when(ok, F.round(z, 6)).alias("z"))


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    unit: int = 100,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between two
    groups' value distributions — the drift metric that, unlike PSI
    or KS, weighs HOW FAR mass moved, in the value's own units:
    W1 = integral |F_a(x) - F_b(x)| dx over the pooled support.
    Values ride as integer `unit`ths (cents by default).

    Exact arithmetic end-to-end: per distinct value, (n_a, n_b)
    counts; inclusive cumsums via prefix.global_cumsum; consecutive
    support gaps dv from a rank equi-join (global_rank + rank+1 —
    no single-partition lead window); each segment contributes
    |C_a*N_b - C_b*N_a| * dv as an exact DECIMAL(38,0)/HUGEINT, and
    the ONLY division is the final /(N_a*N_b) (then /unit back to
    value units).

    Returns one row (n_a, n_b, w1), w1 rounded 6 in original value
    units; 0 rows when either group is empty.

    Scale shape: one distinct-value aggregate, two distributed
    scans, one rank equi-join, a 1-row fold.

    Reference provenance: no analog in the reference; beyond-
    reference analytics suite.
    """
    from mms_rdf_spark.operators.link import global_rank
    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(group_col).isin([group_a, group_b])
                  & F.col(value_col).isNotNull())
         .select((F.col(group_col) == group_a).cast("long")
                 .alias("_isa"),
                 F.round(F.col(value_col) * unit).cast("long")
                 .alias("_v")))
    per = (s.groupBy("_v")
           .agg(F.sum("_isa").cast("long").alias("_na"),
                F.sum(1 - F.col("_isa")).cast("long").alias("_nb")))
    ca = global_cumsum(per, "_v", "_v", "_na") \
        .withColumnRenamed("cum", "_ca")
    cb = global_cumsum(ca, "_v", "_v", "_nb") \
        .withColumnRenamed("cum", "_cb")
    ranked = global_rank(cb, "_v", "_v")
    nxt = ranked.select((F.col("rank") - 1).alias("rank"),
                        F.col("_v").alias("_vn"))
    seg = ranked.join(nxt, on="rank")
    tot = per.agg(F.sum("_na").cast("long").alias("_ta"),
                  F.sum("_nb").cast("long").alias("_tb"))
    seg = seg.crossJoin(F.broadcast(tot))
    contrib = (F.abs(F.col("_ca") * F.col("_tb")
                     - F.col("_cb") * F.col("_ta"))
               .cast("decimal(38,0)")
               * (F.col("_vn") - F.col("_v")))
    wsum = seg.agg(F.sum(contrib).cast("decimal(38,0)").alias("_w"))
    st = (tot.crossJoin(F.broadcast(wsum))
          .select(F.col("_ta").alias("n_a"),
                  F.col("_tb").alias("n_b"), "_w")
          .where(F.col("n_a").isNotNull() & (F.col("n_a") > 0)
                 & (F.col("n_b") > 0)))
    w1 = (F.coalesce(F.col("_w").cast("double"), F.lit(0.0))
          / (F.col("n_a").cast("double") * F.col("n_b"))
          / unit)
    return st.select("n_a", "n_b", F.round(w1, 6).alias("w1"))


def normal_sf(z) -> Column:
    """Standard-normal survival function 1 - Phi(z) by the
    Abramowitz & Stegun 26.2.17 polynomial (|error| < 7.5e-8) —
    turns any of the suite's z statistics into a p-value without
    SciPy. Column-in, Column-out; fixed-order arithmetic with ONE
    engine transcendental (exp), safe under the suite's 6dp output
    rounding. `normal_sf_sql(expr)` emits the textually identical
    SQL for oracles.
    """
    z = z.cast("double")
    x = F.abs(z)
    k = 1.0 / (1.0 + 0.2316419 * x)
    poly = (k * (0.319381530
                 + k * (-0.356563782
                        + k * (1.781477937
                               + k * (-1.821255978
                                      + k * 1.330274429)))))
    pdf = F.exp(-(x * x) / 2.0) / 2.5066282746310002
    upper = pdf * poly
    return F.when(z >= 0, upper).otherwise(1.0 - upper)


def normal_sf_sql(expr: str) -> str:
    """SQL mirror of normal_sf for a z expression string."""
    x = f"abs(CAST({expr} AS DOUBLE))"
    k = f"(1.0 / (1.0 + 0.2316419 * {x}))"
    poly = (f"({k} * (0.319381530 + {k} * (-0.356563782 + {k} * "
            f"(1.781477937 + {k} * (-1.821255978 + {k} * "
            f"1.330274429)))))")
    pdf = f"(exp(-({x} * {x}) / 2.0) / 2.5066282746310002)"
    upper = f"({pdf} * {poly})"
    return (f"(CASE WHEN CAST({expr} AS DOUBLE) >= 0 THEN {upper} "
            f"ELSE 1.0 - {upper} END)")


def chi2_sf(x, dof: int) -> Column:
    """Chi-square survival function P(X > x) for small INTEGER dof,
    in closed form (no SciPy, no incomplete-gamma routine): even dof
    is the finite Poisson sum e^{-x/2} sum (x/2)^i / i!, odd dof
    adds 2*normal_sf(sqrt(x)) plus half-integer-gamma terms whose
    coefficients are computed ONCE in Python and emitted as
    literals. Powers build by repeated multiplication (fixed-order,
    engine-mirrorable); the only engine transcendentals are exp/sqrt
    (+ normal_sf's exp for odd dof). `chi2_sf_sql` emits the
    textually identical SQL.
    """
    import math

    if not 1 <= dof <= 64:
        raise ValueError("chi2_sf: 1 <= dof <= 64")
    x = x.cast("double")
    h = x / 2.0
    if dof % 2 == 0:
        m = dof // 2
        acc = F.lit(0.0)
        term = F.lit(1.0)
        for i in range(m):
            if i > 0:
                term = term * h / float(i)
            acc = acc + term
        return F.exp(-h) * acc
    m = (dof - 1) // 2
    out = 2.0 * normal_sf(F.sqrt(x))
    if m > 0:
        sq = F.sqrt(h)
        pw = sq  # (x/2)^{i-1/2} at i=1
        for i in range(1, m + 1):
            if i > 1:
                pw = pw * h
            g = math.gamma(i + 0.5)
            out = out + F.exp(-h) * pw * F.lit(1.0 / g)
    return out


def chi2_sf_sql(expr: str, dof: int) -> str:
    """SQL mirror of chi2_sf for an x expression string."""
    import math

    if not 1 <= dof <= 64:
        raise ValueError("chi2_sf_sql: 1 <= dof <= 64")
    h = f"(CAST({expr} AS DOUBLE) / 2.0)"
    if dof % 2 == 0:
        m = dof // 2
        acc = None
        term = "1.0"
        for i in range(m):
            if i > 0:
                term = f"({term} * {h} / {float(i)!r})"
            acc = term if acc is None else f"({acc} + {term})"
        return f"(exp(-{h}) * {acc})"
    m = (dof - 1) // 2
    out = (f"(2.0 * "
           f"{normal_sf_sql(f'sqrt(CAST({expr} AS DOUBLE))')})")
    pw = f"sqrt({h})"
    for i in range(1, m + 1):
        if i > 1:
            pw = f"({pw} * {h})"
        g = 1.0 / math.gamma(i + 0.5)
        out = f"({out} + (exp(-{h}) * {pw} * {g!r}))"
    return out


_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)
_ACKLAM_PLOW = 0.02425


def normal_ppf(p) -> Column:
    """Inverse standard-normal CDF by Acklam's rational
    approximation (|relative error| < 1.15e-9) — the quantile
    counterpart of normal_sf, unlocking normal-scores statistics
    (Fligner-Killeen, van der Waerden) fully in-engine. Column-in,
    Column-out; engine transcendentals are ln and sqrt only, every
    coefficient a shared Python literal; `normal_ppf_sql` emits the
    textually identical SQL. p must lie in (0, 1) — endpoints return
    NULL (ln(0) degenerates)."""
    p = p.cast("double")
    a, b = _ACKLAM_A, _ACKLAM_B
    c, d = _ACKLAM_C, _ACKLAM_D

    def central(pp):
        q = pp - 0.5
        r = q * q
        num = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                + a[4]) * r + a[5]) * q
        den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
               + b[4]) * r + 1.0
        return num / den

    def tail(pp):  # lower tail pp < PLOW; upper via symmetry
        ql = F.sqrt(-2.0 * F.log(pp))
        num = ((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql
               + c[4]) * ql + c[5]
        den = (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql \
            + 1.0
        return num / den

    lo, hi = _ACKLAM_PLOW, 1.0 - _ACKLAM_PLOW
    return (F.when((p <= 0.0) | (p >= 1.0), F.lit(None))
            .when(p < lo, tail(p))
            .when(p > hi, -tail(1.0 - p))
            .otherwise(central(p)))


def normal_ppf_sql(expr: str) -> str:
    """SQL mirror of normal_ppf for a probability expression."""
    a, b = _ACKLAM_A, _ACKLAM_B
    c, d = _ACKLAM_C, _ACKLAM_D
    p = f"CAST({expr} AS DOUBLE)"

    def central(pp):
        q = f"({pp} - 0.5)"
        r = f"({q} * {q})"
        num = (f"(((((({a[0]!r} * {r} + {a[1]!r}) * {r} + {a[2]!r})"
               f" * {r} + {a[3]!r}) * {r} + {a[4]!r}) * {r}"
               f" + {a[5]!r}) * {q})")
        den = (f"((((({b[0]!r} * {r} + {b[1]!r}) * {r} + {b[2]!r})"
               f" * {r} + {b[3]!r}) * {r} + {b[4]!r}) * {r} + 1.0)")
        return f"({num} / {den})"

    def tail(pp):
        ql = f"sqrt(-2.0 * ln({pp}))"
        num = (f"((((({c[0]!r} * {ql} + {c[1]!r}) * {ql}"
               f" + {c[2]!r}) * {ql} + {c[3]!r}) * {ql}"
               f" + {c[4]!r}) * {ql} + {c[5]!r})")
        den = (f"(((({d[0]!r} * {ql} + {d[1]!r}) * {ql}"
               f" + {d[2]!r}) * {ql} + {d[3]!r}) * {ql} + 1.0)")
        return f"({num} / {den})"

    lo, hi = _ACKLAM_PLOW, 1.0 - _ACKLAM_PLOW
    return (f"(CASE WHEN {p} <= 0.0 OR {p} >= 1.0 THEN NULL"
            f" WHEN {p} < {lo!r} THEN {tail(p)}"
            f" WHEN {p} > {hi!r} THEN -{tail(f'(1.0 - {p})')}"
            f" ELSE {central(p)} END)")


def fligner_killeen(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Fligner-Killeen test for equal variances — the RANK-based
    member of the variance-test trio (bartlett_test: parametric,
    levene_bf: robust means, this: normal scores of ranked absolute
    deviations — the most outlier-resistant, scipy's default
    recommendation for non-normal data). Values must already be
    exact integers (pre-scaled units).

    a_i = normal_ppf(1/2 + r_i/(2(N+1))) over pooled tie-averaged
    ranks of |x - median_group|; X^2 = sum_j n_j (Abar_j - abar)^2
    / V^2 with V^2 the sample variance of all scores.

    Exact arithmetic: per-group exact LOWER medians (the levene_bf
    machinery); per DISTINCT deviation the tie-averaged rank is the
    exact half-unit (2*cum - cnt + 1)/2 from prefix.global_cumsum;
    each distinct deviation's normal score computes ONCE and rounds
    to integer NANO units, so per-group score sums and the pooled
    square sum (nano^2 as DECIMAL/HUGEINT) are exact and order-free;
    per-group chi-square terms round to micro longs before the
    cross-group sum; three divisions at the finale, mirrored
    textually in SQL (normal_ppf_sql emits the score mirror).

    Returns one row (k, n, x2): NULL when k < 2 or the score
    variance degenerates. Empty: 0 rows.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).cast("long").alias("_v")))
    pv0 = (s.groupBy("_g", "_v")
           .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    wg = (Window.partitionBy("_g").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum0 = pv0.withColumn("_cum", F.sum("_cnt").over(wg))
    ng = s.groupBy("_g").agg(F.count(F.lit(1)).cast("long")
                             .alias("_ng"))
    med = (cum0.join(ng, on="_g")
           .where((F.col("_cum") - F.col("_cnt"))
                  < F.floor((F.col("_ng") + 1) / F.lit(2.0)))
           .where(F.col("_cum")
                  >= F.floor((F.col("_ng") + 1) / F.lit(2.0)))
           .select("_g", F.col("_v").alias("_m")))
    z = (s.join(med, on="_g")
         .select("_g", F.abs(F.col("_v") - F.col("_m")).alias("_z")))
    return _normal_scores_chi2(z)


def _normal_scores_chi2(z: DataFrame) -> DataFrame:
    """Shared finale for normal-scores k-sample tests
    (fligner_killeen on |deviations|, van_der_waerden on raw
    values): pooled tie-averaged ranks -> Acklam normal scores as
    nano longs -> chi-square X^2 = sum n_j (Abar_j - abar)^2 / V^2.
    Input: (_g, _z) rows with _z exact longs."""
    from mms_rdf_spark.operators.prefix import global_cumsum

    pgz = (z.groupBy("_g", "_z")
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pz = pgz.groupBy("_z").agg(F.sum("_c").cast("long")
                               .alias("_cnt"))
    cum = global_cumsum(pz, "_z", "_z", "_cnt")
    tot = cum.agg(F.sum("_cnt").cast("long").alias("_nn"))
    cum = cum.crossJoin(F.broadcast(tot))
    nn = F.col("_nn").cast("double")
    pp = 0.5 + (2 * F.col("cum") - F.col("_cnt") + 1) \
        / (4.0 * (nn + 1.0))
    scored = cum.select(
        "_z", "_cnt", "_nn",
        F.round(normal_ppf(pp) * 1e9).cast("long").alias("_a"))
    per_g = (pgz.join(scored.select("_z", "_a"), on="_z")
             .groupBy("_g")
             .agg(F.sum("_c").cast("long").alias("_njg"),
                  F.sum(F.col("_c") * F.col("_a")).cast("long")
                  .alias("_sa")))
    pooled = scored.agg(
        F.max("_nn").alias("_n2"),
        F.count(F.lit(1)).cast("long").alias("_jz"),
        F.sum(F.col("_cnt") * F.col("_a")).cast("long").alias("_ta"),
        F.sum(F.col("_cnt")
              * (F.col("_a").cast("decimal(38,0)") * F.col("_a")))
        .cast("decimal(38,0)").alias("_qa"))
    j = per_g.crossJoin(F.broadcast(pooled))
    n2d = F.col("_n2").cast("double")
    abar = F.col("_ta") / (n2d * 1e9)
    ajg = F.col("_sa") / (F.col("_njg").cast("double") * 1e9)
    term = F.col("_njg") * (ajg - abar) * (ajg - abar)
    st = (j.groupBy("_n2", "_jz", "_ta", "_qa")
          .agg(F.count(F.lit(1)).cast("long").alias("k"),
               F.sum(F.round(term * 1e6).cast("long"))
               .cast("long").alias("_tm")))
    st = st.where(F.col("_n2").isNotNull() & (F.col("_n2") > 0))
    nd = F.col("_n2").cast("double")
    v2 = ((F.col("_qa").cast("double") / 1e18
           - nd * (F.col("_ta") / (nd * 1e9))
             * (F.col("_ta") / (nd * 1e9)))
          / (nd - 1.0))
    ok = (F.col("k") > 1) & (F.col("_jz") > 1) & (v2 > 0)
    return st.select(
        "k", F.col("_n2").cast("long").alias("n"),
        F.when(ok, F.round(F.col("_tm") / 1e6 / v2, 6)).alias("x2"))


def van_der_waerden(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Van der Waerden normal-scores test — the k-sample LOCATION
    test on normal scores of the pooled raw-value ranks: asymptotic
    efficiency of ANOVA under normality WITH kruskal_wallis's
    distribution-free robustness. Values must be exact integers
    (pre-scaled units). Shares fligner_killeen's exact machinery
    (_normal_scores_chi2) — FK scores |median deviations|
    (dispersion), this scores the values themselves (location).

    Returns one row (k, n, x2): NULL when k < 2 or the scores
    degenerate. Empty: 0 rows.
    """
    z = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).cast("long").alias("_z")))
    return _normal_scores_chi2(z)


def mw_one_vs_rest_fdr(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """The multiple-testing composition: a one-vs-rest Mann-Whitney
    test per group (does THIS group's value distribution differ from
    everyone else's?) with Benjamini-Hochberg FDR correction across
    the battery — the correct way to scan k segments for anomalies
    without 'significant' noise at k tests * alpha.

    One pass: the POOLED distinct-value cumsum (prefix.global_cumsum)
    serves every group simultaneously — per group, the doubled rank
    sum 2R_g = sum(c_gv * (2*cum - cnt + 1)) is exact, and the MW z
    vs the complement uses mann_whitney_u's exact formula with
    n_b = N - n_g. p = 2 * normal_sf(|z|) (A&S polynomial) rounded
    6dp, then BH over the k-row battery: rank by (p, group),
    q_i = min_{j>=i} p_j * m / j clamped to 1 (suffix running min
    over the bounded frame), m = tests with defined p.

    Returns one row per group (grp, n, z, p, q); degenerate groups
    (variance 0) carry NULL z/p/q and are excluded from m.

    Scale shape: one (g,v) aggregate, one distributed scan, one
    value-keyed join of aggregated tables, then k-row windows.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).alias("_g"),
                 F.col(value_col).alias("_v")))
    pgv = (s.groupBy("_g", "_v")
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pv = pgv.groupBy("_v").agg(F.sum("_c").cast("long").alias("_cnt"))
    cum = global_cumsum(pv, "_v", "_v", "_cnt")
    per_g = (pgv.join(cum, on="_v")
             .groupBy("_g")
             .agg(F.sum("_c").cast("long").alias("_na"),
                  F.sum(F.col("_c")
                        * (2 * F.col("cum") - F.col("_cnt") + 1))
                  .cast("long").alias("_r2a")))
    glob = cum.agg(
        F.sum("_cnt").cast("long").alias("_nn"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
              - F.col("_cnt")).cast("long").alias("_ties"))
    per = per_g.crossJoin(F.broadcast(glob))
    na = F.col("_na")
    nb = F.col("_nn") - na
    nn = F.col("_nn")
    u2 = F.col("_r2a") - na * (na + 1)
    sig2 = (na * nb / F.lit(12.0)) \
        * ((nn + 1) - F.col("_ties") / (nn * (nn - F.lit(1.0))))
    z = (u2 / F.lit(2.0) - na * nb / F.lit(2.0)) / F.sqrt(sig2)
    ok = (na > 0) & (nb > 0) & (sig2 > 0)
    scored = per.select(
        F.col("_g").alias("grp"), na.alias("n"),
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.round(2.0 * normal_sf(F.abs(z)), 6)).alias("p"))
    m = Window.partitionBy()
    wr = Window.orderBy("p", "grp")
    ws = (Window.orderBy(F.col("_rnk").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    with_q = (scored.where(F.col("p").isNotNull())
              .withColumn("_m", F.count(F.lit(1)).over(m))
              .withColumn("_rnk", F.row_number().over(wr))
              .withColumn("_f", F.col("p") * F.col("_m")
                          / F.col("_rnk"))
              .withColumn("q", F.round(
                  F.least(F.min("_f").over(ws), F.lit(1.0)), 6))
              .select("grp", "n", "z", "p", "q"))
    rest = (scored.where(F.col("p").isNull())
            .select("grp", "n", "z", "p",
                    F.lit(None).cast("double").alias("q")))
    return with_q.unionByName(rest)


def cochran_armitage(
    df: DataFrame,
    group_col: str,
    success_col: str,
    order: list,
) -> DataFrame:
    """Cochran-Armitage trend test — does a binomial RATE increase
    along a pre-specified group order (doses, time buckets, model
    sizes)? The 2 x k counterpart of page_trend_test: chi-square
    independence would ignore the order; this is the test with power
    against the monotone alternative. `order` lists the groups in
    hypothesized ascending order (scores 1..k); groups outside it
    raise. `success_col` must be 0/1 integers.

    T = sum_i t_i (a_i - n_i A/N); under H0,
    Var(T) = (A/N)(1 - A/N) (sum t_i^2 n_i - (sum t_i n_i)^2 / N).

    Exact arithmetic: clearing denominators keeps everything long —
    N*T = sum t_i (a_i N - n_i A) and N^2 * the bracket =
    N sum t_i^2 n_i * N - (sum t_i n_i)^2 ... assembled as
    fixed-order doubles over FIVE exact longs (a_i, n_i and their
    t-weighted sums), one division + sqrt, mirrored textually in
    SQL.

    Returns one row (k, n, successes, z): z NULL when a margin is
    empty or the score spread degenerates. Empty: 0 rows.
    """
    pos = df.sparkSession.createDataFrame(
        [(g, i + 1) for i, g in enumerate(order)], "_g string, _t int")
    s = (df.where(F.col(success_col).isNotNull())
         .select(F.col(group_col).cast("string").alias("_g"),
                 F.col(success_col).cast("long").alias("_s")))
    extra = s.select("_g").distinct() \
        .join(F.broadcast(pos), on="_g", how="left_anti")
    if extra.take(1):
        raise ValueError("cochran_armitage: groups outside `order`")
    per = (s.groupBy("_g")
           .agg(F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_s").cast("long").alias("_a"))
           .join(F.broadcast(pos), on="_g"))
    st = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_a").cast("long").alias("successes"),
        F.sum(F.col("_t") * F.col("_a")).cast("long").alias("_ta"),
        F.sum(F.col("_t") * F.col("_n")).cast("long").alias("_tn"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_n")).cast("long")
        .alias("_t2n"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    nn = F.col("n").cast("double")
    aa = F.col("successes").cast("double")
    t_num = F.col("_ta") - F.col("_tn") * aa / nn
    bracket = F.col("_t2n") - F.col("_tn").cast("double") \
        * F.col("_tn") / nn
    var = (aa / nn) * (1.0 - aa / nn) * bracket
    z = t_num / F.sqrt(var)
    ok = ((F.col("successes") > 0) & (F.col("successes") < F.col("n"))
          & (var > 0))
    return st.select(
        "k", "n", "successes",
        F.when(ok, F.round(z, 6)).alias("z"))


def gehan_test(
    durations: DataFrame,
    group_col: str,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Gehan-Breslow-Wilcoxon test — logrank_test with weight n_t
    (the pooled at-risk count) per event time: EARLY deaths weigh
    more, so it out-powers the log-rank when hazards differ early
    and cross later (exactly where the log-rank is blind). Same
    input contract and risk-set machinery (_survival_cells).

    The n_t weight makes the statistic EXACT: U = sum_t (n*d_a -
    d*n_a) is an integer (the e-term's /n cancels), and Var's
    per-time term n^2 v_t = d*n_a*n_b*(n-d)/(n-1) keeps an exact
    DECIMAL numerator with the bartlett floor-division trick — the
    only float is the final U/sqrt(Var).

    Returns one row (group_a, group_b, n_a, n_b, u, z): NULL z when
    the variance degenerates. Empty / all-censored: 0 rows.
    """
    cells, names, groups = _survival_cells(
        durations, group_col, duration_col, event_col)
    n = F.col("_na") + F.col("_nb")
    d = F.col("_da") + F.col("_db")
    u_t = n * F.col("_da") - d * F.col("_na")
    vnum = (d.cast("decimal(38,0)") * F.col("_na") * F.col("_nb")
            * (n - d))
    v_t = F.when(
        n > 1,
        ((vnum - vnum % (n - 1)) / (n - 1)).cast("decimal(38,0)")
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    contrib = cells.where(d > 0).select(
        u_t.cast("long").alias("_u"), v_t.alias("_v"))
    st = contrib.agg(
        F.sum("_u").cast("long").alias("_us"),
        F.sum("_v").cast("decimal(38,0)").alias("_vs"),
        F.count(F.lit(1)).cast("long").alias("_nt"))
    ta = (groups.crossJoin(F.broadcast(names))
          .agg(F.sum(F.when(F.col("_g") == F.col("group_a"),
                            F.col("_tot"))).cast("long").alias("n_a"),
               F.sum(F.when(F.col("_g") == F.col("group_b"),
                            F.col("_tot"))).cast("long")
               .alias("n_b")))
    j = (st.crossJoin(F.broadcast(names)).crossJoin(F.broadcast(ta))
         .where(F.col("_nt").isNotNull() & (F.col("_nt") > 0)))
    vs = F.col("_vs").cast("double")
    z = F.col("_us") / F.sqrt(vs)
    return j.select(
        "group_a", "group_b", "n_a", "n_b",
        F.col("_us").alias("u"),
        F.when(vs > 0, F.round(z, 6)).alias("z"))


def pacf3(acf: DataFrame, lag_col: str = "lag",
          r_col: str = "r") -> DataFrame:
    """Partial autocorrelation at lags 1..3 from an ACF table (the
    lagged_crosscorr output): the AR-order diagnostic next to
    events_acf/ljung_box — phi_kk is the correlation at lag k AFTER
    removing what shorter lags already explain, via the
    Durbin-Levinson / Toeplitz closed forms:

      phi_11 = r1
      phi_22 = (r2 - r1^2) / (1 - r1^2)
      phi_33 = det(M3) / det(R3)   (3x3 Toeplitz Cramer)

    Exactness: inputs are the ACF's ROUNDED 6dp r values, so both
    engines assemble identical doubles through the fixed-order
    determinant expressions (the ols2 Cramer discipline); each
    phi_kk is NULL when its lag is missing (degenerate series) or
    its denominator is 0. Returns (lag, pacf) rows for lags 1..3.
    """
    one = acf.agg(
        F.max(F.when(F.col(lag_col) == 1, F.col(r_col))).alias("r1"),
        F.max(F.when(F.col(lag_col) == 2, F.col(r_col))).alias("r2"),
        F.max(F.when(F.col(lag_col) == 3, F.col(r_col))).alias("r3"))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p1 = r1
    den2 = 1.0 - r1 * r1
    p2 = (r2 - r1 * r1) / den2
    det_r = (1.0 * (1.0 - r1 * r1)
             - r1 * (r1 - r1 * r2)
             + r2 * (r1 * r1 - r2))
    det_m = (1.0 * (1.0 * r3 - r2 * r1)
             - r1 * (r1 * r3 - r2 * r2)
             + r1 * (r1 * r1 - 1.0 * r2))
    p3 = det_m / det_r
    rows = []
    rows.append(one.select(
        F.lit(1).cast("int").alias("lag"),
        F.when(r1.isNotNull(), F.round(p1, 6)).alias("pacf")))
    rows.append(one.select(
        F.lit(2).cast("int").alias("lag"),
        F.when(r1.isNotNull() & r2.isNotNull() & (den2 != 0.0),
               F.round(p2, 6)).alias("pacf")))
    rows.append(one.select(
        F.lit(3).cast("int").alias("lag"),
        F.when(r1.isNotNull() & r2.isNotNull() & r3.isNotNull()
               & (det_r != 0.0), F.round(p3, 6)).alias("pacf")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def sax_transform(
    series: DataFrame,
    t_col: str,
    y_col: str,
    n_segments: int = 24,
) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin et al. 2003) over
    a regular integer series: z-normalize, Piecewise Aggregate
    Approximation into `n_segments` equal-count time segments, then
    quantize each segment mean against the standard N(0,1) quartile
    breakpoints into the 4-letter alphabet a/b/c/d — the
    dimensionality reduction behind time-series motif/novelty
    search.

    Exact arithmetic: global moments and per-segment sums are exact
    longs (one aggregate + one segment aggregate); segments come
    from link.global_rank + the exact _ntile_from_rank arithmetic
    over the TIME order; the z-score is one fixed-order float per
    segment, ROUNDED 6dp BEFORE the breakpoint comparison so both
    engines quantize identical values against the shared literal
    breakpoints (-0.6745 / 0 / 0.6745). Returns (segment, n,
    mean_z, symbol); 0 rows on empty or zero-variance input.

    Scale shape: one rank pass + two aggregates; the driver holds
    one count (the rfm/lorenz precedent).
    """
    from mms_rdf_spark.operators.link import global_rank

    s = (series.where(F.col(t_col).isNotNull()
                      & F.col(y_col).isNotNull())
         .select(F.col(t_col).cast("long").alias("_t"),
                 F.col(y_col).cast("long").alias("_y")))
    cnt = s.count()
    if cnt == 0:
        return s.select(F.lit(0).cast("int").alias("segment"),
                        F.lit(0).cast("long").alias("n"),
                        F.lit(0.0).alias("mean_z"),
                        F.lit("").alias("symbol")).where(F.lit(False))
    mom = s.agg(F.sum("_y").cast("long").alias("_s"),
                F.sum(F.col("_y").cast("decimal(38,0)")
                      * F.col("_y")).cast("decimal(38,0)")
                .alias("_q"))
    ranked = global_rank(s, "_t", "_y")
    seg = (ranked.select(
        _ntile_from_rank(F.col("rank"), cnt, n_segments)
        .alias("segment"), "_y")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("_y").cast("long").alias("_sy"))
        .crossJoin(F.broadcast(mom)))
    nd = F.lit(float(cnt))
    mu = F.col("_s").cast("double") / nd
    var = ((F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s") / nd)
           / (nd - 1.0))
    z = ((F.col("_sy").cast("double") / F.col("n") - mu)
         / F.sqrt(var))
    zr = F.round(z, 6)
    sym = (F.when(zr < -0.6745, "a")
           .when(zr < 0.0, "b")
           .when(zr < 0.6745, "c")
           .otherwise("d"))
    return (seg.where(var > 0)
            .select("segment", "n", zr.alias("mean_z"),
                    sym.alias("symbol")))


def gamma_fit_mom(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Gamma distribution fit by the method of moments — shape
    k = mean^2/var, scale theta = var/mean — the standard quick
    parametric summary for positive right-skewed metrics (spend,
    latency, tokens/doc): one aggregate, two ratios. Values must be
    positive exact integers (pre-scaled units); the parameters are
    in those units.

    Exact moments (n, sum, sumsq DECIMAL/HUGEINT), sample variance
    via the exact e = n*q - s^2 numerator (the bartlett form),
    fixed-order float finale mirrored in SQL. Returns one row
    (n, mean, k_shape, theta): NULL fit when n < 2 or the variance
    degenerates. Empty: 0 rows.
    """
    v = F.col(value_col).cast("long")
    st = (df.where(v.isNotNull() & (v > 0))
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(v).cast("long").alias("_s"),
               F.sum(v.cast("decimal(38,0)") * v)
               .cast("decimal(38,0)").alias("_q")))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    nd = F.col("n").cast("double")
    e = (F.col("n").cast("decimal(38,0)") * F.col("_q")
         - F.col("_s").cast("decimal(38,0)") * F.col("_s"))
    mean = F.col("_s").cast("double") / nd
    var = e.cast("double") / (nd * (nd - 1.0))
    ok = (F.col("n") > 1) & (var > 0)
    return st.select(
        "n", F.round(mean, 6).alias("mean"),
        F.when(ok, F.round(mean * mean / var, 6)).alias("k_shape"),
        F.when(ok, F.round(var / mean, 6)).alias("theta"))


def sax_motifs(
    series: DataFrame,
    t_col: str,
    y_col: str,
    step_s: int,
    word_len: int = 8,
    k: int = 10,
) -> DataFrame:
    """Time-series motif discovery via per-point SAX words: each
    point gets a quartile-alphabet symbol from its z-score, each
    window start spells the `word_len`-symbol word of the next
    points, and repeated words ARE the recurring shapes (the
    Lin/Keogh motif recipe) — "which daily load pattern keeps
    happening?".

    Exact arithmetic: global moments exact; per-point z is one
    fixed-order float ROUNDED 6dp before the shared literal
    breakpoints; the word assembles from `word_len` t+offset
    EQUI-JOINS (the forecast_accuracy lag pattern — no
    single-partition lead window) and only complete windows count.
    Top-k by (n desc, word) via TakeOrderedAndProject.

    Returns <= k rows (word, n_windows). Empty/degenerate: 0 rows.
    """
    s = (series.where(F.col(t_col).isNotNull()
                      & F.col(y_col).isNotNull())
         .select(F.col(t_col).cast("long").alias("_t"),
                 F.col(y_col).cast("long").alias("_y")))
    mom = s.agg(F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_y").cast("long").alias("_s"),
                F.sum(F.col("_y").cast("decimal(38,0)")
                      * F.col("_y")).cast("decimal(38,0)")
                .alias("_q"))
    sym = s.crossJoin(F.broadcast(mom))
    nd = F.col("_n").cast("double")
    mu = F.col("_s").cast("double") / nd
    var = ((F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s") / nd)
           / (nd - 1.0))
    zr = F.round((F.col("_y") - mu) / F.sqrt(var), 6)
    letter = (F.when(zr < -0.6745, "a").when(zr < 0.0, "b")
              .when(zr < 0.6745, "c").otherwise("d"))
    sym = (sym.where((F.col("_n") > 1) & (var > 0))
           .select("_t", letter.alias("_c0")))
    words = sym
    for i in range(1, word_len):
        nxt = sym.select((F.col("_t") - i * step_s).alias("_t"),
                         F.col("_c0").alias(f"_c{i}"))
        words = words.join(nxt, on="_t")
    word = F.concat(*[F.col(f"_c{i}") for i in range(word_len)])
    return (words.select(word.alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
            .orderBy(F.col("n_windows").desc(), "word").limit(k))


def dunn_posthoc(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964) — WHICH groups differ, after
    kruskal_wallis says SOME do: pairwise mean-rank z-tests on the
    POOLED ranks with the tie-corrected variance, plus
    Benjamini-Hochberg q-values across the k(k-1)/2 pairs (the
    mw_one_vs_rest_fdr discipline).

    z_ij = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 - T/(12(N-1)))
                                     * (1/n_i + 1/n_j)),
    T = sum(t^3 - t).

    Exact arithmetic: ONE pooled distinct-value cumsum serves every
    pair; doubled rank sums 2R_g are exact longs, so Rbar_i - Rbar_j
    = (2R_i*n_j - 2R_j*n_i)/(2 n_i n_j) has an exact integer
    numerator; the variance is a fixed-order float over exact longs;
    p = 2*normal_sf(|z|) (shared A&S mirror), BH over the bounded
    pair frame. Pairs order by the groups' lexical order (g_a < g_b).

    Returns one row per pair (g_a, g_b, n_a, n_b, z, p, q); pairs
    with degenerate variance carry NULLs and are excluded from BH's
    m. Empty / single group: 0 rows.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.prefix import global_cumsum

    s = (df.where(F.col(value_col).isNotNull())
         .select(F.col(group_col).cast("string").alias("_g"),
                 F.col(value_col).alias("_v")))
    pgv = (s.groupBy("_g", "_v")
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pv = pgv.groupBy("_v").agg(F.sum("_c").cast("long").alias("_cnt"))
    cum = global_cumsum(pv, "_v", "_v", "_cnt")
    per_g = (pgv.join(cum, on="_v")
             .groupBy("_g")
             .agg(F.sum("_c").cast("long").alias("_n"),
                  F.sum(F.col("_c")
                        * (2 * F.col("cum") - F.col("_cnt") + 1))
                  .cast("long").alias("_r2")))
    glob = cum.agg(
        F.sum("_cnt").cast("long").alias("_nn"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
              - F.col("_cnt")).cast("long").alias("_ties"))
    a = per_g.select(F.col("_g").alias("g_a"),
                     F.col("_n").alias("n_a"),
                     F.col("_r2").alias("_r2a"))
    b = per_g.select(F.col("_g").alias("g_b"),
                     F.col("_n").alias("n_b"),
                     F.col("_r2").alias("_r2b"))
    pairs = (a.crossJoin(b).where(F.col("g_a") < F.col("g_b"))
             .crossJoin(F.broadcast(glob)))
    nn = F.col("_nn").cast("double")
    # Rbar_i - Rbar_j with exact integer numerator
    num = (F.col("_r2a").cast("decimal(38,0)") * F.col("n_b")
           - F.col("_r2b").cast("decimal(38,0)") * F.col("n_a")
           ).cast("double") \
        / (2.0 * F.col("n_a") * F.col("n_b"))
    sig2 = ((nn * (nn + 1.0) / 12.0
             - F.col("_ties") / (12.0 * (nn - 1.0)))
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = num / F.sqrt(sig2)
    ok = sig2 > 0
    scored = pairs.select(
        "g_a", "g_b", "n_a", "n_b",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.round(2.0 * normal_sf(F.abs(z)), 6)).alias("p"))
    m = Window.partitionBy()
    wr = Window.orderBy("p", "g_a", "g_b")
    ws = (Window.orderBy(F.col("_rnk").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    with_q = (scored.where(F.col("p").isNotNull())
              .withColumn("_m", F.count(F.lit(1)).over(m))
              .withColumn("_rnk", F.row_number().over(wr))
              .withColumn("_f", F.col("p") * F.col("_m")
                          / F.col("_rnk"))
              .withColumn("q", F.round(
                  F.least(F.min("_f").over(ws), F.lit(1.0)), 6))
              .select("g_a", "g_b", "n_a", "n_b", "z", "p", "q"))
    rest = (scored.where(F.col("p").isNull())
            .select("g_a", "g_b", "n_a", "n_b", "z", "p",
                    F.lit(None).cast("double").alias("q")))
    return with_q.unionByName(rest)
