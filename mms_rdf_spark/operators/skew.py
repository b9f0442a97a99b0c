"""Skew-handling utilities (SURVEY.md §4 custom item 3).

AQE's skew-join splitting covers joins; these cover skewed
AGGREGATIONS (a hot tool name appearing in 10^9 turns makes a plain
groupBy(key) put one partition on one task). Two-phase salted
aggregation: partial aggregate on (key, salt), then final aggregate on
key — the map-side combine the reference never needed because its
datasets fit one node (SURVEY.md O9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Parallelize a narrow input scan (guide §2.5 "input skew: one
    huge unsplittable file"): when the scan's partitioning is below
    the session parallelism — single-file single-row-group parquet
    yields ONE task, serializing all pre-shuffle work on one core —
    redistribute once right after the read. Scale-adaptive and
    conditional: a real multi-file table already scans at >= cores
    partitions and passes through untouched, so this never adds a
    shuffle at scale; column pruning and filter pushdown both reach
    the scan THROUGH the repartition (verified in plans).

    Measured discipline (round 6): ONLY worth it when the downstream
    per-row work dominates the exchange cost. At sf0.1 it wins big for
    curate_full (heavy fused projection: quality + dup-ratio grams +
    split hash per row, 2.9 s -> 1.7 s) but LOSES for cheap
    split-explode pipelines (nb_train +0.8 s) and count-pruned plans
    (events_hilbert +0.5 s) — apply per call site with numbers, never
    blanket on a shared reader."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:  # plan-only, runs no job
        return df.repartition(target)
    return df


def pin_fanout_partitions(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition on `keys` with an EXPLICIT partition count, for use
    immediately before a pair-generating (self-)join whose output fans
    out far beyond its input bytes.

    Why: AQE's post-shuffle coalescing is BYTE-based and fan-out-blind
    — a banded/blocked table is bytes-tiny (one short row per (id,
    bucket)) while the in-bucket pair join is quadratic per bucket, so
    AQE folds the whole expansion into one partition (measured at the
    round-5 10x scale point: 111M LSH pairs in a single task, 177 s ->
    46.9 s after pinning). An explicit numPartitions is exempt from
    AQE coalescing, and hash-partitioning on the join keys is reused
    by both sides of the self-join (no extra shuffle). At real scale
    the bucket shuffle is byte-heavy and this matches what AQE would
    have chosen anyway; the worst single task stays bounded by the
    caller's bucket/block cap."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" under some AQE configs
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def with_salt(df: DataFrame, buckets: int = 16,
              col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row hash (NOT
    rand(): deterministic under retries/resume)."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(
        col_name, F.pmod(F.hash(*cols), F.lit(buckets)))


def salted_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """groupBy(key).count() that survives hot keys: partial count per
    (key, salt), then sum per key. Same result, bounded partition size."""
    return (
        with_salt(df, buckets)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("count"))
    )


def salted_agg(df: DataFrame, key: str, agg_col: str,
               buckets: int = 16) -> DataFrame:
    """Two-phase sum aggregation over a skewed key."""
    return (
        with_salt(df, buckets)
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias(f"sum_{agg_col}"))
    )


def repartition_salted(df: DataFrame, key: str | Column,
                       buckets: int = 16) -> DataFrame:
    """Repartition on (key, salt) so a hot key spreads over `buckets`
    partitions — the pre-join spread for skewed equi-joins when AQE's
    runtime splitting isn't available (e.g., before a mapInPandas)."""
    salted = with_salt(df, buckets)
    return salted.repartition(F.col(key) if isinstance(key, str) else key,
                              F.col("_salt")).drop("_salt")


def grouped_topk(df: DataFrame, group: str, key: str, k: int = 3,
                 buckets: int = 16) -> DataFrame:
    """Heavy hitters per group: top-k `key`s by count within each
    `group` (group, key, n, rank), rank ties broken by key for
    determinism.

    Built on the two-phase salted count, so a celebrity key (one user
    behind 10^9 events) is partial-counted across `buckets` tasks
    before the per-(group,key) row ever exists; the final window ranks
    |distinct keys| rows per group, not raw events. The standard
    "top sources / top entities" report at corpus scale."""
    from pyspark.sql.window import Window

    counts = (
        with_salt(df, buckets)
        .groupBy(group, key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(group, key)
        .agg(F.sum("_partial").alias("n"))
    )
    w = Window.partitionBy(group).orderBy(F.col("n").desc(), F.col(key))
    return (counts.withColumn("rank",
                              F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k))


def bloom_prejoin(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_bits: int = 1 << 20,
) -> DataFrame:
    """Shuffle-reduction semi-filter: drop big-side rows whose join key
    CANNOT match `small` before the real join shuffles them — the
    hand-rolled form of runtime bloom-filter pushdown, for when the
    optimizer can't infer it (e.g. the small side is itself a subquery
    Spark won't derive an InSubquery filter from).

    The filter is a (word, mask) bitmap built from md5(key) mod
    `n_bits` (k=1 hash — the regime runtime join filters use, where
    the goal is shuffle-volume reduction and a ~load-factor false-pass
    rate is fine; false NEGATIVES are impossible, so the subsequent
    exact join keeps correctness). The bitmap is at most n_bits/64
    rows, built with one map-side-combined bit_or aggregate and
    broadcast; the big side probes it with one broadcast join — no
    explode, no second shuffle. Returns the filtered big side; compose
    with the real join for results identical to joining unfiltered.
    """
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(n_bits))
    words = (small
             .select((h / 64).cast("long").alias("_w"),
                     (h % 64).cast("int").alias("_bit"))
             .select("_w", F.expr("shiftleft(1L, _bit)").alias("_b"))
             .groupBy("_w")
             .agg(F.bit_or("_b").alias("_mask")))
    return (big
            .withColumn("_h", h)
            .withColumn("_w", (F.col("_h") / 64).cast("long"))
            .withColumn("_bit", (F.col("_h") % 64).cast("int"))
            .join(F.broadcast(words), on="_w", how="inner")
            .where(F.expr("(_mask & shiftleft(1L, _bit)) != 0"))
            .drop("_h", "_w", "_bit", "_mask"))
