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
