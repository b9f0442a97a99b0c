"""Latest-wins CDC merge (the MERGE INTO / SCD-1 upsert pattern).

The batch stand-in for Iceberg's MERGE INTO that the amend stage's
users ask for next: given a base snapshot and a change batch, keep the
highest-version row per key, honoring tombstones. Expressed as
unionByName + one per-key window — a single hash exchange on the key,
no join (the same shape as asof_join, and for the same reason: a
merge is a per-key linear scan, not a pairwise match).

At 100 TB: change batches are normally ≪ base, so the exchange is
dominated by the base re-shuffle; with the base stored bucketed on the
key (tables.write_spo_bucketed pattern) the window reads the bucket
layout and only the delta shuffles. Deterministic: version ties break
toward the change batch, then by the source ordinal — reruns and
resumes produce byte-identical snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version: str,
    deleted_col: str | None = None,
) -> DataFrame:
    """One row per key: the highest-`version` row across base and
    updates (updates win version ties). Rows whose winning version has
    `deleted_col` true are dropped entirely (tombstone semantics).
    Columns = base's columns (+ deleted_col until filtered).

    Contract: (key, version) must be unique WITHIN each side — two
    update rows carrying the same key and version leave the winner
    undefined (same input contract as asof_join's right side;
    pre-aggregate the change batch if a producer can emit dupes)."""
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("_src").desc())
    out = (
        b.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    if deleted_col is not None:
        out = out.where(~F.coalesce(F.col(deleted_col), F.lit(False))) \
            .drop(deleted_col)
    return out


def scd2_history(
    changes: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse a
    per-key change stream into validity intervals of `attr`.

    A row opens a new interval only when `attr` differs from the key's
    previous value in (ts, tiebreak) order (classic SCD2 no-change
    collapse); `valid_to` is the next interval's `valid_from` (NULL =
    current, also flagged `is_current`). Output columns: key, attr,
    valid_from, valid_to, is_current.

    Plan: lag() to detect changes, filter, lead() for the close — both
    windows share one hash partitioning on `key`, so the fact table
    shuffles exactly once. Contract: `attr` must be non-null (NULL
    would need null-safe change detection; encode absent as a
    sentinel) and (key, ts, tiebreak) unique.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(attr).over(w)
    opened = (changes
              .select(key, attr, ts_col,
                      *([tiebreak_col] if tiebreak_col else []))
              .withColumn("_prev", prev)
              .where(F.col("_prev").isNull()
                     | (F.col(attr) != F.col("_prev"))))
    out = (opened
           .withColumn("valid_from", F.col(ts_col))
           .withColumn("valid_to", F.lead(ts_col).over(w))
           .withColumn("is_current", F.col("valid_to").isNull())
           .drop("_prev"))
    if tiebreak_col:
        out = out.drop(tiebreak_col)
    if ts_col != "valid_from":
        out = out.drop(ts_col)
    return out
