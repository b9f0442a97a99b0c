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
