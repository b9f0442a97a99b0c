"""Conversation sessionization: split conversations on inactivity gaps.

A KG-construction companion operator: agent transcripts often need
re-segmentation before extraction (one nominal conv_id spanning days
of unrelated work). Pure window algebra — lag over the stable
(conv_id, turn_idx) ordering, gap predicate, cumulative sum — no UDF,
one shuffle on conv_id that extraction's own window then reuses (same
partitioning key, so Catalyst can avoid a second exchange when
composed).

This is the batch form of the classic streaming session-window;
`applyInPandasWithState` would host the same logic over an unbounded
stream, but conversations have no watermark-safe close (see
streaming/incremental.py), so batch is the honest default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(turns: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Add session_idx (0-based per conv_id) and session_id columns:
    a new session starts when the time since the previous turn exceeds
    `gap_minutes`. Deterministic: order is (turn_idx), not arrival."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # timezone-independent epoch seconds: complete seconds from an NTZ
    # epoch literal — never routes through the session zone (a TZ cast
    # would shift wall times around DST gaps in non-UTC sessions), and
    # floor-per-value semantics match an oracle's floor(epoch(ts)).
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(ts as timestamp_ntz))")
    gap = sec - F.lag(sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    out = (
        turns.withColumn("_new", is_new)
        .withColumn("session_idx",
                    (F.sum("_new").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
                    .cast("int"))
        .drop("_new")
    )
    return out.withColumn(
        "session_id",
        F.concat_ws("#", F.col("conv_id"), F.col("session_idx").cast("string")))
