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


def turn_latency(
    transcripts: DataFrame,
    from_role: str = "user",
    to_role: str = "assistant",
    ndigits: int = 4,
) -> DataFrame:
    """Dialogue responsiveness per conversation: for every
    `from_role` turn immediately followed by a `to_role` turn, the
    response gap in whole seconds; aggregated to
    (conv_id, n_pairs, avg_latency_s, max_latency_s).

    Gaps are exact integer seconds so the average is one division
    (the moment-sum rule); one exchange on conv_id shared by the lead
    window and the aggregate. This is the transcript-native SLA signal
    operators like sessionize feed on — same input contract as the
    extractor (conv_id, turn_idx, role, ts).
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.temporal import _epoch_s

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (transcripts
             .select("conv_id", "turn_idx", "role",
                     _epoch_s("ts").alias("_s"))
             .withColumn("_nrole", F.lead("role").over(w))
             .withColumn("_ns", F.lead("_s").over(w))
             .where((F.col("role") == from_role)
                    & (F.col("_nrole") == to_role))
             .select("conv_id", (F.col("_ns") - F.col("_s"))
                     .alias("_gap")))
    return (pairs.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.sum("_gap") / F.count(F.lit(1)), ndigits)
                 .alias("avg_latency_s"),
                 F.max("_gap").alias("max_latency_s")))
