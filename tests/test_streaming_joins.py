"""Stream-stream interval join: batch equality + exactly-once append."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F


def _frames():
    base = pd.Timestamp("2025-01-01 00:00:00")
    rows = []
    # c1: tool@10 answered @20 and @35 (both within 30m); tool@50
    # answered @90 (40m — OUTSIDE the window)
    for conv, minute, role in [
        ("c1", 10, "tool"), ("c1", 20, "assistant"),
        ("c1", 35, "assistant"), ("c1", 50, "tool"),
        ("c1", 90, "assistant"),
        # c2: answer BEFORE the tool turn (must not match)
        ("c2", 5, "assistant"), ("c2", 10, "tool"),
    ]:
        rows.append((conv, len(rows), role, "x", None,
                     base + pd.Timedelta(minutes=minute)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from mms_rdf_spark.streaming.joins import stream_stream_tool_answers

    pdf = _frames()
    ldir, rdir, out, ckpt = (str(tmp_path / d)
                             for d in ("l", "r", "out", "ckpt"))
    for d in (ldir, rdir):
        os.makedirs(d)
        pdf.to_parquet(d + "/b1.parquet", index=False)

    q = stream_stream_tool_answers(spark, ldir, rdir, out, ckpt,
                                   within="30 minutes",
                                   watermark="1 hour")
    q.awaitTermination(120)

    got = {(r["conv_id"], r["tool_idx"], r["answer_idx"], r["lag_s"])
           for r in spark.read.parquet(out).collect()}
    # batch reference: same predicate over the same data
    df = spark.createDataFrame(pdf)
    tool = df.where(F.col("role") == "tool") \
        .select("conv_id", F.col("turn_idx").alias("tool_idx"),
                F.col("ts").alias("tool_ts"))
    ans = df.where(F.col("role") == "assistant") \
        .select(F.col("conv_id").alias("c2"),
                F.col("turn_idx").alias("answer_idx"),
                F.col("ts").alias("answer_ts"))
    want = {(r["conv_id"], r["tool_idx"], r["answer_idx"], r["lag_s"])
            for r in tool.join(
                ans, (F.col("conv_id") == F.col("c2"))
                & (F.col("answer_ts") >= F.col("tool_ts"))
                & (F.col("answer_ts") <= F.col("tool_ts")
                   + F.expr("INTERVAL 30 minutes")))
            .select("conv_id", "tool_idx", "answer_idx",
                    (F.unix_timestamp("answer_ts")
                     - F.unix_timestamp("tool_ts")).alias("lag_s"))
            .collect()}
    assert got == want
    # semantic spot checks: in-window pairs present, out-of-window and
    # answer-before-tool absent
    convs = {(c, t, a) for c, t, a, _ in got}
    assert ("c1", 0, 1) in convs and ("c1", 0, 2) in convs
    assert all(not (c == "c1" and t == 3) for c, t, a in convs)
    assert all(c != "c2" for c, t, a in convs)
    # exactly-once on re-drain: no new rows, no duplicates
    n1 = spark.read.parquet(out).count()
    q2 = stream_stream_tool_answers(spark, ldir, rdir, out, ckpt,
                                    within="30 minutes",
                                    watermark="1 hour")
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1
