"""Watermarked windowed aggregation: window math matches a batch
computation; append mode emits each closed window exactly once."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F


def _frame():
    base = pd.Timestamp("2025-01-01 00:00:00")
    rows = []
    # c1: 3 turns in hour 0, 2 in hour 1; c2: 1 in hour 0, 4 in hour 3
    for conv, minute, role in [
        ("c1", 5, "user"), ("c1", 20, "tool"), ("c1", 50, "assistant"),
        ("c1", 70, "user"), ("c1", 110, "tool"),
        ("c2", 10, "user"),
        ("c2", 185, "user"), ("c2", 190, "tool"),
        ("c2", 200, "assistant"), ("c2", 230, "user"),
    ]:
        rows.append((conv, len(rows), role, "x", None,
                     base + pd.Timedelta(minutes=minute)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def test_windowed_counts_match_batch(spark, tmp_path):
    from mms_rdf_spark.streaming.windows import windowed_turn_counts

    pdf = _frame()
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(src)
    pdf.to_parquet(src + "/b1.parquet", index=False)
    # a far-future heartbeat advances the watermark so every real
    # window closes and append mode emits it
    sentinel = pdf.iloc[[0]].assign(
        conv_id="zzz-sentinel",
        ts=pd.Timestamp("2025-01-02 00:00:00")).astype({"turn_idx": "int32"})
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sentinel.to_parquet(src + "/b2.parquet", index=False)

    q = windowed_turn_counts(spark, src, out, ckpt,
                             window="1 hour", watermark="1 hour")
    q.awaitTermination(120)
    # second trigger: watermark (advanced by b2) closes b1's windows
    q2 = windowed_turn_counts(spark, src, out, ckpt,
                              window="1 hour", watermark="1 hour")
    q2.awaitTermination(120)

    got = spark.read.parquet(out).where(F.col("conv_id") != "zzz-sentinel")
    batch = (
        spark.createDataFrame(pdf)
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
                 "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.count(F.when(F.col("role") == "tool", 1))
             .alias("n_tool_turns"))
        .select("conv_id", F.col("w.start").alias("window_start"),
                "n_turns", "n_tool_turns")
    )
    g = {(r["conv_id"], str(r["window_start"]), r["n_turns"],
          r["n_tool_turns"]) for r in got.collect()}
    w = {(r["conv_id"], str(r["window_start"]), r["n_turns"],
          r["n_tool_turns"]) for r in batch.collect()}
    assert g == w
    # exactly-once: no window emitted twice
    assert got.groupBy("conv_id", "window_start").count() \
        .where("count > 1").count() == 0


def test_session_windows_match_batch_and_gap_semantics(spark, tmp_path):
    """Built-in session_window streaming: session bounds equal the
    batch session_window computation, gaps > 30min split sessions, and
    append emits each closed session exactly once."""
    from mms_rdf_spark.streaming.windows import session_windowed_turn_counts

    pdf = _frame()
    src, out, ckpt = (str(tmp_path / d) for d in ("sin", "sout", "sckpt"))
    os.makedirs(src)
    pdf.to_parquet(src + "/b1.parquet", index=False)
    sentinel = pdf.iloc[[0]].assign(
        conv_id="zzz-sentinel",
        ts=pd.Timestamp("2025-01-02 00:00:00")).astype({"turn_idx": "int32"})
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sentinel.to_parquet(src + "/b2.parquet", index=False)

    for _ in range(2):  # second drain closes b1's sessions
        q = session_windowed_turn_counts(spark, src, out, ckpt,
                                         gap="30 minutes",
                                         watermark="1 hour")
        q.awaitTermination(120)

    got = spark.read.parquet(out).where(F.col("conv_id") != "zzz-sentinel")
    batch = (
        spark.createDataFrame(pdf)
        .groupBy(F.session_window(F.col("ts").cast("timestamp"),
                                  "30 minutes").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select("conv_id", F.col("w.start").alias("session_start"),
                "n_turns"))
    g = {(r["conv_id"], str(r["session_start"]), r["n_turns"])
         for r in got.collect()}
    w = {(r["conv_id"], str(r["session_start"]), r["n_turns"])
         for r in batch.collect()}
    assert g == w
    # gap semantics on the fixture: c1 turns at 5/20/50/70 chain into
    # one session (every gap <= 30min), the 110' turn starts another;
    # c2: singleton at 10', then 185/190/200/230 chain
    c1 = sorted(r["n_turns"] for r in got.collect()
                if r["conv_id"] == "c1")
    assert c1 == [1, 4]
    assert got.groupBy("conv_id", "session_start").count() \
        .where("count > 1").count() == 0
