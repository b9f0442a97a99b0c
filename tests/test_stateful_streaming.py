"""applyInPandasWithState sessionization: state must carry session
numbering across triggers, matching the batch operator exactly."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F


def _frame():
    rows = []
    base = pd.Timestamp("2025-01-01 00:00:00")
    for conv, gaps in [("c1", [0, 1, 2, 90, 91, 200, 201]),
                       ("c2", [0, 50, 100, 150])]:  # every gap > 30min
        for i, minutes in enumerate(gaps):
            rows.append((conv, i, "user", f"t{i}", None,
                         base + pd.Timedelta(minutes=minutes)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # parquet TIMESTAMP(MICROS)
    return pdf


def test_streaming_matches_batch_sessionize(spark, tmp_path):
    from mms_rdf_spark.operators.sessionize import sessionize
    from mms_rdf_spark.streaming.stateful import streaming_sessionize

    pdf = _frame()
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(src)
    # split MID-conversation: session numbering must continue across
    # triggers purely from the state store
    pdf.iloc[:6].to_parquet(src + "/b1.parquet", index=False)

    q = streaming_sessionize(spark, src, out, ckpt, gap_minutes=30)
    q.awaitTermination(120)
    pdf.iloc[6:].to_parquet(src + "/b2.parquet", index=False)
    q2 = streaming_sessionize(spark, src, out, ckpt, gap_minutes=30)
    q2.awaitTermination(120)

    got = {(r["conv_id"], r["turn_idx"]): r["session_idx"]
           for r in spark.read.parquet(out).collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["session_idx"]
            for r in sessionize(spark.createDataFrame(pdf), 30)
            .select("conv_id", "turn_idx", "session_idx").collect()}
    assert got == want
    # sanity: c1 has 3 sessions, c2 has 4
    assert max(v for (c, _), v in got.items() if c == "c1") == 2
    assert max(v for (c, _), v in got.items() if c == "c2") == 3


def test_streaming_sessionize_idempotent_rerun(spark, tmp_path):
    from mms_rdf_spark.streaming.stateful import streaming_sessionize

    pdf = _frame()
    src, out, ckpt = (str(tmp_path / d) for d in ("in2", "out2", "ckpt2"))
    os.makedirs(src)
    pdf.to_parquet(src + "/all.parquet", index=False)
    q = streaming_sessionize(spark, src, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # rerun with no new files: checkpoint prevents reprocessing
    q2 = streaming_sessionize(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1 == len(pdf)
