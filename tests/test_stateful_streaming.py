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


def _wait_rows(spark, out, n, timeout=120):
    """Poll the file sink until >= n committed rows (the continuous
    TTL query has no terminal state to await)."""
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            if spark.read.parquet(out).count() >= n:
                return
        except Exception:
            pass  # sink dir not created yet
        time.sleep(0.5)
    raise AssertionError(f"sink never reached {n} rows")


def test_streaming_ttl_matches_batch_when_no_eviction(spark, tmp_path):
    """With a TTL far above the replay duration, the timeout variant is
    behaviorally identical to streaming_sessionize / batch sessionize,
    including cross-trigger state continuation (files dropped into a
    RUNNING query, mid-conversation split)."""
    from mms_rdf_spark.operators.sessionize import sessionize
    from mms_rdf_spark.streaming.stateful import streaming_sessionize_ttl

    pdf = _frame()
    src, out, ckpt = (str(tmp_path / d) for d in ("in3", "out3", "ckpt3"))
    os.makedirs(src)
    pdf.iloc[:6].to_parquet(src + "/b1.parquet", index=False)
    q = streaming_sessionize_ttl(spark, src, out, ckpt, gap_minutes=30,
                                 idle_timeout_minutes=60)
    try:
        _wait_rows(spark, out, 6)
        pdf.iloc[6:].to_parquet(src + "/b2.parquet", index=False)
        _wait_rows(spark, out, len(pdf))
    finally:
        q.stop()

    got = {(r["conv_id"], r["turn_idx"]): r["session_idx"]
           for r in spark.read.parquet(out).collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["session_idx"]
            for r in sessionize(spark.createDataFrame(pdf), 30)
            .select("conv_id", "turn_idx", "session_idx").collect()}
    assert got == want


def test_streaming_ttl_evicts_idle_state(spark, tmp_path):
    """The store-bounding behavior itself: a conversation idle past the
    TTL is evicted by the hasTimedOut callback (fired by an empty
    wall-clock trigger), so when it speaks again its numbering restarts
    at 0 — the observable proof the state row was actually dropped."""
    import time

    import pandas as pd

    from mms_rdf_spark.streaming.stateful import streaming_sessionize_ttl

    def mk(conv, idx_minutes):
        rows = [(conv, i, "user", f"t{i}", None,
                 pd.Timestamp("2025-01-01") + pd.Timedelta(minutes=m))
                for i, m in idx_minutes]
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return pdf

    src, out, ckpt = (str(tmp_path / d) for d in ("in4", "out4", "ckpt4"))
    os.makedirs(src)
    # c1 with a 90-min EVENT gap -> sessions [0, 1, 1]; state ends at 1
    mk("c1", [(0, 0), (1, 90), (2, 91)]).to_parquet(
        src + "/b1.parquet", index=False)
    q = streaming_sessionize_ttl(spark, src, out, ckpt, gap_minutes=30,
                                 idle_timeout_minutes=2.0 / 60)  # 2s TTL
    try:
        _wait_rows(spark, out, 3)
        time.sleep(5)  # idle past the TTL: empty triggers fire the
        # timeout callback and evict c1's state row
        # c1 speaks again 1 EVENT-minute later (no 30-min gap) — with
        # retained state this would continue session 1; after eviction
        # it must restart at 0
        mk("c1", [(3, 92)]).to_parquet(src + "/b2.parquet", index=False)
        _wait_rows(spark, out, 4)
    finally:
        q.stop()

    got = {(r["conv_id"], r["turn_idx"]): r["session_idx"]
           for r in spark.read.parquet(out).collect()}
    assert got[("c1", 0)] == 0 and got[("c1", 2)] == 1
    assert got[("c1", 3)] == 0, \
        "idle state must have been evicted (numbering restart)"
