"""Incremental substring-level exact dedup (streaming/dupspans.py):
single-batch parity, two-wave cumulative window equality with
retroactive first-occurrence emission, rendered spans row-identical to
the batch operator, exactly-once emission, replay idempotence, and
untouched-bucket reuse."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

L = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# waves engineered so wave B duplicates grams whose FIRST (and only)
# occurrence arrived in wave A — the retroactive-emission path
ROWS_A = [
    (1, "a b c d e f"),          # "a b c"... unique so far
    (2, "x y z q r"),            # all unique so far
    (3, "a b c d zz"),           # duplicates doc1's "a b c"/"b c d" now
]
ROWS_B = [
    (4, "x y z q r s"),          # retro-duplicates doc2's windows
    (5, "totally fresh tokens here now"),
    (6, "a b c later copy"),     # third copy of "a b c"
]


def _batch_windows(spark, rows):
    """Duplicated window positions per the batch operator's dup set."""
    from collections import Counter
    cnt = Counter()
    toks = {d: [t for t in s.split(" ") if t] for d, s in rows}
    for d, ts in toks.items():
        for i in range(len(ts) - L + 1):
            cnt[" ".join(ts[i:i + L])] += 1
    out = set()
    for d, ts in toks.items():
        for i in range(len(ts) - L + 1):
            if cnt[" ".join(ts[i:i + L])] >= 2:
                out.add((d, i))
    return out


def _batch_spans(spark, rows):
    from mms_rdf_spark.operators.dedup import duplicated_spans
    return {(r.doc_id, r.span_start, r.span_end, r.span_len,
             r.n_windows)
            for r in duplicated_spans(_docs(spark, rows),
                                      length=L).collect()}


def test_single_batch_matches_batch_operator(spark, tmp_path):
    from mms_rdf_spark.streaming.dupspans import dupspans_batch

    emit, merged, touched = dupspans_batch(
        spark, _docs(spark, ROWS_A), str(tmp_path / "store"), length=L)
    got = {(r.doc_id, r.pos) for r in emit.collect()}
    assert got == _batch_windows(spark, ROWS_A)
    assert touched == {r.bucket for r in
                       merged.select("bucket").distinct().collect()}


def test_two_wave_cumulative_equality_and_retroactive_emit(
        spark, tmp_path):
    from mms_rdf_spark.streaming.dupspans import (
        incremental_dupspans, read_windows, spans_from_windows)

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    win_dir = str(tmp_path / "wins")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    incremental_dupspans(
        spark, docs_dir, store, win_dir, ckpt, length=L
    ).awaitTermination()
    wave1 = {(r.doc_id, r.pos) for r in
             read_windows(spark, win_dir).collect()}
    assert wave1 == _batch_windows(spark, ROWS_A)

    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    incremental_dupspans(
        spark, docs_dir, store, win_dir, ckpt, length=L
    ).awaitTermination()
    rows = [(r.doc_id, r.pos) for r in
            read_windows(spark, win_dir).collect()]
    # exactly-once: no window emitted twice across waves
    assert len(rows) == len(set(rows))
    # cumulative == batch operator on the full corpus, including
    # doc2's windows that only became duplicated in wave B
    assert set(rows) == _batch_windows(spark, ROWS_A + ROWS_B)
    assert any(d == 2 for d, _ in rows)
    # rendered spans row-identical to the batch operator
    got_spans = {(r.doc_id, r.span_start, r.span_end, r.span_len,
                  r.n_windows)
                 for r in spans_from_windows(spark, win_dir,
                                             length=L).collect()}
    assert got_spans == _batch_spans(spark, ROWS_A + ROWS_B)


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.dupspans import (
        incremental_dupspans, read_grams, read_windows)

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    win_dir = str(tmp_path / "wins")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    incremental_dupspans(spark, docs_dir, store, win_dir,
                         str(tmp_path / "ck1"), length=L
                         ).awaitTermination()
    v1 = snapshot.current_version(store)
    n1 = read_windows(spark, win_dir).count()
    # a fresh checkpoint replays batch 0 against the SAME store:
    # the applied-batch manifest makes the commit a no-op and the
    # re-emitted window rows overwrite identical content
    incremental_dupspans(spark, docs_dir, store, win_dir,
                         str(tmp_path / "ck2"), length=L
                         ).awaitTermination()
    assert snapshot.current_version(store) == v1
    assert read_windows(spark, win_dir).count() == n1
    # store still serves the same gram counts
    g = {r.gram: r.cnt for r in read_grams(spark, store).collect()}
    assert g["a b c"] == 2


def test_untouched_buckets_hardlinked_across_commit(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.dupspans import incremental_dupspans

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    _docs(spark, ROWS_A).write.parquet(docs_dir)
    incremental_dupspans(spark, docs_dir, store,
                         str(tmp_path / "w"), str(tmp_path / "ck"),
                         length=L).awaitTermination()
    v1 = snapshot.current_version(store)
    _docs(spark, [(9, "totally new island of words")]).write \
        .mode("append").parquet(docs_dir)
    incremental_dupspans(spark, docs_dir, store,
                         str(tmp_path / "w"), str(tmp_path / "ck"),
                         length=L).awaitTermination()
    v2 = snapshot.current_version(store)
    assert v2 != v1
    d1 = os.path.join(store, v1, "grams")
    d2 = os.path.join(store, v2, "grams")
    shared = 0
    for b in os.listdir(d1):
        if not b.startswith("bucket="):
            continue
        p2 = os.path.join(d2, b)
        if os.path.isdir(p2):
            f1 = sorted(f for f in os.listdir(os.path.join(d1, b))
                        if f.endswith(".parquet"))
            f2 = sorted(f for f in os.listdir(p2)
                        if f.endswith(".parquet"))
            if f1 and f1 == f2 and all(
                os.stat(os.path.join(d1, b, f)).st_ino
                == os.stat(os.path.join(p2, f)).st_ino for f in f1):
                shared += 1
    assert shared > 0  # at least one untouched bucket is inode-shared


def test_empty_batch_and_short_docs(spark, tmp_path):
    from mms_rdf_spark.streaming.dupspans import dupspans_batch

    emit, merged, touched = dupspans_batch(
        spark, _docs(spark, [(1, "a b")]), str(tmp_path / "s"),
        length=L)
    assert emit.count() == 0 and merged.count() == 0
    assert touched == set()
