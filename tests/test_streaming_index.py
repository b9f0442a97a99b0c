"""Incremental inverted index (streaming/index.py): single-batch and
two-wave equality with the batch operator, min-k cap merge safety,
replay idempotence, untouched-bucket reuse."""

from __future__ import annotations

import os


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


ROWS_A = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple date date date"),
]
ROWS_B = [
    (4, "banana banana elderberry"),
    (5, "apple cherry fig"),
]


def _batch_index(spark, rows, max_postings=32):
    from mms_rdf_spark.operators.textstats import inverted_index

    return {r.token: (r.df, r.postings) for r in
            inverted_index(_docs(spark, rows),
                           max_postings=max_postings).collect()}


def _rendered(spark, store):
    from mms_rdf_spark.streaming.index import render_index

    return {r.token: (r.df, r.postings)
            for r in render_index(spark, store).collect()}


def _run_wave(spark, docs_dir, store, ckpt, max_postings=32):
    from mms_rdf_spark.streaming.index import incremental_index

    incremental_index(spark, docs_dir, store, ckpt,
                      max_postings=max_postings).awaitTermination()


def test_two_wave_equals_batch_operator(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    assert _rendered(spark, store) == _batch_index(spark, ROWS_A)

    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    assert _rendered(spark, store) \
        == _batch_index(spark, ROWS_A + ROWS_B)


def test_min_k_cap_is_merge_safe(spark, tmp_path):
    # cap 2: wave 1 stores docs {1,3} for 'apple'; wave 2 brings doc 5
    # which must NOT displace smaller ids, and df keeps counting past
    # the cap — exactly the batch operator's semantics on the union
    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt, max_postings=2)
    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt, max_postings=2)
    got = _rendered(spark, store)
    assert got == _batch_index(spark, ROWS_A + ROWS_B, max_postings=2)
    assert got["apple"] == (3, "1:2,3:1")  # df counts past the cap


def test_replay_is_noop_and_untouched_buckets_hardlinked(spark,
                                                         tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.index import index_batch

    store = str(tmp_path / "store")
    entries, dfc, touched = index_batch(
        spark, _docs(spark, ROWS_A), store)
    snapshot.commit(spark, store, 0,
                    {"entries": (entries, touched),
                     "dfc": (dfc, touched)})
    v0 = snapshot.current_version(store)
    # replay of batch 0 is a no-op
    snapshot.commit(spark, store, 0,
                    {"entries": (entries, touched),
                     "dfc": (dfc, touched)})
    assert snapshot.current_version(store) == v0

    # wave 2 touching a subset of buckets: untouched buckets of the
    # new version hardlink the SAME inodes as v0 (byte-identical)
    e2, d2, t2 = index_batch(spark, _docs(spark, ROWS_B), store)
    snapshot.commit(spark, store, 1,
                    {"entries": (e2, t2), "dfc": (d2, t2)})
    v1 = snapshot.current_version(store)
    untouched = set()
    v0_entries = os.path.join(store, v0, "entries")
    for b in os.listdir(v0_entries):
        if b.startswith("bucket=") \
                and int(b.split("=")[1]) not in t2:
            untouched.add(b)
    assert untouched, "fixture must leave some bucket untouched"
    for b in untouched:
        old = os.path.join(store, v0, "entries", b)
        new = os.path.join(store, v1, "entries", b)
        old_inodes = {os.stat(os.path.join(old, f)).st_ino
                      for f in os.listdir(old)}
        new_inodes = {os.stat(os.path.join(new, f)).st_ino
                      for f in os.listdir(new)}
        assert old_inodes == new_inodes
