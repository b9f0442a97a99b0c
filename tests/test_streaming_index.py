"""Incremental inverted index + BM25 serving (streaming/index.py):
two-wave render equality with the batch operator, render-time cap
semantics, BM25-from-store row identity with bm25_topk, replay
idempotence, untouched-bucket reuse."""

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
    (6, None),  # NULL text: counted in N, excluded from avgdl
]


def _batch_index(spark, rows, max_postings=32):
    from mms_rdf_spark.operators.textstats import inverted_index

    return {r.token: (r.df, r.postings) for r in
            inverted_index(_docs(spark, rows),
                           max_postings=max_postings).collect()}


def _rendered(spark, store, max_postings=32):
    from mms_rdf_spark.streaming.index import render_index

    return {r.token: (r.df, r.postings)
            for r in render_index(spark, store,
                                  max_postings=max_postings).collect()}


def _run_wave(spark, docs_dir, store, ckpt):
    from mms_rdf_spark.streaming.index import incremental_index

    incremental_index(spark, docs_dir, store, ckpt).awaitTermination()


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
    # render-time cap: df keeps counting past the cap
    got = _rendered(spark, store, max_postings=2)
    assert got == _batch_index(spark, ROWS_A + ROWS_B, max_postings=2)
    assert got["apple"] == (3, "1:2,3:1")


def test_bm25_from_store_matches_batch_scorer(spark, tmp_path):
    from mms_rdf_spark.operators.textstats import bm25_topk
    from mms_rdf_spark.streaming.index import bm25_from_index

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, ROWS_A).write.parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)

    terms = ["apple", "cherry", "missingterm"]
    want = [(r.doc_id, r.score) for r in
            bm25_topk(_docs(spark, ROWS_A + ROWS_B), terms,
                      k=5).collect()]
    got = [(r.doc_id, r.score) for r in
           bm25_from_index(spark, store, terms, k=5).collect()]
    assert got == want  # ROW-IDENTICAL: same idf/avgdl rounding
    assert want  # fixture sanity: the query matches something


def test_replay_is_noop_and_untouched_buckets_hardlinked(spark,
                                                         tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.index import index_batch

    store = str(tmp_path / "store")
    entries, dfc, doclen, t_tok, t_doc = index_batch(
        spark, _docs(spark, ROWS_A), store)
    snapshot.commit(spark, store, 0,
                    {"entries": (entries, t_tok),
                     "dfc": (dfc, t_tok),
                     "doclen": (doclen, t_doc)})
    v0 = snapshot.current_version(store)
    snapshot.commit(spark, store, 0,
                    {"entries": (entries, t_tok),
                     "dfc": (dfc, t_tok),
                     "doclen": (doclen, t_doc)})
    assert snapshot.current_version(store) == v0  # replay no-op

    e2, d2, l2, t2, td2 = index_batch(spark, _docs(spark, ROWS_B),
                                      store)
    snapshot.commit(spark, store, 1,
                    {"entries": (e2, t2), "dfc": (d2, t2),
                     "doclen": (l2, td2)})
    v1 = snapshot.current_version(store)
    untouched = set()
    v0_entries = os.path.join(store, v0, "entries")
    for bkt in os.listdir(v0_entries):
        if bkt.startswith("bucket=") \
                and int(bkt.split("=")[1]) not in t2:
            untouched.add(bkt)
    assert untouched, "fixture must leave some bucket untouched"
    for bkt in untouched:
        old = os.path.join(store, v0, "entries", bkt)
        new = os.path.join(store, v1, "entries", bkt)
        old_inodes = {os.stat(os.path.join(old, f)).st_ino
                      for f in os.listdir(old)}
        new_inodes = {os.stat(os.path.join(new, f)).st_ino
                      for f in os.listdir(new)}
        assert old_inodes == new_inodes
