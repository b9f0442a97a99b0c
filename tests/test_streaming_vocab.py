"""Incremental token-count vocabulary (streaming/vocab.py): two-wave
render equality with the batch operator, additive merge across waves,
replay idempotence, untouched-bucket hardlink reuse."""

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
    (4, "banana banana elderberry apple"),
    (5, "apple cherry fig"),
    (6, None),  # NULL text contributes nothing
]


def _batch_vocab(spark, rows, k=50):
    from mms_rdf_spark.operators.textstats import token_vocab

    return [(r.token, r.n, r.rank) for r in
            token_vocab(_docs(spark, rows), k=k)
            .orderBy("rank").collect()]


def _rendered(spark, store, k=50):
    from mms_rdf_spark.streaming.vocab import render_vocab

    return [(r.token, r.n, r.rank) for r in
            render_vocab(spark, store, k=k).orderBy("rank").collect()]


def _run_wave(spark, docs_dir, store, ckpt):
    from mms_rdf_spark.streaming.vocab import incremental_vocab

    incremental_vocab(spark, docs_dir, store, ckpt).awaitTermination()


def test_two_wave_equals_batch_operator(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    assert _rendered(spark, store) == _batch_vocab(spark, ROWS_A)

    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    _run_wave(spark, docs_dir, store, ckpt)
    got = _rendered(spark, store)
    assert got == _batch_vocab(spark, ROWS_A + ROWS_B)
    # the cross-wave token really accumulated (3 from A + 2 from B)
    assert ("apple", 5, 1) in got
    # top-k truncation matches the batch operator too
    assert _rendered(spark, store, k=2) \
        == _batch_vocab(spark, ROWS_A + ROWS_B, k=2)


def test_replay_is_noop_and_untouched_buckets_hardlinked(spark,
                                                         tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.vocab import vocab_batch

    store = str(tmp_path / "store")
    counts, touched = vocab_batch(spark, _docs(spark, ROWS_A), store)
    snapshot.commit(spark, store, 0, {"counts": (counts, touched)})
    v0 = snapshot.current_version(store)
    snapshot.commit(spark, store, 0, {"counts": (counts, touched)})
    assert snapshot.current_version(store) == v0  # replay no-op

    # second wave touching ONLY one new token's bucket
    c2, t2 = vocab_batch(spark, _docs(spark, [(7, "zzz_only")]), store)
    snapshot.commit(spark, store, 1, {"counts": (c2, t2)})
    v1 = snapshot.current_version(store)
    untouched = [b for b in os.listdir(os.path.join(store, v0,
                                                    "counts"))
                 if b.startswith("bucket=")
                 and int(b.split("=")[1]) not in t2]
    assert untouched, "fixture must leave some bucket untouched"
    for bkt in untouched:
        old = os.path.join(store, v0, "counts", bkt)
        new = os.path.join(store, v1, "counts", bkt)
        assert ({os.stat(os.path.join(old, f)).st_ino
                 for f in os.listdir(old)}
                == {os.stat(os.path.join(new, f)).st_ino
                    for f in os.listdir(new)})


def test_three_way_wave_split_equivalence(spark, tmp_path):
    """Any wave split yields the same store contents: one-shot vs
    two-wave renders are identical beyond top-k — compare the FULL
    vocabulary."""
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.vocab import vocab_batch

    one = str(tmp_path / "one")
    two = str(tmp_path / "two")
    c, t = vocab_batch(spark, _docs(spark, ROWS_A + ROWS_B), one)
    snapshot.commit(spark, one, 0, {"counts": (c, t)})
    c0, t0 = vocab_batch(spark, _docs(spark, ROWS_A), two)
    snapshot.commit(spark, two, 0, {"counts": (c0, t0)})
    c1, t1 = vocab_batch(spark, _docs(spark, ROWS_B), two)
    snapshot.commit(spark, two, 1, {"counts": (c1, t1)})

    def full(root):
        tab = snapshot.read_table(spark, root, "counts")
        return {(r.token, r.n) for r in tab.collect()}

    assert full(one) == full(two)
