"""Incremental KMV distinct-count sketch (streaming/kmv.py): two-wave
render equality with the batch operator, any-split equivalence,
replay idempotence (by algebra AND manifest), and the
nothing-new-touches-nothing hardlink property."""

from __future__ import annotations

import os


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


VALS_A = [f"user{i}" for i in range(40)]
VALS_B = [f"user{i}" for i in range(30, 90)]  # overlaps A


def _batch_row(spark, vals, k=16):
    from mms_rdf_spark.operators.sketch import kmv_distinct

    r = kmv_distinct(_vals(spark, vals), "v", k=k).collect()[0]
    return (r.k_used, r.kth_hash, r.est_distinct)


def _rendered(spark, store, k=16):
    from mms_rdf_spark.streaming.kmv import render_distinct

    r = render_distinct(spark, store, k=k).collect()[0]
    return (r.k_used, r.kth_hash, r.est_distinct)


def _run_wave(spark, data_dir, store, ckpt, k=16):
    from mms_rdf_spark.streaming.kmv import incremental_kmv

    incremental_kmv(spark, data_dir, store, ckpt, "v",
                    k=k).awaitTermination()


def test_two_wave_render_equals_batch_operator(spark, tmp_path):
    data = str(tmp_path / "data")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _vals(spark, VALS_A).write.parquet(data)
    _run_wave(spark, data, store, ckpt)
    assert _rendered(spark, store) == _batch_row(spark, VALS_A)

    _vals(spark, VALS_B).write.mode("append").parquet(data)
    _run_wave(spark, data, store, ckpt)
    assert _rendered(spark, store) == _batch_row(spark,
                                                 VALS_A + VALS_B)
    # estimator really saturated: 90 distinct > k=16 -> estimate path
    assert _rendered(spark, store)[0] == 16


def test_any_split_equivalence_and_small_corpus_exact(spark,
                                                      tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.kmv import kmv_batch

    # under k distinct values: the sketch IS the value set, count
    # exact, and any 3-way split commits the identical store
    vals = [f"x{i}" for i in range(10)]
    one = str(tmp_path / "one")
    sk, t = kmv_batch(spark, _vals(spark, vals), one, "v", k=16)
    snapshot.commit(spark, one, 0, {"sketch": (sk, t)})

    three = str(tmp_path / "three")
    for i, chunk in enumerate([vals[:3], vals[3:4], vals[4:]]):
        sk, t = kmv_batch(spark, _vals(spark, chunk), three, "v",
                          k=16)
        snapshot.commit(spark, three, i, {"sketch": (sk, t)})

    def full(root):
        tab = snapshot.read_table(spark, root, "sketch")
        return {r.h for r in tab.collect()}

    assert full(one) == full(three)
    assert _rendered(spark, one) == _rendered(spark, three)
    assert _rendered(spark, one)[0] == 10  # exact below k
    assert _rendered(spark, one)[2] == 10.0


def test_replay_noop_and_no_new_touches_nothing(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.kmv import kmv_batch

    store = str(tmp_path / "store")
    sk, t = kmv_batch(spark, _vals(spark, VALS_A), store, "v", k=16)
    snapshot.commit(spark, store, 0, {"sketch": (sk, t)})
    v0 = snapshot.current_version(store)

    # manifest replay guard: same batch id is a no-op
    snapshot.commit(spark, store, 0, {"sketch": (sk, t)})
    assert snapshot.current_version(store) == v0

    # algebraic idempotence: re-merging already-seen values changes
    # nothing and touches NO buckets -> every file hardlinks forward
    sk2, t2 = kmv_batch(spark, _vals(spark, VALS_A[:7]), store, "v",
                        k=16)
    assert t2 == set()
    snapshot.commit(spark, store, 1, {"sketch": (sk2, t2)})
    v1 = snapshot.current_version(store)
    old_dir = os.path.join(store, v0, "sketch")
    new_dir = os.path.join(store, v1, "sketch")
    for bkt in os.listdir(old_dir):
        if not bkt.startswith("bucket="):
            continue
        old = os.path.join(old_dir, bkt)
        new = os.path.join(new_dir, bkt)
        assert ({os.stat(os.path.join(old, f)).st_ino
                 for f in os.listdir(old)}
                == {os.stat(os.path.join(new, f)).st_ino
                    for f in os.listdir(new)})
    assert _rendered(spark, store) == _batch_row(spark, VALS_A)
