"""Incremental concentration store (streaming/concentration.py):
two-wave render equality with gini_concentration, any-split, replay
no-op, untouched-bucket hardlinks."""

from __future__ import annotations

import os


def _events(spark, user_ids):
    return spark.createDataFrame([(u,) for u in user_ids],
                                 "user_id long")


WAVE_A = [1] * 10 + [2] * 3 + [3, 4, 5]
WAVE_B = [1] * 5 + [6] * 7 + [2, 7]


def _batch_row(spark, ids):
    from mms_rdf_spark.operators.analytics import gini_concentration

    r = gini_concentration(_events(spark, ids)).collect()[0]
    return (r.n_keys, r.gini)


def _rendered(spark, store):
    from mms_rdf_spark.streaming.concentration import render_gini

    r = render_gini(spark, store).collect()[0]
    return (r.n_keys, r.gini)


def test_two_wave_render_equals_batch(spark, tmp_path):
    from mms_rdf_spark.streaming.concentration import (
        incremental_concentration,
    )

    data = str(tmp_path / "data")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _events(spark, WAVE_A).write.parquet(data)
    incremental_concentration(spark, data, store,
                              ckpt).awaitTermination()
    assert _rendered(spark, store) == _batch_row(spark, WAVE_A)

    _events(spark, WAVE_B).write.mode("append").parquet(data)
    incremental_concentration(spark, data, store,
                              ckpt).awaitTermination()
    assert _rendered(spark, store) == _batch_row(spark,
                                                 WAVE_A + WAVE_B)
    # cross-wave accumulation really happened (user 1: 10 + 5)
    from mms_rdf_spark.streaming import snapshot
    tab = {r.key: r.x for r in
           snapshot.read_table(spark, store, "counts").collect()}
    assert tab["1"] == 15 and tab["6"] == 7


def test_split_equivalence_replay_and_hardlinks(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.concentration import conc_batch

    one = str(tmp_path / "one")
    c, t = conc_batch(spark, _events(spark, WAVE_A + WAVE_B), one)
    snapshot.commit(spark, one, 0, {"counts": (c, t)})

    two = str(tmp_path / "two")
    c0, t0 = conc_batch(spark, _events(spark, WAVE_A), two)
    snapshot.commit(spark, two, 0, {"counts": (c0, t0)})
    c1, t1 = conc_batch(spark, _events(spark, WAVE_B), two)
    snapshot.commit(spark, two, 1, {"counts": (c1, t1)})
    assert _rendered(spark, one) == _rendered(spark, two)

    # replay no-op
    v1 = snapshot.current_version(two)
    snapshot.commit(spark, two, 1, {"counts": (c1, t1)})
    assert snapshot.current_version(two) == v1

    # a wave touching one new key leaves other buckets hardlinked
    c2, t2 = conc_batch(spark, _events(spark, [999999]), two)
    snapshot.commit(spark, two, 2, {"counts": (c2, t2)})
    v2 = snapshot.current_version(two)
    old_dir = os.path.join(two, v1, "counts")
    new_dir = os.path.join(two, v2, "counts")
    untouched = [b for b in os.listdir(old_dir)
                 if b.startswith("bucket=")
                 and int(b.split("=")[1]) not in t2]
    assert untouched
    for bkt in untouched:
        old = os.path.join(old_dir, bkt)
        new = os.path.join(new_dir, bkt)
        assert ({os.stat(os.path.join(old, f)).st_ino
                 for f in os.listdir(old)}
                == {os.stat(os.path.join(new, f)).st_ino
                    for f in os.listdir(new)})
