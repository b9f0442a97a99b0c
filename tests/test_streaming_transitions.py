"""Incremental transition counts (streaming/transitions.py, twin
#19): two-wave render equality with transition_probs, RETROACTIVE
out-of-order repair (a late event splits an already-counted pair),
cross-wave boundary pairing, replay idempotence, untouched-bucket
hardlink reuse."""

from __future__ import annotations

import datetime as dt
import os


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")


# wave A: user 1 does a@1 -> c@3 (pair a->c); user 2 does b@1 -> b@2
ROWS_A = [
    (1, 1, "a", _ts(1)),
    (2, 1, "c", _ts(3)),
    (3, 2, "b", _ts(1)),
    (4, 2, "b", _ts(2)),
]
# wave B: user 1's LATE event b@2 lands BETWEEN a@1 and c@3 — the
# stale a->c must retract in favor of a->b and b->c; user 3 appears;
# user 2's new event pairs with their wave-A history (boundary pair)
ROWS_B = [
    (5, 1, "b", _ts(2)),
    (6, 3, "a", _ts(1)),
    (7, 3, "b", _ts(2)),
    (8, 2, "c", _ts(4)),
]


def _batch(spark, rows):
    from mms_rdf_spark.operators.analytics import transition_probs

    return {(r.src, r.dst): (r.n, r.p)
            for r in transition_probs(_events(spark, rows)).collect()}


def _rendered(spark, store):
    from mms_rdf_spark.streaming.transitions import render_transitions

    return {(r.src, r.dst): (r.n, r.p)
            for r in render_transitions(spark, store).collect()}


def _run_wave(spark, events_dir, store, ckpt):
    from mms_rdf_spark.streaming.transitions import (
        incremental_transitions,
    )

    incremental_transitions(spark, events_dir, store,
                            ckpt).awaitTermination()


def test_two_waves_with_retroactive_reorder_equal_batch(spark,
                                                        tmp_path):
    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _events(spark, ROWS_A).write.parquet(events_dir)
    _run_wave(spark, events_dir, store, ckpt)
    got = _rendered(spark, store)
    assert got == _batch(spark, ROWS_A)
    assert got[("a", "c")] == (1, 1.0)  # the pair wave B will retract

    _events(spark, ROWS_B).write.mode("append").parquet(events_dir)
    _run_wave(spark, events_dir, store, ckpt)
    got = _rendered(spark, store)
    assert got == _batch(spark, ROWS_A + ROWS_B)
    # the retroactive rewrite really happened
    assert ("a", "c") not in got          # stale pair retracted
    assert got[("a", "b")] == (2, 1.0)    # users 1 and 3
    assert got[("b", "c")][0] == 2        # user 1 late + user 2 boundary


def test_replay_is_noop_and_untouched_buckets_hardlinked(spark,
                                                         tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.transitions import transitions_batch

    store = str(tmp_path / "store")
    s, st, c, ct = transitions_batch(spark, _events(spark, ROWS_A),
                                     store)
    snapshot.commit(spark, store, 0, {"seq": (s, st),
                                      "counts": (c, ct)})
    v0 = snapshot.current_version(store)
    snapshot.commit(spark, store, 0, {"seq": (s, st),
                                      "counts": (c, ct)})
    assert snapshot.current_version(store) == v0  # replay no-op

    # a second wave touching ONLY one unseen user
    s2, st2, c2, ct2 = transitions_batch(
        spark, _events(spark, [(9, 99, "x", _ts(1)),
                               (10, 99, "y", _ts(2))]), store)
    snapshot.commit(spark, store, 1, {"seq": (s2, st2),
                                      "counts": (c2, ct2)})
    v1 = snapshot.current_version(store)
    for table, touched in (("seq", st2), ("counts", ct2)):
        untouched = [b for b in os.listdir(os.path.join(store, v0,
                                                        table))
                     if b.startswith("bucket=")
                     and int(b.split("=")[1]) not in touched]
        assert untouched, f"fixture must leave a {table} bucket alone"
        for bkt in untouched:
            old = os.path.join(store, v0, table, bkt)
            new = os.path.join(store, v1, table, bkt)
            assert ({os.stat(os.path.join(old, f)).st_ino
                     for f in os.listdir(old)}
                    == {os.stat(os.path.join(new, f)).st_ino
                        for f in os.listdir(new)})


def test_any_wave_split_equivalence(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.transitions import transitions_batch

    one = str(tmp_path / "one")
    two = str(tmp_path / "two")
    s, st, c, ct = transitions_batch(
        spark, _events(spark, ROWS_A + ROWS_B), one)
    snapshot.commit(spark, one, 0, {"seq": (s, st), "counts": (c, ct)})
    for i, rows in enumerate([ROWS_A, ROWS_B]):
        s, st, c, ct = transitions_batch(spark, _events(spark, rows),
                                         two)
        snapshot.commit(spark, two, i, {"seq": (s, st),
                                        "counts": (c, ct)})

    def full(root):
        tab = snapshot.read_table(spark, root, "counts")
        return {(r.src, r.dst, r.n) for r in tab.collect()}

    assert full(one) == full(two)
