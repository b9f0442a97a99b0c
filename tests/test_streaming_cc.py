"""Incremental connected components (streaming/cc.py): two-wave label
equality with the batch operator — including a wave-2 edge BRIDGING
two wave-1 components (the transitive merge the blocking-key linker
cannot see) — plus replay idempotence."""

from __future__ import annotations


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


WAVE_A = [("a", "b"), ("b", "c"), ("x", "y"), ("m", "n")]
# wave 2: grow one component, BRIDGE {a,b,c} with {x,y}, and mint a
# fresh singleton pair
WAVE_B = [("c", "d"), ("y", "a"), ("p", "q")]


def _batch_labels(spark, pairs):
    from mms_rdf_spark.operators.cc import connected_components

    return {r.node: r.component for r in
            connected_components(_edges(spark, pairs)).collect()}


def _store_labels(spark, store):
    from mms_rdf_spark.streaming.cc import read_components

    return {r.node: r.comp
            for r in read_components(spark, store).collect()}


def test_two_wave_equality_with_bridging_merge(spark, tmp_path):
    from mms_rdf_spark.streaming.cc import incremental_cc

    edges_dir = str(tmp_path / "edges")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _edges(spark, WAVE_A).write.parquet(edges_dir)
    incremental_cc(spark, edges_dir, store, ckpt).awaitTermination()
    assert _store_labels(spark, store) == _batch_labels(spark, WAVE_A)

    _edges(spark, WAVE_B).write.mode("append").parquet(edges_dir)
    incremental_cc(spark, edges_dir, store, ckpt).awaitTermination()
    got = _store_labels(spark, store)
    assert got == _batch_labels(spark, WAVE_A + WAVE_B)
    # the bridge merged {a..d} with {x,y}: one label, the min member
    assert len({got[n] for n in "abcdxy"}) == 1
    assert got["a"] == "a"
    # untouched component kept its label; the new pair got its own
    assert got["m"] == got["n"] == "m"
    assert got["p"] == got["q"] == "p"


def test_replay_is_noop(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.cc import cc_batch

    store = str(tmp_path / "store")
    labels, touched = cc_batch(spark, _edges(spark, WAVE_A), store)
    snapshot.commit(spark, store, 0, {"labels": (labels, touched)})
    v0 = snapshot.current_version(store)
    snapshot.commit(spark, store, 0, {"labels": (labels, touched)})
    assert snapshot.current_version(store) == v0


def test_wave2_only_rewrites_affected_components(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.cc import cc_batch

    store = str(tmp_path / "store")
    labels, touched = cc_batch(spark, _edges(spark, WAVE_A), store)
    snapshot.commit(spark, store, 0, {"labels": (labels, touched)})
    l2, t2 = cc_batch(spark, _edges(spark, [("c", "d")]), store)
    # only component 'a' (and d's would-be singleton) is affected:
    # the {x,y} and {m,n} buckets must not be in the touched set
    # unless they hash-collide with the affected ones
    from mms_rdf_spark.streaming.snapshot import N_BUCKETS
    import zlib

    def b(comp):
        return zlib.crc32(comp.encode()) % N_BUCKETS

    assert b("a") in t2
    collide = {b("a"), b("d")}
    if b("x") not in collide:
        assert b("x") not in t2
    if b("m") not in collide:
        assert b("m") not in t2
