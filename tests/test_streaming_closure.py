"""Incremental transitive closure (streaming/closure.py): two-wave
cumulative equality with bridging edges (the old*·new·old*·new·old*
decomposition path), exactly-once pair emission, replay no-op, and
duplicate/implied-edge re-arrival."""

from __future__ import annotations

import pyspark.sql.functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _batch_closure(spark, rows):
    from mms_rdf_spark.plans.closure import transitive_closure

    out = transitive_closure(
        _edges(spark, rows).select(F.col("src").alias("sub"),
                                   F.col("dst").alias("sup")),
        reflexive=False)
    return {(r.sub, r.sup) for r in out.collect()}


# wave A: two disjoint chains; wave B: a BRIDGE b->c plus a tail edge
# — new pairs must compose old-prefix · new · old-suffix · (and the
# multi-new-edge path a->b->c->d->e->f uses TWO new edges with an old
# segment between them)
WAVE_A = [("a", "b"), ("c", "d"), ("d", "e")]
WAVE_B = [("b", "c"), ("e", "f")]


def test_two_wave_equality_and_bridging(spark, tmp_path):
    from mms_rdf_spark.streaming.closure import (
        incremental_closure, read_closure, read_pairs)

    edges_dir = str(tmp_path / "edges")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")

    _edges(spark, WAVE_A).write.parquet(edges_dir)
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck")).awaitTermination()
    w1 = {(r.s, r.d) for r in read_pairs(spark, pairs_dir).collect()}
    assert w1 == _batch_closure(spark, WAVE_A)

    _edges(spark, WAVE_B).write.mode("append").parquet(edges_dir)
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck")).awaitTermination()
    rows = [(r.s, r.d) for r in read_pairs(spark, pairs_dir).collect()]
    assert len(rows) == len(set(rows))  # exactly-once
    full = _batch_closure(spark, WAVE_A + WAVE_B)
    assert set(rows) == full
    # the two-new-edge path with an old segment between them
    assert ("a", "f") in set(rows)
    # store == batch closure row-for-row
    got = {(r.s, r.d) for r in read_closure(spark, store).collect()}
    assert got == full


def test_duplicate_and_implied_edges_emit_nothing(spark, tmp_path):
    from mms_rdf_spark.streaming.closure import (
        incremental_closure, read_pairs)

    edges_dir = str(tmp_path / "edges")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    _edges(spark, [("a", "b"), ("b", "c")]).write.parquet(edges_dir)
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck")).awaitTermination()
    n1 = read_pairs(spark, pairs_dir).count()
    assert n1 == 3
    # re-arrivals: an exact duplicate and an already-implied edge
    _edges(spark, [("a", "b"), ("a", "c")]).write.mode("append") \
        .parquet(edges_dir)
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck")).awaitTermination()
    assert read_pairs(spark, pairs_dir).count() == n1


def test_replay_is_noop(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.closure import (
        incremental_closure, read_pairs)

    edges_dir = str(tmp_path / "edges")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    _edges(spark, WAVE_A).write.parquet(edges_dir)
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck1")).awaitTermination()
    v1 = snapshot.current_version(store)
    n1 = read_pairs(spark, pairs_dir).count()
    incremental_closure(spark, edges_dir, store, pairs_dir,
                        str(tmp_path / "ck2")).awaitTermination()
    assert snapshot.current_version(store) == v1
    assert read_pairs(spark, pairs_dir).count() == n1


def test_three_waves_random_graph_equality(spark, tmp_path):
    import random

    from mms_rdf_spark.streaming.closure import (
        incremental_closure, read_closure)

    rng = random.Random(17)
    edges = list({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                  for _ in range(25)})
    waves = [edges[:8], edges[8:16], edges[16:]]
    edges_dir = str(tmp_path / "edges")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    for i, w in enumerate(waves):
        mode = "overwrite" if i == 0 else "append"
        _edges(spark, w).write.mode(mode).parquet(edges_dir)
        incremental_closure(spark, edges_dir, store, pairs_dir,
                            str(tmp_path / "ck")).awaitTermination()
    got = {(r.s, r.d) for r in read_closure(spark, store).collect()}
    assert got == _batch_closure(spark, edges)
