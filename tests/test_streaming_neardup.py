"""Incremental MinHash/LSH near-dup (streaming/neardup.py):
single-batch parity with the batch operator, two-wave cumulative
equality, exactly-once pair emission, and store commit idempotence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


ROWS_A = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different content about spark and parquet"),
    (4, "the quick brown fox jumps over the lazy dog"),
]
ROWS_B = [
    (5, "the quick brown fox jumps over the lazy dog today"),
    (6, "completely different content about spark and parquet"),
    (7, "unrelated text with its own vocabulary entirely xyzzy"),
]


def _batch_pairs(spark, rows):
    from mms_rdf_spark.operators.dedup import lsh_candidate_pairs

    return {(r.a_id, r.b_id) for r in
            lsh_candidate_pairs(_docs(spark, rows),
                                max_bucket=None).collect()}


def test_single_batch_matches_batch_operator(spark, tmp_path):
    from mms_rdf_spark.streaming.neardup import neardup_batch

    pairs, merged, touched = neardup_batch(
        spark, _docs(spark, ROWS_A), str(tmp_path / "store"))
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert got == _batch_pairs(spark, ROWS_A)
    assert touched == {r.bucket for r in
                       merged.select("bucket").distinct().collect()}


def test_two_wave_cumulative_equality_and_exactly_once(spark, tmp_path):
    from mms_rdf_spark.streaming.neardup import (
        incremental_neardup, read_pairs, read_signatures)

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    incremental_neardup(
        spark, docs_dir, store, pairs_dir, ckpt).awaitTermination()
    wave1 = {(r.a_id, r.b_id) for r in read_pairs(spark, pairs_dir)
             .select("a_id", "b_id").collect()}
    assert wave1 == _batch_pairs(spark, ROWS_A)

    _docs(spark, ROWS_B).write.mode("append").parquet(docs_dir)
    incremental_neardup(
        spark, docs_dir, store, pairs_dir, ckpt).awaitTermination()
    got = read_pairs(spark, pairs_dir)
    all_pairs = [(r.a_id, r.b_id) for r in
                 got.select("a_id", "b_id").collect()]
    # cumulative == batch operator on the full corpus ...
    assert set(all_pairs) == _batch_pairs(spark, ROWS_A + ROWS_B)
    # ... and exactly-once: no pair emitted by two batches
    assert len(all_pairs) == len(set(all_pairs))
    # wave-2 pairs all have >=1 wave-2 side
    w2 = {(r.a_id, r.b_id) for r in
          got.where(F.col("batch") > got.agg(
              F.min("batch")).first()[0])
          .select("a_id", "b_id").collect()}
    new_ids = {d for d, _ in ROWS_B}
    assert all(a in new_ids or b in new_ids for a, b in w2)
    # store now holds every doc's signatures
    sigs = read_signatures(spark, store)
    assert ({r.doc_id for r in sigs.select("doc_id").distinct().collect()}
            == {d for d, _ in ROWS_A + ROWS_B})


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.neardup import (
        incremental_neardup, read_pairs)

    docs_dir = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")

    _docs(spark, ROWS_A).write.parquet(docs_dir)
    incremental_neardup(spark, docs_dir, store, pairs_dir,
                        str(tmp_path / "ckpt")).awaitTermination()
    version = snapshot.current_version(store)
    n = read_pairs(spark, pairs_dir).count()
    # fresh checkpoint replays batch 0 against the committed store:
    # the applied-batch guard makes it a no-op (no new version, no
    # duplicate pairs)
    incremental_neardup(spark, docs_dir, store, pairs_dir,
                        str(tmp_path / "ckpt2")).awaitTermination()
    assert snapshot.current_version(store) == version
    assert read_pairs(spark, pairs_dir).count() == n


def test_probe_join_broadcasts_batch_keys_only(spark, tmp_path):
    """The store-probe must be a broadcast LEFT SEMI of the BATCH's
    band-keys against the store — never a store-sized broadcast or a
    full-store pair scan."""
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.neardup import neardup_batch
    from mms_rdf_spark.streaming.snapshot import bucket_col

    store = str(tmp_path / "store")
    _, merged, touched = neardup_batch(
        spark, _docs(spark, ROWS_A), store)
    snapshot.commit(spark, store, 0, {"banded": (merged, touched)})
    pairs, _, _ = neardup_batch(spark, _docs(spark, ROWS_B), store)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
