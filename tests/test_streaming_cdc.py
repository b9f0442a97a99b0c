"""Incremental CDC chunk store (streaming/cdc.py): two-wave render
equality with the batch operator, any-split equivalence, replay
no-op, untouched-bucket hardlinks."""

from __future__ import annotations

import hashlib
import os


def _media(spark, items):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in items],
        "media_id long, payload binary")


def _blob(seed, blocks=40):
    return b"".join(hashlib.sha256(b"%s%d" % (seed, i)).digest()
                    for i in range(blocks))


ITEMS_A = [(1, _blob(b"a")), (2, _blob(b"b")),
           (3, b"PRE!" + _blob(b"a"))]        # shares chunks with 1
ITEMS_B = [(4, _blob(b"a")), (5, _blob(b"c")), (6, b"")]


def _batch_row(spark, items):
    from mms_rdf_spark.operators.multimodal import (
        cdc_chunks,
        cdc_dedup_stats,
    )

    r = cdc_dedup_stats(cdc_chunks(_media(spark, items))).collect()[0]
    return tuple(r)


def _rendered(spark, store):
    from mms_rdf_spark.streaming.cdc import render_cdc_stats

    return tuple(render_cdc_stats(spark, store).collect()[0])


def _run_wave(spark, data_dir, store, ckpt):
    from mms_rdf_spark.streaming.cdc import incremental_cdc

    incremental_cdc(spark, data_dir, store, ckpt).awaitTermination()


def test_two_wave_render_equals_batch_operator(spark, tmp_path):
    data = str(tmp_path / "data")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _media(spark, ITEMS_A).write.parquet(data)
    _run_wave(spark, data, store, ckpt)
    assert _rendered(spark, store) == _batch_row(spark, ITEMS_A)

    _media(spark, ITEMS_B).write.mode("append").parquet(data)
    _run_wave(spark, data, store, ckpt)
    got = _rendered(spark, store)
    assert got == _batch_row(spark, ITEMS_A + ITEMS_B)
    # the cross-wave duplicate (media 4 == media 1) really deduped
    assert got[5] < 1.0  # dedup_ratio
    # empty payload (media 6) produced no chunks and is not counted
    assert got[0] == 5  # n_media


def test_any_split_equivalence(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.cdc import cdc_store_batch

    one = str(tmp_path / "one")
    tables = cdc_store_batch(spark, _media(spark, ITEMS_A + ITEMS_B),
                             one)
    snapshot.commit(spark, one, 0, tables)

    three = str(tmp_path / "three")
    waves = [ITEMS_A[:1], ITEMS_A[1:] + ITEMS_B[:1], ITEMS_B[1:]]
    for i, wave in enumerate(waves):
        tables = cdc_store_batch(spark, _media(spark, wave), three)
        snapshot.commit(spark, three, i, tables)

    assert _rendered(spark, one) == _rendered(spark, three)


def test_replay_noop_and_untouched_buckets_hardlinked(spark,
                                                      tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.cdc import cdc_store_batch

    store = str(tmp_path / "store")
    tables = cdc_store_batch(spark, _media(spark, ITEMS_A), store)
    snapshot.commit(spark, store, 0, tables)
    v0 = snapshot.current_version(store)
    before = _rendered(spark, store)

    # manifest replay guard: same batch id cannot double-count occ
    snapshot.commit(spark, store, 0, tables)
    assert snapshot.current_version(store) == v0
    assert _rendered(spark, store) == before

    # a second wave with one tiny new payload touches few buckets
    t2 = cdc_store_batch(spark, _media(spark, [(9, b"Z" * 40)]),
                         store)
    snapshot.commit(spark, store, 1, t2)
    v1 = snapshot.current_version(store)
    touched = t2["counts"][1]
    old_dir = os.path.join(store, v0, "counts")
    new_dir = os.path.join(store, v1, "counts")
    untouched = [b for b in os.listdir(old_dir)
                 if b.startswith("bucket=")
                 and int(b.split("=")[1]) not in touched]
    assert untouched, "fixture must leave some bucket untouched"
    for bkt in untouched:
        old = os.path.join(old_dir, bkt)
        new = os.path.join(new_dir, bkt)
        assert ({os.stat(os.path.join(old, f)).st_ino
                 for f in os.listdir(old)}
                == {os.stat(os.path.join(new, f)).st_ino
                    for f in os.listdir(new)})
