"""Incremental Misra-Gries heavy hitters (streaming/hitters.py, twin
#20): the mergeability invariant (every estimate within n/(k+1) of
exact, every guaranteed-frequent item present) across waves and wave
splits, exact-total tracking, replay idempotence."""

from __future__ import annotations

from collections import Counter


def _items(spark, values):
    return spark.createDataFrame([(v,) for v in values],
                                 "item string")


# skewed stream: 'a' dominates, 'b' frequent, long tail of singletons
WAVE_A = ["a"] * 30 + ["b"] * 12 + [f"t{i}" for i in range(20)]
WAVE_B = ["a"] * 25 + ["b"] * 10 + ["c"] * 18 + \
    [f"u{i}" for i in range(15)]


def _check_invariant(rendered, exact: Counter, k: int):
    n = sum(exact.values())
    got = {r["item"]: r["est_count"] for r in rendered}
    bound = n / (k + 1)
    # (a) every certainly-frequent item is present
    for item, true in exact.items():
        if true > bound:
            assert item in got, (item, true, bound)
    # (b) every estimate is within the additive bound, never over
    for item, est in got.items():
        true = exact[item]
        assert true - bound <= est <= true, (item, est, true, bound)
    # n is tracked exactly
    assert all(r["n"] == n for r in rendered)


def test_two_waves_keep_the_mg_invariant(spark, tmp_path):
    from mms_rdf_spark.streaming.hitters import (
        incremental_hitters, render_hitters)

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    k = 8

    _items(spark, WAVE_A).write.parquet(src)
    incremental_hitters(spark, src, store, ckpt, "item",
                        k).awaitTermination()
    _check_invariant(render_hitters(spark, store).collect(),
                     Counter(WAVE_A), k)

    _items(spark, WAVE_B).write.mode("append").parquet(src)
    incremental_hitters(spark, src, store, ckpt, "item",
                        k).awaitTermination()
    rendered = render_hitters(spark, store).collect()
    _check_invariant(rendered, Counter(WAVE_A + WAVE_B), k)
    # the dominators survived the merge
    items = {r["item"] for r in rendered}
    assert {"a", "b"} <= items
    # the summary stays bounded
    assert len(rendered) <= k


def test_wave_split_keeps_invariant_and_replay_is_noop(spark,
                                                       tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.hitters import (
        hitters_batch, render_hitters)

    k = 8
    exact = Counter(WAVE_A + WAVE_B)

    # one-shot vs two-wave stores both certify against the SAME
    # exact counts (contents may differ — the invariant is the
    # contract, like any MG deployment)
    one = str(tmp_path / "one")
    mg, meta = hitters_batch(spark, _items(spark, WAVE_A + WAVE_B),
                             one, "item", k)
    snapshot.commit(spark, one, 0, {"mg": (mg, None),
                                    "meta": (meta, None)}, n_buckets=1)
    _check_invariant(render_hitters(spark, one).collect(), exact, k)

    two = str(tmp_path / "two")
    for i, wave in enumerate([WAVE_A, WAVE_B]):
        mg, meta = hitters_batch(spark, _items(spark, wave), two,
                                 "item", k)
        snapshot.commit(spark, two, i, {"mg": (mg, None),
                                        "meta": (meta, None)},
                        n_buckets=1)
    _check_invariant(render_hitters(spark, two).collect(), exact, k)

    # replay of an applied batch id is a no-op
    v = snapshot.current_version(two)
    mg, meta = hitters_batch(spark, _items(spark, WAVE_B), two,
                             "item", k)
    snapshot.commit(spark, two, 1, {"mg": (mg, None),
                                    "meta": (meta, None)}, n_buckets=1)
    assert snapshot.current_version(two) == v


def test_empty_wave_and_null_items(spark, tmp_path):
    from mms_rdf_spark.streaming import snapshot
    from mms_rdf_spark.streaming.hitters import (
        hitters_batch, render_hitters)

    store = str(tmp_path / "store")
    mg, meta = hitters_batch(
        spark, spark.createDataFrame([("a",), (None,)], "item string"),
        store, "item", 4)
    snapshot.commit(spark, store, 0, {"mg": (mg, None),
                                      "meta": (meta, None)},
                    n_buckets=1)
    rows = render_hitters(spark, store).collect()
    assert [(r["item"], r["est_count"], r["n"]) for r in rows] \
        == [("a", 1, 1)]

    # an empty wave advances the batch id but changes nothing
    mg, meta = hitters_batch(
        spark, spark.createDataFrame([], "item string"), store,
        "item", 4)
    snapshot.commit(spark, store, 1, {"mg": (mg, None),
                                      "meta": (meta, None)},
                    n_buckets=1)
    rows = render_hitters(spark, store).collect()
    assert [(r["item"], r["est_count"], r["n"]) for r in rows] \
        == [("a", 1, 1)]
