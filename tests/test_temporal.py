from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mms_rdf_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
    time_rollup,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(20)),
         (4, 20, _ts(7)), (5, 30, _ts(1))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(4), 1.0), (10, _ts(10), 2.0), (10, _ts(15), 3.0),
         (20, _ts(9), 9.0)],
        "user_id long, ts timestamp, value double")
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _fixture(spark)
    got = {r["event_id"]: r["asof_value"]
           for r in asof_join(left, right, on="user_id").collect()}
    # t=5 -> right@4; t=10 -> right@10 (equal ts INCLUDED); t=20 -> right@15
    assert got == {1: 1.0, 2: 2.0, 3: 3.0,
                   4: None,   # user 20's only right row is later (t=9 > 7)
                   5: None}   # user 30 has no right rows


def test_asof_forward_picks_earliest_at_or_after(spark):
    left, right = _fixture(spark)
    got = {r["event_id"]: r["asof_value"]
           for r in asof_join(left, right, on="user_id",
                              direction="forward").collect()}
    assert got == {1: 2.0, 2: 2.0, 3: None, 4: 9.0, 5: None}


def test_asof_is_one_exchange_no_join(spark):
    """The whole point vs a theta-join: one hash exchange on the key,
    zero Join nodes (a naive l.ts >= r.ts join plans a
    BroadcastNestedLoopJoin that is quadratic per key)."""
    left, right = _fixture(spark)
    plan = asof_join(left, right, on="user_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_range_join_matches_naive_inequality_join(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = (ev.where(F.col("event_type") == "error")
          .select(F.col("event_id").alias("interval_id"), "user_id",
                  F.col("ts").alias("start_ts"),
                  (F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
                  .alias("end_ts")))
    pt = (ev.where(F.col("event_type") == "click")
          .select(F.col("event_id").alias("point_id"), "user_id", "ts"))
    got = sorted(
        (r["interval_id"], r["point_id"])
        for r in range_join_bucketed(iv, pt, on="user_id").collect())
    naive = sorted(
        (r["interval_id"], r["point_id"])
        for r in iv.join(pt.withColumnRenamed("user_id", "u2"),
                         (F.col("user_id") == F.col("u2"))
                         & F.col("ts").between(F.col("start_ts"),
                                               F.col("end_ts")))
        .collect())
    assert got == naive and len(got) > 0


def test_range_join_plans_equi_join_not_nested_loop(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = (ev.where(F.col("event_type") == "error")
          .select(F.col("event_id").alias("interval_id"), "user_id",
                  F.col("ts").alias("start_ts"),
                  (F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
                  .alias("end_ts")))
    pt = (ev.where(F.col("event_type") == "click")
          .select(F.col("event_id").alias("point_id"), "user_id", "ts"))
    plan = range_join_bucketed(iv, pt, on="user_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan  # a real equi-join on (key, bucket)


def test_rollup_levels_are_consistent(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = time_rollup(ev).collect()
    total = [r for r in rows if r["level"] == 3]
    days = [r for r in rows if r["level"] == 1]
    hours = [r for r in rows if r["level"] == 0]
    assert len(total) == 1
    assert total[0]["n"] == ev.count() == sum(r["n"] for r in days)
    assert sum(r["n"] for r in hours) == total[0]["n"]
    # every hour row nests inside its day row
    day_keys = {r["day_s"] for r in days}
    assert all(r["day_s"] in day_keys for r in hours)
    assert all(r["hour_s"] is None for r in days)


def test_asof_property_matches_naive_reference(spark):
    """Randomized (hypothesis) check of the union-window formulation
    against a driver-side naive reference, including duplicate
    timestamps on both sides (right pre-aggregated per the uniqueness
    contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(st.integers(0, 3), st.integers(0, 40))
    triple = st.tuples(st.integers(0, 3), st.integers(0, 40),
                       st.integers(-5, 5))
    base = dt.datetime(2024, 1, 1)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=25),
           st.lists(triple, min_size=0, max_size=25))
    def check(lrows, rrows):
        left = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=t))
             for i, (k, t) in enumerate(lrows)],
            "event_id long, user_id long, ts timestamp")
        ragg = {}
        for k, t, v in rrows:
            ragg[(k, t)] = max(ragg.get((k, t), float(v)), float(v))
        right = spark.createDataFrame(
            [(k, base + dt.timedelta(seconds=t), v)
             for (k, t), v in ragg.items()] or [(99, base, 0.0)],
            "user_id long, ts timestamp, value double")
        got = {r["event_id"]: r["asof_value"]
               for r in asof_join(left, right, on="user_id").collect()}
        for i, (k, t) in enumerate(lrows):
            cand = [(rt, v) for (rk, rt), v in ragg.items()
                    if rk == k and rt <= t]
            want = max(cand)[1] if cand else None
            assert got[i] == want, (i, k, t, got[i], want)

    check()


def test_range_join_property_matches_naive(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iv = st.tuples(st.integers(0, 2), st.integers(0, 60),
                   st.integers(0, 90))
    pt = st.tuples(st.integers(0, 2), st.integers(0, 120))

    base = dt.datetime(2024, 1, 1)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(iv, min_size=1, max_size=15),
           st.lists(pt, min_size=1, max_size=20))
    def check(ivs, pts):
        intervals = spark.createDataFrame(
            [(i, k, base + dt.timedelta(seconds=s),
              base + dt.timedelta(seconds=s + d))
             for i, (k, s, d) in enumerate(ivs)],
            "interval_id long, user_id long, "
            "start_ts timestamp, end_ts timestamp")
        points = spark.createDataFrame(
            [(j, k, base + dt.timedelta(seconds=t))
             for j, (k, t) in enumerate(pts)],
            "point_id long, user_id long, ts timestamp")
        got = sorted((r["interval_id"], r["point_id"]) for r in
                     range_join_bucketed(intervals, points,
                                         on="user_id",
                                         bucket_seconds=16).collect())
        want = sorted(
            (i, j)
            for i, (ik, s, d) in enumerate(ivs)
            for j, (pk, t) in enumerate(pts)
            if ik == pk and s <= t <= s + d)
        assert got == want

    check()


def test_gap_fill_fills_and_carries_forward(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("u", base, 5.0),
            ("u", base + dt.timedelta(hours=3), 9.0),
            ("v", base + dt.timedelta(hours=1), 1.0)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    from mms_rdf_spark.operators.temporal import gap_fill

    got = {(r["user_id"], r["bucket_s"]): (r["value"], r["is_observed"])
           for r in gap_fill(df, "user_id", step_seconds=3600).collect()}
    e0 = int(base.timestamp())  # session TZ is UTC
    # u: observed at h0 and h3, h1/h2 forward-filled with 5.0
    assert got[("u", e0)] == (5.0, True)
    assert got[("u", e0 + 3600)] == (5.0, False)
    assert got[("u", e0 + 7200)] == (5.0, False)
    assert got[("u", e0 + 10800)] == (9.0, True)
    # v: single observation -> single grid row
    assert got[("v", e0 + 3600)] == (1.0, True)
    assert len(got) == 5


def test_merge_upsert_semantics(spark):
    from mms_rdf_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)],
        "k long, v string, version int, deleted boolean")
    upd = spark.createDataFrame(
        [(2, "b2", 2, False),   # newer version wins
         (3, "c2", 2, True),    # tombstone removes the key
         (4, "d", 1, False),    # insert; version TIES base-era rows ->
         (1, "a2", 1, False)],  # update wins the tie
        "k long, v string, version int, deleted boolean")
    got = {r["k"]: (r["v"], r["version"]) for r in
           merge_upsert(base, upd, "k", "version",
                        deleted_col="deleted").collect()}
    assert got == {1: ("a2", 1), 2: ("b2", 2), 4: ("d", 1)}


def test_reserved_column_collisions_fail_fast(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 10, _ts(5), 0.0)],
        "event_id long, user_id long, ts timestamp, asof_value double")
    right = spark.createDataFrame(
        [(10, _ts(4), 1.0)], "user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="asof_join"):
        asof_join(left, right, on="user_id")
    iv = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(9), 7)],
        "interval_id long, user_id long, start_ts timestamp, "
        "end_ts timestamp, _bkt long")
    pt = spark.createDataFrame(
        [(2, 10, _ts(3))], "point_id long, user_id long, ts timestamp")
    with pytest.raises(ValueError, match="range_join"):
        range_join_bucketed(iv, pt, on="user_id")


def test_interval_overlap_join_semantics(spark):
    from mms_rdf_spark.operators.temporal import interval_overlap_join
    mk = lambda m0, m1: (dt.datetime(2024, 1, 1, 0, m0),
                         dt.datetime(2024, 1, 1, 0, m1))
    left = spark.createDataFrame(
        [(1, 10, *mk(0, 30)), (2, 10, *mk(50, 55)), (3, 20, *mk(0, 30))],
        "l_id long, user_id long, start_ts timestamp, end_ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, *mk(20, 40)),   # overlaps 1
         (101, 10, *mk(30, 45)),   # touches 1 at minute 30: NO overlap
         (102, 20, *mk(29, 31))],  # overlaps 3 (other key)
        "r_id long, user_id long, start_ts timestamp, end_ts timestamp")
    got = {(r["l_id"], r["r_id"]) for r in interval_overlap_join(
        left, right, on="user_id", bucket_seconds=600).collect()}
    assert got == {(1, 100), (3, 102)}


def test_interval_overlap_multibucket_dedup(spark):
    from mms_rdf_spark.operators.temporal import interval_overlap_join
    # long intervals share MANY buckets; the pair must appear once
    left = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 1, 10))],
        "l_id long, user_id long, start_ts timestamp, end_ts timestamp")
    right = spark.createDataFrame(
        [(2, 1, dt.datetime(2024, 1, 1, 1), dt.datetime(2024, 1, 1, 9))],
        "r_id long, user_id long, start_ts timestamp, end_ts timestamp")
    rows = interval_overlap_join(left, right, on="user_id").collect()
    assert len(rows) == 1


def test_auto_bucket_width_tracks_p50_on_bimodal_spans(spark):
    """The auto-tuner (bucket_seconds=None, now the default) derives
    the width from the p50 interval span: on a bimodal fixture of many
    5-minute intervals and a few week-long stragglers it must choose
    ~300 s (the majority mode), NOT anything influenced by the heavy
    tail — and auto-width results must equal explicit-width results
    (width is performance-only by construction)."""
    from mms_rdf_spark.operators.temporal import (_auto_bucket_seconds,
                                                  interval_overlap_join)

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, t0, t0 + dt.timedelta(seconds=300))
            for i in range(90)]
    rows += [(100 + i, 1, t0, t0 + dt.timedelta(days=7))
             for i in range(10)]
    iv = spark.createDataFrame(
        rows, "l_id int, user_id int, start_ts timestamp, "
              "end_ts timestamp")
    w = _auto_bucket_seconds((iv, "start_ts", "end_ts"), fallback=3600)
    assert w == 300, w
    # clamps: all-instant spans floor at 60 s; empty input -> fallback
    inst = iv.withColumn("end_ts", F.col("start_ts"))
    assert _auto_bucket_seconds(
        (inst, "start_ts", "end_ts"), fallback=3600) == 60
    assert _auto_bucket_seconds(
        (iv.where(F.lit(False)), "start_ts", "end_ts"),
        fallback=1234) == 1234
    # results identical under auto and explicit widths
    rv = iv.select(F.col("l_id").alias("r_id"), "user_id",
                   "start_ts", "end_ts")
    auto = interval_overlap_join(iv, rv, on="user_id").collect()
    manual = interval_overlap_join(iv, rv, on="user_id",
                                   bucket_seconds=7200).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, manual))


def test_asof_tolerance_nulls_stale_matches(spark):
    """merge_asof-parity tolerance: matches farther than the bound null
    out, in-bound matches are untouched, and the plan stays one
    exchange with zero Join nodes (the tolerance rides the window)."""
    left, right = _fixture(spark)
    base = {r["event_id"]: r["asof_value"]
            for r in asof_join(left, right, on="user_id").collect()}
    wide = {r["event_id"]: r["asof_value"]
            for r in asof_join(left, right, on="user_id",
                               tolerance_seconds=10**9).collect()}
    assert wide == base  # huge bound changes nothing
    tight = {r["event_id"]: r["asof_value"]
             for r in asof_join(left, right, on="user_id",
                                tolerance_seconds=0).collect()}
    # only exact-timestamp matches survive a zero bound
    assert all(v is None or base[k] == v for k, v in tight.items())
    assert any(v is None and base[k] is not None
               for k, v in tight.items())
    plan = asof_join(left, right, on="user_id", tolerance_seconds=60) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan, plan


def test_asof_null_right_value_pairs_with_own_timestamp(spark):
    """Round-4 advice: (value, matched-ts) must come from the SAME
    right row. A right row with a NULL value still matches (pandas
    merge_asof convention) and the tolerance gap is measured against
    THAT row's timestamp — not a fresher/staler neighbor's."""
    left = spark.createDataFrame(
        [(1, 10, _ts(20))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(1), 7.0), (10, _ts(19), None)],
        "user_id long, ts timestamp, value double")
    # no tolerance: the t=19 NULL row is the latest at-or-before match
    got = asof_join(left, right, on="user_id").collect()
    assert [r.asof_value for r in got] == [None]
    # tolerance 120 s: gap to the MATCHED row (t=19) is 60 s -> in
    # bound -> NULL value (not the stale 7.0 from t=1, whose gap of
    # 19 min would also have failed the bound)
    got = asof_join(left, right, on="user_id",
                    tolerance_seconds=120).collect()
    assert [r.asof_value for r in got] == [None]


def test_lttb_downsample_picks_extremes(spark):
    from mms_rdf_spark.operators.temporal import lttb_downsample

    # 40 points, mostly flat with one big spike per middle region:
    # the spike must survive downsampling to 4 buckets
    rows = []
    for t in range(40):
        y = 10
        if t == 15:
            y = 500
        if t == 25:
            y = -300
        rows.append((t, y))
    df = spark.createDataFrame(rows, "t long, y long")
    out = lttb_downsample(df, "t", "y", n_buckets=4).collect()
    assert len(out) == 4
    ys = {r.y for r in out}
    assert 500 in ys and -300 in ys
    # first/last points kept verbatim (LTTB convention)
    ts = sorted(r.t for r in out)
    assert ts[0] == 0 and ts[-1] == 39
    # one row per bucket, ordered
    assert [r.bucket for r in out] == sorted({r.bucket for r in out})

    # single point / empty
    one = spark.createDataFrame([(5, 7)], "t long, y long")
    o = lttb_downsample(one, "t", "y", n_buckets=3).collect()
    assert len(o) == 1 and (o[0].t, o[0].y) == (5, 7)
    assert lttb_downsample(one.where("t < 0"), "t", "y").count() == 0
