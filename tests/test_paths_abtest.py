from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from mms_rdf_spark.operators.analytics import (
    ab_test_zstats,
    period_over_period,
    top_paths,
)


def _ts(day, minute=0):
    return dt.datetime(2024, 1, day, 0, minute)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")


def test_top_paths_orders_and_counts(spark):
    ev = _ev(spark, [
        (1, 1, "a", _ts(1, 0), 0.0), (2, 1, "b", _ts(1, 1), 0.0),
        (3, 2, "a", _ts(1, 0), 0.0), (4, 2, "b", _ts(1, 1), 0.0),
        (5, 3, "b", _ts(1, 0), 0.0), (6, 3, "a", _ts(1, 1), 0.0),
    ])
    got = [(r["path"], r["n"]) for r in top_paths(ev).collect()]
    assert got == [("a>b", 2), ("b>a", 1)]


def test_top_paths_respects_max_len(spark):
    ev = _ev(spark, [(i, 1, f"t{i}", _ts(1, i), 0.0) for i in range(5)])
    got = top_paths(ev, max_len=3).collect()
    assert got[0]["path"] == "t0>t1>t2"


def test_ab_test_detects_lift(spark):
    rows = []
    for i in range(40):
        arm = i % 2
        # treatment (arm 1) has +5 lift; small deterministic wiggle
        rows.append((i, i, "m", _ts(1, i),
                     10.0 + 5.0 * arm + (i % 4) * 0.5))
    ev = _ev(spark, rows)
    r = ab_test_zstats(ev, "event_type",
                       F.col("user_id") % 2).collect()[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    # wiggle averages differ per arm (0.5 vs 1.0) -> diff is 5.5
    assert abs(r["diff"] - 5.5) < 1e-9
    assert r["z"] > 5  # decisive lift
    # hand-check z from exact sums
    a = [10.0 + (i % 4) * 0.5 for i in range(0, 40, 2)]
    b = [15.0 + (i % 4) * 0.5 for i in range(1, 40, 2)]
    ma, mb = sum(a) / 20, sum(b) / 20
    va = sum(x * x for x in a) / 20 - ma * ma
    vb = sum(x * x for x in b) / 20 - mb * mb
    z = (mb - ma) / math.sqrt(va / 20 + vb / 20)
    assert abs(r["z"] - round(z, 4)) < 1e-9


def test_ab_test_drops_empty_arm(spark):
    ev = _ev(spark, [(1, 2, "m", _ts(1), 1.0), (2, 4, "m", _ts(1), 2.0)])
    assert ab_test_zstats(ev, "event_type",
                          F.col("user_id") % 2).count() == 0


def test_period_over_period_change(spark):
    ev = _ev(spark,
             [(i, 1, "a", _ts(1, i), 0.0) for i in range(4)]       # wk1: 4
             + [(9 + i, 1, "a", _ts(9, i), 0.0) for i in range(6)])  # wk2: 6
    got = sorted((r["period_s"], r["n"], r["prev_n"], r["pct_change"])
                 for r in period_over_period(ev, "event_type").collect())
    assert got[0][1:] == (4, None, None)
    assert got[1][1:] == (6, 4, 0.5)


def test_touch_attribution_models(spark):
    from mms_rdf_spark.operators.analytics import touch_attribution
    ev = _ev(spark, [
        (1, 1, "view", _ts(1, 0), 0.0),
        (2, 1, "click", _ts(1, 1), 0.0),
        (3, 1, "purchase", _ts(1, 2), 0.0),   # first=view, last=click
        (4, 1, "purchase", _ts(1, 3), 0.0),   # first=view, last=click
        (5, 2, "purchase", _ts(1, 0), 0.0),   # no touch -> (none)
    ])
    got = {(r["model"], r["channel"]): (r["n"], r["share"])
           for r in touch_attribution(ev).collect()}
    assert got[("first", "view")] == (2, round(2 / 3, 6))
    assert got[("last", "click")] == (2, round(2 / 3, 6))
    assert got[("first", "(none)")] == (1, round(1 / 3, 6))
    assert got[("last", "(none)")][0] == 1


def test_touch_attribution_touch_after_conversion_ignored(spark):
    from mms_rdf_spark.operators.analytics import touch_attribution
    ev = _ev(spark, [
        (1, 1, "purchase", _ts(1, 0), 0.0),
        (2, 1, "click", _ts(1, 1), 0.0),
    ])
    got = {(r["model"], r["channel"])
           for r in touch_attribution(ev).collect()}
    assert got == {("first", "(none)"), ("last", "(none)")}
