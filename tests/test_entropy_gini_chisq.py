from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from mms_rdf_spark.operators.analytics import (
    activity_entropy,
    chi_square_cells,
    gini_concentration,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")


T0 = dt.datetime(2024, 1, 1)


def test_entropy_uniform_vs_concentrated(spark):
    rows = ([(i, 1, t, T0, 0.0)
             for i, t in enumerate(["a", "b", "c", "d"])]   # uniform
            + [(10 + i, 2, "a", T0, 0.0) for i in range(4)])  # one type
    got = {r["user_id"]: r["entropy"]
           for r in activity_entropy(_ev(spark, rows)).collect()}
    # uniform over 4 -> ln(4); micro-nat pipeline: ln(1/4) rounded 6dp
    expect = -4 * 1 * round(round(math.log(0.25), 6) * 1e6) / (4 * 1e6)
    assert abs(got[1] - round(expect, 6)) < 1e-12
    assert got[2] == 0.0
    assert got[1] > got[2]


def test_gini_equal_and_skewed(spark):
    equal = _ev(spark, [(i, i % 4, "a", T0, 0.0) for i in range(8)])
    r = gini_concentration(equal).collect()[0]
    # 4 users x 2 events each: perfect equality -> G = 0
    assert r["n_keys"] == 4 and r["gini"] == 0.0
    skew = _ev(spark, [(i, 0 if i < 7 else 1, "a", T0, 0.0)
                       for i in range(8)])
    r2 = gini_concentration(skew).collect()[0]
    assert r2["gini"] > r["gini"]


def test_chi_square_independent_is_zero(spark):
    # perfectly independent 2x2: every contribution 0
    rows = [(i, 1, t, T0, float(b))
            for i, (t, b) in enumerate(
                [("a", 0), ("a", 1), ("b", 0), ("b", 1)])]
    got = chi_square_cells(
        _ev(spark, rows), "event_type",
        (F.col("value") > 0.5).cast("int")).collect()
    assert len(got) == 4
    assert all(r["contrib"] == 0.0 for r in got)
    assert all(r["e"] == 1.0 for r in got)


def test_chi_square_dependent_cells_positive(spark):
    # a only with 0, b only with 1 -> maximal dependence
    rows = [(1, 1, "a", T0, 0.0), (2, 1, "a", T0, 0.0),
            (3, 1, "b", T0, 1.0), (4, 1, "b", T0, 1.0)]
    got = {(r["a"], r["b"]): r["contrib"] for r in chi_square_cells(
        _ev(spark, rows), "event_type",
        (F.col("value") > 0.5).cast("int")).collect()}
    assert got[("a", 0)] == 1.0 and got[("b", 1)] == 1.0
