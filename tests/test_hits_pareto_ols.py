from __future__ import annotations

from pyspark.sql import functions as F

from mms_rdf_spark.operators.analytics import (
    grouped_ols_trend,
    pareto_frontier_2d,
)
from mms_rdf_spark.operators.pagerank import hits


def test_hits_star_hub_and_authority(spark):
    # h -> a1, a2, a3: h is the pure hub, a_i pure authorities
    e = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3")], "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got["h"] == (1.0, 0.0)
    for a in ("a1", "a2", "a3"):
        assert got[a] == (0.0, 1.0)


def test_hits_ranks_better_connected_higher(spark):
    # u1 points to both popular targets, u2 to one
    e = spark.createDataFrame(
        [("u1", "t1"), ("u1", "t2"), ("u2", "t1"), ("u3", "t1")],
        "src string, dst string")
    got = {r["node"]: r for r in hits(e).collect()}
    assert got["t1"]["auth"] == 1.0              # most incoming
    assert got["t1"]["auth"] > got["t2"]["auth"]
    assert got["u1"]["hub"] == 1.0               # covers both targets
    assert got["u1"]["hub"] > got["u2"]["hub"]


def test_hits_deterministic(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    r1 = sorted(map(tuple, hits(e).collect()))
    r2 = sorted(map(tuple, hits(e).collect()))
    assert r1 == r2


def test_pareto_frontier_dominance(spark):
    # minimize x, maximize y
    pts = [(1, 10.0), (1, 3.0),   # x=1 collapses to best 10
           (2, 12.0),             # better y at higher x: kept
           (3, 11.0),             # dominated by (2, 12)
           (4, 15.0)]             # kept
    df = spark.createDataFrame(pts, "x long, y double")
    got = {r["x"]: r["best_y"]
           for r in pareto_frontier_2d(df, "x", "y").collect()}
    assert got == {1: 10.0, 2: 12.0, 4: 15.0}


def test_ols_recovers_exact_line(spark):
    rows = [("g", x, 2.5 * x + 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "grp string, x long, v double")
    r = grouped_ols_trend(df, "grp", F.col("x"), "v").collect()[0]
    assert r["slope"] == 2.5 and r["intercept"] == 1.0 and r["n"] == 10


def test_ols_drops_degenerate_group(spark):
    df = spark.createDataFrame(
        [("g", 5, 1.0), ("g", 5, 2.0)], "grp string, x long, v double")
    assert grouped_ols_trend(df, "grp", F.col("x"), "v").count() == 0
