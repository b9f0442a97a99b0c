"""link_prediction_scores: pure-Python twin on random graphs plus
semantics pins (mediator cap, endpoint-degree jaccard/pa)."""
from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest

from mms_rdf_spark.operators.pagerank import (adamic_adar,
                                              link_prediction_scores)


def _py_scores(edges, max_deg=None):
    nbr = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    deg = {z: len(ns) for z, ns in nbr.items()}
    kept = {z for z, d in deg.items()
            if d >= 2 and (max_deg is None or d <= max_deg)}
    out = {}
    for z in kept:
        w = round(1e6 / deg[z])
        ns = sorted(nbr[z])
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                cn, ra = out.get((a, b), (0, 0))
                out[(a, b)] = (cn + 1, ra + w)
    rows = {}
    for (a, b), (cn, ra_mu) in out.items():
        jac = round(cn / (deg[a] + deg[b] - cn), 6)
        rows[(a, b)] = (cn, jac, round(ra_mu / 1e6, 6),
                        deg[a] * deg[b])
    return rows


def test_linkpred_matches_python_twin(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(90)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["a"], r["b"]): (r["cn"], r["jaccard"], r["ra"], r["pa"])
           for r in link_prediction_scores(df).collect()}
    want = _py_scores(edges)
    assert got == want


def test_linkpred_mediator_cap_drops_hub_pairs(spark):
    # hub h touches everything; with max_deg below its degree the
    # pairs mediated ONLY by h disappear, and surviving pairs do not
    # count h as a common neighbor
    edges = [("h", f"x{i}") for i in range(6)] + [("x0", "x1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {(r["a"], r["b"]): r
            for r in link_prediction_scores(df, max_deg=3).collect()}
    # x0-x1 edge makes x0, x1 degree-2 mediators; pairs like
    # (x2, x3) were h-only and must vanish
    assert all(("x2" not in p and "x3" not in p) or "h" in p
               for p in rows), rows
    want = _py_scores(edges, max_deg=3)
    got = {(r["a"], r["b"]): (r["cn"], r["jaccard"], r["ra"], r["pa"])
           for r in rows.values()}
    assert got == want


def test_linkpred_triangle_exact_values(spark):
    # path a-z-b plus edge a-c: deg z=2, deg a=2, deg b=1, deg c=1
    df = spark.createDataFrame(
        [("a", "z"), ("z", "b"), ("a", "c")], "src string, dst string")
    rows = {(r["a"], r["b"]): r
            for r in link_prediction_scores(df).collect()}
    r = rows[("a", "b")]
    assert r["cn"] == 1
    assert r["jaccard"] == pytest.approx(round(1 / (2 + 1 - 1), 6))
    assert r["ra"] == pytest.approx(0.5)
    assert r["pa"] == 2


def test_linkpred_pair_universe_matches_adamic(spark):
    # same mediator semantics: the (a, b) key set must equal
    # adamic_adar's on the same graph and cap
    rng = random.Random(11)
    nodes = [f"m{i}" for i in range(20)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(50)})
    df = spark.createDataFrame(edges, "src string, dst string")
    lp = {(r["a"], r["b"]) for r in
          link_prediction_scores(df, max_deg=8).collect()}
    aa = {(r["a"], r["b"]) for r in
          adamic_adar(df, max_deg=8).collect()}
    assert lp == aa
