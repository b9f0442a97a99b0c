"""Seeded label propagation (Zhu & Ghahramani hard-clamp): pure-Python
synchronous twin on random graphs, clamp invariance, frontier growth,
and deterministic tie-break."""

from __future__ import annotations

import random
from collections import Counter

from mms_rdf_spark.operators.pagerank import seeded_label_propagation


def _twin(edges, seeds, iters):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seed = {}
    for n, l in seeds:
        seed[n] = min(l, seed.get(n, l))
    labels = dict(seed)
    for _ in range(iters):
        new = dict(seed)
        for n in adj:
            if n in seed:
                continue
            cnt = Counter(labels[m] for m in adj[n] if m in labels)
            if cnt:
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                new[n] = best[0]
        labels = new
    return labels


def _run(spark, edges, seeds, iters):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame(seeds, "node string, label string")
    out = seeded_label_propagation(e, s, iters=iters)
    return {r.node: r.label for r in out.collect()}, \
        {r.node for r in out.collect() if r.is_seed}


def test_chain_frontier_growth_and_clamp(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    seeds = [("n0", "A"), ("n6", "B")]
    got, seeded = _run(spark, edges, seeds, iters=2)
    assert got == _twin(edges, seeds, 2)
    # frontier reaches 2 hops; n3 (3 hops from both) stays unlabeled
    assert got.get("n2") == "A" and got.get("n4") == "B"
    assert "n3" not in got
    assert seeded == {"n0", "n6"}
    # seeds are clamped even when outvoted
    edges2 = [("s", f"x{i}") for i in range(3)]
    seeds2 = [("s", "A")] + [(f"x{i}", "B") for i in range(3)]
    got2, _ = _run(spark, edges2, seeds2, iters=3)
    assert got2["s"] == "A"


def test_tie_breaks_label_ascending(spark):
    edges = [("a", "m"), ("b", "m")]
    seeds = [("a", "Z"), ("b", "A")]
    got, _ = _run(spark, edges, seeds, iters=1)
    assert got["m"] == "A"


def test_randomized_against_twin(spark):
    rng = random.Random(5)
    for trial in range(3):
        edges = list({(f"n{rng.randrange(10)}", f"n{rng.randrange(10)}")
                      for _ in range(15)})
        edges = [(u, v) for u, v in edges if u != v]
        seeds = [(f"n{i}", rng.choice("ABC")) for i in
                 rng.sample(range(10), 3)]
        it = rng.choice([1, 2, 3])
        got, _ = _run(spark, edges, seeds, it)
        want = _twin(edges, seeds, it)
        assert got == want, (trial, edges, seeds, it)


def test_empty_and_conflicting_seeds(spark):
    e = spark.createDataFrame([], "src string, dst string")
    s = spark.createDataFrame([("a", "B"), ("a", "A")],
                              "node string, label string")
    out = seeded_label_propagation(e, s).collect()
    assert [(r.node, r.label) for r in out] == [("a", "A")]
