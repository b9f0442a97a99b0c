"""Match-assignment operators (operators/link.py): reciprocal-best
one-to-one assignment and the locally-dominant greedy matching, which
must equal the sequential sort-all-pairs greedy matching exactly."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mms_rdf_spark.operators.link import greedy_matching, mutual_best_match


def _random_pairs(n_nodes: int, seed: str, density: int = 3):
    """Deterministic pseudo-random scored pairs with DISTINCT scores
    (md5-derived), so the greedy matching is unique."""
    pairs, seen = [], set()
    for i in range(n_nodes * density):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        a = int(h[:8], 16) % n_nodes
        b = int(h[8:16], 16) % n_nodes
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        score = round((int(h[16:24], 16) % 1000000) / 1e6, 6)
        pairs.append((a, b, score))
    return pairs


def _py_greedy(pairs):
    """Sequential greedy: sort by (score desc, a, b), take a pair iff
    both endpoints are unmatched."""
    taken, used = set(), set()
    for a, b, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if a not in used and b not in used:
            taken.add((a, b))
            used.add(a)
            used.add(b)
    return taken


def test_greedy_matching_equals_sequential_greedy(spark):
    for seed in ("g1", "g2", "g3"):
        pairs = _random_pairs(60, seed)
        df = spark.createDataFrame(
            pairs, "id_a int, id_b int, score double")
        got = {(r["id_a"], r["id_b"])
               for r in greedy_matching(df).collect()}
        assert got == _py_greedy(pairs), seed


def test_greedy_matching_is_valid_and_maximal(spark):
    pairs = _random_pairs(80, "gm")
    df = spark.createDataFrame(
        pairs, "id_a int, id_b int, score double")
    got = [(r["id_a"], r["id_b"]) for r in greedy_matching(df).collect()]
    used = [n for ab in got for n in ab]
    assert len(used) == len(set(used))  # valid: each node once
    matched = set(used)
    for a, b, _ in pairs:  # maximal: no free-free pair survives
        assert a in matched or b in matched


def test_mutual_best_is_round_one_of_greedy(spark):
    """Mutual-best pairs are exactly the locally dominant pairs — a
    subset of the greedy matching, and every pair of it whose score
    beats all its neighbors' best alternatives."""
    pairs = _random_pairs(60, "mb")
    df = spark.createDataFrame(
        pairs, "id_a int, id_b int, score double")
    mb = {(r["id_a"], r["id_b"])
          for r in mutual_best_match(df).collect()}
    greedy = {(r["id_a"], r["id_b"])
              for r in greedy_matching(df).collect()}
    assert mb <= greedy and len(mb) > 0
    # each node at most once in mutual-best too
    used = [n for ab in mb for n in ab]
    assert len(used) == len(set(used))


def test_greedy_matching_decreasing_path_worst_case(spark):
    # v0-v1 (0.9) > v1-v2 (0.8) > ... : only one locally dominant
    # pair exists per round, exercising the multi-round path
    pairs = [(i, i + 1, round(0.9 - 0.1 * i, 6)) for i in range(6)]
    df = spark.createDataFrame(
        pairs, "id_a int, id_b int, score double")
    got = {(r["id_a"], r["id_b"])
           for r in greedy_matching(df).collect()}
    assert got == {(0, 1), (2, 3), (4, 5)}


def test_greedy_matching_empty_and_exhaustion(spark):
    e = spark.createDataFrame([], "id_a int, id_b int, score double")
    assert greedy_matching(e).count() == 0
    pairs = [(i, i + 1, round(0.9 - 0.01 * i, 6)) for i in range(10)]
    df = spark.createDataFrame(
        pairs, "id_a int, id_b int, score double")
    try:
        greedy_matching(df, max_rounds=2)
        raise AssertionError("expected loud exhaustion")
    except RuntimeError as exc:
        assert "not converged" in str(exc)


def test_mutual_best_tie_breaks_by_partner_id(spark):
    # node 1 scores 0.5 with both 2 and 3 -> best partner is 2 (asc);
    # 2's best is 1 -> (1,2) matched, 3 unmatched
    df = spark.createDataFrame(
        [(1, 2, 0.5), (1, 3, 0.5)], "id_a int, id_b int, score double")
    got = [(r["id_a"], r["id_b"]) for r in mutual_best_match(df).collect()]
    assert got == [(1, 2)]
