"""Jaro-Winkler blocked matching: the pure-Python scorer is bit-for-bit
DuckDB's jaro_winkler_similarity (fuzz-pinned, so the contract oracle can
use the engine builtin), the length-ratio JVM prefilter never drops a
qualifying pair, and blocking/caps bound the pair fan-out."""

from __future__ import annotations

import random
import string

import duckdb
import pyspark.sql.functions as F
import pytest

from mms_rdf_spark.operators.link import _jaro_winkler_py, jaro_winkler_pairs


def test_jw_fuzz_parity_with_duckdb():
    con = duckdb.connect()
    rng = random.Random(20260818)
    for i in range(1500):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        alpha = "abcde" if rng.random() < 0.5 else string.ascii_lowercase
        s1 = "".join(rng.choice(alpha) for _ in range(n1))
        s2 = "".join(rng.choice(alpha) for _ in range(n2))
        if rng.random() < 0.3 and s1:  # near-dup: single substitution
            lst = list(s1)
            lst[rng.randrange(len(lst))] = rng.choice(alpha)
            s2 = "".join(lst)
        d = con.execute("select jaro_winkler_similarity(?, ?)",
                        [s1, s2]).fetchone()[0]
        assert abs(d - _jaro_winkler_py(s1, s2)) < 1e-12, (s1, s2)


@pytest.mark.parametrize("s1,s2,expect", [
    ("martha", "marhta", 0.961111111),     # Winkler's canonical example
    ("dwayne", "duane", 0.84),
    ("dixon", "dicksonx", 0.813333333),
    ("", "abc", 0.0),
    ("abc", "abc", 1.0),
    ("a", "b", 0.0),
])
def test_jw_known_values(s1, s2, expect):
    assert abs(_jaro_winkler_py(s1, s2) - expect) < 1e-6


def test_pairs_match_bruteforce(spark):
    rng = random.Random(7)
    names = []
    base = ["martha crane", "jonathan wells", "marhta crane",
            "jon wells", "martha crain", "xavier quex"]
    for i in range(120):
        b = rng.choice(base)
        if rng.random() < 0.5:
            lst = list(b)
            lst[rng.randrange(len(lst))] = rng.choice("abcdefgh ")
            b = "".join(lst)
        names.append((i, b, b.split(" ")[-1][:2]))
    df = spark.createDataFrame(names, "id int, name string, blk string")
    got = {(r.id_a, r.id_b): r.jw
           for r in jaro_winkler_pairs(df, "id", "name", "blk",
                                       threshold=0.9).collect()}
    want = {}
    for i, (ia, ta, ba) in enumerate(names):
        for ib, tb, bb in names[i + 1:]:
            if ba != bb:
                continue
            jw = round(_jaro_winkler_py(ta, tb), 6)
            if jw >= 0.9:
                want[(min(ia, ib), max(ia, ib))] = jw
    assert got == want


def test_length_prefilter_is_sound_at_rounding_boundary(spark):
    # lmin/lmax below 5t-4 is provably sub-threshold on the TRUE score;
    # the operator backs off by the 6dp rounding radius. Exercise a
    # low threshold (prefilter vacuous) and a high one (prefilter hot)
    # and require identical results to brute force either way.
    rows = [(0, "aaaaaaaaaaaa", "x"), (1, "aaa", "x"),
            (2, "aaaaaaaaaaab", "x"), (3, "aab", "x")]
    df = spark.createDataFrame(rows, "id int, name string, blk string")
    for t in (0.5, 0.97):
        got = {(r.id_a, r.id_b) for r in
               jaro_winkler_pairs(df, "id", "name", "blk",
                                  threshold=t).collect()}
        want = set()
        for i, (ia, ta, _) in enumerate(rows):
            for ib, tb, _ in rows[i + 1:]:
                if round(_jaro_winkler_py(ta, tb), 6) >= t:
                    want.add((ia, ib))
        assert got == want, t


def test_max_block_drops_oversized_blocks(spark):
    rows = [(i, "same name", "hot") for i in range(10)]
    rows += [(100, "martha crane", "c"), (101, "marhta crane", "c")]
    df = spark.createDataFrame(rows, "id int, name string, blk string")
    out = jaro_winkler_pairs(df, "id", "name", "blk",
                             threshold=0.9, max_block=5).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id int, name string, blk string")
    assert jaro_winkler_pairs(df, "id", "name", "blk").count() == 0
    assert jaro_winkler_pairs(df, "id", "name", "blk",
                              max_block=3).count() == 0


def test_null_text_scores_zero_not_crash(spark):
    rows = [(0, None, "x"), (1, "abc", "x"), (2, "abc", "x")]
    df = spark.createDataFrame(rows, "id int, name string, blk string")
    out = jaro_winkler_pairs(df, "id", "name", "blk", threshold=0.5)
    # threshold 0.5 with a low ratio bound still runs the UDF on the
    # NULL row's pairs; only the identical pair survives
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}


def test_sorted_neighborhood_exact_adjacency(spark):
    # the EXISTING probe-explode operator (link.py) on a generic key:
    # next `window` neighbors in (key, id) sort order
    from mms_rdf_spark.operators.link import sorted_neighborhood_pairs

    rows = [(str(i), k) for i, k in enumerate(
        ["apple", "apples", "aple", "banana", "bananna", "cherry"])]
    df = spark.createDataFrame(rows, "id string, key string")
    got = sorted((r.a_id, r.b_id, r.b_rank - r.a_rank) for r in
                 sorted_neighborhood_pairs(df, key="key", id_col="id",
                                           window=2).collect())
    # sort order: aple(2) apple(0) apples(1) banana(3) bananna(4)
    # cherry(5); window 2 = gaps 1 and 2
    want = sorted([("2", "0", 1), ("2", "1", 2), ("0", "1", 1),
                   ("0", "3", 2), ("1", "3", 1), ("1", "4", 2),
                   ("3", "4", 1), ("3", "5", 2), ("4", "5", 1)])
    assert got == want
    # skew-free by construction: every record has <= window partners
    from collections import Counter
    deg = Counter()
    for a, _, _ in got:
        deg[a] += 1
    assert max(deg.values()) <= 2
