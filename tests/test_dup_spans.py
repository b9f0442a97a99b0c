"""Substring-level exact dedup (Lee et al. 2022 ExactSubstr): maximal
spans of length-L windows occurring >= 2 times corpus-wide; overlap and
adjacency merging, full-window-only semantics, within-doc repeats."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators.dedup import duplicated_spans


def _spans(spark, rows, length):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = duplicated_spans(df, length=length)
    return sorted((r.doc_id, r.span_start, r.span_end, r.span_len,
                   r.n_windows) for r in out.collect())


def test_cross_doc_duplicate_span(spark):
    # docs 0/1 share tokens c..h (6 tokens); L=4 -> dup windows at
    # doc0 pos 2,3,4 (c d e f / d e f g / e f g h), doc1 pos 0,1,2
    rows = [(0, "a b c d e f g h"), (1, "c d e f g h x y")]
    got = _spans(spark, rows, 4)
    assert got == [(0, 2, 7, 6, 3), (1, 0, 5, 6, 3)]


def test_within_doc_repeat_counts(spark):
    # one doc repeating the same 3 tokens twice, far apart: both
    # occurrences are duplicated windows (all copies count)
    rows = [(0, "p q r z1 z2 z3 z4 p q r")]
    got = _spans(spark, rows, 3)
    assert got == [(0, 0, 2, 3, 1), (0, 7, 9, 3, 1)]


def test_adjacent_islands_merge(spark):
    # duplicated windows at starts 0 and L merge (adjacent spans);
    # starts 0 and L+1 do not
    rows = [(0, "a b c d"), (1, "a b x c d y"),
            (2, "a b u v w c d")]
    # L=2: "a b" occurs in all three; "c d" occurs in all three.
    # doc0: starts 0 and 2 -> gap 2 <= L -> ONE span [0,3]
    # doc1: starts 0 and 3 -> gap 3 > L -> two spans
    # doc2: starts 0 and 5 -> two spans
    got = _spans(spark, rows, 2)
    assert (0, 0, 3, 4, 2) in got
    assert (1, 0, 1, 2, 1) in got and (1, 3, 4, 2, 1) in got
    assert (2, 0, 1, 2, 1) in got and (2, 5, 6, 2, 1) in got


def test_short_docs_contribute_no_windows(spark):
    # doc1 is a PREFIX of a duplicated window but shorter than L:
    # no truncated-gram evidence, so nothing is emitted for it and
    # doc0's identical window has no second occurrence either
    rows = [(0, "a b c d"), (1, "a b c")]
    assert _spans(spark, rows, 4) == []


def test_whole_doc_duplicate_is_one_maximal_span(spark):
    text = " ".join(f"t{i}" for i in range(30))
    rows = [(0, text), (1, text)]
    got = _spans(spark, rows, 8)
    assert got == [(0, 0, 29, 30, 23), (1, 0, 29, 30, 23)]


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    assert duplicated_spans(df, length=4).count() == 0


def test_matches_bruteforce_on_documents_sample(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(60).cache())
    L = 5
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in duplicated_spans(docs, length=L).collect()}
    # brute force in Python
    from collections import Counter
    rows = [(r.doc_id, [t for t in r.text.split(" ") if t])
            for r in docs.collect()]
    cnt = Counter()
    for _, toks in rows:
        for i in range(len(toks) - L + 1):
            cnt[" ".join(toks[i:i + L])] += 1
    want = set()
    for did, toks in rows:
        pos = [i for i in range(len(toks) - L + 1)
               if cnt[" ".join(toks[i:i + L])] >= 2]
        if not pos:
            continue
        start, prev, n = pos[0], pos[0], 1
        for p in pos[1:]:
            if p - prev <= L:
                prev, n = p, n + 1
            else:
                want.add((did, start, prev + L - 1, n))
                start, prev, n = p, p, 1
        want.add((did, start, prev + L - 1, n))
    assert got == want
