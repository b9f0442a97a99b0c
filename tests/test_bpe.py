from __future__ import annotations

from mms_rdf_spark.operators.bpe import bpe_merges, bpe_segment


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


def test_bpe_learns_expected_merge_sequence(spark):
    docs = _docs(spark, ["low low lower"])
    got = [(r["round"], r["a"], r["b"], r["cnt"])
           for r in bpe_merges(docs, rounds=3).orderBy("round").collect()]
    # (l,o) and (o,w) tie at 3 -> lexicographic a picks (l,o); then the
    # merged symbol "lo" pairs with w; then (e,r) beats (low,e) on tie
    assert got == [(1, "l", "o", 3), (2, "lo", "w", 3), (3, "e", "r", 1)]


def test_bpe_greedy_overlap_handling(spark):
    # "aaa": pairs (a,a) x2 -> merge is left-to-right non-overlapping,
    # leaving [aa, a]; round 2 then merges (aa, a)
    docs = _docs(spark, ["aaa"])
    got = [(r["round"], r["a"], r["b"], r["cnt"])
           for r in bpe_merges(docs, rounds=2).orderBy("round").collect()]
    assert got == [(1, "a", "a", 2), (2, "aa", "a", 1)]


def test_bpe_weighted_by_word_frequency(spark):
    # "ab" appears 3 times as a word, "cd" once: (a,b) wins on weight
    docs = _docs(spark, ["ab ab", "ab cd"])
    top = bpe_merges(docs, rounds=1).collect()[0]
    assert (top["a"], top["b"], top["cnt"]) == ("a", "b", 3)


def test_bpe_segment_compression_counts(spark):
    docs = _docs(spark, ["low low lower"])
    merges = bpe_merges(docs, rounds=3)
    row = bpe_segment(docs, merges).collect()[0]
    # after merges l+o, lo+w, e+r: low=1 subword, lower=[low,er]=2
    assert row["n_words"] == 3
    assert row["n_subwords"] == 1 + 1 + 2
