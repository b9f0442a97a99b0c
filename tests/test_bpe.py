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


def test_wordpiece_prefers_high_likelihood_pairs(spark):
    from mms_rdf_spark.operators.bpe import wordpiece_merges

    # "xy" appears only together (score 1/(n_x*n_y) maximal at
    # cnt=n_x=n_y); "ab" is frequent but a,b also occur alone a lot
    docs = [(1, "xy xy xy ab ab ab ab ab"),
            (2, "aa ba ab ca ad ab be bf")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = wordpiece_merges(df, rounds=2).orderBy("round").collect()
    # round 1: count(xy)=3, n_x=n_y=3 -> score 1/3; every a/b pair
    # is diluted by the many singleton a's and b's
    assert (rows[0].a, rows[0].b) == ("x", "y")
    assert rows[0].cnt == 3
    assert abs(rows[0].score - 3 / 9) < 1e-6
    # merged symbol "xy" participates in later rounds' counts
    assert rows[1].score <= rows[0].score + 1e-9

    # determinism: rerun yields the identical merge table
    again = wordpiece_merges(df, rounds=2).orderBy("round").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
