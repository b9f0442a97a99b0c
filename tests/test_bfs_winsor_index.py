from __future__ import annotations

from mms_rdf_spark.operators.analytics import winsorize
from mms_rdf_spark.operators.pagerank import bfs_levels
from mms_rdf_spark.operators.textstats import inverted_index


def test_bfs_min_distance_multi_source(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "c")],
        "src string, dst string")
    srcs = spark.createDataFrame([("a",), ("x",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_levels(e, srcs, max_hops=3).collect()}
    # undirected; c is 1 from x (not 2 from a); d is 2 via x->c->d
    assert got == {"a": 0, "x": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_hop_bound_truncates(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_levels(e, srcs, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d is 3 hops: absent


def test_bfs_directed_respects_direction(spark):
    e = spark.createDataFrame([("a", "b"), ("c", "b")],
                              "src string, dst string")
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_levels(e, srcs, max_hops=2,
                               directed=True).collect()}
    assert got == {"a": 0, "b": 1}  # c unreachable along direction


def test_winsorize_clips_to_percentiles(spark):
    rows = [(i, "g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {r["id"]: r["clipped"]
           for r in winsorize(df, "grp", "v", "id",
                              lower=0.05, upper=0.95).collect()}
    # quantile_cont on 1..100: p05 = 1 + 99*0.05 = 5.95, p95 = 95.05
    assert got[1] == 5.95 and got[3] == 5.95
    assert got[100] == 95.05 and got[99] == 95.05
    assert got[50] == 50.0  # interior untouched


def test_inverted_index_df_counts_before_cap(spark):
    docs = spark.createDataFrame(
        [(i, "common word" + (" rare" if i == 3 else ""))
         for i in range(1, 6)],
        "doc_id long, text string")
    got = {r["token"]: (r["df"], r["postings"])
           for r in inverted_index(docs, max_postings=3).collect()}
    assert got["common"] == (5, "1:1,2:1,3:1")   # df full, postings capped
    assert got["rare"] == (1, "3:1")


def test_inverted_index_tf_and_order(spark):
    docs = spark.createDataFrame(
        [(2, "b a a"), (1, "a")], "doc_id long, text string")
    got = {r["token"]: r["postings"]
           for r in inverted_index(docs).collect()}
    assert got["a"] == "1:1,2:2"  # sorted by doc id, tf counted
    assert got["b"] == "2:1"


def test_readability_counts_and_score(spark):
    from mms_rdf_spark.operators.textstats import readability
    docs = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!")], "doc_id long, text string")
    r = readability(docs).collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a = 6
    assert r["n_syllables"] == 6
    assert r["flesch"] == round(206.835 - 1.015 * 3 - 84.6 * 1.0, 4)


def test_readability_floors_empty(spark):
    from mms_rdf_spark.operators.textstats import readability
    docs = spark.createDataFrame([(1, "xyz")], "doc_id long, text string")
    r = readability(docs).collect()[0]
    # no vowels, no sentence marks: floors kick in (syllables >= words)
    assert r["n_sentences"] == 1 and r["n_syllables"] == 1


def test_keywords_tfidf_picks_distinctive_terms(spark):
    from mms_rdf_spark.operators.textstats import keywords_tfidf
    docs = spark.createDataFrame(
        [(1, "common common unicorn"), (2, "common dragon dragon"),
         (3, "common plain")], "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): r["token"]
           for r in keywords_tfidf(docs, k=2).collect()}
    # the doc-specific rare word outranks the everywhere-word
    assert got[(1, 1)] == "unicorn"
    assert got[(2, 1)] == "dragon"
    assert got[(3, 1)] == "plain"


def test_keywords_tfidf_deterministic_ties(spark):
    from mms_rdf_spark.operators.textstats import keywords_tfidf
    docs = spark.createDataFrame(
        [(1, "zebra apple")], "doc_id long, text string")
    got = [r["token"] for r in keywords_tfidf(docs, k=2)
           .orderBy("rank").collect()]
    assert got == ["apple", "zebra"]  # equal scores -> token order
