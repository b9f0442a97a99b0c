from __future__ import annotations

from mms_rdf_spark.operators.textstats import (
    bm25_topk,
    cross_doc_gram_stats,
)


def _corpus(spark):
    rows = [
        (1, "spark join vector spark join"),          # stuffed with terms
        (2, "spark table scan over the big table"),   # one term
        (3, "nothing relevant here at all"),          # no terms
        (4, "a b c d e f g h i j k l m n o p"),       # no terms, long
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_term_dense_doc_first(spark):
    got = bm25_topk(_corpus(spark), ["spark", "join", "vector"],
                    k=10).collect()
    assert [r["doc_id"] for r in got] == [1, 2]  # no-hit docs excluded
    assert got[0]["score"] > got[1]["score"] > 0


def test_bm25_respects_k_and_tiebreak(spark):
    rows = [(i, "same text here") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ["same"], k=5).collect()
    # identical scores -> doc_id tiebreak, k enforced
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert len({r["score"] for r in got}) == 1


def test_cross_doc_grams_flags_shared_spans(spark):
    shared = "one two three four five"
    rows = [
        (1, shared + " alpha beta gamma delta epsilon"),
        (2, shared + " zeta eta theta iota kappa"),
        (3, "completely different words in this document entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in cross_doc_gram_stats(df).collect()}
    # docs 1/2 share exactly the 5-gram of `shared`; doc 3 shares none
    assert got[1]["n_shared"] == 1 and got[2]["n_shared"] == 1
    assert got[3]["n_shared"] == 0 and got[3]["shared_frac"] == 0.0
    assert 0 < got[1]["shared_frac"] < 1


def test_token_vocab_counts_and_rank(spark):
    from mms_rdf_spark.operators.textstats import token_vocab

    rows = [(1, "a a a b b c"), (2, "a b x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["token"], r["n"], r["rank"])
           for r in token_vocab(df, k=3).orderBy("rank").collect()]
    assert got == [("a", 4, 1), ("b", 3, 2), ("c", 1, 3)]  # c ties x, token asc


def test_cooccurrence_pmi_prefers_exclusive_pairs(spark):
    from mms_rdf_spark.operators.textstats import cooccurrence_pmi

    rows = []
    # p/q always together (5 docs), r everywhere (10 docs)
    for i in range(5):
        rows.append((i, "p q r"))
    for i in range(5, 10):
        rows.append((i, "r s t"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"]): r["pmi"] for r in
           cooccurrence_pmi(df, min_df=5, min_pairs=5, k=10).collect()}
    # exclusive pair (p,q): pmi = ln(5*10/(5*5)) = ln 2 > 0
    # ubiquitous partner (p,r): pmi = ln(5*10/(5*10)) = 0
    assert round(got[("p", "q")], 4) == round(0.6931, 4)
    assert got[("p", "r")] == 0.0
    assert got[("p", "q")] > got[("p", "r")]


def test_bigram_lm_scores_fluency_ordering(spark):
    from mms_rdf_spark.operators.textstats import bigram_lm_scores

    # a corpus dominated by one phrase: docs repeating it score high,
    # a doc of unseen-pair gibberish scores low
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "mat the on sat cat the"))  # same words, odd order
    rows.append((200, "x"))                        # <2 tokens: excluded
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert 200 not in got
    assert got[0]["n_bigrams"] == 5
    assert got[0]["avg_logprob"] > got[100]["avg_logprob"]


def test_textrank_hub_word_ranks_first(spark):
    from mms_rdf_spark.operators.textstats import textrank_keywords

    # "hub" co-occurs with every filler word; fillers only ever see
    # hub and one neighbor -> hub's centrality dominates
    rows = [(i, f"hub w{i} hub w{i} hub") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = textrank_keywords(df, window=2, iters=3, k=5).collect()
    assert got[0]["token"] == "hub" and got[0]["rnk"] == 1
    assert len(got) == 5
    # rnk is the 1-based (rank desc, token) order, dense and total
    assert [r["rnk"] for r in got] == [1, 2, 3, 4, 5]
    ranks = [r["rank"] for r in got]
    assert ranks == sorted(ranks, reverse=True)


def test_textrank_lowercases_and_drops_self_pairs(spark):
    from mms_rdf_spark.operators.textstats import textrank_keywords

    # "Same same SAME" collapses to one token whose self-pairs are
    # dropped -> the graph has no 'same' node at all (no edges), and
    # the only edges come from the second doc
    rows = [(1, "Same same SAME"), (2, "alpha beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {r["token"] for r in
            textrank_keywords(df, window=1, iters=2, k=10).collect()}
    assert toks == {"alpha", "beta"}

    # empty corpus -> empty frame
    e = spark.createDataFrame([], "doc_id long, text string")
    assert textrank_keywords(e).count() == 0


def test_rake_phrases_and_scores_hand_computed(spark):
    from mms_rdf_spark.operators.textstats import rake_keywords

    # STOPWORDS contains "of" and "the": "deep learning" and
    # "deep net" are the two candidate phrases.
    # freq: deep=2 learning=1 net=1; deg: deep=4 learning=2 net=2
    # word scores: deep=2.0 learning=2.0 net=2.0 -> phrases both 4.0
    rows = [(1, "deep learning of the deep net"),
            (2, "the a an")]  # stopwords only: no candidates
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["phrase"], r["n_words"], r["n_occ"], r["score"],
            r["rnk"]) for r in rake_keywords(df).collect()]
    assert got == [("deep learning", 2, 1, 4.0, 1),
                   ("deep net", 2, 1, 4.0, 2)]

    # repeated identical phrase: n_occ counts instances, score once
    rep = spark.createDataFrame(
        [(1, "big model"), (2, "big model"), (3, "tiny probe")],
        "doc_id long, text string")
    got = {r["phrase"]: (r["n_occ"], r["score"])
           for r in rake_keywords(rep).collect()}
    # freq: big=2 model=2 tiny=1 probe=1; deg: big=4 model=4 tiny=2
    # probe=2 -> all word scores 2.0; both phrases score 4.0
    assert got["big model"] == (2, 4.0)
    assert got["tiny probe"] == (1, 4.0)

    e = spark.createDataFrame([], "doc_id long, text string")
    assert rake_keywords(e).count() == 0

