

def test_stupid_backoff_loo_backoff_chain(spark):
    import math

    from mms_rdf_spark.operators.textstats import stupid_backoff_scores

    # doc 1 repeats its trigram (LOO survives at the top level);
    # doc 2 is a hapax trigram of hapax tokens (falls to the floor);
    # doc 3 is too short to score
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z"), (3, "q w")],
        "doc_id int, text string")
    got = {r.doc_id: r for r in stupid_backoff_scores(docs).collect()}
    assert set(got) == {1, 2}
    # corpus: N = 11 tokens; unigram a/b/c = 2 each; bigram 'a b' and
    # 'b c' = 2, the rest 1. doc 1 trigrams: 'a b c' (x2), 'b c a',
    # 'c a b':
    #   'a b c': n3=2 -> top level (2-1)/(c('a b')-1) = 1/1 = 1
    #   'b c a': backoff twice (b23 'c a' hapax) ->
    #            0.4^2 * (c('a')-1)/(N-1) = 0.16/10
    #   'c a b': b23 = 'a b' (n2=2) -> level 2:
    #            0.4 * (2-1)/(c('a')-1) = 0.4
    lp = [math.log(1.0), math.log(1.0), math.log(0.16 / 10),
          math.log(0.4)]
    want = round(sum(round(x, 6) * 1e6 for x in lp) / 4 / 1e6, 6)
    assert got[1].n_trigrams == 4
    assert abs(got[1].avg_logscore - want) < 2e-6
    # doc 2: every level LOO-zero -> floor 0.4^3 / (N-1)
    assert got[2].n_trigrams == 1
    assert abs(got[2].avg_logscore
               - round(math.log(0.064 / 10), 6)) < 2e-6
