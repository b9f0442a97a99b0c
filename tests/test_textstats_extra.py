

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


def test_kneser_ney_hand_computed(spark):
    import math

    from mms_rdf_spark.operators.textstats import kneser_ney_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id int, text string")
    got = {r.doc_id: r for r in kneser_ney_scores(docs).collect()}
    assert set(got) == {1, 2}  # doc 3 has no bigram
    # bigram types: 'a b' (c=3), 'b a' (1), 'b c' (1); B = 3
    # ctx  u=a: c=3, N1+=1 ; u=b: c=2, N1+=2
    # cont w=b: 1 ; w=a: 1 ; w=c: 1
    p_ab = (3 - 0.75) / 3 + 0.75 * 1 / 3 * (1 / 3)
    p_ba = (1 - 0.75) / 2 + 0.75 * 2 / 2 * (1 / 3)
    p_bc = (1 - 0.75) / 2 + 0.75 * 2 / 2 * (1 / 3)
    lp1 = [round(math.log(p_ab), 6), round(math.log(p_ba), 6),
           round(math.log(p_ab), 6)]
    want1 = round(sum(x * 1e6 for x in lp1) / 3 / 1e6, 6)
    assert got[1].n_bigrams == 3
    assert abs(got[1].avg_logprob - want1) < 2e-6
    lp2 = [round(math.log(p_ab), 6), round(math.log(p_bc), 6)]
    want2 = round(sum(x * 1e6 for x in lp2) / 2 / 1e6, 6)
    assert got[2].n_bigrams == 2
    assert abs(got[2].avg_logprob - want2) < 2e-6
    # KN normalizes per context over the FULL vocab: u=b's observed
    # continuations (a, c) plus the unseen 'b b' (pure continuation
    # mass d * N1+(b)/c(b) * Pcont(b)) sum to 1
    p_bb_unseen = 0.75 * 2 / 2 * (1 / 3)
    assert abs(p_ba + p_bc + p_bb_unseen - 1.0) < 1e-12


def test_kneser_ney_empty_and_null_text(spark):
    from mms_rdf_spark.operators.textstats import kneser_ney_scores

    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id int, text string")
    assert kneser_ney_scores(docs).count() == 0


def test_texttiling_sharp_topic_shift_is_boundary(spark):
    from mms_rdf_spark.operators.textstats import texttiling

    rows = [(0, "cats purr cats meow"), (1, "cats purr softly"),
            (2, "cats meow purr"),
            (3, "quarks gluons bosons"), (4, "gluons quarks decay"),
            (5, "bosons quarks gluons spin")]
    df = spark.createDataFrame([("a", i, t) for i, t in rows],
                               "src string, idx int, text string")
    out = {r.gap_idx: r for r in
           texttiling(df, "src", "idx", "text").collect()}
    assert len(out) == 5  # n-1 gaps
    # the topic shift at gap 2 (cats -> physics) has score 0 and the
    # deepest valley; it must be the boundary
    assert out[2].score == 0.0 and out[2].is_boundary
    assert not out[0].is_boundary and not out[3].is_boundary


def test_texttiling_short_sequences_never_boundary(spark):
    from mms_rdf_spark.operators.textstats import texttiling

    # 2 items -> 1 gap -> no std -> pinned false
    df = spark.createDataFrame(
        [("a", 0, "x y"), ("a", 1, "p q")],
        "src string, idx int, text string")
    out = texttiling(df, "src", "idx", "text").collect()
    assert len(out) == 1 and not out[0].is_boundary
    # empty input
    e = spark.createDataFrame([], "src string, idx int, text string")
    assert texttiling(e, "src", "idx", "text").count() == 0


def test_llr_collocations_matches_pure_python(spark):
    import collections
    import math

    from mms_rdf_spark.operators.textstats import llr_collocations

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    got = [(r["tok_a"], r["tok_b"], r["n_ab"], r["llr"], r["rank"])
           for r in llr_collocations(docs, min_count=5, k=10)
           .collect()]

    bg, R, C = (collections.Counter(), collections.Counter(),
                collections.Counter())
    for txt in docs.toPandas()["text"].fillna(""):
        t = [x for x in txt.split(" ") if x]
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
            R[a] += 1
            C[b] += 1
    T = sum(bg.values())

    def nano(x):
        return int(round(round(math.log(x), 9) * 1e9))

    def g2(a, b):
        k11, r1, c1 = bg[(a, b)], R[a], C[b]
        cells = [(k11, r1, c1), (r1 - k11, r1, T - c1),
                 (c1 - k11, T - r1, c1),
                 (T - r1 - c1 + k11, T - r1, T - c1)]
        return 2 * sum(k * nano(k * T / (rr * cc))
                       for k, rr, cc in cells if k > 0)

    scored = sorted(((g2(a, b), a, b) for (a, b), n in bg.items()
                     if n >= 5), key=lambda x: (-x[0], x[1], x[2]))[:10]
    exp = [(a, b, bg[(a, b)], round(s / 1e9, 6), i + 1)
           for i, (s, a, b) in enumerate(scored)]
    assert got == exp and len(got) == 10


def test_good_turing_table(spark):
    from mms_rdf_spark.operators.textstats import good_turing

    # 3 hapaxes, 2 tokens seen twice, 1 seen three times; T = 10
    docs = spark.createDataFrame(
        [(1, "h1 h2 h3 d1 d2 t"), (2, "d1 d2 t t")],
        "doc_id int, text string")
    got = {r["r"]: (r["n_r"], r["r_star"], r["p_token"])
           for r in good_turing(docs).collect()}
    # r=1: N1=3, N2=2 -> r* = 2*2/3; r=2: N2=2, N3=1 -> r* = 3*1/2;
    # r=3: N4=0 -> r* = 0
    assert got == {
        1: (3, round(4 / 3, 6), round(4 / 3 / 10, 9)),
        2: (2, 1.5, 0.15),
        3: (1, 0.0, 0.0),
    }


def test_bleu2_hand_computed(spark):
    import math

    from mms_rdf_spark.operators.textstats import bleu2_pairs

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat is on the mat"),
         (2, "a b"), (3, "a b c d"),
         (4, "x"), (5, "y z")],
        "doc_id long, text string")
    got = {r.cand_id: r for r in bleu2_pairs(docs).collect()}
    assert set(got) == {0, 2, 4}
    # pair (0, 1): clipped uni the:2 cat:1 on:1 mat:1 -> 5/6;
    # clipped bi "the cat","on the","the mat" -> 3/5; BP = 1
    r0 = got[0]
    assert (r0.m1, r0.c1, r0.m2, r0.c2) == (5, 6, 3, 5)
    assert abs(r0.bleu2 - round(math.sqrt((5 / 6) * (3 / 5)), 6)) < 1e-9
    # pair (2, 3): perfect precisions, short candidate -> BP = e^-1
    r2 = got[2]
    assert (r2.m1, r2.c1, r2.m2, r2.c2) == (2, 2, 1, 1)
    assert abs(r2.bleu2 - round(math.exp(-1.0), 6)) < 1e-9
    # pair (4, 5): no matches and no candidate bigram -> 0
    r4 = got[4]
    assert (r4.m1, r4.m2, r4.c2) == (0, 0, 0)
    assert r4.bleu2 == 0.0


def test_jsd_contributions_hand_computed(spark):
    import math

    from mms_rdf_spark.operators.textstats import jsd_contributions

    # half 0 (even doc_id): a a b | a  -> a:3 b:1, T_p = 4
    # half 1 (odd  doc_id): b b   | c c -> b:2 c:2, T_q = 4
    docs = spark.createDataFrame(
        [(0, "a a b"), (2, "a"), (1, "b b"), (3, "c c")],
        "doc_id long, text string")
    got = {r.tok: r for r in jsd_contributions(docs, k=10).collect()}
    assert set(got) == {"a", "b", "c"}

    def nano(x):
        return round(round(math.log(x), 9) * 1e9)

    want_a = round(3 * nano(2.0) / 1e9 / 8.0, 6)
    want_c = round(2 * nano(2.0) / 1e9 / 8.0, 6)
    want_b = round(1 * nano(2 / 3) / 1e9 / 8.0
                   + 2 * nano(4 / 3) / 1e9 / 8.0, 6)
    assert got["a"].jsd_contrib == want_a and got["a"].rank == 1
    assert got["c"].jsd_contrib == want_c and got["c"].rank == 2
    assert got["b"].jsd_contrib == want_b and got["b"].rank == 3
    assert (got["a"].n_p, got["a"].n_q) == (3, 0)


def test_ngram_novelty_hand_computed(spark):
    from mms_rdf_spark.operators.textstats import ngram_novelty

    # doc 0 introduces "a b c" and "b c d"; doc 1 repeats "a b c" and
    # introduces "b c e"; doc 2 is an exact duplicate of doc 0 -> 0.0;
    # doc 3 is too short for a trigram -> excluded
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "a b c d"), (3, "x y")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0].n_grams, got[0].n_new, got[0].novelty) == (2, 2, 1.0)
    assert (got[1].n_grams, got[1].n_new, got[1].novelty) == (2, 1, 0.5)
    assert (got[2].n_grams, got[2].n_new, got[2].novelty) == (2, 0, 0.0)


def test_chrf3_hand_computed(spark):
    from mms_rdf_spark.operators.textstats import chrf3_pairs

    # cand "abcd" -> abc, bcd; ref "abce" -> abc, bce: m=1, c=2, r=2
    # chrF3 = 5*1 / (4*2 + 2) = 0.5
    # cand "ab" has no trigram -> m=0, score 0
    # whitespace strip: "a bcd" == "abcd" after strip
    docs = spark.createDataFrame(
        [(0, "a bcd"), (1, "abce"), (2, "ab"), (3, "xyz")],
        "doc_id long, text string")
    got = {r.cand_id: r for r in chrf3_pairs(docs).collect()}
    assert set(got) == {0, 2}
    r0 = got[0]
    assert (r0.m, r0.c_total, r0.r_total) == (1, 2, 2)
    assert r0.chrf3 == 0.5
    r2 = got[2]
    assert (r2.m, r2.c_total, r2.r_total) == (0, 0, 1)
    assert r2.chrf3 == 0.0


def test_heaps_fit_matches_pure_python_twin(spark):
    from mms_rdf_spark.operators.textstats import heaps_fit

    docs = [
        (1, "a b c a"),
        (2, "a d e"),
        (3, "b b f g h"),
        (4, "a b c d"),
        (5, "i j k l m n"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = heaps_fit(df).collect()[0]

    # twin: cumulative tokens / first-occurrence types, log-log OLS
    import math
    seen, pts, nn = set(), [], 0
    for _, text in docs:
        ws = [w for w in text.split(" ") if w]
        nn += len(ws)
        seen |= set(ws)
        pts.append((math.log(nn), math.log(len(seen))))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    ln_k = (sy - beta * sx) / n
    assert r.n_points == n
    assert abs(r.beta - beta) < 1e-5
    assert abs(r.ln_k - ln_k) < 1e-5
    # growth exponent sits in (0, 1) for any corpus with reuse
    assert 0.0 < r.beta < 1.0

    # degenerate: single doc -> one point -> NULL fit; empty -> 0 rows
    one = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    r1 = heaps_fit(one).collect()[0]
    assert r1.n_points == 1 and r1.beta is None and r1.ln_k is None
    assert heaps_fit(df.where("doc_id < 0")).count() == 0


def test_lexical_diversity_hand_case(spark):
    import math

    from mms_rdf_spark.operators.textstats import lexical_diversity

    docs = [(1, "a a b"), (2, "b c"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = lexical_diversity(df).collect()[0]
    # tokens: a a b b c -> N=5, V=3
    assert (r.n_tokens, r.vocab) == (5, 3)
    assert r.ttr == 0.6
    counts = [2, 2, 1]
    h = -sum(c / 5 * math.log(c / 5) for c in counts)
    assert abs(r.shannon - h) < 1e-6
    assert r.simpson == round((2 * 1 + 2 * 1 + 0) / (5 * 4), 6)

    # single token -> simpson NULL, shannon 0
    one = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    r = lexical_diversity(one).collect()[0]
    assert r.shannon == 0.0 and r.simpson is None and r.ttr == 1.0
    # empty corpus -> 0 rows
    assert lexical_diversity(df.where("doc_id < 0")).count() == 0
