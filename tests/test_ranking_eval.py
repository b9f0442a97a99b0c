"""Bradley-Terry ranking, ROUGE-N eval, and RAG chunking fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bradley_terry_orders_by_strength(spark):
    from mms_rdf_spark.operators.ranking import bradley_terry

    # A dominates B, B dominates C; transitive strengths expected
    games = spark.createDataFrame(
        [("A", "B", 8), ("B", "A", 2),
         ("B", "C", 8), ("C", "B", 2),
         ("A", "C", 9), ("C", "A", 1)],
        "winner string, loser string, n long")
    out = {r.player: r for r in bradley_terry(games, iterations=8).collect()}
    assert out["A"].score > out["B"].score > out["C"].score > 0
    assert out["A"].wins == 17 and out["A"].games == 20
    # normalized to mean 1 (9dp grid)
    mean = sum(r.score for r in out.values()) / 3
    assert abs(mean - 1.0) < 1e-6


def test_bradley_terry_zero_win_player(spark):
    from mms_rdf_spark.operators.ranking import bradley_terry

    games = spark.createDataFrame(
        [("A", "B", 3), ("A", "C", 3), ("B", "C", 2), ("C", "B", 1)],
        "winner string, loser string, n long")
    out = {r.player: r for r in bradley_terry(games, iterations=4).collect()}
    # A never lost -> top; nobody here has zero games
    assert out["A"].score == max(r.score for r in out.values())
    assert out["A"].wins == 6 and out["B"].wins == 2 and out["C"].wins == 1


def test_bradley_terry_deterministic(spark):
    from mms_rdf_spark.operators.ranking import bradley_terry, pairwise_games

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", f"src{i % 3}", (i * 37) % 101 + 1)
         for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long")
    g = pairwise_games(docs)
    a = bradley_terry(g, iterations=8).orderBy("player").toPandas()
    b = bradley_terry(g, iterations=8).orderBy("player").toPandas()
    assert a.equals(b)


def test_rouge_n_known_values(spark):
    from mms_rdf_spark.operators.evalmetrics import rouge_n

    pairs = spark.createDataFrame(
        [(0, "a b c d", "b c d e"),   # bigrams: 2 of 3 match
         (1, "a a a a", "a a"),       # clipping: min(3,1)=1
         (2, "x y", "p q")],          # no overlap
        "pair_id long, candidate string, reference string")
    out = {r.pair_id: r for r in rouge_n(pairs, n=2).collect()}
    assert out[0].matches == 2 and out[0].n_cand == 3 and out[0].n_ref == 3
    assert abs(out[0].precision - round(2 / 3, 6)) < 1e-9
    assert abs(out[0].f1 - round(4 / 6, 6)) < 1e-9
    assert out[1].matches == 1 and out[1].n_cand == 3 and out[1].n_ref == 1
    assert abs(out[1].recall - 1.0) < 1e-9
    assert abs(out[1].f1 - 0.5) < 1e-9
    assert out[2].matches == 0 and out[2].precision == 0.0 \
        and out[2].f1 == 0.0


def test_chunk_documents_covers_all_tokens(spark):
    from mms_rdf_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))),  # 10 toks
         (1, "one two"),                              # < size
         (2, "")],                                    # empty
        "doc_id long, text string")
    out = chunk_documents(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # ceil(max(10-4,0)/3)+1 = 3 chunks at starts 0,3,6
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [r.start_tok for r in c0] == [0, 3, 6]
    assert [r.n_tokens for r in c0] == [4, 4, 4]
    assert c0[2].chunk_text == "w6 w7 w8 w9"
    # every token appears in at least one chunk
    covered = set()
    for r in c0:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(10)}
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "one two"
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 0 \
        and by_doc[2][0].chunk_text == ""


def test_chunking_is_shuffle_free(spark):
    from mms_rdf_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_rrf_fusion_known_values(spark):
    from mms_rdf_spark.operators.evalmetrics import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (4, 2)],
                              "doc_id long, rank long")
    out = {r.doc_id: r.rrf_score for r in rrf_fuse(a, b, k=60).collect()}
    assert out[1] == round(1 / 61, 9)          # only in a
    assert out[4] == round(1 / 62, 9)          # only in b
    assert out[3] == round(1 / 63 + 1 / 61, 9)  # both lists
    # doc in both lists outranks a top-1 single-list doc
    assert out[3] > out[1]


def test_bradley_terry_driver_and_frames_fold_identical(spark):
    from mms_rdf_spark.operators.ranking import bradley_terry, pairwise_games

    docs = spark.createDataFrame(
        [(i, f"t{i}", ["en", "de"][i % 2], f"src{i % 5}",
          (i * 53) % 211 + 1) for i in range(120)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    g = pairwise_games(docs).localCheckpoint()
    a = bradley_terry(g, iterations=8, fold="driver") \
        .orderBy("player").toPandas()
    b = bradley_terry(g, iterations=8, fold="frames") \
        .orderBy("player").toPandas()
    assert a[sorted(a.columns)].equals(b[sorted(b.columns)])


def test_retrieval_metrics_hand_computed(spark):
    import math

    from mms_rdf_spark.operators.evalmetrics import retrieval_metrics

    # q1: ranked d1..d4; relevant = d2 (rel 2), d4 (rel 1), d9 (rel 1,
    # never retrieved). q2: no relevant docs at all.
    ranked = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
         ("q1", "d4", 4), ("q2", "d1", 1)],
        "query string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "d2", 2), ("q1", "d4", 1), ("q1", "d9", 1)],
        "query string, doc_id string, rel int")
    got = {r["query"]: r
           for r in retrieval_metrics(ranked, qrels, k=4).collect()}

    r1 = got["q1"]
    assert r1.n_rel == 3
    assert r1.mrr == round(1 / 2, 6)
    # precision at the relevant positions: 1/2 (d2), 2/4 (d4)
    ap = (round(round(0.5, 6) * 1e6) + round(round(0.5, 6) * 1e6)) \
        / 1e6 / 3
    assert r1.ap == round(ap, 6)
    assert r1.p_at_k == round(2 / 4, 6)
    assert r1.recall_at_k == round(2 / 3, 6)
    dcg = (round(round((2**0 - 1) / math.log2(2), 6) * 1e6)
           + round(round((2**2 - 1) / math.log2(3), 6) * 1e6)
           + round(round((2**0 - 1) / math.log2(4), 6) * 1e6)
           + round(round((2**1 - 1) / math.log2(5), 6) * 1e6))
    idcg = (round(round((2**2 - 1) / math.log2(2), 6) * 1e6)
            + round(round((2**1 - 1) / math.log2(3), 6) * 1e6)
            + round(round((2**1 - 1) / math.log2(4), 6) * 1e6))
    assert r1.ndcg == round(dcg / idcg, 6)

    r2 = got["q2"]
    assert (r2.n_rel, r2.mrr, r2.ap, r2.p_at_k, r2.recall_at_k,
            r2.ndcg) == (0, 0.0, 0.0, 0.0, 0.0, 0.0)


def test_retrieval_metrics_perfect_run_is_one(spark):
    from mms_rdf_spark.operators.evalmetrics import retrieval_metrics

    ranked = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)],
        "query string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q", "a", 2), ("q", "b", 1)],
        "query string, doc_id string, rel int")
    r = retrieval_metrics(ranked, qrels, k=2).collect()[0]
    assert (r.mrr, r.ap, r.p_at_k, r.recall_at_k, r.ndcg) == \
        (1.0, 1.0, 1.0, 1.0, 1.0)


def test_bcubed_perfect_clustering(spark):
    from mms_rdf_spark.operators.evalmetrics import bcubed

    a = spark.createDataFrame([(i, i % 3) for i in range(9)],
                              "id long, cluster long")
    g = spark.createDataFrame([(i, i % 3) for i in range(9)],
                              "id long, gold long")
    r = bcubed(a, g).collect()[0]
    assert (r.bcubed_p, r.bcubed_r, r.bcubed_f1) == (1.0, 1.0, 1.0)


def test_bcubed_single_cluster_hand_values(spark):
    from mms_rdf_spark.operators.evalmetrics import bcubed

    # 4 items, gold = {0,1} {2,3}, predicted = one cluster:
    # P_i = 2/4 for all -> P = 0.5 ; R_i = 2/2 = 1 -> R = 1
    a = spark.createDataFrame([(i, 0) for i in range(4)],
                              "id long, cluster long")
    g = spark.createDataFrame([(i, i // 2) for i in range(4)],
                              "id long, gold long")
    r = bcubed(a, g).collect()[0]
    assert r.bcubed_p == 0.5 and r.bcubed_r == 1.0
    assert r.bcubed_f1 == round(2 * 0.5 * 1.0 / 1.5, 6)


def test_bcubed_singletons_recall(spark):
    from mms_rdf_spark.operators.evalmetrics import bcubed

    # all singleton predictions: P = 1, R_i = 1/|G(i)|
    a = spark.createDataFrame([(i, i) for i in range(4)],
                              "id long, cluster long")
    g = spark.createDataFrame([(i, 0) for i in range(4)],
                              "id long, gold long")
    r = bcubed(a, g).collect()[0]
    assert r.bcubed_p == 1.0 and r.bcubed_r == 0.25


def test_bcubed_empty(spark):
    from mms_rdf_spark.operators.evalmetrics import bcubed

    a = spark.createDataFrame([], "id long, cluster long")
    g = spark.createDataFrame([], "id long, gold long")
    assert bcubed(a, g).count() == 0


def test_ari_textbook_example_and_identity(spark):
    from mms_rdf_spark.operators.evalmetrics import adjusted_rand

    a = spark.createDataFrame([(i, v) for i, v in
                               enumerate([0, 0, 0, 1, 1, 1])],
                              "id long, cluster long")
    g = spark.createDataFrame([(i, v) for i, v in
                               enumerate([0, 0, 1, 1, 2, 2])],
                              "id long, gold long")
    r = adjusted_rand(a, g).collect()[0]
    assert r.ari == 0.242424  # Hubert-Arabie worked example family
    assert (r.sum_comb_nij, r.sum_comb_a, r.sum_comb_b) == (2, 6, 3)
    same = adjusted_rand(
        a, a.withColumnRenamed("cluster", "gold")).collect()[0]
    assert same.ari == 1.0


def test_ari_random_labels_near_zero_and_degenerate(spark):
    from mms_rdf_spark.operators.evalmetrics import adjusted_rand

    # all-singletons vs all-singletons: denominator 0 -> defined 1.0
    a = spark.createDataFrame([(i, i) for i in range(5)],
                              "id long, cluster long")
    r = adjusted_rand(
        a, a.withColumnRenamed("cluster", "gold")).collect()[0]
    assert r.ari == 1.0
    # empty input: no row
    e = spark.createDataFrame([], "id long, cluster long")
    assert adjusted_rand(
        e, e.withColumnRenamed("cluster", "gold")).count() == 0


def test_nmi_hand_values_and_identity(spark):
    from mms_rdf_spark.operators.evalmetrics import (
        normalized_mutual_info,
    )

    a = spark.createDataFrame([(i, v) for i, v in
                               enumerate([0, 0, 0, 1, 1, 1])],
                              "id long, cluster long")
    g = spark.createDataFrame([(i, v) for i, v in
                               enumerate([0, 0, 1, 1, 2, 2])],
                              "id long, gold long")
    r = normalized_mutual_info(a, g).collect()[0]
    assert (r.mi_nano, r.hc_nano, r.hg_nano) == (
        462098120, 693147180, 1098612288)
    assert r.nmi == 0.42062
    same = normalized_mutual_info(
        a, a.withColumnRenamed("cluster", "gold")).collect()[0]
    assert same.nmi == 1.0


def test_nmi_degenerate_single_class(spark):
    from mms_rdf_spark.operators.evalmetrics import (
        normalized_mutual_info,
    )

    a = spark.createDataFrame([(i, 0) for i in range(4)],
                              "id long, cluster long")
    r = normalized_mutual_info(
        a, a.withColumnRenamed("cluster", "gold")).collect()[0]
    # both entropies 0 -> defined 1.0 (identical by construction)
    assert r.nmi == 1.0 and r.hc_nano == 0


def test_kappa_textbook_and_degenerates(spark):
    from mms_rdf_spark.operators.evalmetrics import cohens_kappa

    # classic 2x2 example: 50 items, a/b agree on 20 yes + 15 no,
    # disagree 10+5 -> po=0.7, pe=0.5*0.55+0.5*0.45=0.5, kappa=0.4
    rows = []
    i = 0
    for la, lb, cnt in [("y", "y", 20), ("n", "n", 15),
                        ("y", "n", 10), ("n", "y", 5)]:
        for _ in range(cnt):
            rows.append((i, la, lb))
            i += 1
    a = spark.createDataFrame([(i, la) for i, la, _ in rows],
                              "id long, label string")
    b = spark.createDataFrame([(i, lb) for i, _, lb in rows],
                              "id long, label string")
    r = cohens_kappa(a, b).collect()[0]
    assert (r.n, r.n_agree, r.po) == (50, 35, 0.7)
    assert r.pe == 0.5 and r.kappa == 0.4
    # identical raters -> kappa 1; constant-and-equal -> defined 1.0
    same = cohens_kappa(a, a.withColumnRenamed("label", "label")
                        ).collect()[0]
    assert same.kappa == 1.0
    const = spark.createDataFrame([(i, "x") for i in range(4)],
                                  "id long, label string")
    assert cohens_kappa(const, const).collect()[0].kappa == 1.0
    e = spark.createDataFrame([], "id long, label string")
    assert cohens_kappa(e, e).count() == 0


def test_classification_report_textbook(spark):
    from mms_rdf_spark.operators.evalmetrics import classification_report

    # confusion: gold a,a,a,b,b,c ; pred a,a,b,b,b,a
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "a")],
        "id int, label string")
    gold = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "id int, label string")
    got = {r["label"]: (r["tp"], r["fp"], r["fn"], r["precision"],
                        r["recall"], r["f1"])
           for r in classification_report(pred, gold).collect()}
    # a: tp=2 fp=1 fn=1 -> p=2/3 r=2/3 f1=2/3
    pa = round(2 / 3, 6)
    f1a = round(2 * pa * pa / (pa + pa), 6)
    assert got["a"] == (2, 1, 1, pa, pa, f1a)
    # b: tp=2 fp=1 fn=0 -> p=2/3 r=1
    rb = 1.0
    f1b = round(2 * pa * rb / (pa + rb), 6)
    assert got["b"] == (2, 1, 0, pa, rb, f1b)
    # c: never predicted -> tp=0 fp=0 fn=1, zero_division=0
    assert got["c"] == (0, 0, 1, 0.0, 0.0, 0.0)
    assert set(got) == {"a", "b", "c"}


def test_mcnemar_textbook(spark):
    from mms_rdf_spark.operators.evalmetrics import mcnemar_test

    # gold all "x"; A right on 1-6, B right on 1-4 and 7-8:
    # n01 (A wrong, B right) = {7,8} = 2;
    # n10 (A right, B wrong) = {5,6} = 2
    gold = spark.createDataFrame(
        [(i, "x") for i in range(1, 9)], "id int, label string")
    a = spark.createDataFrame(
        [(i, "x" if i <= 6 else "y") for i in range(1, 9)],
        "id int, label string")
    b = spark.createDataFrame(
        [(i, "x" if i <= 4 or i >= 7 else "y") for i in range(1, 9)],
        "id int, label string")
    r = mcnemar_test(a, b, gold).collect()[0]
    assert (r["n"], r["n01"], r["n10"]) == (8, 2, 2)
    # continuity correction: (|2-2|-1)^2 / 4 = 0.25
    assert r["statistic"] == 0.25
    # no discordance -> 0.0
    r2 = mcnemar_test(a, a, gold).collect()[0]
    assert r2["statistic"] == 0.0 and r2["n01"] == 0 and r2["n10"] == 0


def test_golden_record_modal_votes(spark):
    from mms_rdf_spark.operators.link import golden_record

    rows = [
        (1, "c1", "en", "web"), (2, "c1", "en", "api"),
        (3, "c1", "de", "api"), (4, "c2", None, None),
        (5, "c2", "fr", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, cluster string, lang string, source string")
    got = {r["cluster"]: (r["n_members"], r["rep_id"], r["lang"],
                          r["source"])
           for r in golden_record(df, "cluster", ["lang", "source"],
                                  id_col="doc_id").collect()}
    # c1: lang en (2 votes), source tie api/web -> api (value asc)
    assert got["c1"] == (3, 1, "en", "api")
    # c2: lang fr (NULL excluded), source all-NULL -> NULL
    assert got["c2"] == (2, 4, "fr", None)


def test_roc_auc_matches_pairwise_definition(spark):
    from mms_rdf_spark.operators.evalmetrics import roc_auc

    # scores with ties across classes; brute-force pairwise AUC =
    # (#(pos>neg) + 0.5*#(pos==neg)) / (n_pos*n_neg)
    rows = [(0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.7, 1),
            (0.5, 0), (0.5, 0), (0.3, 1), (0.1, 0)]
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(rows)],
        "doc_id long, prob double, y int")
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    brute = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg) \
        / (len(pos) * len(neg))
    r = roc_auc(df).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == round(brute, 6)

    # perfect separation -> 1.0; inverted -> 0.0
    sep = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.8, 1), (3, 0.2, 0)],
        "doc_id long, prob double, y int")
    assert roc_auc(sep).collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(1, 0.1, 1), (2, 0.8, 0)], "doc_id long, prob double, y int")
    assert roc_auc(inv).collect()[0]["auc"] == 0.0

    # one class empty -> auc NULL, counts kept; empty input -> empty
    onec = spark.createDataFrame(
        [(1, 0.5, 1), (2, 0.6, 1)], "doc_id long, prob double, y int")
    r = roc_auc(onec).collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None
    e = spark.createDataFrame([], "doc_id long, prob double, y int")
    assert roc_auc(e).count() == 0


def test_roc_auc_equals_mann_whitney_auc(spark):
    # cross-pin: the scored-classifier-seam roc_auc and the two-
    # sample-seam mann_whitney_auc are the same statistic — the
    # 6dp-rounded values must be identical on real data
    from mms_rdf_spark.operators.analytics import mann_whitney_auc
    from mms_rdf_spark.operators.evalmetrics import roc_auc

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import pyspark.sql.functions as F
    scored = ev.select(
        F.col("value").alias("prob"),
        (F.col("event_type") == "click").cast("int").alias("y"))
    r = roc_auc(scored).collect()[0]
    m = mann_whitney_auc(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") != "click")).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (m["n_a"], m["n_b"])
    assert r["auc"] == m["auc"]


def test_pr_curve_matches_bruteforce(spark):
    from mms_rdf_spark.operators.evalmetrics import pr_curve

    rows = [(0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0), (0.5, 1),
            (0.3, 0), (0.1, 1)]
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(rows)],
        "doc_id long, prob double, y int")
    got = {r["threshold"]: r for r in pr_curve(df).collect()}
    n_pos = sum(y for _, y in rows)
    assert set(got) == {0.9, 0.8, 0.5, 0.3, 0.1}
    for t in got:
        tp = sum(1 for s, y in rows if s >= t and y == 1)
        fp = sum(1 for s, y in rows if s >= t and y == 0)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, n_pos - tp)
        p = round(tp / (tp + fp), 6)
        rec = round(tp / n_pos, 6)
        assert r["precision"] == p and r["recall"] == rec
        assert r["f1"] == (round(2 * p * rec / (p + rec), 6)
                           if p + rec > 0 else 0.0)

    # all-negative corpus: recall/f1 NULL, precision still defined
    neg = spark.createDataFrame([(1, 0.7, 0), (2, 0.2, 0)],
                                "doc_id long, prob double, y int")
    for r in pr_curve(neg).collect():
        assert r["recall"] is None and r["f1"] is None
        assert r["tp"] == 0 and r["precision"] == 0.0

    e = spark.createDataFrame([], "doc_id long, prob double, y int")
    assert pr_curve(e).count() == 0


def test_krippendorff_alpha_known_values_and_missing(spark):
    from mms_rdf_spark.operators.evalmetrics import krippendorff_alpha

    def _r(rows):
        return spark.createDataFrame(rows, "item long, label string")

    # perfect agreement -> alpha = 1
    perfect = _r([(1, "a"), (1, "a"), (2, "b"), (2, "b")])
    assert krippendorff_alpha(perfect).collect()[0]["alpha"] == 1.0

    # maximal systematic disagreement on 2 items, 2 raters:
    # D_o = 4, D_e = (16-8)/3 -> alpha = 1 - 4/(8/3) = -0.5
    dis = _r([(1, "a"), (1, "b"), (2, "a"), (2, "b")])
    row = dis_row = krippendorff_alpha(dis).collect()[0]
    assert row["alpha"] == -0.5
    assert row["n_items"] == 2 and row["n_ratings"] == 4
    assert row["d_o_nano"] == 4 * 10**9

    # missing data: singleton items are excluded, NULL labels ignored
    miss = _r([(1, "a"), (1, "a"), (2, "c"),      # item 2 singleton
               (3, None), (3, "b"), (3, "b")])    # NULL ignored
    row = krippendorff_alpha(miss).collect()[0]
    assert row["n_items"] == 2 and row["n_ratings"] == 4
    assert row["alpha"] == 1.0

    # pure-Python twin on a mixed multi-rater fixture (3 raters,
    # holes, ties) mirroring the 9dp-nano discipline exactly
    rows = [(1, "a"), (1, "a"), (1, "b"),
            (2, "b"), (2, "b"),
            (3, "a"), (3, "c"), (3, "c"),
            (4, "c"), (4, "c"), (4, "c"),
            (5, "a")]  # singleton: excluded
    from collections import Counter, defaultdict
    by_item = defaultdict(list)
    for i, l in rows:
        by_item[i].append(l)
    kept = {i: ls for i, ls in by_item.items() if len(ls) >= 2}
    do_nano = sum(
        int(round(round((len(ls) ** 2
                         - sum(c * c
                               for c in Counter(ls).values()))
                        / (len(ls) - 1), 9) * 1e9))
        for ls in kept.values())
    nc = Counter(l for ls in kept.values() for l in ls)
    n = sum(nc.values())
    de = (float(n) * n - sum(c * c for c in nc.values())) / (n - 1)
    exp = round(1 - (do_nano / 1e9) / de, 6)
    row = krippendorff_alpha(_r(rows)).collect()[0]
    assert row["d_o_nano"] == do_nano and row["alpha"] == exp

    # degenerate: one label everywhere -> D_e = 0 -> alpha NULL
    one = _r([(1, "a"), (1, "a"), (2, "a"), (2, "a")])
    assert krippendorff_alpha(one).collect()[0]["alpha"] is None

    # empty / all-singleton -> empty frame
    e = _r([])
    assert krippendorff_alpha(e).count() == 0
    assert krippendorff_alpha(_r([(1, "a"), (2, "b")])).count() == 0


def test_fleiss_kappa_hand_example_and_guards(spark):
    from mms_rdf_spark.operators.evalmetrics import fleiss_kappa

    # hand-checked, m=2: item1 unanimous 'a' (P_1=1), item2 split
    # a/b (P_2=0) -> P_bar=0.5; c_a=3 c_b=1, Nm=4 -> P_e=10/16
    # kappa = (0.5-0.625)/0.375 = -1/3
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b")], "item long, label string")
    r = fleiss_kappa(df, m=2).collect()[0]
    assert (r["n_items"], r["m"]) == (2, 2)
    assert (r["p_bar"], r["p_e"]) == (0.5, 0.625)
    assert r["kappa"] == round(-1 / 3, 6)

    # unanimous items over DIFFERENT labels: P_bar=1, kappa=1
    u = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "item long, label string")
    assert fleiss_kappa(u, m=2).collect()[0]["kappa"] == 1.0

    # every rating one label: P_e=1 -> kappa NULL (not 1.0)
    d = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "item long, label string")
    r = fleiss_kappa(d, m=2).collect()[0]
    assert r["p_e"] == 1.0 and r["kappa"] is None

    # items with a panel size != m are excluded; NULL labels ignored
    v = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b"), (3, None)],
        "item long, label string")
    r = fleiss_kappa(v, m=2).collect()[0]
    assert r["n_items"] == 1

    # empty input -> empty frame; m < 2 raises
    e = spark.createDataFrame([], "item long, label string")
    assert fleiss_kappa(e, m=2).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        fleiss_kappa(df, m=1)


def test_brier_decomposition_hand_example(spark):
    from mms_rdf_spark.operators.evalmetrics import brier_decomposition

    # hand-checked: brier=0.3, REL=0.1, RES=0.04, UNC=0.24
    # and the Murphy identity REL - RES + UNC = brier holds exactly
    rows = [(1.0, 1), (1.0, 0), (0.0, 0), (0.5, 1), (0.5, 0)]
    df = spark.createDataFrame(rows, "prob double, y int")
    r = brier_decomposition(df).collect()[0]
    assert (r["n"], r["n_bins"]) == (5, 3)
    assert r["brier"] == 0.3
    assert r["reliability"] == 0.1
    assert r["resolution"] == 0.04
    assert r["uncertainty"] == 0.24
    assert round(r["reliability"] - r["resolution"]
                 + r["uncertainty"], 6) == r["brier"]

    # perfect confident forecasts: everything 0
    p = spark.createDataFrame([(1.0, 1), (0.0, 0)], "prob double, y int")
    r = brier_decomposition(p).collect()[0]
    assert (r["brier"], r["reliability"]) == (0.0, 0.0)
    assert r["resolution"] == r["uncertainty"] == 0.25

    # NULLs excluded; empty -> empty frame
    withnull = spark.createDataFrame(
        [(0.5, 1), (None, 0), (0.2, None)], "prob double, y int")
    assert brier_decomposition(withnull).collect()[0]["n"] == 1
    e = spark.createDataFrame([], "prob double, y int")
    assert brier_decomposition(e).count() == 0


def _alpha_interval_reference(items):
    """Pure-Python interval Krippendorff over {item: [values]}."""
    kept = {i: vs for i, vs in items.items() if len(vs) >= 2}
    if not kept:
        return None
    do = 0.0
    for vs in kept.values():
        m = len(vs)
        do += sum((c - k) ** 2 for c in vs for k in vs) / (m - 1)
    allv = [v for vs in kept.values() for v in vs]
    n = len(allv)
    de = sum((c - k) ** 2 for c in allv for k in allv) / (n - 1)
    return 1.0 - do / de if de > 0 else None


def test_krippendorff_interval_reference_and_guards(spark):
    from mms_rdf_spark.operators.evalmetrics import (
        krippendorff_alpha_interval,
    )

    items = {1: [1, 2], 2: [3, 3, 4], 3: [0, 0], 4: [5],
             5: [2, 2, 2]}
    rows = [(i, v) for i, vs in items.items() for v in vs]
    df = spark.createDataFrame(rows, "item long, value long")
    r = krippendorff_alpha_interval(df).collect()[0]
    ref = _alpha_interval_reference(items)
    assert r.n_items == 4          # the singleton item 4 excluded
    assert r.n_ratings == 10
    assert abs(r.alpha - ref) < 1e-6
    # near agreement on a numeric scale scores high
    assert r.alpha > 0.5

    # perfect agreement -> alpha 1; constant ratings -> NULL
    perf = [(i, i) for i in range(5) for _ in range(3)]
    r = krippendorff_alpha_interval(
        spark.createDataFrame(perf, "item long, value long")
    ).collect()[0]
    assert r.alpha == 1.0
    const = [(1, 7), (1, 7), (2, 7), (2, 7)]
    r = krippendorff_alpha_interval(
        spark.createDataFrame(const, "item long, value long")
    ).collect()[0]
    assert r.alpha is None
    # nothing with m >= 2 -> 0 rows
    single = spark.createDataFrame([(1, 3)], "item long, value long")
    assert krippendorff_alpha_interval(single).count() == 0
