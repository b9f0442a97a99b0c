"""Empty-input robustness sweep for the late-round-3 operators: every
operator must return an empty (or well-defined aggregate) result on
empty input, never raise — the property that matters when an upstream
filter legitimately drains a partition-pruned scan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_temporal_ops_on_empty(spark):
    from mms_rdf_spark.operators.temporal import (
        asof_join,
        gap_fill,
        range_join_bucketed,
        time_rollup,
    )

    left = _empty(spark, "event_id long, user_id long, ts timestamp")
    right = _empty(spark, "user_id long, ts timestamp, value double")
    assert asof_join(left, right, on="user_id").count() == 0
    iv = _empty(spark, "interval_id long, user_id long, "
                       "start_ts timestamp, end_ts timestamp")
    pt = _empty(spark, "point_id long, user_id long, ts timestamp")
    assert range_join_bucketed(iv, pt, on="user_id").count() == 0
    ev = _empty(spark, "ts timestamp, value double")
    # Spark grouping-sets on an empty relation yield zero groups
    # (no grand-total row) — pinned so a behavior change is noticed
    assert time_rollup(ev).count() == 0
    assert gap_fill(
        _empty(spark, "user_id long, ts timestamp, value double"),
        "user_id").count() == 0


def test_graph_and_sketch_ops_on_empty(spark):
    from mms_rdf_spark.operators.pagerank import pagerank, triangle_count
    from mms_rdf_spark.operators.sketch import (
        grouped_quantiles,
        kmv_distinct,
        kmv_jaccard,
    )

    e = _empty(spark, "src string, dst string")
    assert pagerank(e, iters=2).count() == 0
    assert triangle_count(e).collect()[0]["n_triangles"] == 0
    ev = _empty(spark, "event_id long, event_type string, value double")
    row = kmv_distinct(ev, "event_id").collect()[0]
    assert row["k_used"] == 0 and row["est_distinct"] == 0.0
    jac = kmv_jaccard(ev, ev, "event_id").collect()[0]
    assert jac["k_used"] == 0
    assert grouped_quantiles(ev, "event_type", "value").count() == 0


def test_text_and_layout_ops_on_empty(spark):
    from mms_rdf_spark.operators.cdc import merge_upsert
    from mms_rdf_spark.operators.layout import zorder_key
    from mms_rdf_spark.operators.link import sorted_neighborhood_pairs
    from mms_rdf_spark.operators.packing import stratified_sample
    from mms_rdf_spark.operators.skew import grouped_topk
    from mms_rdf_spark.operators.textstats import (
        bm25_topk,
        cooccurrence_pmi,
        cross_doc_gram_stats,
        token_vocab,
    )

    docs = _empty(spark, "doc_id long, text string, source string")
    assert bm25_topk(docs, ["x"], k=5).count() == 0
    assert cross_doc_gram_stats(docs).count() == 0
    assert token_vocab(docs).count() == 0
    assert cooccurrence_pmi(docs).count() == 0
    assert stratified_sample(docs).count() == 0
    assert zorder_key(_empty(spark, "id long, a long, b long"),
                      "a", "b").count() == 0
    assert sorted_neighborhood_pairs(
        _empty(spark, "surface string, norm string")).count() == 0
    assert grouped_topk(_empty(spark, "k string, v long"),
                        "k", "v").count() == 0
    base = _empty(spark, "k long, v string, version int, deleted boolean")
    assert merge_upsert(base, base, "k", "version",
                        deleted_col="deleted").count() == 0


def test_analytics_ops_on_empty(spark):
    from mms_rdf_spark.operators.analytics import (
        ab_test_zstats,
        activity_entropy,
        burst_detection,
        change_point,
        chi_square_cells,
        cohort_retention,
        cumulative_uniques,
        ewma_smooth,
        funnel_steps,
        gini_concentration,
        grouped_ntiles,
        grouped_ols_trend,
        grouped_zscore_outliers,
        pareto_frontier_2d,
        period_over_period,
        psi_drift,
        rfm_segments,
        robust_zscore_outliers,
        time_moving_avg,
        top_paths,
        touch_attribution,
        transition_probs,
        value_histogram,
        winsorize,
    )

    ev = _empty(spark, "event_id long, user_id long, event_type string, "
                       "ts timestamp, value double")
    assert funnel_steps(ev, ["a", "b"]).count() == 0
    assert time_moving_avg(ev).count() == 0
    assert transition_probs(ev).count() == 0
    assert cohort_retention(ev).count() == 0
    assert value_histogram(ev).count() == 0
    assert grouped_zscore_outliers(ev, "event_type", "value",
                                   "event_id").count() == 0
    assert grouped_ntiles(ev, "event_type", "value",
                          "event_id").count() == 0
    assert winsorize(ev, "event_type", "value", "event_id").count() == 0
    assert pareto_frontier_2d(ev, "user_id", "value").count() == 0
    assert grouped_ols_trend(ev, "event_type", F.col("user_id"),
                             "value").count() == 0
    assert change_point(ev, "event_type", "value").count() == 0
    assert top_paths(ev).count() == 0
    assert ab_test_zstats(ev, "event_type",
                          F.col("user_id") % 2).count() == 0
    assert period_over_period(ev, "event_type").count() == 0
    assert activity_entropy(ev).count() == 0
    # single-row aggregate over empty input: n_keys 0, gini NULL-safe
    g = gini_concentration(ev).collect()
    assert len(g) == 1 and g[0]["n_keys"] == 0
    assert chi_square_cells(ev, "event_type",
                            (F.col("value") > 0).cast("int")).count() == 0
    assert psi_drift(ev, ev, "value", 0.0, 1.0, n_bins=3).count() == 3
    assert ewma_smooth(ev).count() == 0
    assert rfm_segments(ev).count() == 0
    assert touch_attribution(ev).count() == 0
    assert cumulative_uniques(ev).count() == 0
    assert burst_detection(ev).count() == 0
    assert robust_zscore_outliers(ev, "event_type", "value",
                                  "event_id").count() == 0


def test_new_graph_ops_on_empty(spark):
    from mms_rdf_spark.operators.pagerank import (
        adamic_adar,
        bfs_levels,
        clustering_coefficient,
        degree_assortativity,
        harmonic_centrality_2hop,
        hits,
        k_core,
        katz_centrality,
        label_propagation,
        modularity,
        reciprocity,
        weighted_sssp,
    )

    e = _empty(spark, "src string, dst string")
    lab = _empty(spark, "node string, label string")
    srcs = _empty(spark, "node string")
    assert label_propagation(e, iters=2).count() == 0
    assert k_core(e, k=2, iters=2).count() == 0
    assert hits(e, iters=2).count() == 0
    assert bfs_levels(e, srcs, max_hops=2).count() == 0
    assert degree_assortativity(e).count() == 0
    assert adamic_adar(e).count() == 0
    ew = _empty(spark, "src string, dst string, w long")
    assert weighted_sssp(ew, srcs, rounds=2).count() == 0
    assert clustering_coefficient(e).count() == 0
    assert katz_centrality(e, iters=2).count() == 0
    r = reciprocity(e).collect()
    assert len(r) == 1 and r[0]["n_edges"] == 0
    m = modularity(e, lab).collect()
    assert len(m) == 1 and m[0]["n_communities"] == 0
    assert harmonic_centrality_2hop(e).count() == 0


def test_new_misc_ops_on_empty(spark):
    from mms_rdf_spark.operators.basket import (
        association_rules,
        cooccurrence_similarity,
    )
    from mms_rdf_spark.operators.bpe import bpe_merges
    from mms_rdf_spark.operators.cdc import scd2_history
    from mms_rdf_spark.operators.link import fuzzy_edit_pairs
    from mms_rdf_spark.operators.quality import (
        audit,
        check_unique,
        profile,
        split_leakage,
    )
    from mms_rdf_spark.operators.sessionize import turn_latency
    from mms_rdf_spark.operators.similarity import mean_pool
    from mms_rdf_spark.operators.skew import bloom_prejoin
    from mms_rdf_spark.operators.temporal import (
        interval_overlap_join,
        ohlc_bars,
        time_weighted_avg,
    )
    from mms_rdf_spark.operators.textstats import (
        inverted_index,
        keywords_tfidf,
        readability,
    )

    docs = _empty(spark, "doc_id long, text string")
    assert inverted_index(docs).count() == 0
    assert keywords_tfidf(docs).count() == 0
    assert readability(docs).count() == 0
    assert split_leakage(docs).count() == 0
    assert bpe_merges(docs, rounds=2).count() == 0
    bk = _empty(spark, "bk long, item string")
    assert cooccurrence_similarity(bk, "bk", "item").count() == 0
    assert association_rules(bk, "bk", "item").count() == 0
    ch = _empty(spark, "k long, s string, ts timestamp, oid long")
    assert scd2_history(ch, "k", "s", tiebreak_col="oid").count() == 0
    fz = _empty(spark, "id long, name string, blk string")
    assert fuzzy_edit_pairs(fz, "id", "name", "blk").count() == 0
    tr = _empty(spark, "conv_id string, turn_idx int, role string, "
                       "ts timestamp")
    assert turn_latency(tr).count() == 0
    em = _empty(spark, "vec_id long, embedding array<float>, "
                       "label string")
    assert mean_pool(em).count() == 0
    ev = _empty(spark, "event_id long, user_id long, ts timestamp, "
                       "value double")
    assert time_weighted_avg(ev).count() == 0
    assert ohlc_bars(ev).count() == 0
    iv = _empty(spark, "l_id long, user_id long, start_ts timestamp, "
                       "end_ts timestamp")
    rv = _empty(spark, "r_id long, user_id long, start_ts timestamp, "
                       "end_ts timestamp")
    assert interval_overlap_join(iv, rv, on="user_id").count() == 0
    big = _empty(spark, "id long, key long")
    small = _empty(spark, "key long")
    assert bloom_prejoin(big, small, "key").count() == 0
    rep = audit([check_unique(big, ["id"])]).collect()
    assert rep[0]["violations"] == 0
    assert profile(big, ["id"]).count() == 1


def test_round4_ops_on_empty(spark):
    """Round-4 operators: empty corpora must yield empty (or
    well-defined) results, never raise — including DSIR with an empty
    TARGET (weights degrade to the uniform-smoothing ratio, one row
    per raw doc, no nulls)."""
    from mms_rdf_spark.operators.dsir import dsir_top, dsir_weights
    from mms_rdf_spark.operators.packing import (length_bucketed_batches,
                                                 padding_waste)
    from mms_rdf_spark.operators.similarity import mmr_select_batched
    from mms_rdf_spark.operators.sketch import (approx_grouped_quantiles,
                                                hll_certificate,
                                                hll_distinct,
                                                quantile_rank_certificate)

    docs = _empty(spark, "doc_id long, text string")
    target = _empty(spark, "doc_id long, text string")
    assert dsir_weights(docs, target).count() == 0
    assert dsir_top(docs, target).count() == 0
    some = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    # empty TARGET against a real corpus: defined, null-free
    rows = dsir_weights(some, target, n_buckets=64).collect()
    assert len(rows) == 2 and all(r["logw"] is not None for r in rows)
    assert length_bucketed_batches(docs).count() == 0
    assert padding_waste(length_bucketed_batches(docs)).count() == 0
    ev = _empty(spark, "event_type string, user_id long, value double")
    assert approx_grouped_quantiles(ev, "event_type", "value").count() == 0
    assert quantile_rank_certificate(ev, "event_type", "value").count() == 0
    assert hll_distinct(ev, "event_type", "user_id").count() == 0
    assert hll_certificate(ev, "event_type", "user_id").count() == 0
    emb = _empty(spark, "vec_id long, embedding array<float>")
    assert mmr_select_batched(emb, query_id=0, k=3).count() == 0


def test_ranking_eval_chunking_on_empty(spark):
    from mms_rdf_spark.operators.evalmetrics import doc_pairs, rouge_n
    from mms_rdf_spark.operators.packing import chunk_documents
    from mms_rdf_spark.operators.ranking import bradley_terry, pairwise_games

    docs = _empty(spark, "doc_id long, text string, lang string, "
                         "source string, n_chars long")
    games = pairwise_games(docs)
    assert games.count() == 0
    assert bradley_terry(games, iterations=2).count() == 0
    assert rouge_n(doc_pairs(docs), n=2).count() == 0
    assert chunk_documents(docs).count() == 0


def test_round5_continuation_ops_on_empty(spark):
    from mms_rdf_spark.operators.analytics import seasonal_decompose
    from mms_rdf_spark.operators.link import fellegi_sunter_scores
    from mms_rdf_spark.operators.mlops import feature_hash
    from mms_rdf_spark.operators.pagerank import (
        betweenness_centrality,
        biased_random_walks,
        closeness_centrality,
        hop_plot,
        louvain,
        weighted_pagerank,
    )
    from mms_rdf_spark.operators.textstats import stupid_backoff_scores

    e = _empty(spark, "src string, dst string")
    assert betweenness_centrality(e).count() == 0
    assert closeness_centrality(e).count() == 0
    assert louvain(e).count() == 0
    assert hop_plot(e).count() == 0
    assert biased_random_walks(e).count() == 0
    ew = _empty(spark, "src string, dst string, w long")
    assert weighted_pagerank(ew).count() == 0
    docs = _empty(spark, "doc_id long, text string")
    assert feature_hash(docs).count() == 0
    assert stupid_backoff_scores(docs).count() == 0
    df = _empty(spark, "id long, name string, brand string, blk string")
    assert fellegi_sunter_scores(df, "id", "blk", ["brand"],
                                 "name").count() == 0
    ev = _empty(spark, "ts timestamp")
    assert seasonal_decompose(ev).count() == 0


def test_round5_new_ops_on_empty(spark):
    from mms_rdf_spark.operators.curate import normalize_text
    from mms_rdf_spark.operators.dedup import allpairs_cosine_pairs
    from mms_rdf_spark.operators.evalmetrics import classification_report
    from mms_rdf_spark.operators.link import (
        greedy_matching,
        mutual_best_match,
    )
    from mms_rdf_spark.operators.textstats import (
        good_turing,
        llr_collocations,
    )

    from mms_rdf_spark.operators.pagerank import square_counts
    from mms_rdf_spark.operators.textstats import (
        bleu2_pairs,
        chrf3_pairs,
        jsd_contributions,
        ngram_novelty,
    )

    docs = _empty(spark, "doc_id long, text string")
    assert normalize_text(docs).count() == 0
    assert allpairs_cosine_pairs(docs).count() == 0
    assert llr_collocations(docs).count() == 0
    assert good_turing(docs).count() == 0
    assert bleu2_pairs(docs).count() == 0
    assert jsd_contributions(docs).count() == 0
    assert ngram_novelty(docs).count() == 0
    assert chrf3_pairs(docs).count() == 0
    from mms_rdf_spark.operators.quality import compression_ratio
    assert compression_ratio(docs).count() == 0
    edges = _empty(spark, "src long, dst long")
    assert square_counts(edges).count() == 0
    pairs = _empty(spark, "id_a long, id_b long, score double")
    assert mutual_best_match(pairs).count() == 0
    assert greedy_matching(pairs).count() == 0
    lab = _empty(spark, "id long, label string")
    assert classification_report(lab, lab).count() == 0


def test_continuation11_new_ops_on_empty(spark):
    from mms_rdf_spark.operators.analytics import (
        anderson_darling_k,
        bartlett_test,
        cliffs_delta,
        cochran_armitage,
        fligner_killeen,
        forecast_accuracy,
        grubbs_statistic,
        hurst_exponent,
        kruskal_wallis,
        logrank_test,
        lorenz_curve,
        mood_median_test,
        mw_one_vs_rest_fdr,
        page_trend_test,
        powerlaw_alpha,
        spectral_power,
        theils_u,
        van_der_waerden,
        wasserstein_1d,
        wilcoxon_signed_rank,
        wilson_rates,
    )

    gv = _empty(spark, "g string, v double")
    gl = _empty(spark, "g string, v long")
    assert kruskal_wallis(gv, "g", "v").count() == 0
    assert anderson_darling_k(gv, "g", "v").count() == 0
    assert mood_median_test(gv, "g", "v").count() == 0
    assert bartlett_test(gl, "g", "v").count() == 0
    assert fligner_killeen(gl, "g", "v").count() == 0
    assert van_der_waerden(gl, "g", "v").count() == 0
    # cliffs follows mann_whitney_u's 1-row convention (NULL stats)
    assert cliffs_delta(gv, "g", "v", "a", "b") \
        .collect()[0].delta is None
    assert wasserstein_1d(gv, "g", "v", "a", "b").count() == 0
    assert theils_u(gv, "g", "v").count() == 0
    assert mw_one_vs_rest_fdr(gv, "g", "v").count() == 0
    assert lorenz_curve(gl, "g", "v").count() == 0
    assert wilson_rates(_empty(spark, "g string, s int"),
                        "g", "s").count() == 0
    ab = _empty(spark, "a long, b long")
    assert wilcoxon_signed_rank(ab, "a", "b").count() == 0
    assert grubbs_statistic(gl, "v").count() == 0
    assert powerlaw_alpha(gl, "v").count() == 0
    blk = _empty(spark, "blk long, g string, v long")
    assert page_trend_test(blk, "blk", "g", "v",
                           order=["x", "y"]).count() == 0
    dur = _empty(spark, "g string, duration long, event long")
    assert logrank_test(dur, "g").count() == 0
    assert cochran_armitage(_empty(spark, "g string, s int"),
                            "g", "s", order=["a", "b"]).count() == 0
    ty = _empty(spark, "t long, y long")
    assert forecast_accuracy(ty, "t", "y", 2, 1).count() == 0
    assert hurst_exponent(ty, "t", "y", 1).count() == 0
    assert spectral_power(ty, "t", "y", 1).count() == 0

    from mms_rdf_spark.operators.temporal import lttb_downsample
    assert lttb_downsample(ty, "t", "y").count() == 0

    from mms_rdf_spark.operators.evalmetrics import (
        krippendorff_alpha_interval,
        matthews_corr,
    )
    lab = _empty(spark, "id long, label string")
    assert matthews_corr(lab, lab, positive="x").count() == 0
    assert krippendorff_alpha_interval(
        _empty(spark, "item long, value long")).count() == 0

    from mms_rdf_spark.operators.mlops import (
        kfold_summary,
        ols2_breusch_pagan,
        ols2_train,
    )
    yxx = _empty(spark, "y long, x1 long, x2 long")
    assert ols2_train(yxx, "y", "x1", "x2").count() == 0
    assert ols2_breusch_pagan(yxx, "y", "x1", "x2").count() == 0
    docs = _empty(spark, "doc_id long, text string, lang string")
    assert kfold_summary(docs, k=5).count() == 0

    from mms_rdf_spark.operators.textstats import (
        heaps_fit,
        lexical_diversity,
    )
    d2 = _empty(spark, "doc_id long, text string")
    assert heaps_fit(d2).count() == 0
    assert lexical_diversity(d2).count() == 0

    from mms_rdf_spark.operators.bpe import wordpiece_merges
    assert wordpiece_merges(d2, rounds=2).count() == 0

    from mms_rdf_spark.operators.multimodal import (
        cdc_chunks,
        cdc_dedup_stats,
    )
    med = _empty(spark, "media_id long, payload binary")
    assert cdc_chunks(med).count() == 0
    assert cdc_dedup_stats(cdc_chunks(med)).count() == 0

    from mms_rdf_spark.operators.pagerank import (
        densest_subgraph,
        density_profile,
    )
    e = _empty(spark, "src long, dst long")
    assert density_profile(e).count() == 0
    assert densest_subgraph(e).count() == 0
