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
