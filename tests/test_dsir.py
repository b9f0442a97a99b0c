"""DSIR hashed n-gram importance weighting (operators/dsir.py):
target-likeness ordering, exact determinism under repartitioning, and
the TakeOrdered selection plan."""

from __future__ import annotations

import pyspark.sql.functions as F


def _corpus(spark):
    """Docs 0-3 use target-domain vocabulary, 4-7 a disjoint one; the
    target corpus is two MORE docs from the same domain as 0-3."""
    raw = [(i, "alpha beta gamma delta alpha beta") for i in range(4)]
    raw += [(4 + i, "zig zag zog zug zig zag") for i in range(4)]
    target = [(100, "alpha beta gamma alpha"),
              (101, "beta gamma delta beta")]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string")
    return mk(raw), mk(target)


def test_dsir_ranks_target_domain_docs_higher(spark):
    from mms_rdf_spark.operators.dsir import dsir_weights

    raw, target = _corpus(spark)
    got = {r["doc_id"]: r["logw"]
           for r in dsir_weights(raw, target, n_buckets=512).collect()}
    assert len(got) == 8
    in_domain = [got[i] for i in range(4)]
    out_domain = [got[i] for i in range(4, 8)]
    assert min(in_domain) > max(out_domain), got
    # in-domain docs share text => identical weights (pure function)
    assert len(set(in_domain)) == 1 and len(set(out_domain)) == 1


def test_dsir_exact_under_repartitioning(spark):
    """Micro-unit integer sums make the per-doc score independent of
    partitioning/accumulation order — bit-identical, not just close."""
    from mms_rdf_spark.operators.dsir import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.where(F.col("doc_id") % 97 == 0)
    a = sorted(map(tuple, dsir_weights(docs, target).collect()))
    b = sorted(map(tuple, dsir_weights(
        docs.repartition(7), target.coalesce(1)).collect()))
    assert a == b
    assert len(a) == docs.count()


def test_dsir_top_selection_plan_and_order(spark):
    from mms_rdf_spark.operators.dsir import dsir_top, dsir_weights

    raw, target = _corpus(spark)
    top = dsir_top(raw, target, k=3, n_buckets=512)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = top.orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]  # ties -> id order
    w = {r["doc_id"]: r["logw"]
         for r in dsir_weights(raw, target, n_buckets=512).collect()}
    assert all(r["logw"] == w[r["doc_id"]] for r in rows)


def test_hard_negatives_excludes_semantic_positives(spark):
    """Candidates high on BM25 AND in the query's semantic top-k_pos
    must be dropped (they are positives, not negatives); the survivors
    keep BM25 order. Doc 1 matches lexically and points the same way
    as the query embedding -> excluded; docs 2,3 match lexically but
    point away -> the hard negatives."""
    from mms_rdf_spark.operators.textstats import hard_negatives

    docs = spark.createDataFrame(
        [(0, "spark join vector"), (1, "spark join vector fast"),
         (2, "spark join vector slow why"), (3, "spark join vector ok"),
         (4, "nothing relevant here at all")],
        "doc_id long, text string")
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.1]),   # 1 = semantic positive
         (2, [0.0, 1.0]), (3, [-1.0, 0.1]), (4, [0.9, 0.3])],
        "vec_id long, embedding array<float>")
    got = hard_negatives(docs, embs, ["spark", "join", "vector"],
                         query_id=0, k_lex=4, k_pos=2).collect()
    ids = [r["doc_id"] for r in got]
    assert 0 not in ids and 1 not in ids and 4 not in ids, ids
    assert set(ids) == {2, 3}
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] \
        == [1, 2]
    assert all(r["cos"] < 0.5 for r in got)
