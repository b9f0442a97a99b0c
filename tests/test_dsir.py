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
