"""Hot-bucket capping + scoped-rewrite plan tests (the round-2 scale
fixes): no single task may materialize a quadratic hot bucket, and the
canonical rewrite must never join the non-mention remainder."""

from __future__ import annotations

import pyspark.sql.functions as F

from mms_rdf_spark.operators.dedup import (
    lsh_bucket_stats,
    lsh_candidate_pairs,
)
from mms_rdf_spark.operators.similarity import embedding_near_duplicates


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hot_docs(spark, n=100):
    """n docs with identical text -> one maximal LSH bucket per band."""
    return spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the crawl")
        .alias("text"))


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    docs = _hot_docs(spark, 100)
    uncapped = lsh_candidate_pairs(docs, max_bucket=None).count()
    assert uncapped == 100 * 99 // 2  # the quadratic worst case
    capped = lsh_candidate_pairs(docs, max_bucket=10).count()
    # per band: ceil(100/10)=10 salt groups of ~10 docs -> ~10*C(10,2)
    # pairs; the salt is band-dependent so the 2 bands union to at most
    # 2x that (minus overlap) — still worlds below the quadratic
    assert 0 < capped < uncapped
    assert capped <= 2 * 10 * (10 * 11 // 2)  # slack for uneven crc32 split


def test_lsh_cap_above_bucket_width_is_identity(spark):
    docs = _hot_docs(spark, 40)
    exact = {(r["a_id"], r["b_id"]) for r in
             lsh_candidate_pairs(docs, max_bucket=None).collect()}
    capped = {(r["a_id"], r["b_id"]) for r in
              lsh_candidate_pairs(docs, max_bucket=4096).collect()}
    assert exact == capped  # default cap never alters small-scale output


def test_lsh_bucket_stats_reports_salted_volume(spark):
    docs = _hot_docs(spark, 100)
    stats = lsh_bucket_stats(docs, max_bucket=10).collect()
    assert stats, "the hot bucket must be reported"
    for r in stats:
        assert r["width"] == 100
        assert r["n_salts"] == 10
        assert 0 < r["est_dropped_pairs"] < 100 * 99 // 2


def test_embedding_neardup_cap_bounds_pairs(spark):
    # identical vectors -> one LSH bucket
    vec = [float(i % 7) + 1.0 for i in range(64)]
    emb = spark.range(60).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"))
    exact = embedding_near_duplicates(emb, threshold=0.5,
                                      max_bucket=4096).count()
    assert exact == 60 * 59 // 2
    capped = embedding_near_duplicates(emb, threshold=0.5,
                                       max_bucket=6).count()
    assert 0 < capped < exact


def test_multiband_neardup_recovers_capped_recall(spark):
    """The round-2 gap, closed: with ONE band, pairs split across salt
    groups of an oversized hyperplane bucket are unrecoverable; with b
    bands (independent hyperplanes AND band-dependent salts) a split
    pair is lost only if separated in every band — P(miss) ~
    (1 - 1/n_salts)^b. Adversarial corpus: 120 identical vectors =
    every band one maximal bucket, cap 60 => 2 salt groups/band."""
    from mms_rdf_spark.operators.similarity import (
        embedding_near_duplicates_mb,
    )

    vec = [float(i % 7) + 1.0 for i in range(64)]
    emb = spark.range(120).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"))
    total = 120 * 119 // 2
    single = embedding_near_duplicates(emb, threshold=0.5,
                                       max_bucket=60).count()
    assert single < 0.8 * total, "single band must demonstrably drop pairs"
    multi = embedding_near_duplicates_mb(emb, threshold=0.5, planes=4,
                                         bands=8, max_bucket=60).count()
    assert multi >= 0.95 * total, f"multi-band recall {multi/total:.3f}"
    assert multi <= total


def test_multiband_bands1_matches_single_band(spark):
    """bands=1 must reproduce embedding_near_duplicates row-for-row —
    the multi-band operator is a strict generalization."""
    from mms_rdf_spark.operators.similarity import (
        embedding_near_duplicates_mb,
    )

    emb = spark.range(80).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[(F.col("id") * 7 + F.lit(d) * 3) % 11 - 5.0
                  for d in range(16)]).alias("embedding"))
    a = {(r["a_id"], r["b_id"], r["score"]) for r in
         embedding_near_duplicates(emb, threshold=0.2).collect()}
    b = {(r["a_id"], r["b_id"], r["score"]) for r in
         embedding_near_duplicates_mb(emb, threshold=0.2,
                                      bands=1).collect()}
    assert a == b and a


def test_rewrite_join_scoped_to_mention_slice(spark, triples_df):
    from mms_rdf_spark.operators.link import (
        candidate_edges,
        distinct_surfaces,
        entity_table,
    )
    from mms_rdf_spark.operators.materialize import (
        MENTION_IRI_PREFIX,
        rewrite_mentions_canonical,
    )

    mentions = triples_df.where(
        F.col("object").startswith(MENTION_IRI_PREFIX))
    surfaces = distinct_surfaces(mentions)
    from mms_rdf_spark.operators.cc import connected_components

    comps = connected_components(candidate_edges(surfaces), "src", "dst")
    # truncate the entity-side lineage so the plan assertion below sees
    # only the rewrite's own joins, not link/cc internals
    entities = entity_table(surfaces, comps).localCheckpoint()

    out = rewrite_mentions_canonical(triples_df, entities)
    plan = _plan(out)
    # exactly one join in the whole plan: the mention-slice branch.
    # The non-mention remainder is filter+union only.
    assert plan.count("Join") == 1, plan

    # semantics: every mention object is rewritten to its canonical IRI,
    # every non-mention row is untouched, row multiset preserved
    assert out.count() == triples_df.count()
    ent_map = {r["surface"]: r["canonical_iri"] for r in entities.collect()}
    for r in out.where(F.col("object").startswith(MENTION_IRI_PREFIX)) \
               .limit(5).collect():
        surface = r["object"][len(MENTION_IRI_PREFIX):]
        assert surface not in ent_map, \
            "linked surfaces must have been rewritten to entity IRIs"
    n_canon = out.where(
        F.col("object").startswith("mms-element:Entity.")).count()
    assert n_canon == mentions.count(), \
        "every mention row must carry a canonical entity object"
